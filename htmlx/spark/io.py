"""Table IO seam: atomic-commit appends + checkpoint/resume.

SURVEY.md §2.3/§7.5: on a real cluster this is an Iceberg catalog —
``writeTo(table).append()`` per snapshot, resume by querying committed
snapshot summaries. The Iceberg runtime jar is not available offline in this
sandbox, so the same contract is implemented as Parquet subdirectories plus a
JSON manifest of committed group ids; the seam (``ParquetTableIO``) keeps
both implementations interchangeable.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


class ParquetTableIO:
    """Parquet + manifest implementation of the commit/resume contract.

    Layout:
      <root>/data/group=<gid>/*.parquet   partition-dir per url-hash group
      <root>/_manifest.json               {"committed": {run_id: [gid, ...]}}
    """

    def __init__(self, root: str):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.manifest_path = os.path.join(root, "_manifest.json")
        os.makedirs(self.data_dir, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    def _read_manifest(self) -> dict:
        if not os.path.exists(self.manifest_path):
            return {"committed": {}}
        with open(self.manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, manifest: dict) -> None:
        tmp = self.manifest_path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self.manifest_path)  # atomic on POSIX

    def committed_groups(self, run_id: str) -> set[int]:
        return set(self._read_manifest()["committed"].get(run_id, []))

    def _commit_groups(self, run_id: str, group_ids) -> None:
        manifest = self._read_manifest()
        groups = set(manifest["committed"].get(run_id, []))
        groups.update(int(g) for g in group_ids)
        manifest["committed"][run_id] = sorted(groups)
        self._write_manifest(manifest)

    # -- append ------------------------------------------------------------
    def append_group(self, df: DataFrame, run_id: str, group_id: int) -> None:
        """Write one partition group then commit it to the manifest.
        The manifest update happens only after a successful write, so a
        failed run leaves the group uncommitted and it is redone on resume
        (write-then-commit = the Iceberg snapshot-commit analogue)."""
        path = os.path.join(self.data_dir, f"group={group_id}")
        df.write.mode("overwrite").parquet(path)
        self._commit_groups(run_id, [group_id])

    def append_groups(self, df: DataFrame, run_id: str, group_ids) -> None:
        """Write MANY groups in one pass — df must carry a `group` column.

        One `partitionBy("group")` write (dynamic partition overwrite: only
        the touched group dirs are replaced, committed dirs stay intact),
        then ONE manifest commit covering them all. This is the Iceberg
        single-append-snapshot analogue: the input is scanned once for N
        groups instead of once per group. A failure before the manifest
        write leaves every group in the pass uncommitted; resume redoes the
        pass (partial dirs are overwritten), so exactly-once output still
        holds — the resume granularity is the pass, not the group."""
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("group")
            .parquet(self.data_dir)
        )
        self._commit_groups(run_id, group_ids)

    def is_empty(self) -> bool:
        """True when no group dir has ever been written (a partitioned
        write of zero rows creates no directories — a legitimate state for
        e.g. an audit table over a clean corpus)."""
        return not any(e.startswith("group=") for e in os.listdir(self.data_dir))

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.option("basePath", self.data_dir).parquet(
            os.path.join(self.data_dir, "group=*")
        )


def group_bucket(num_groups: int):
    """Deterministic url-hash bucket column (JVM-side, no Python roundtrip)."""
    return F.pmod(F.xxhash64(F.col("url"), F.lit("htmlx-group")), F.lit(num_groups))


def run_with_resume(
    spark: SparkSession,
    pages: DataFrame,
    out: ParquetTableIO,
    metrics_out: ParquetTableIO | None,
    run_id: str,
    num_groups: int = 8,
    config=None,
    partitions_per_group: int | None = None,
    audit_out: ParquetTableIO | None = None,
    doc_counter=None,
):
    """Checkpointed extraction run (SURVEY.md §7.5), single-scan.

    Work is divided into url-hash buckets 0..num_groups-1. All uncommitted
    groups are processed in ONE pass: one scan of the input (a single
    `group IN (pending)` predicate instead of a scan per group), one
    extraction of each document, one partitioned write, one manifest
    commit. On restart with the same run_id, committed groups are skipped
    and only pending ones are rescanned/redone.

    Metrics and audit tables are DERIVED from the results just written
    (column-pruned read-back of the thin lineage columns), so enabling
    them adds zero extra extraction work and zero extra input scans.
    """
    from ..core.extract import Config
    from .job import derive_audit, derive_metrics, run_extraction

    config = config or Config()
    done = out.committed_groups(run_id)
    pending = [g for g in range(num_groups) if g not in done]
    if pending:
        bucket = group_bucket(num_groups)
        work = pages.where(bucket.isin(pending)) if done else pages
        num_partitions = partitions_per_group * len(pending) if partitions_per_group else None
        collect_audit = config.audit_enabled or audit_out is not None
        results = run_extraction(
            work, config, run_id, num_partitions,
            with_audit=collect_audit, doc_counter=doc_counter,
        )
        # recompute the bucket on the result rows (same deterministic hash)
        results = results.withColumn("group", bucket)
        out.append_groups(results, run_id, pending)
        if metrics_out is not None or audit_out is not None:
            # derive from the WRITTEN results: pruned scan of thin columns,
            # zero re-extraction and zero extra scans of the input table
            written = out.read(spark).where(
                (F.col("run_id") == run_id) & F.col("group").isin(pending)
            )
            if metrics_out is not None:
                # keyed by (run_id, partition_id, group): the metrics write
                # touches exactly the pending group dirs, so a later resume
                # pass can never clobber an already-committed group's rows
                metrics = derive_metrics(
                    written.select(
                        "run_id",
                        "partition_id",
                        "group",
                        "error",
                        "input_bytes",
                        "processing_time_ms",
                        "audit",
                    ),
                    extra_keys=("group",),
                )
                metrics_out.append_groups(metrics, run_id, pending)
            if audit_out is not None:
                audit_out.append_groups(
                    derive_audit(written).withColumn("group", group_bucket(num_groups)),
                    run_id,
                    pending,
                )
    return out.read(spark)
