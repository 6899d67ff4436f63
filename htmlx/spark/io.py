"""Table IO seam: atomic-commit appends + checkpoint/resume.

SURVEY.md §2.3/§7.5: on a real cluster this is an Iceberg catalog —
``writeTo(table).append()`` per partition group, resume by querying committed
snapshot summaries. The Iceberg runtime jar is not available offline in this
sandbox, so the same contract is implemented as Parquet subdirectories plus a
JSON manifest of committed group ids; the seam (``TableIO``) keeps both
implementations interchangeable.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


class ParquetTableIO:
    """Parquet + manifest implementation of the commit/resume contract.

    Layout:
      <root>/data/group=<gid>/*.parquet   one atomic-ish append per group
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

    # -- append ------------------------------------------------------------
    def append_group(self, df: DataFrame, run_id: str, group_id: int) -> None:
        """Write one partition group then commit it to the manifest.
        The manifest update happens only after a successful write, so a
        failed run leaves the group uncommitted and it is redone on resume
        (write-then-commit = the Iceberg snapshot-commit analogue)."""
        path = os.path.join(self.data_dir, f"group={group_id}")
        df.write.mode("overwrite").parquet(path)
        manifest = self._read_manifest()
        groups = set(manifest["committed"].get(run_id, []))
        groups.add(group_id)
        manifest["committed"][run_id] = sorted(groups)
        self._write_manifest(manifest)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.option("basePath", self.data_dir).parquet(
            os.path.join(self.data_dir, "group=*")
        )


def run_with_resume(
    spark: SparkSession,
    pages: DataFrame,
    out: ParquetTableIO,
    metrics_out: ParquetTableIO | None,
    run_id: str,
    num_groups: int = 8,
    config=None,
    partitions_per_group: int | None = None,
):
    """Checkpointed driver loop (SURVEY.md §7.5).

    Work is divided into url-hash buckets 0..num_groups-1; each group's
    output append is one atomic commit tagged (run_id, group_id). On restart
    with the same run_id, committed groups are skipped.
    """
    from ..core.extract import Config
    from .job import run_extraction, run_metrics

    config = config or Config()
    done = out.committed_groups(run_id)
    bucket = F.pmod(F.xxhash64(F.col("url"), F.lit("htmlx-group")), F.lit(num_groups))
    for gid in range(num_groups):
        if gid in done:
            continue
        group_df = pages.where(bucket == gid)
        results = run_extraction(group_df, config, run_id, partitions_per_group)
        out.append_group(results, run_id, gid)
        if metrics_out is not None:
            metrics = run_metrics(group_df, config, run_id, partitions_per_group)
            metrics_out.append_group(metrics, run_id, gid)
    return out.read(spark)
