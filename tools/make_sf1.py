"""Synthesize the sf1 (10x) shakeout corpus from sf0.1 — the generator
behind BENCH/BASELINE.md's round-9 scale readings.

  python tools/make_sf1.py [src_sf_dir] [out_dir]
  # defaults: /root/testdata/sf0.1 -> /tmp/htmlx_scale/sf1

Replication is STAT-PRESERVING, which is the shakeout's validity
condition: verbatim 10x copies would make every exact-dup group, LSH
bucket and embedding cluster ~10x denser, inflating the pair stages
quadratically — measuring data fabrication, not scaling.

  documents   replica 0 verbatim; replicas 1..9 word-shuffled by a
              deterministic md5 sort key (identical unigram/length
              stats, shingle overlap ~0 -> dup densities match base)
  embeddings  replicas rotate the vector by `rep` dims (norms and
              value distributions preserved; rotations decorrelate)
  lineitem +  key-shifted replicas with the SAME o_orderkey stride, so
  orders      every sf1 lineitem row still joins its order (an unshifted
              orders copy would orphan 9/10 of the join — the exact
              selectivity distortion this tool exists to avoid);
              o_custkey stays unshifted: dims keep their size and each
              customer simply carries 10x orders, the TPC-H shape of a
              bigger corpus over the same customer base
  events      key-shifted replicas (10x fact rows)
  dims        region/nation/customer/supplier/part copied
"""

import shutil
import sys

import duckdb


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/htmlx_scale/sf1"
    import os

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 8")
    n_docs = con.execute(
        f"SELECT count(*) FROM read_parquet('{base}/documents.parquet')"
    ).fetchone()[0]
    n_vecs = con.execute(
        f"SELECT count(*) FROM read_parquet('{base}/embeddings.parquet')"
    ).fetchone()[0]

    con.execute(f"""
    COPY (
      WITH reps AS (SELECT unnest(generate_series(0, 9)) AS rep),
      src AS (SELECT * FROM read_parquet('{base}/documents.parquet'))
      SELECT s.doc_id + r.rep * {n_docs} AS doc_id,
             CASE WHEN r.rep = 0 THEN s.text
                  ELSE array_to_string(
                    list_transform(
                      list_sort(
                        list_transform(string_split(s.text, ' '),
                          (w, i) -> struct_pack(k := md5(w || ':' || i || ':' || r.rep), w := w))),
                      p -> p.w), ' ')
             END AS text,
             s.lang, s.source, CAST(length(s.text) AS BIGINT) AS n_chars
      FROM src s, reps r
    ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      WITH reps AS (SELECT unnest(generate_series(0, 9)) AS rep),
      src AS (SELECT * FROM read_parquet('{base}/embeddings.parquet'))
      SELECT s.vec_id + r.rep * {n_vecs} AS vec_id,
             CASE WHEN r.rep = 0 THEN s.embedding
                  ELSE list_concat(s.embedding[r.rep + 1:], s.embedding[1:r.rep])
             END AS embedding,
             s.label
      FROM src s, reps r
    ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      WITH reps AS (SELECT unnest(generate_series(0, 9)) AS rep)
      SELECT l_orderkey + rep * 10000000 AS l_orderkey, l_partkey, l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
             l_returnflag, l_linestatus, l_shipdate
      FROM read_parquet('{base}/lineitem.parquet'), reps
    ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      WITH reps AS (SELECT unnest(generate_series(0, 9)) AS rep)
      SELECT event_id + rep * 10000000 AS event_id, ts,
             user_id + rep * 1000000 AS user_id, event_type, value, props
      FROM read_parquet('{base}/events.parquet'), reps
    ) TO '{out}/events.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      WITH reps AS (SELECT unnest(generate_series(0, 9)) AS rep)
      SELECT o_orderkey + rep * 10000000 AS o_orderkey, o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM read_parquet('{base}/orders.parquet'), reps
    ) TO '{out}/orders.parquet' (FORMAT PARQUET)
    """)
    for t in ("region", "nation", "customer", "supplier", "part"):
        shutil.copy(f"{base}/{t}.parquet", f"{out}/{t}.parquet")
    for t in ("documents", "embeddings", "lineitem", "orders", "events"):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n}")
    print(f"sf1 at {out} — run: SPARK_GRAFT_SF_DIR={out} python bench.py")


if __name__ == "__main__":
    main()
