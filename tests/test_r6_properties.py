"""Property pins for the r6 second-wave corpus operators, batched as one
DataFrame per law (the test_url_canonical pattern — structured randoms,
Spark evaluated once, not per-example):

- ccnet_norm_col: idempotence (a dedup key must be a fixpoint) + totality
  + output alphabet (letters / '0' / single spaces only).
- anchor_text_agg: inlink conservation (output counts sum to the
  cross-host input link count), n_src_hosts <= n_inlinks.
- snapshot_diff: the output is a PARTITION of old∪new canonical URLs
  (each exactly once) with status consistent with side presence.
- host_template_lines: line-count conservation (n_lines - n_removed ==
  cleaned line count) and sub-min_docs hosts never modified.
"""

import random

import pytest

from pyspark.sql import functions as F

from htmlx.spark.analytics import (
    anchor_text_agg,
    ccnet_norm_col,
    host_template_lines,
    snapshot_diff,
)
from htmlx.spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(cores=4, app_name="htmlx-r6-properties")
    yield s
    s.stop()


def test_ccnet_norm_idempotent_total_alphabet(spark):
    rng = random.Random(7)
    pool = " aB3.!?\t\nàÉßœ中é—«»…_-/0"
    texts = [
        "".join(rng.choice(pool) for _ in range(rng.randrange(0, 60)))
        for _ in range(400)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    once = {
        r["i"]: r["n"]
        for r in df.select("i", ccnet_norm_col("text").alias("n")).collect()
    }
    df2 = spark.createDataFrame([(i, n) for i, n in once.items()],
                                "i long, text string")
    twice = {
        r["i"]: r["n"]
        for r in df2.select("i", ccnet_norm_col("text").alias("n")).collect()
    }
    for i, t in enumerate(texts):
        assert once[i] == twice[i], f"not a fixpoint: {t!r} -> {once[i]!r} -> {twice[i]!r}"
        n = once[i]
        assert "  " not in n and n == n.strip()
        for c in n:
            assert c == "0" or c == " " or c.isalpha(), (t, n, c)


def test_anchor_agg_conservation(spark):
    rng = random.Random(13)
    hosts = [f"h{k}.com" for k in range(6)]
    rows = []
    for i in range(500):
        s, t = rng.choice(hosts), rng.choice(hosts)
        anchor = rng.choice([None, "", "x", "résumé", "some anchor words"])
        rows.append((f"https://{s}/p/{i}", f"https://{t}/q/{i}", anchor))
    df = spark.createDataFrame(rows, "src_url string, dst_url string, anchor_text string")
    out = anchor_text_agg(df).collect()
    n_cross = sum(
        1 for s, t, _ in [
            (r[0].split("/")[2], r[1].split("/")[2], r[2]) for r in rows
        ] if s != t
    )
    assert sum(r["n_inlinks"] for r in out) == n_cross
    for r in out:
        assert 1 <= r["n_src_hosts"] <= r["n_inlinks"]
        assert r["anchor_bytes"] >= 0
        assert 0 <= r["n_empty_anchors"] <= r["n_inlinks"]


def test_snapshot_diff_is_a_partition(spark):
    rng = random.Random(17)
    S = "doc_id long, url string, text string, warc_ts long"

    def snap(tag, n):
        return [
            (i + (1000 if tag == "n" else 0),
             f"https://s.com/p{rng.randrange(40)}",
             rng.choice(["a", "b", "c"]),
             rng.randrange(5))
            for i in range(n)
        ]

    old_rows, new_rows = snap("o", 60), snap("n", 60)
    o = spark.createDataFrame(old_rows, S)
    n = spark.createDataFrame(new_rows, S)
    out = snapshot_diff(o, n).collect()
    urls = [r["canonical_url"] for r in out]
    assert len(urls) == len(set(urls))  # each canonical URL exactly once
    assert set(urls) == {r[1] for r in old_rows} | {r[1] for r in new_rows}
    for r in out:
        if r["status"] == "added":
            assert r["old_doc_id"] is None and r["new_doc_id"] is not None
        elif r["status"] == "removed":
            assert r["new_doc_id"] is None and r["old_doc_id"] is not None
        else:
            assert r["old_doc_id"] is not None and r["new_doc_id"] is not None


def test_host_template_line_conservation(spark):
    rng = random.Random(19)
    rows = []
    for i in range(120):
        host = f"h{rng.randrange(4)}.com" if i % 10 else "lone.com"
        lines = ["TEMPLATE HEADER"] + [
            f"body {i} line {j}" for j in range(rng.randrange(1, 4))
        ]
        rows.append((i, f"https://{host}/{i}", "\n".join(lines)))
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = {r["doc_id"]: r for r in host_template_lines(df).collect()}
    texts = {r[0]: r[2] for r in rows}
    for i, r in out.items():
        n_clean = len(r["cleaned_text"].split("\n")) if r["cleaned_text"] else 0
        assert r["n_lines"] == len(texts[i].split("\n"))
        assert r["n_lines"] - r["n_removed"] == n_clean, (i, r)
    # lone.com has at most ~12 docs sharing TEMPLATE HEADER (>= min_docs),
    # so it IS eligible; check instead a genuinely tiny host:
    tiny = spark.createDataFrame(
        [(1, "https://t.com/1", "X\na"), (2, "https://t.com/2", "X\nb")],
        "doc_id long, url string, text string",
    )
    for r in host_template_lines(tiny).collect():
        assert r["n_removed"] == 0  # below the min_docs floor
