"""SimHash spec pinned by an independent pure-Python implementation
(hashlib.md5) — the third engine alongside Spark SQL and the DuckDB oracle.
Any drift in the Catalyst expression shows up here without needing Spark
and DuckDB to drift together."""

import hashlib

import pytest

from htmlx.spark.analytics import SIMHASH_BITS, simhash_docs
from htmlx.spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


def simhash_py(text: str) -> int:
    votes = [0] * SIMHASH_BITS
    for tok in text.split(" "):
        h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
        for b in range(SIMHASH_BITS):
            votes[b] += 1 if (h >> b) & 1 else -1
    return sum(1 << b for b in range(SIMHASH_BITS) if votes[b] > 0)


@pytest.fixture(scope="module")
def spark():
    s = get_spark(cores=4, app_name="htmlx-simhash-test")
    yield s
    s.stop()


def test_simhash_matches_python_reference(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    rows = {r.doc_id: r.simhash for r in simhash_docs(docs, hash_basis="md5").collect()}
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert len(rows) == 50
    for doc_id, text in texts.items():
        assert rows[doc_id] == simhash_py(text), doc_id


def test_simhash_edge_strings(spark):
    """Whitespace runs (empty tokens), unicode, punctuation: the Spark
    expression and the Python reference must agree token-for-token."""
    cases = [
        "a  b",            # double space -> empty token, md5('') hashed
        " leading",
        "trailing ",
        "汉字 mixed ascii tokens",
        "café naïve résumé",
        "a,b.c!d",         # punctuation stays inside tokens
        "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 astral",  # astral-plane chars
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id long, text string"
    )
    got = {r.doc_id: r.simhash for r in simhash_docs(df, hash_basis="md5").collect()}
    for i, t in enumerate(cases):
        assert got[i] == simhash_py(t), repr(t)


def test_simhash_locality():
    """Near-identical texts differ in few bits; unrelated texts in many."""
    base = "the quick brown fox jumps over the lazy dog " * 10
    near = base.replace("lazy", "sleepy", 1)
    far = "completely different content about spark partitioning strategies " * 8

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(simhash_py(base), simhash_py(near)) <= 12
    assert hamming(simhash_py(base), simhash_py(far)) >= 15
