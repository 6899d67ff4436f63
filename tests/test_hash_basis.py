"""The two hash bases (xxhash64 production / md5 oracle) must be
interchangeable for dedup purposes: identical VERIFIED near-dup output and
equivalent signature structure on the test corpus. Pinning this is what
lets the driver queries run md5 (DuckDB-replicable) while production and
bench run the several-times-cheaper JVM xxhash64."""

import pytest

from htmlx.spark.analytics import (
    SIMHASH_BITS,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_docs,
)
from htmlx.spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = get_spark(cores=4, app_name="htmlx-hash-basis-test")
    yield s
    s.stop()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def _verified_pairs(docs, basis):
    cands = minhash_lsh_candidates(docs, max_bucket_size=None, hash_basis=basis)
    verified = ngram_jaccard_pairs(docs, cands).where("jaccard >= 0.9")
    return {(r.doc_a, r.doc_b) for r in verified.collect()}


def test_verified_candidate_sets_identical_across_bases(docs):
    """The full dedup pipeline (LSH candidates -> exact-Jaccard verify at
    J >= 0.9) produces the SAME pairs under both bases: per-pair LSH recall
    at J >= 0.9 is ~0.9998 with 8 bands x 4 rows, and the corpus's injected
    near-dup cluster sits at J 0.9-0.99 with a gap below to 0.07, so any
    well-mixed 64-bit base hash lands the identical verified set."""
    xx = _verified_pairs(docs, "xxhash64")
    md = _verified_pairs(docs, "md5")
    assert xx, "corpus must contain injected near-dup pairs"
    assert xx == md


def test_simhash_structure_equivalent_across_bases(docs):
    """Near-dup pairs must be low-Hamming and unrelated pairs high-Hamming
    under BOTH bases (absolute signatures differ by construction)."""
    near = sorted(_verified_pairs(docs, "md5"))
    sigs = {}
    for basis in ("xxhash64", "md5"):
        sigs[basis] = {
            r.doc_id: r.simhash for r in simhash_docs(docs, hash_basis=basis).collect()
        }

    def hamming(s, a, b):
        return bin(s[a] ^ s[b]).count("1")

    ids = sorted(sigs["md5"])
    near_set = set(near)
    far = [
        (ids[i], ids[i + 7])
        for i in range(0, len(ids) - 7, 11)
        if (ids[i], ids[i + 7]) not in near_set
    ][: len(near)]
    for basis in ("xxhash64", "md5"):
        s = sigs[basis]
        near_mean = sum(hamming(s, a, b) for a, b in near) / len(near)
        far_mean = sum(hamming(s, a, b) for a, b in far) / len(far)
        # near-dups a few bits apart; unrelated docs many bits apart (the
        # corpus shares a generator vocabulary, so "far" sits ~17 bits, not
        # the 30 of truly random text — measured ~2 vs ~17 for both bases)
        assert near_mean < SIMHASH_BITS * 0.1, (basis, near_mean)
        assert far_mean > SIMHASH_BITS * 0.2, (basis, far_mean)
        assert far_mean > 4 * near_mean, (basis, near_mean, far_mean)
        # bit balance: each signature uses a healthy share of the 60 bits
        ones = sum(bin(v).count("1") for v in s.values()) / len(s)
        assert SIMHASH_BITS * 0.2 < ones < SIMHASH_BITS * 0.8, (basis, ones)
