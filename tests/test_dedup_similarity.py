"""Dedup + similarity operators on planted fixtures (the driver testdata
has few genuine near-dups, so these tests construct known ones)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goobi_viewer_indexer_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def planted(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    far = "completely different content about spark query engines and shuffles"
    rows = [
        (0, base), (1, base),            # exact dups
        (2, near),                        # near-dup of 0/1
        (3, far), (4, "tiny"), (5, None), # singletons / degenerate
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(planted):
    groups = dedup.exact_duplicates(planted).collect()
    assert len(groups) == 1
    assert groups[0]["n_copies"] == 2
    assert groups[0]["doc_ids"] == "0,1"


def test_minhash_lsh_finds_near_dups(planted):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in dedup.minhash_near_duplicates(planted, threshold=0.5).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert (1, 2) in pairs
    assert not any(3 in p or 4 in p or 5 in p for p in pairs)


def test_lsh_candidates_superset_of_verified(planted):
    sigs = dedup.minhash_signature(planted)
    cands = {(r["doc_a"], r["doc_b"]) for r in dedup.lsh_candidate_pairs(sigs).collect()}
    verified = {(r["doc_a"], r["doc_b"]) for r in dedup.minhash_near_duplicates(planted, threshold=0.5).collect()}
    assert verified <= cands


def test_simhash_near_for_near_docs(planted):
    fp = {r["doc_id"]: r["simhash"] for r in dedup.simhash_fingerprint(planted).collect()}
    assert fp[0] == fp[1]  # identical docs → identical fingerprint
    ham_near = bin(fp[0] ^ fp[2]).count("1")
    ham_far = bin(fp[0] ^ fp[3]).count("1")
    assert ham_near < ham_far
    assert fp[5] == 0  # null text


def test_lsh_ann_matches_bruteforce_on_top1(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qv = list(emb.filter(F.col("vec_id") == 1).select("embedding").collect()[0][0])
    brute = [r["vec_id"] for r in similarity.cosine_topk_bruteforce(emb, qv, k=10).collect()]
    # wide buckets (4 planes → 16 buckets × 8 tables) for high recall on
    # isotropic random embeddings, where sign-sketch recall is weakest
    approx = [r["vec_id"] for r in similarity.cosine_topk_lsh(emb, qv, k=10, n_tables=8, n_planes=4).collect()]
    # the query vector itself (cosine 1.0) must always be retrieved
    assert brute[0] == 1
    assert approx[0] == 1
    # recall@10 sanity
    assert len(set(brute) & set(approx)) >= 5


def test_embedding_near_duplicates_symmetry(spark):
    rows = [(0, [1.0, 0.0, 0.0]), (1, [1.0, 0.001, 0.0]), (2, [0.0, 1.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.embedding_near_duplicates(emb, threshold=0.99).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(0, 1)]
