"""Semantic tests for the LLM-pipeline operators (SURVEY §2 Part C) —
properties the oracle can't express."""

from __future__ import annotations

import pytest

from spark_dynamodb_spark.operators import dedup, multimodal, similarity


def test_minhash_equals_exact_at_fixture_dup_level(spark, sf_dir):
    """LSH candidates must recover every pair the exact method finds
    (valid at the fixture's J≈0.98 duplicate level)."""
    lsh = {
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_minhash_lsh(spark, sf_dir).collect()
    }
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    assert lsh == exact
    assert len(exact) > 0  # fixture has planted near-dups


def test_lsh_ann_recall_vs_bruteforce(spark, sf_dir):
    brute = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ann_cosine_topk(spark, sf_dir).collect()
    }
    bucketed = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ann_lsh_bucketed(spark, sf_dir).collect()
    }
    recall = len(brute & bucketed) / len(brute)
    assert recall >= 0.5, f"LSH recall {recall:.2f} too low"


def test_simhash_near_dups_are_hamming_close(spark, sf_dir):
    """Planted near-dup pairs must have closer simhashes than random
    pairs on average."""
    sims = {r.doc_id: r.simhash for r in dedup.dedup_simhash(spark, sf_dir).collect()}
    pairs = [
        (r.doc_a, r.doc_b) for r in dedup.dedup_ngram_jaccard(spark, sf_dir).collect()
    ]
    assert pairs

    def hamming(a, b):
        return bin(a ^ b).count("1")

    dup_dist = sum(hamming(sims[a], sims[b]) for a, b in pairs) / len(pairs)
    ids = sorted(sims)[:40]
    rand_pairs = [(ids[i], ids[j]) for i in range(len(ids)) for j in range(i + 1, len(ids))]
    rand_dist = sum(hamming(sims[a], sims[b]) for a, b in rand_pairs) / len(rand_pairs)
    assert dup_dist < rand_dist / 2


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"xx")
    f = multimodal.decode_image(b"abcd", fake=True)
    assert f["n_bytes"] == 4 and f["head"] == "61626364"
