"""Dedup operators vs the DuckDB oracle at sf0.01 — the sf the driver
gate uses, and the smallest sf where the generator plants near-dups.

Beyond bit-parity (test_analytics_oracle covers every spec at the
default sf), these tests assert *content*: the planted near-duplicate
pairs are actually recovered, and MinHash-LSH recall vs the exact
n-gram-Jaccard join is high.
"""

from __future__ import annotations

import pytest

from gcp_dbt_data_engineering_spark.operators.dedup import SPECS

from .oracle_harness import compare

SF = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(SPECS))
def test_dedup_oracle_sf001(spark, name):
    spec = SPECS[name]
    res = compare(spec.spark(spark, SF), spec.oracle, SF)
    assert res["match"], res


def test_near_dup_pairs_found(spark):
    exact = {
        (r.doc_a, r.doc_b)
        for r in SPECS["dedup_ngram_jaccard"].spark(spark, SF).collect()
    }
    assert len(exact) >= 10, "generator plants ~25 near-dup pairs at sf0.01"

    lsh = {
        (r.doc_a, r.doc_b)
        for r in SPECS["dedup_minhash_lsh"].spark(spark, SF).collect()
    }
    assert lsh <= exact or len(lsh - exact) <= len(lsh) // 2
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.8, f"MinHash-LSH recall {recall:.2f} too low"

    sim = {
        (r.doc_a, r.doc_b)
        for r in SPECS["dedup_simhash"].spark(spark, SF).collect()
    }
    sim_recall = len(sim & exact) / len(exact)
    assert sim_recall >= 0.6, f"SimHash recall {sim_recall:.2f} too low"


def test_embedding_near_dup_nonempty(spark):
    rows = SPECS["dedup_embedding_cosine"].spark(spark, SF).collect()
    assert all(r.vec_a < r.vec_b for r in rows)
    assert all(r.cosine >= 0.4 for r in rows)
