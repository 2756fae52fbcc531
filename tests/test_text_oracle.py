"""Text-analysis operators vs the DuckDB oracle at sf0.01, plus
content checks (non-degenerate distributions, fingerprint near-dup
signal agrees with the exact Jaccard pairs)."""

from __future__ import annotations

import pytest

from gcp_dbt_data_engineering_spark.operators.text import SPECS

from .oracle_harness import compare

SF = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(SPECS))
def test_text_oracle_sf001(spark, name):
    spec = SPECS[name]
    res = compare(spec.spark(spark, SF), spec.oracle, SF)
    assert res["match"], res


def test_quality_tiers_nondegenerate(spark):
    rows = SPECS["text_quality_score"].spark(spark, SF).collect()
    tiers = {r.tier for r in rows}
    assert len(tiers) >= 2, f"all docs in one tier: {tiers}"
    assert all(0.0 <= r.score <= 1.0 for r in rows)


def test_fingerprint_flags_near_dups(spark):
    from gcp_dbt_data_engineering_spark.operators.dedup import SPECS as D

    near = {
        d
        for r in D["dedup_ngram_jaccard"].spark(spark, SF).collect()
        for d in (r.doc_a, r.doc_b)
    }
    fp = SPECS["text_fingerprint"].spark(spark, SF).collect()
    flagged = {r.doc_id for r in fp if r.n_docs_same_fp > 1}
    # shared-min-gram fingerprint should catch a majority of the
    # planted near-dup docs (it is a 1-perm MinHash: recall < 1).
    hit = len(near & flagged) / max(len(near), 1)
    assert hit >= 0.5, f"fingerprint hit-rate {hit:.2f}"


def test_rake_keywords_oracle_and_semantics(spark):
    """Oracle twin for text_rake_keywords plus RAKE semantics: no
    stopword appears inside a candidate, candidates respect the length
    cap, and scores are degree/frequency-consistent (>= n_words, since
    every member word's score is >= its own phrase's length >= 1)."""
    from gcp_dbt_data_engineering_spark.operators.text import (
        RAKE_MAX_PHRASE,
        RAKE_TOP_K,
        SPECS,
        _RAKE_STOPS,
    )
    from .oracle_harness import compare

    SF = "/root/testdata/sf0.01"
    spec = SPECS["text_rake_keywords"]
    res = compare(spec.spark(spark, SF), spec.oracle, SF)
    assert res["match"], res

    rows = spec.spark(spark, SF).collect()
    assert len(rows) == RAKE_TOP_K
    stops = set(_RAKE_STOPS)
    for r in rows:
        words = r.phrase.split(" ")
        assert 1 <= len(words) <= RAKE_MAX_PHRASE
        assert r.n_words == len(words)
        assert not (set(words) & stops)
        assert r.score >= r.n_words  # deg/freq >= 1 per member word
        assert r.n_occurrences >= 1
