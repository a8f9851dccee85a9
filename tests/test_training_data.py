"""Unit tests for the wave-3 training-data operators beyond the
registry parity sweep (which checks oracle agreement): semantic
properties on hand-built corpora where the expected answer is known
by construction.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from radio_data_pipeline_spark.functions.dedup import containment_pairs

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- containment

@pytest.fixture(scope="module")
def quote_docs(spark):
    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"filler{i}" for i in range(40))
    other = " ".join(f"noise{i}" for i in range(10))
    return spark.createDataFrame(
        [(1, short), (2, long), (3, other)], "doc_id int, text string")


def test_containment_detects_subsumption(spark, quote_docs):
    # doc 1 is wholly quoted inside doc 2: containment(1 in 2) == 1.0
    # even though Jaccard is low (union dominated by doc 2's filler).
    out = {(r.id_a, r.id_b): r
           for r in containment_pairs(quote_docs, k=3,
                                      threshold=0.5).collect()}
    assert (1, 2) in out
    pair = out[(1, 2)]
    assert pair.cont_a == 1.0          # all of doc 1's shingles in doc 2
    assert pair.cont_b < 0.2           # doc 2 is mostly not doc 1
    # the unrelated doc shares nothing
    assert (1, 3) not in out and (2, 3) not in out


def test_containment_threshold_filters(spark, quote_docs):
    # threshold above 1.0 keeps nothing
    assert containment_pairs(quote_docs, k=3, threshold=1.01).count() == 0


# -------------------------------------------------------------------- bloom

def test_bloom_flags_superset_of_exact(spark):
    # Bloom membership can false-positive but never false-negative:
    # every exactly-contaminated doc must be flagged.
    from radio_data_pipeline_spark.plans.training_data import (
        bloom_decontam_stats,
    )
    rows = bloom_decontam_stats(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_flagged >= r.n_exact
        assert r.n_false_pos == r.n_flagged - r.n_exact
        assert r.n_docs >= r.n_flagged


def test_bloom_deterministic(spark):
    from radio_data_pipeline_spark.plans.training_data import (
        bloom_decontam_stats,
    )
    a = [tuple(r) for r in bloom_decontam_stats(spark, SF).collect()]
    b = [tuple(r) for r in bloom_decontam_stats(spark, SF).collect()]
    assert a == b


# ---------------------------------------------------------------------- CDC

def test_merge_upsert_op_partition(spark):
    # Every key is exactly one of insert/update/keep, and the final
    # timestamp respects the op: inserts/updates carry change-side
    # timestamps (>= cutoff), keeps carry base-side ones (< cutoff).
    from radio_data_pipeline_spark.plans.training_data import (
        _CUTOFF_US,
        merge_upsert_events,
    )
    rows = merge_upsert_events(spark, SF).collect()
    assert len(rows) > 0
    ops = {r.op for r in rows}
    assert ops <= {"insert", "update", "keep"}
    for r in rows:
        if r.op == "keep":
            assert r.final_ts_us < _CUTOFF_US
        else:
            assert r.final_ts_us >= _CUTOFF_US
    # keys unique
    keys = [(r.user_id, r.event_type) for r in rows]
    assert len(keys) == len(set(keys))


# ------------------------------------------------------------------ coverage

def test_duplicate_coverage_bounds(spark):
    from radio_data_pipeline_spark.plans.training_data import (
        duplicate_ngram_coverage,
    )
    rows = duplicate_ngram_coverage(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.n_dup_grams <= r.n_grams
        assert 0.0 <= r.dup_coverage <= 1.0


def test_duplicate_coverage_exact_copies(spark, tmp_path):
    # two identical docs + one unique: the copies have coverage 1.0,
    # the unique doc 0.0.
    text_dup = " ".join(f"w{i}" for i in range(10))
    text_uniq = " ".join(f"u{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, text_dup), (2, text_dup), (3, text_uniq)],
        "doc_id long, text string")
    d = str(tmp_path / "docs")
    docs.write.parquet(d + "/documents.parquet")
    from radio_data_pipeline_spark.plans.training_data import (
        duplicate_ngram_coverage,
    )
    out = {r.doc_id: r.dup_coverage
           for r in duplicate_ngram_coverage(spark, d).collect()}
    assert out[1] == 1.0 and out[2] == 1.0 and out[3] == 0.0


# ------------------------------------------------------------ wave 4: sketch

def test_countmin_never_underestimates(spark):
    from radio_data_pipeline_spark.plans.analytics_extra import (
        countmin_heavy_hitters,
    )
    rows = countmin_heavy_hitters(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.est_n >= r.exact_n
        assert r.overestimate == r.est_n - r.exact_n


def test_asof_tolerance_subset_of_asof(spark):
    # tolerance-bounded matches are a subset of the unbounded as-of
    # matches, and every gap respects the bound.
    from radio_data_pipeline_spark.plans.analytics_extra import (
        _ASOF_TOL_US,
        events_asof_tolerance,
    )
    from radio_data_pipeline_spark.plans.relational import (
        events_asof_prior_view,
    )
    tol = {(r.event_id, r.prior_view_event): r.gap_us
           for r in events_asof_tolerance(spark, SF).collect()}
    allm = {(r.event_id, r.prior_view_event)
            for r in events_asof_prior_view(spark, SF).collect()}
    assert set(tol) <= allm
    assert all(0 <= g <= _ASOF_TOL_US for g in tol.values())


def test_top_singular_dim_unit_norm(spark):
    import math
    from radio_data_pipeline_spark.plans.analytics_extra import (
        embedding_top_singular_dim,
    )
    rows = embedding_top_singular_dim(spark, SF).collect()
    assert len(rows) == 64
    assert abs(math.sqrt(sum(r.component ** 2 for r in rows)) - 1.0) < 1e-4


def test_mmr_prefers_diversity(spark):
    # MMR's second pick must score >= any candidate under the same
    # criterion, and the three picks are distinct.
    from radio_data_pipeline_spark.plans.analytics_extra import (
        mmr_diversified_topk,
    )
    rows = mmr_diversified_topk(spark, SF).collect()
    assert [r.rank for r in rows] == [1, 2, 3]
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == 3
    # rank-1 is the pure-relevance argmax: its relevance bounds the rest
    assert rows[0].relevance >= rows[1].relevance - 1e-9
    # mmr score = rel - 0.5 * sim with sim in [-1, 1]: bounded both ways
    for r in rows[1:]:
        assert r.relevance - 0.5 - 1e-9 <= r.mmr_score <= r.relevance + 0.5 + 1e-9
