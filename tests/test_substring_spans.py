"""duplicated_spans (exact-substring span dedup, Lee et al. 2021):
hand-built corpora pinning span boundaries, the min_len filter, the
overlap-by-up-to-k-2 property, and the stats query's interval merge.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from radio_data_pipeline_spark.functions.dedup import duplicated_spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def words(prefix, n, start=0):
    return " ".join(f"{prefix}{i}" for i in range(start, start + n))


def test_shared_passage_boundaries(spark):
    # docs 1 and 2 share an exact 12-word passage at different offsets;
    # everything else is unique -> exactly one span per doc, covering
    # exactly the passage.
    passage = words("shared", 12)
    d1 = words("a", 3) + " " + passage + " " + words("b", 4)
    d2 = words("c", 7) + " " + passage
    out = duplicated_spans(_docs(spark, [(1, d1), (2, d2)]),
                           k=5, min_len=10)
    got = {(r.doc_id, r.span_start, r.span_end, r.span_words)
           for r in out.collect()}
    # doc 1: passage occupies word positions 3..14; doc 2: 7..18
    assert got == {(1, 3, 14, 12), (2, 7, 18, 12)}


def test_min_len_filters_short_spans(spark):
    # a shared 6-word run: with k=5 it is a valid duplicated span of 6
    # words, dropped at min_len=10, kept at min_len=6
    passage = words("p", 6)
    rows = [(1, words("x", 5) + " " + passage),
            (2, passage + " " + words("y", 5))]
    assert duplicated_spans(_docs(spark, rows), k=5, min_len=10).count() == 0
    kept = duplicated_spans(_docs(spark, rows), k=5, min_len=6)
    assert {(r.doc_id, r.span_words) for r in kept.collect()} == \
        {(1, 6), (2, 6)}


def test_within_doc_repetition_counts(spark):
    # duplication WITHIN one document (the same 10 words twice) must
    # count: "occurs >= 2 times in the corpus" includes the same doc.
    passage = words("r", 10)
    d = passage + " " + words("mid", 6) + " " + passage
    out = duplicated_spans(_docs(spark, [(1, d)]), k=5, min_len=10)
    got = {(r.span_start, r.span_end) for r in out.collect()}
    assert got == {(0, 9), (16, 25)}


def test_overlapping_spans_and_interval_merge(spark):
    # gram runs separated by a gap < k produce word-OVERLAPPING maximal
    # spans. doc 1 holds [p0..p9] ++ one unique word ++ [q0..q9]; docs
    # 2/3 duplicate the two halves separately. In doc 1 the dup gram
    # starts are 0..5 and 11..16 (gap of 5 > 0 at k=5 keeps them
    # separate islands), spans [0..9] and [11..20] — disjoint here; the
    # overlap case needs a gap < k between RUNS of the same doc:
    # doc 4: A(8 words) u B(8 words) where A and B are each duplicated
    # elsewhere and u is unique -> gram starts 0..3 and 9..12, spans
    # [0..7] and [9..16]: still disjoint. True overlap: doc 5 =
    # C0..C11 with C0..C7 duplicated in doc 6 and C4..C11 duplicated
    # in doc 7 -> dup gram starts 0..3 and 4..7 are CONTIGUOUS, so the
    # islands merge into one span [0..11] — pinning that chained
    # witnesses merge (the documented fingerprint-granularity
    # semantics).
    C = [f"c{i}" for i in range(12)]
    rows = [(5, " ".join(C)),
            (6, " ".join(C[:8]) + " " + words("zz", 4)),
            (7, words("ww", 4) + " " + " ".join(C[4:]))]
    out = duplicated_spans(_docs(spark, rows), k=5, min_len=10)
    by_doc = {r.doc_id: (r.span_start, r.span_end)
              for r in out.collect() if r.doc_id == 5}
    assert by_doc == {5: (0, 11)}


def test_stats_interval_merge_no_double_count(spark):
    # Force genuinely overlapping qualifying spans in one doc, then
    # check the registered stats query's dup_words equals the UNION of
    # covered positions, not the sum of span lengths. Construction:
    # doc 1 = X(10) g1 g2 g3 Y(10) with X duplicated in doc 2 and
    # [g1 g2 g3 Y] ... needs spans overlapping: doc 1 = W0..W21 where
    # W0..W12 duplicated in doc 2 and W10..W21 duplicated in doc 3:
    # dup gram starts 0..8 and 10..17 -> islands [0..8], [10..17],
    # spans [0..12] and [10..21] overlap on 10..12.
    W = [f"w{i}" for i in range(22)]
    rows = [(1, " ".join(W)),
            (2, " ".join(W[:13]) + " " + words("uu", 3)),
            (3, words("vv", 3) + " " + " ".join(W[10:]))]
    spans = duplicated_spans(_docs(spark, rows), k=5, min_len=10)
    d1 = sorted((r.span_start, r.span_end) for r in
                spans.filter(F.col("doc_id") == 1).collect())
    assert d1 == [(0, 12), (10, 21)]  # overlapping by 3 words
    # union coverage for doc 1 is 22 words, sum of lengths is 25
    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy("span_start")
    prev_max = F.max("span_end").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    merged = (spans.withColumn(
        "_brk", F.when(F.col("span_start")
                       > F.coalesce(prev_max, F.lit(-2)) + 1, 1)
        .otherwise(0))
        .withColumn("_grp", F.sum("_brk").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("doc_id", "_grp")
        .agg((F.max("span_end") - F.min("span_start") + 1).alias("n")))
    cov = {r.doc_id: r.n for r in
           merged.groupBy("doc_id").agg(F.sum("n").alias("n"))
           .withColumnRenamed("sum(n)", "n").collect()}
    assert cov[1] == 22


def test_no_duplication_no_spans(spark):
    rows = [(i, words(f"u{i}_", 30)) for i in range(4)]
    assert duplicated_spans(_docs(spark, rows), k=5, min_len=10).count() == 0


def test_remove_duplicated_spans_excises_union(spark):
    # same overlap corpus as the stats test: doc 1's two qualifying
    # spans [0..12] and [10..21] overlap; removal must excise the
    # UNION (all 22 words), not double-count, and docs 2/3 lose only
    # their own duplicated halves.
    from radio_data_pipeline_spark.functions.dedup import (
        remove_duplicated_spans)

    W = [f"w{i}" for i in range(22)]
    rows = [(1, " ".join(W)),
            (2, " ".join(W[:13]) + " " + words("uu", 3)),
            (3, words("vv", 3) + " " + " ".join(W[10:]))]
    out = {r.doc_id: r for r in
           remove_duplicated_spans(_docs(spark, rows),
                                   k=5, min_len=10).collect()}
    assert (out[1].n_words, out[1].n_kept, out[1].clean_text) == \
        (22, 0, "")
    # doc 2: 16 words, span covers W[0..12] -> keeps its 3 uu-words
    assert (out[2].n_words, out[2].n_kept) == (16, 3)
    assert out[2].clean_text == words("uu", 3)
    # doc 3: 15 words, span covers W[10..21] at offset 3 -> keeps vv
    assert (out[3].n_words, out[3].n_kept) == (15, 3)
    assert out[3].clean_text == words("vv", 3)


def test_remove_spans_passthrough_without_duplication(spark):
    from radio_data_pipeline_spark.functions.dedup import (
        remove_duplicated_spans)

    rows = [(i, words(f"u{i}_", 12)) for i in range(3)]
    out = remove_duplicated_spans(_docs(spark, rows), k=5, min_len=10)
    for r in out.collect():
        assert r.n_kept == r.n_words == 12
        assert r.clean_text == words(f"u{r.doc_id}_", 12)
