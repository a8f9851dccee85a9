"""Corpus-quality signals for LLM training-data curation (driver
extension family, alongside plans/llm.py): within-document repetition
metrics (the Gopher quality-filter family), corpus-level repeated
n-grams (the C4 "remove spans seen elsewhere" signal), and
sketch-based distinct counting (HyperLogLog — the 100 TB cardinality
operator).

Scale design notes:
- Repetition signals are computed by exploding (doc_id, n, gram) rows
  and aggregating — never by per-row O(len^2) array scans. The explode
  output is linear in corpus token count; both aggregations are keyed
  by doc_id(+gram) so hot keys are bounded by document length, not
  corpus size.
- Corpus n-grams shuffle once on the gram; frequency skew (stopword
  runs) is bounded because the aggregate is a partial-agg count, not a
  list collect.
- `approx_count_distinct` (HLL++) is the scale path for cardinality:
  fixed-size sketch per group, mergeable map-side, no distinct-expand
  shuffle. The exact `countDistinct` alongside exists ONLY to assert
  the sketch's error bound in the oracle check; a 100 TB deployment
  drops it.

Gram construction mirrors functions/dedup.py `minhash_signature_table`
(reference utils.py tokenization analogue): posexplode + lead windows,
measured ~an order of magnitude cheaper than per-element array
slice/join expressions, with the window's doc_id hash-partitioning
reused by the first aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from radio_data_pipeline_spark.functions.dedup import gram_array
from radio_data_pipeline_spark.functions.text import (
    WHITESPACE_WORDS_SQL,
    whitespace_words,
)
from radio_data_pipeline_spark.operators.ordering import bounded_sort
from radio_data_pipeline_spark.plans.registry import register
from radio_data_pipeline_spark.sources.parquet import (
    load_table,
    load_table_fanned,
)

_WORDS_CTE = (
    f"SELECT doc_id, {WHITESPACE_WORDS_SQL} AS words FROM documents"
)


def _grams_sql(k: int) -> str:
    """DuckDB k-gram list over `words` (1-based inclusive slices),
    matching plans/llm.py _SHINGLES_SQL construction."""
    if k == 1:
        return "words"
    return (f"list_transform(range(1, greatest(len(words) - {k - 1}, 0) + 1),"
            f" i -> array_to_string(words[i:i+{k - 1}], ' '))")


def _word_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: the downstream work is window + hash aggregation over
    # every token — CPU far above the bytes read; a single-row-group
    # file must not serialize it (no-op at real scale, see parquet.py)
    docs = load_table_fanned(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.posexplode(whitespace_words(F.col("text"))).alias("pos", "w"))


def _gram_rows(spark: SparkSession, sf_dir: str, k: int,
               distinct_within_doc: bool = False) -> DataFrame:
    """(doc_id, gram) rows of k-word grams built map-side (gram_array
    zip_with + explode) — no token explode, no lead() window, no
    doc-keyed shuffle. With ``distinct_within_doc`` the per-document
    dedup happens map-side too (array_distinct on the gram array
    before the explode), replacing what used to be a corpus-wide
    dropDuplicates shuffle; (doc_id, gram) output sets are identical
    because grams are deduped within the single row that owns them."""
    docs = load_table_fanned(spark, sf_dir, "documents")
    arr = gram_array(F.col("text"), k)
    if distinct_within_doc:
        arr = F.array_distinct(arr)
    return (docs.select("doc_id", F.explode(arr).alias("gram"))
            .where(F.col("gram").isNotNull()))


def _tagged_grams(k: int) -> F.Column:
    """Map-side k-word gram array over `text`, each element tagged
    with its gram order as struct(n, gram); trailing positions with
    < k-1 successors are NULL grams (filtered by consumers) — the
    same incomplete-gram semantics as the oracle's range() bound.
    Round-11 optimization: replaces a lead()-window builder that
    shuffled and sorted every token row by doc id before the gram
    aggregation's own shuffle."""
    return F.transform(
        gram_array(F.col("text"), k),
        lambda g: F.struct(F.lit(k).alias("n"), g.alias("gram")))


@register(
    "repetition_signals",
    oracle=f"""
    WITH w AS ({_WORDS_CTE}),
    g AS (
      SELECT doc_id, 1 AS n, unnest({_grams_sql(1)}) AS gram FROM w
      UNION ALL
      SELECT doc_id, 2 AS n, unnest({_grams_sql(2)}) AS gram FROM w
      UNION ALL
      SELECT doc_id, 3 AS n, unnest({_grams_sql(3)}) AS gram FROM w
    ),
    g1 AS (SELECT doc_id, n, gram, count(*) AS c
           FROM g GROUP BY doc_id, n, gram),
    g2 AS (SELECT doc_id, n, sum(c) AS total, count(*) AS n_distinct,
                  max(c) AS top,
                  sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
           FROM g1 GROUP BY doc_id, n)
    SELECT doc_id,
           CAST(sum(CASE WHEN n = 1 THEN total END) AS BIGINT) AS n_words,
           round(CAST(sum(CASE WHEN n = 1 THEN n_distinct END) AS DOUBLE)
                 / sum(CASE WHEN n = 1 THEN total END), 6)
               AS distinct_word_ratio,
           round(coalesce(CAST(sum(CASE WHEN n = 2 THEN top END) AS DOUBLE)
                 / sum(CASE WHEN n = 2 THEN total END), 0), 6)
               AS top_bigram_frac,
           round(coalesce(CAST(sum(CASE WHEN n = 3 THEN dup END) AS DOUBLE)
                 / sum(CASE WHEN n = 3 THEN total END), 0), 6)
               AS dup_trigram_frac
    FROM g2 GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Gopher-style within-document repetition signals: distinct-word "
        "ratio, most-frequent-bigram mass fraction, duplicated-trigram "
        "mass fraction. Explode-and-aggregate (linear, partial-agg "
        "combinable) — never per-row quadratic array scans.",
    tags=("text", "quality", "repetition"),
)
def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table_fanned(spark, sf_dir, "documents")
    grams = (
        docs.select(
            "doc_id",
            F.explode(F.concat(_tagged_grams(1), _tagged_grams(2),
                               _tagged_grams(3))).alias("s"))
        .select("doc_id", F.col("s.n").alias("n"),
                F.col("s.gram").alias("gram"))
        .where(F.col("gram").isNotNull())
    )
    g1 = grams.groupBy("doc_id", "n", "gram").agg(F.count(F.lit(1)).alias("c"))
    g2 = g1.groupBy("doc_id", "n").agg(
        F.sum("c").alias("total"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup"))

    def pick(n: int, col: str) -> F.Column:
        return F.sum(F.when(F.col("n") == n, F.col(col)))

    return (
        g2.groupBy("doc_id").agg(
            pick(1, "total").cast("bigint").alias("n_words"),
            F.round(pick(1, "n_distinct").cast("double")
                    / pick(1, "total"), 6).alias("distinct_word_ratio"),
            F.round(F.coalesce(pick(2, "top").cast("double")
                               / pick(2, "total"), F.lit(0.0)), 6)
             .alias("top_bigram_frac"),
            F.round(F.coalesce(pick(3, "dup").cast("double")
                               / pick(3, "total"), F.lit(0.0)), 6)
             .alias("dup_trigram_frac"),
        )
        .orderBy("doc_id")
    )


_REPEAT_K = 5
_REPEAT_TOPN = 20


@register(
    "corpus_repeated_5grams",
    oracle=f"""
    WITH w AS ({_WORDS_CTE}),
    g AS (SELECT doc_id, unnest({_grams_sql(_REPEAT_K)}) AS gram FROM w)
    SELECT gram,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occurrences
    FROM g
    GROUP BY gram
    HAVING count(DISTINCT doc_id) >= 2
    ORDER BY n_docs DESC, n_occurrences DESC, gram
    LIMIT {_REPEAT_TOPN}
    """,
    doc="C4-style cross-document repeated spans: top word-5-grams by "
        "number of documents containing them (>= 2 docs). One shuffle "
        "keyed by the gram with map-side partial aggregation; top-k via "
        "TakeOrderedAndProject, no global sort.",
    tags=("text", "quality", "dedup"),
)
def corpus_repeated_5grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    grams = _gram_rows(spark, sf_dir, _REPEAT_K)
    return (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("n_docs"),
             F.count(F.lit(1)).alias("n_occurrences"))
        .where(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), F.asc("gram"))
        .limit(_REPEAT_TOPN)
    )


@register(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS approx_within_5pct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="HyperLogLog++ distinct-user cardinality per event type "
        "(rsd=0.01), asserted within 5% of exact. The sketch is the "
        "100 TB path: fixed-size state, map-side mergeable, no "
        "distinct-expand shuffle; the exact count exists only to "
        "check the bound (HLL++ is deterministic for fixed data, so "
        "the assertion is a stable oracle value, not flaky).",
    tags=("sketch", "approx"),
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"),
             F.approx_count_distinct("user_id", rsd=0.01).alias("approx"))
        .select(
            "event_type",
            F.col("exact_users").cast("bigint").alias("exact_users"),
            (F.abs(F.col("approx") - F.col("exact_users"))
             <= 0.05 * F.col("exact_users")).alias("approx_within_5pct"))
        .transform(bounded_sort, "event_type")
    )


@register(
    "doc_token_entropy",
    oracle=f"""
    WITH w AS ({_WORDS_CTE}),
    t AS (SELECT doc_id, unnest(words) AS word FROM w),
    c AS (SELECT doc_id, word, count(*) AS c
          FROM t GROUP BY doc_id, word)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy
    FROM c
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="Shannon entropy of each document's token distribution "
        "(nats): H = ln(n) - sum(c ln c)/n over per-word counts — "
        "the lexical-diversity quality signal that separates "
        "natural text (high entropy) from boilerplate and keyword "
        "spam (low), complementing repetition_signals' top-heaviness "
        "ratios. Two aggregations: (doc_id, word) counts then the "
        "per-doc reduction — the second rides the doc_id component "
        "of the first's partitioning, and both partial-aggregate "
        "map-side. ln() is bit-identical libm on both engines.",
    tags=("text", "quality", "entropy"),
)
def doc_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Map-side run-length entropy (r12, guide §2.4 — the §C1-C3
    # rewrite class): per-word counts of a document are the run
    # lengths of its SORTED word array, so H computes inside the row
    # that owns the text — no token explode, no (doc_id, word)
    # shuffle of the whole token stream, no second doc_id aggregation
    # (the old shape shuffled every token and paid 2 driver jobs,
    # 4-5 stages each). Identical values: the multiset of run lengths
    # IS the per-(doc, word) count multiset, and sum(c·ln c) over it
    # is order-independent through the 6-decimal round (oracle-
    # verified at 3 SFs). Skew profile: per-doc O(n log n) sort —
    # bounded by document length, the same per-row envelope as the
    # map-side MinHash/SimHash kernels. The doc_id range fan makes
    # the trailing orderBy local (sampling reads only the scan).
    docs = load_table_fanned(spark, sf_dir, "documents",
                             range_cols=("doc_id",))
    t = docs.select(
        "doc_id",
        F.sort_array(whitespace_words(F.col("text"))).alias("s"))
    s = F.col("s")
    n = F.size(s)
    # run ends: position i (1-based) is an end iff it is the last
    # element or differs from its successor (zip_with NULL-pads the
    # one-shorter shifted copy, marking the final position)
    flags = F.zip_with(s, F.slice(s, 2, F.greatest(n - 1, F.lit(0))),
                       lambda a, b: b.isNull() | (a != b))
    ends = F.filter(
        F.transform(flags, lambda x, i: F.when(x, i + F.lit(1))),
        lambda e: e.isNotNull())
    prev = F.concat(F.array(F.lit(0)),
                    F.slice(ends, 1, F.size(ends) - 1))
    counts = F.zip_with(ends, prev, lambda e, p: e - p)
    nd = n.cast("double")
    plogp = F.aggregate(
        counts, F.lit(0.0),
        lambda acc, c: acc + c.cast("double") * F.log(c.cast("double")))
    return (
        t.select("doc_id",
                 n.cast("bigint").alias("n_tokens"),
                 F.round(F.log(nd) - plogp / nd, 6).alias("entropy"))
        .orderBy("doc_id")
    )


@register(
    "events_constraint_report",
    oracle="""
    WITH m AS (
      SELECT
        avg(CASE WHEN event_id IS NOT NULL THEN 1.0 ELSE 0.0 END)
          AS m_notnull,
        CAST(count(DISTINCT event_id) AS DOUBLE) / count(*) AS m_unique,
        coalesce(avg(CASE WHEN value IS NOT NULL THEN
          CASE WHEN value >= 0 AND value <= 1000000 THEN 1.0
               ELSE 0.0 END END), 1.0) AS m_range,
        coalesce(avg(CASE WHEN event_type IS NOT NULL THEN
          CASE WHEN event_type IN ('click','view','purchase',
                                   'scroll','signup')
               THEN 1.0 ELSE 0.0 END END), 1.0) AS m_set,
        least(CAST(count(*) AS DOUBLE) / 100.0, 1.0) AS m_rows
      FROM events
    )
    SELECT rule, round(metric, 6) AS metric, threshold,
           -- pass/fail on the UNROUNDED metric, exactly like the
           -- engine (rounding-first would bless sub-5e-7 violations);
           -- coalesce mirrors the engine's NULL-metric-fails rule
           coalesce(metric >= threshold, FALSE) AS passed
    FROM (
      SELECT 'not_null(event_id)' AS rule, m_notnull AS metric,
             1.0 AS threshold FROM m
      UNION ALL SELECT 'unique(event_id)', m_unique, 1.0 FROM m
      UNION ALL SELECT 'in_range(value,0.0,1000000.0)', m_range,
             0.95 FROM m
      UNION ALL SELECT 'in_set(event_type,[''click'', ''view'', ''purchase'', ''scroll'', ''signup''])', m_set, 1.0 FROM m
      UNION ALL SELECT 'min_rows(100)', m_rows, 1.0 FROM m
    )
    ORDER BY rule
    """,
    doc="Declarative data-quality gate (functions/constraints.py — "
        "the Deequ/Great-Expectations role, generalizing the "
        "reference's per-column physicality checks validate.py:"
        "104-127 into a reusable rule engine): five rules — "
        "completeness, uniqueness, range, domain membership, volume "
        "floor — ALL compiled into ONE aggregation pass over the "
        "scan, so a 50-rule suite on a 100 TB ingest costs one "
        "count()-shaped job (the distinct rule plans through the "
        "same Aggregate via expand). The report rows are assembled "
        "executor-side from the single aggregate row (inline array "
        "-> explode); the driver never touches data. Oracle computes "
        "the identical five metrics in one SQL aggregate.",
    tags=("quality", "validation", "constraints", "agg"),
)
def events_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from radio_data_pipeline_spark.functions.constraints import (
        evaluate_constraints,
        in_range,
        in_set,
        min_rows,
        not_null,
        unique,
    )
    ev = load_table(spark, sf_dir, "events")
    report = evaluate_constraints(ev, [
        not_null("event_id"),
        unique("event_id"),
        in_range("value", 0.0, 1000000.0, threshold=0.95),
        in_set("event_type",
               ["click", "view", "purchase", "scroll", "signup"]),
        min_rows(100),
    ])
    return report.transform(bounded_sort, "rule")


@register(
    "events_column_profile",
    oracle="""
    WITH m AS (
      SELECT
        round(avg(CASE WHEN user_id IS NOT NULL THEN 1.0 ELSE 0.0 END),
              6) AS n0,
        count(DISTINCT user_id) AS d0,
        CAST(min(user_id) AS VARCHAR) AS lo0,
        CAST(max(user_id) AS VARCHAR) AS hi0,
        round(avg(CASE WHEN event_type IS NOT NULL THEN 1.0
                       ELSE 0.0 END), 6) AS n1,
        count(DISTINCT event_type) AS d1,
        CAST(min(event_type) AS VARCHAR) AS lo1,
        CAST(max(event_type) AS VARCHAR) AS hi1,
        round(avg(CASE WHEN value IS NOT NULL THEN 1.0 ELSE 0.0 END),
              6) AS n2,
        count(DISTINCT value) AS d2,
        CAST(min(value) AS VARCHAR) AS lo2,
        CAST(max(value) AS VARCHAR) AS hi2
      FROM events
    )
    SELECT * FROM (
      SELECT 'user_id' AS "column", n0 AS non_null_frac,
             CAST(d0 AS BIGINT) AS n_distinct, lo0 AS min_str,
             hi0 AS max_str FROM m
      UNION ALL SELECT 'event_type', n1, CAST(d1 AS BIGINT), lo1, hi1
        FROM m
      UNION ALL SELECT 'value', n2, CAST(d2 AS BIGINT), lo2, hi2
        FROM m
    )
    ORDER BY "column"
    """,
    doc="One-pass column profiler (functions/constraints.py "
        "profile_columns — the summarize/describe diagnostic): null "
        "fraction, exact cardinality, and bounds for three events "
        "columns, ALL in one Aggregate over one scan (the multiple "
        "distinct aggregates plan through Spark's expand; at 100 TB "
        "the same shape runs with approx_count_distinct sketches). "
        "The report assembles executor-side (array -> explode) from "
        "the single aggregate row. Floats stringify differently per "
        "engine (Spark 81.42 vs DuckDB '81.42'), so min/max compare "
        "via CAST AS VARCHAR on both sides — numeric values chosen "
        "from columns whose parquet doubles round-trip identically.",
    tags=("quality", "diagnostics", "profile", "agg"),
)
def events_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from radio_data_pipeline_spark.functions.constraints import (
        profile_columns,
    )
    ev = load_table(spark, sf_dir, "events")
    return profile_columns(
        ev, ["user_id", "event_type", "value"]).transform(
            bounded_sort, "column")


_SPAN_K = 5
_SPAN_MIN_LEN = 10

_SPANS_CTE = f"""
    g AS (SELECT doc_id, i - 1 AS pos,
                 array_to_string(words[i:i+{_SPAN_K - 1}], ' ') AS gram
          FROM w, UNNEST(range(1, greatest(len(words) - {_SPAN_K - 1}, 0)
                               + 1)) AS t(i)),
    c AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
    d AS (SELECT g.doc_id, g.pos FROM g JOIN c USING (gram)),
    isl AS (SELECT doc_id, pos,
                   pos - row_number() OVER (PARTITION BY doc_id
                                            ORDER BY pos) AS grp
            FROM d),
    s AS (SELECT doc_id, min(pos) AS a, max(pos) + {_SPAN_K - 1} AS b
          FROM isl GROUP BY doc_id, grp),
    q AS (SELECT doc_id, a, b FROM s
          WHERE b - a + 1 >= {_SPAN_MIN_LEN})
"""


@register(
    "exact_substring_spans",
    oracle=f"""
    WITH w AS ({_WORDS_CTE}),
    {_SPANS_CTE}
    SELECT doc_id,
           CAST(a AS BIGINT) AS span_start,
           CAST(b AS BIGINT) AS span_end,
           CAST(b - a + 1 AS BIGINT) AS span_words
    FROM q
    ORDER BY doc_id, span_start
    """,
    doc="Exact-substring duplicate spans (Lee et al. 2021, "
        "arXiv:2107.06499): per document, the maximal word ranges whose "
        "every 5-gram occurs >= 2 times in the corpus, kept at >= "
        f"{_SPAN_MIN_LEN} words — the span-level dedup the doc-level "
        "family (minhash/simhash/semdedup) cannot express: boilerplate "
        "passages inside otherwise-unique documents. Gram runs stand in "
        "for the paper's suffix arrays (a duplicated substring's k-gram "
        "starts are all duplicated; maximal runs = maximal spans at "
        "fingerprint granularity). One corpus-wide gram-keyed count "
        "shuffle with map-side partials, a count-filtered join back "
        "reusing the gram partitioning (hot stopword grams cost their "
        "occurrence count, never a pair blowup), then doc-keyed "
        "gaps-and-islands windows bounded by document length.",
    tags=("text", "dedup", "span", "islands"),
)
def exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from radio_data_pipeline_spark.functions.dedup import duplicated_spans

    docs = load_table_fanned(spark, sf_dir, "documents")
    return (duplicated_spans(docs, k=_SPAN_K, min_len=_SPAN_MIN_LEN)
            .orderBy("doc_id", "span_start"))


@register(
    "substring_dedup_stats",
    oracle=f"""
    WITH w AS ({_WORDS_CTE}),
    {_SPANS_CTE},
    m AS (SELECT doc_id, a, b,
                 CASE WHEN a > coalesce(max(b) OVER (
                          PARTITION BY doc_id ORDER BY a
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), -2) + 1
                      THEN 1 ELSE 0 END AS brk
          FROM q),
    mg AS (SELECT doc_id, a, b,
                  sum(brk) OVER (PARTITION BY doc_id ORDER BY a
                                 ROWS UNBOUNDED PRECEDING) AS grp
           FROM m),
    cov AS (SELECT doc_id, grp, min(a) AS ca, max(b) AS cb
            FROM mg GROUP BY doc_id, grp),
    per AS (SELECT doc_id,
                   CAST(sum(cb - ca + 1) AS BIGINT) AS dup_words
            FROM cov GROUP BY doc_id),
    ns AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans
           FROM q GROUP BY doc_id),
    nw AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS n_words FROM w)
    SELECT doc_id, n_words, n_spans, dup_words,
           round(CAST(dup_words AS DOUBLE) / n_words, 6) AS dup_frac
    FROM per JOIN ns USING (doc_id) JOIN nw USING (doc_id)
    ORDER BY doc_id
    """,
    doc="Per-document exact-substring duplication coverage: the span "
        "family's verdict signal (docs whose content mostly exists "
        "elsewhere get dropped; the rest get spans removed). Spans from "
        "the same gram-run builder as exact_substring_spans, then "
        "UNIONED per doc before counting — maximal spans can overlap by "
        "up to k-2 words (gram runs separated by a gap < k), so "
        "coverage is an interval merge (running-max window: a span "
        "starting past the farthest end so far opens a new covered "
        "interval), not a sum of lengths. All windows are doc-keyed "
        "(bounded by doc length); the merge input is spans, thousands "
        "of times smaller than tokens.",
    tags=("text", "dedup", "span", "quality"),
)
def substring_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from radio_data_pipeline_spark.functions.dedup import duplicated_spans

    docs = load_table_fanned(spark, sf_dir, "documents")
    spans = duplicated_spans(docs, k=_SPAN_K, min_len=_SPAN_MIN_LEN)
    w = Window.partitionBy("doc_id").orderBy("span_start")
    prev_max_end = F.max("span_end").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    merged = (spans
              .withColumn("_brk",
                          F.when(F.col("span_start")
                                 > F.coalesce(prev_max_end, F.lit(-2)) + 1,
                                 1).otherwise(0))
              .withColumn("_grp", F.sum("_brk").over(
                  w.rowsBetween(Window.unboundedPreceding, 0))))
    cov = (merged.groupBy("doc_id", "_grp")
           .agg(F.min("span_start").alias("ca"),
                F.max("span_end").alias("cb")))
    per = (cov.groupBy("doc_id")
           .agg(F.sum(F.col("cb") - F.col("ca") + 1)
                .cast("long").alias("dup_words")))
    ns = (spans.groupBy("doc_id")
          .agg(F.count(F.lit(1)).cast("long").alias("n_spans")))
    nw = docs.select(
        "doc_id",
        F.size(whitespace_words(F.col("text"))).cast("long")
        .alias("n_words"))
    return (per.join(ns, "doc_id").join(nw, "doc_id")
            .select("doc_id", "n_words", "n_spans", "dup_words",
                    F.round(F.col("dup_words").cast("double")
                            / F.col("n_words"), 6).alias("dup_frac"))
            .orderBy("doc_id"))


@register(
    "substring_dedup_cleaned",
    oracle=f"""
    WITH w AS ({_WORDS_CTE}),
    {_SPANS_CTE},
    m AS (SELECT doc_id, a, b,
                 CASE WHEN a > coalesce(max(b) OVER (
                          PARTITION BY doc_id ORDER BY a
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), -2) + 1
                      THEN 1 ELSE 0 END AS brk
          FROM q),
    mg AS (SELECT doc_id, a, b,
                  sum(brk) OVER (PARTITION BY doc_id ORDER BY a
                                 ROWS UNBOUNDED PRECEDING) AS grp
           FROM m),
    cov AS (SELECT doc_id, grp, min(a) AS ca, max(b) AS cb
            FROM mg GROUP BY doc_id, grp),
    r AS (SELECT doc_id, unnest(words) AS wd,
                 generate_subscripts(words, 1) - 1 AS pos
          FROM w),
    keepw AS (SELECT r.doc_id, r.pos, r.wd FROM r
              WHERE NOT EXISTS (
                SELECT 1 FROM cov
                WHERE cov.doc_id = r.doc_id
                  AND r.pos BETWEEN cov.ca AND cov.cb)),
    ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                  string_agg(wd, ' ' ORDER BY pos) AS ct
           FROM keepw GROUP BY doc_id),
    nw AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS n_words FROM w)
    SELECT doc_id, n_words,
           coalesce(n_kept, 0) AS n_kept,
           md5(coalesce(ct, '')) AS clean_fp
    FROM nw LEFT JOIN ag USING (doc_id)
    ORDER BY doc_id
    """,
    doc="The transform half of the span family: every document with "
        "its duplicated spans EXCISED (what Lee et al. 2021 do to the "
        "training corpus — drop the substrings, keep the documents), "
        "reported as kept-token counts plus an md5 fingerprint of the "
        "cleaned token stream so the oracle pins exact content "
        "compactly. Overlapping spans interval-merge first, so the "
        "word-classification range join matches each token at most "
        "once (bounded by |tokens|, never |tokens| x |spans|); the "
        "final per-doc collect is doc-keyed, bounded by document "
        "length.",
    tags=("text", "dedup", "span", "range-join"),
)
def substring_dedup_cleaned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from radio_data_pipeline_spark.functions.dedup import (
        remove_duplicated_spans)

    docs = load_table_fanned(spark, sf_dir, "documents")
    return (remove_duplicated_spans(docs, k=_SPAN_K,
                                    min_len=_SPAN_MIN_LEN)
            .select("doc_id", "n_words", "n_kept",
                    F.md5("clean_text").alias("clean_fp"))
            .orderBy("doc_id"))
