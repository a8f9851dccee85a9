"""Corpus-curation operators for LLM training-data construction
(driver extension family, alongside plans/llm.py and plans/quality.py):
benchmark decontamination, context-window sequence packing, and the
quality-filter funnel.

These are the three pipeline stages between "raw crawl" and "training
shards" that the llm.py/quality.py families don't already cover:

- **Decontamination**: remove/flag training documents that share long
  n-grams with an evaluation benchmark (the GPT-3/PaLM 13-gram rule;
  k=5 here because the synthetic corpus' documents are short). Scale
  shape: the benchmark side is tiny relative to the corpus, so its
  distinct-gram set is BROADCAST and the corpus-side gram stream never
  shuffles on the gram key — the whole check is a map-side hash probe
  plus one doc_id-keyed aggregation (a partitioning the gram window
  already established).
- **Sequence packing**: assign documents to fixed-capacity context
  windows (concat-and-chunk, the standard pretraining packing). Global
  greedy packing is inherently sequential, so it is done PER SHARD —
  any deterministic shard-local order is as good for training as a
  global one, and each shard's running sum is an independent window,
  so 1000 executors pack 1000 shards concurrently. A document whose
  tokens straddle a capacity boundary belongs to the bin where it
  starts (its tail spills into the next chunk at tokenization time).
- **Filter funnel**: every document is labeled with the FIRST quality
  rule it fails (Gopher-style rule ordering), then counted per
  (lang, reason) — the attrition report every curation run publishes.
  Pure column expressions over the token array; no shuffle beyond the
  final tiny aggregation.

The reference pipeline has no text surface; these generalize its
filter -> reduce -> save staging (SURVEY §2.8 driver extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from radio_data_pipeline_spark.functions.text import BPE_RE, WORD_RE
from radio_data_pipeline_spark.plans.quality import (
    _grams_sql,
    _gram_rows,
    _WORDS_CTE,
)
from radio_data_pipeline_spark.sources.layout import md5_prefix_long
from radio_data_pipeline_spark.operators.ordering import bounded_sort
from radio_data_pipeline_spark.plans.registry import register
from radio_data_pipeline_spark.sources.parquet import load_table

_DECONTAM_K = 5          # gram length; production uses 13, docs here are short
_BENCH_MOD = 97          # doc_id % 97 == 0 -> the held-out "benchmark" subset


@register(
    "benchmark_decontam",
    oracle=f"""
    WITH w AS ({_WORDS_CTE}),
    g AS (SELECT DISTINCT doc_id, unnest({_grams_sql(_DECONTAM_K)}) AS gram
          FROM w),
    b AS (SELECT DISTINCT gram FROM g WHERE doc_id % {_BENCH_MOD} = 0),
    t AS (SELECT doc_id, gram FROM g WHERE doc_id % {_BENCH_MOD} <> 0)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(b.gram) AS BIGINT) AS n_overlap,
           round(count(b.gram) * 1.0 / count(*), 6) AS overlap_frac
    FROM t LEFT JOIN b ON t.gram = b.gram
    GROUP BY t.doc_id
    HAVING count(b.gram) >= 1
    ORDER BY doc_id
    """,
    doc="Benchmark decontamination: training documents sharing any "
        "word-5-gram with the held-out benchmark subset "
        "(doc_id % 97 == 0), with the contaminated-gram fraction. The "
        "benchmark gram set is broadcast (tiny vs the corpus); the "
        "corpus side's per-doc distinct grams are built map-side "
        "(array_distinct on the gram array) and probed map-side — no "
        "gram-keyed shuffle of the big side; the only big-side "
        "exchange is the final per-doc count aggregation.",
    tags=("text", "decontamination", "dedup"),
)
def benchmark_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-doc distinct grams built fully map-side (round-11: was a
    # lead-window + corpus-wide dropDuplicates shuffle)
    grams = _gram_rows(spark, sf_dir, _DECONTAM_K,
                       distinct_within_doc=True)
    bench = (grams.where(F.col("doc_id") % _BENCH_MOD == 0)
             .select(F.col("gram").alias("bgram")).distinct())
    train = grams.where(F.col("doc_id") % _BENCH_MOD != 0)
    return (
        train.join(F.broadcast(bench), train["gram"] == bench["bgram"], "left")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"),
             F.count("bgram").alias("n_overlap"))
        .where(F.col("n_overlap") >= 1)
        .select("doc_id", "n_grams", "n_overlap",
                F.round(F.col("n_overlap") / F.col("n_grams"), 6)
                 .alias("overlap_frac"))
        .orderBy("doc_id")
    )


_PACK_CAPACITY = 2048    # tokens per context window
_PACK_SHARDS = 8


@register(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, doc_id % {_PACK_SHARDS} AS shard,
             len(regexp_extract_all(coalesce(text, ''), '{BPE_RE}'))
               AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT shard, doc_id, n_tokens,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM t
    )
    SELECT shard,
           CAST(floor(cum_before / {_PACK_CAPACITY}) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM c
    GROUP BY shard, bin
    ORDER BY shard, bin
    """,
    doc="Context-window sequence packing (concat-and-chunk): documents "
        "are concatenated in deterministic shard-local order and a "
        "document starts in bin floor(tokens_before / 2048). Sharded "
        "because greedy packing is order-sequential: each shard's "
        "running sum is an independent window partition, so the packing "
        "of a 100 TB corpus parallelizes across shards with one "
        "shard-keyed shuffle and no global sort.",
    tags=("text", "packing"),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
        F.size(F.regexp_extract_all(
            F.coalesce(F.col("text"), F.lit("")), F.lit(BPE_RE), 0))
         .alias("n_tokens"))
    win = (Window.partitionBy("shard").orderBy("doc_id")
           .rowsBetween(Window.unboundedPreceding, -1))
    # one range exchange serves the shard window, the (shard, bin)
    # groupBy (shard is a subset of the grouping keys, clustering
    # satisfied) and the tail orderBy(shard, bin) via the prefix rule
    # (r12). Parallelism is the shard count in either form — the
    # window already serializes within a shard by design.
    c = t.repartitionByRange("shard").withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(win), F.lit(0)))
    return (
        c.groupBy(
            "shard",
            F.floor(F.col("cum_before") / _PACK_CAPACITY).alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tokens").alias("n_tokens"))
        .orderBy("shard", "bin")
    )


@register(
    "quality_filter_funnel",
    oracle=f"""
    WITH t AS (
      SELECT lang,
             regexp_extract_all(coalesce(text, ''), '{WORD_RE}') AS words
      FROM documents
    ),
    m AS (
      SELECT lang,
             len(words) AS n_words,
             CASE WHEN len(words) = 0 THEN 0.0
                  ELSE len(array_to_string(words, '')) * 1.0 / len(words)
             END AS mean_len,
             CASE WHEN len(words) = 0 THEN 0.0
                  ELSE len(list_distinct(words)) * 1.0 / len(words)
             END AS distinct_ratio
      FROM t
    )
    SELECT lang,
           CASE WHEN n_words < 10 THEN 'too_short'
                WHEN n_words > 5000 THEN 'too_long'
                WHEN mean_len < 2.0 OR mean_len > 12.0 THEN 'word_length'
                WHEN distinct_ratio < 0.3 THEN 'low_diversity'
                ELSE 'kept' END AS reason,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM m
    GROUP BY lang, reason
    ORDER BY lang, reason
    """,
    doc="Quality-filter funnel: each document labeled with the FIRST "
        "rule it fails (Gopher-style ordered rules: length bounds, "
        "mean-word-length band, lexical diversity), counted per "
        "(lang, reason). All rules are column expressions over the "
        "token array (total char count = length of the concatenated "
        "words — no higher-order fold), so the scan streams through "
        "whole-stage codegen and only (lang, reason) counts shuffle.",
    tags=("text", "quality", "filter"),
)
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = F.regexp_extract_all(
        F.coalesce(F.col("text"), F.lit("")), F.lit(WORD_RE), 0)
    t = docs.select("lang", words.alias("words"))
    n_words = F.size(F.col("words"))
    safe_n = F.greatest(n_words, F.lit(1)).cast("double")
    mean_len = F.when(n_words == 0, F.lit(0.0)).otherwise(
        F.length(F.concat_ws("", F.col("words"))) / safe_n)
    distinct_ratio = F.when(n_words == 0, F.lit(0.0)).otherwise(
        F.size(F.array_distinct(F.col("words"))) / safe_n)
    reason = (
        F.when(n_words < 10, F.lit("too_short"))
        .when(n_words > 5000, F.lit("too_long"))
        .when((mean_len < 2.0) | (mean_len > 12.0), F.lit("word_length"))
        .when(distinct_ratio < 0.3, F.lit("low_diversity"))
        .otherwise(F.lit("kept")))
    return (
        t.select("lang", reason.alias("reason"))
        .groupBy("lang", "reason")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        # output bounded by the (language-code x 5 reasons) domain (r12)
        .transform(bounded_sort, "lang", "reason")
    )


_WSAMPLE_K = 5


@register(
    "weighted_sample_per_source",
    oracle=f"""
    WITH k AS (
      SELECT source, doc_id, n_chars,
             -ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    ::UBIGINT + 1) / 4294967297.0) / n_chars AS skey
      FROM documents
      WHERE n_chars > 0
    ),
    r AS (
      SELECT source, doc_id, n_chars, skey,
             row_number() OVER (PARTITION BY source
                                ORDER BY skey, doc_id) AS rn
      FROM k
    )
    SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           round(skey, 6) AS sample_key
    FROM r
    WHERE rn <= {_WSAMPLE_K}
    ORDER BY source, sample_key, doc_id
    """,
    doc="Deterministic weighted sampling without replacement "
        "(Efraimidis-Spirakis A-ES): per document the key is "
        "-ln(u)/w with u an md5-derived uniform in (0,1] and "
        "w = n_chars, and the k smallest keys per source are the "
        "sample — exactly the distribution of sequential weighted "
        "draws, but computed as one map-side expression plus one "
        "per-source top-k window (TakeOrdered shape, no global "
        "sort). md5-seeded u makes the draw engine-portable and "
        "rerun-stable, the property a training-mixture sampler "
        "needs at 100 TB: re-executions and different engines pick "
        "identical documents. ln() is bit-identical libm on both "
        "engines (verified), so the oracle reproduces the keys "
        "exactly.",
    tags=("text", "sampling", "curation"),
)
def weighted_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = ((md5_prefix_long(F.col("doc_id")).cast("double") + 1.0)
         / 4294967297.0)
    k = docs.select(
        "source", "doc_id", "n_chars",
        (-F.log(u) / F.col("n_chars")).alias("skey"))
    w = Window.partitionBy("source").orderBy("skey", "doc_id")
    return (
        k.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _WSAMPLE_K)
        .select("source", "doc_id", F.col("n_chars").cast("long").alias("n_chars"),
                F.round("skey", 6).alias("sample_key"))
        # output bounded by k x the source domain (<= _WSAMPLE_K rows
        # per source; source adjudicated bounded at the
        # source_mixture_weights call site) (r12)
        .transform(bounded_sort, "source", "sample_key", "doc_id")
    )


_SOURCE_CAP = 30


@register(
    "cap_docs_per_source",
    oracle=f"""
    WITH r AS (
      SELECT source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rn <= {_SOURCE_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rn <= {_SOURCE_CAP} THEN n_chars ELSE 0 END)
                AS BIGINT) AS kept_chars
    FROM r
    GROUP BY source
    ORDER BY source
    """,
    doc="Per-source contribution cap: rank each source's documents by "
        "a quality proxy (n_chars, deterministic doc_id tie-break) "
        "and keep at most N — the mixture-capping rule that stops any "
        "single crawl domain from dominating the training corpus "
        "(the deterministic-rank counterpart of "
        "weighted_sample_per_source's probabilistic draw). One "
        "per-source window then an aggregation riding the same "
        "source partitioning; reports per-source kept counts and "
        "retained volume.",
    tags=("text", "curation", "sampling"),
)
def cap_docs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    r = docs.select("source", "n_chars",
                    F.row_number().over(w).alias("rn"))
    kept = F.when(F.col("rn") <= _SOURCE_CAP, 1).otherwise(0)
    kept_chars = F.when(F.col("rn") <= _SOURCE_CAP,
                        F.col("n_chars")).otherwise(0)
    return (
        r.groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
             F.sum(kept).cast("bigint").alias("n_kept"),
             F.sum(kept_chars).cast("bigint").alias("kept_chars"))
        # output bounded by the source domain (source_mixture_weights
        # precedent) (r12)
        .transform(bounded_sort, "source")
    )


# ------------------------------------------------------------------
# The composite refinery: quality gate -> exact dedup -> greedy
# near-dup -> split report, as ONE lazy plan. Constants and SQL
# fragments are imported from the single-definition modules so the
# composite cannot drift from the individual stages it chains.
# ------------------------------------------------------------------

_REFINERY_QUALITY_MIN = 0.6


def _refinery_oracle() -> str:
    from radio_data_pipeline_spark.functions.text import (
        WHITESPACE_WORDS_SQL,
    )
    from radio_data_pipeline_spark.functions.splits import SPLIT_SQL
    from radio_data_pipeline_spark.plans.llm import (
        _bands_sql,
        _PUNCT_SQL,
        _SHINGLES_SQL,
        _sig_terms,
        _STOP_SQL,
    )

    quality = (
        f"0.4 * least(len(regexp_extract_all(text, '{WORD_RE}')) / 100.0, 1.0)"
        f" + 0.3 * (1.0 - least("
        f"CAST(len(regexp_extract_all(text, '{_PUNCT_SQL}')) AS DOUBLE)"
        f" / greatest(len(regexp_extract_all(text, '{WORD_RE}')), 1), 1.0))"
        f" + 0.3 * least(10.0 * ({_STOP_SQL})"
        f" / greatest(len(regexp_extract_all(text, '{WORD_RE}')), 1), 1.0)"
    )
    lang_en = (f"({_STOP_SQL}) * 100.0 / greatest("
               f"len(regexp_extract_all(text, '{WORD_RE}')), 1) >= 2.0")
    fp = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"
    return f"""
    WITH q AS (
      SELECT doc_id, text FROM documents
      WHERE round({quality}, 6) >= {_REFINERY_QUALITY_MIN} AND {lang_en}
    ),
    e AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text,
               min(doc_id) OVER (PARTITION BY {fp}) AS mn
        FROM q)
      WHERE doc_id = mn
    ),
    w AS (SELECT doc_id, {WHITESPACE_WORDS_SQL} AS words FROM e),
    sh AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM w),
    sigs AS (SELECT doc_id, {', '.join(_sig_terms())} FROM sh),
    bands AS ({_bands_sql()}),
    dropped AS (
      SELECT DISTINCT b.doc_id
      FROM bands a
      JOIN bands b ON a.band_id = b.band_id
                  AND a.band_hash = b.band_hash
                  AND a.doc_id < b.doc_id)
    SELECT {SPLIT_SQL.format(id='doc_id')} AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(regexp_extract_all(text, '{WORD_RE}')))
                AS BIGINT) AS total_words
    FROM e
    WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
    GROUP BY split ORDER BY split
    """


@register(
    "corpus_refinery_report",
    oracle=_refinery_oracle(),
    doc="The whole raw-crawl -> training-corpus refinery as ONE lazy "
        "lineage: quality gate (score >= 0.6 AND language-ID 'en') -> "
        "exact dedup (min-id per fingerprint) -> greedy near-dup "
        "(band-wise first survives) -> per-split doc/token report. "
        "No stage materializes; Catalyst sees the full chain, so the "
        "quality predicate prunes BEFORE any signature is hashed and "
        "dropped fingerprint rows never reach the minhash shuffle. "
        "Shuffle budget end-to-end: fingerprint window, signature "
        "groupBy, band window, anti-join, final 3-row aggregate — "
        "each on an md5-uniform key. The per-stage semantics are "
        "imported from their single-definition homes (quality_score / "
        "language_id / fingerprint / greedy_band_survivors / "
        "split_col), so this composite cannot drift from the "
        "individually-oracle-checked stages it chains.",
    tags=("curation", "dedup", "pipeline", "split"),
)
def corpus_refinery_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from radio_data_pipeline_spark.functions.dedup import (
        greedy_band_survivors,
    )
    from radio_data_pipeline_spark.functions.splits import split_col
    from radio_data_pipeline_spark.functions.text import (
        fingerprint,
        language_id,
        quality_score,
        word_count,
    )
    from radio_data_pipeline_spark.plans.llm import _docs

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    q = docs.filter(
        (F.round(quality_score(F.col("text")), 6)
         >= F.lit(_REFINERY_QUALITY_MIN))
        & (language_id(F.col("text")) == "en"))
    w = Window.partitionBy(fingerprint(F.col("text")))
    e = (q.withColumn("mn", F.min("doc_id").over(w))
         .filter(F.col("doc_id") == F.col("mn")).drop("mn"))
    d = greedy_band_survivors(e)
    return (
        d.groupBy(split_col(F.col("doc_id")).alias("split"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
             F.sum(word_count(F.col("text"))).cast("bigint")
             .alias("total_words"))
        .transform(bounded_sort, "split")
    )
