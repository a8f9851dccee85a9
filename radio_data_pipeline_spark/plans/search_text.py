"""Search & indexing wave 5: BM25 ranking, inverted-index postings,
and prefix-duplicate detection — the keyword-retrieval counterpart of
the embedding ANN family (functions/similarity.py).

No reference analogue (the reference has no text surface); these are
SURVEY §2.8 driver-extension components: a training-data curation
stack needs lexical retrieval (for decontamination lookups and
quality-probe search) next to its vector retrieval.

- **BM25 top-k** (`bm25_keyword_topk`): Okapi BM25 (k1=1.2, b=0.75)
  over the whitespace tokenizer every other text operator uses. The
  scale shape is inverted-index-probe, not corpus-scan: the tokenized
  rows are filtered to the query's terms BEFORE any shuffle (a
  broadcast-able 3-term IN list the scan can apply), so the tf
  aggregation shuffles only matching postings; document length and
  the corpus constants (N, avgdl) are a map-only projection and a
  one-row broadcast aggregate. Scores are rounded before the top-k
  sort so the (score, doc_id) ordering is engine-exact.
- **Inverted-index postings** (`inverted_index_postings`): the index
  build itself — term -> document-frequency + the first 10 sorted
  doc_ids. Per-term posting lists are UNBOUNDED at corpus scale, so
  the list is explicitly capped (sort_array + slice) and the report
  keeps only the top-20 terms by df: both caps are the difference
  between a bounded reduce state and a collect_list that OOMs on a
  stopword. One distinct + one aggregation, both keyed on the term.
- **Prefix-duplicate groups** (`doc_prefix_dup_groups`): boilerplate
  detection by shared leading 8-gram — the cheap common-crawl
  heuristic that catches template pages exact-hash dedup misses
  (same header, different footer). Map-only prefix extraction, one
  hash aggregation; the prefix key is ~64 bytes regardless of
  document size, so the shuffle moves keys, not documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from radio_data_pipeline_spark.functions.text import (
    WHITESPACE_WORDS_SQL,
    whitespace_words,
)
from radio_data_pipeline_spark.plans.registry import register
from radio_data_pipeline_spark.sources.parquet import load_table_fanned

_K1 = 1.2
_B = 0.75
_BM25_TERMS = ("spark", "vector", "merge")
_BM25_TOPK = 15

_WORDS_SQL = (
    f"SELECT doc_id, {WHITESPACE_WORDS_SQL} AS words FROM documents"
)


def _split_words() -> F.Column:
    return whitespace_words(F.col("text"))


@register(
    "bm25_keyword_topk",
    oracle=f"""
    WITH w AS ({_WORDS_SQL}),
    dl AS (SELECT doc_id, len(words) AS dl FROM w),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     avg(dl) AS avgdl FROM dl),
    tok AS (SELECT doc_id, unnest(words) AS term FROM w),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM tok WHERE term IN ('spark', 'vector', 'merge')
           GROUP BY doc_id, term),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
           FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                 * tf.tf * ({_K1} + 1)
                 / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl / stats.avgdl))
                 ) AS s
      FROM tf JOIN df USING (term)
              JOIN dl USING (doc_id)
              CROSS JOIN stats
      GROUP BY tf.doc_id)
    SELECT doc_id, round(s, 6) AS bm25
    FROM scored
    ORDER BY round(s, 6) DESC, doc_id
    LIMIT {_BM25_TOPK}
    """,
    doc="Okapi BM25 (k1=1.2, b=0.75) top-15 for a fixed 3-term keyword "
        "query over the shared whitespace tokenizer. Index-probe "
        "shape: token rows are filtered to the query terms before the "
        "tf shuffle (the scan applies the IN list), df is a 3-row "
        "broadcast, N/avgdl a one-row broadcast aggregate; scores are "
        "rounded before the (score, doc_id) top-k so the cutoff is "
        "engine-exact. At 100 TB this is the decontamination-lookup / "
        "corpus-search primitive next to the ANN family.",
    tags=("text", "search", "bm25", "topk"),
)
def bm25_keyword_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table_fanned(spark, sf_dir, "documents")
    words = docs.select("doc_id", _split_words().alias("words"))
    dl = words.select("doc_id", F.size("words").alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                   F.avg("dl").alias("avgdl"))
    tok = words.select(
        "doc_id", F.explode("words").alias("term"))
    tf = (tok.where(F.col("term").isin(*_BM25_TERMS))
          .groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).cast("bigint").alias("tf")))
    df_t = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"))
    idf = F.log(F.lit(1.0)
                + (F.col("n") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    denom = (F.col("tf")
             + F.lit(_K1) * (F.lit(1.0 - _B)
                             + F.lit(_B) * F.col("dl") / F.col("avgdl")))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(idf * F.col("tf") * F.lit(_K1 + 1) / denom).alias("s"))
    )
    return (scored.select("doc_id", F.round("s", 6).alias("bm25"))
            .orderBy(F.desc("bm25"), "doc_id")
            .limit(_BM25_TOPK))


@register(
    "inverted_index_postings",
    oracle=f"""
    WITH w AS ({_WORDS_SQL}),
    pairs AS (SELECT DISTINCT doc_id, unnest(words) AS term FROM w)
    SELECT term,
           CAST(count(*) AS BIGINT) AS df,
           (list(doc_id ORDER BY doc_id))[1:10] AS postings_head
    FROM pairs
    GROUP BY term
    ORDER BY df DESC, term
    LIMIT 20
    """,
    doc="Inverted-index build: per-term document frequency and the "
        "first 10 sorted doc_ids, top-20 terms by df. Both outputs "
        "are explicitly capped because posting lists are unbounded at "
        "corpus scale — and the cap is applied BEFORE any collect: a "
        "per-term row_number filters to the 10 lowest doc_ids first, "
        "so the collect_list buffer holds <= 10 ids per term where "
        "collecting-then-slicing would buffer a stopword's entire "
        "posting list on one reducer. The window and both "
        "aggregations ride one term-keyed partitioning; df counts "
        "the pre-filter rows with a map-side partial.",
    tags=("text", "search", "index"),
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    docs = load_table_fanned(spark, sf_dir, "documents")
    pairs = (docs.select("doc_id",
                         F.explode(_split_words()).alias("term"))
             .distinct())
    # ONE pass over the distinct pairs (r12): df and the head list
    # come from the same window + aggregate — the window keeps every
    # row, so count(*) == df, and collect_list skips the NULLs the
    # rn > 10 CASE leaves, buffering <= 10 ids per term exactly like
    # the filtered form. The previous two-branch shape (df aggregate
    # JOIN head aggregate) computed the explode+distinct subtree
    # twice per action and paid a term-keyed join for the zip.
    w = Window.partitionBy("term").orderBy("doc_id")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"),
             F.sort_array(F.collect_list(
                 F.when(F.col("rn") <= 10, F.col("doc_id"))))
             .alias("postings_head"))
        .orderBy(F.desc("df"), "term")
        .limit(20)
    )


@register(
    "doc_prefix_dup_groups",
    oracle=f"""
    WITH w AS ({_WORDS_SQL}),
    p AS (SELECT doc_id, array_to_string(words[1:8], ' ') AS prefix8
          FROM w)
    SELECT prefix8,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS canonical_doc
    FROM p
    GROUP BY prefix8
    HAVING count(*) > 1
    ORDER BY n_docs DESC, prefix8
    """,
    doc="Boilerplate/prefix duplicate groups: documents sharing the "
        "same leading 8-word gram (the cheap template-page heuristic "
        "that catches same-header-different-footer near-dups exact "
        "hashing misses). Map-only prefix extraction — the shuffle "
        "key is ~64 bytes per doc regardless of document size — then "
        "one hash aggregation with HAVING>1; min(doc_id) nominates "
        "the canonical survivor deterministically.",
    tags=("text", "dedup", "prefix"),
)
def doc_prefix_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table_fanned(spark, sf_dir, "documents")
    p = docs.select(
        "doc_id",
        F.array_join(F.slice(_split_words(), 1, 8), " ").alias("prefix8"))
    return (
        p.groupBy("prefix8")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
             F.min("doc_id").cast("bigint").alias("canonical_doc"))
        .where(F.col("n_docs") > 1)
        .orderBy(F.desc("n_docs"), "prefix8")
    )
