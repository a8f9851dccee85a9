"""Training-data construction operators, wave 3: the dedup/
decontamination/tokenizer signals between plans/llm.py (near-dup
detection), plans/quality.py (corpus statistics) and plans/curation.py
(funnel/packing) that a production pretraining pipeline runs and the
earlier waves don't cover.

- **Per-document duplicated-span coverage** (`duplicate_ngram_coverage`):
  the document-level form of the "remove spans seen elsewhere" rule —
  what fraction of a doc's k-grams occur in >= 2 documents. Corpus
  n-gram dedup work shows document-level duplication fraction is the
  filter signal, not just corpus-level counts.
- **Containment pairs** (`minhash_containment_pairs`): asymmetric
  |A∩B|/|A| — catches quotation/subsumption near-dups Jaccard misses.
- **BPE pair induction** (`bpe_pair_counts`): the first merge
  iteration of byte-pair encoding — frequency of adjacent symbol
  pairs weighted by word frequency. Tokenizer training's inner loop
  is exactly this aggregation repeated; one iteration exercises the
  full distributed shape (distinct-word pre-aggregation so the char
  explode runs over the vocabulary, not the corpus).
- **Bloom-filter decontamination** (`bloom_decontam_stats`): the
  100 TB form of the benchmark n-gram probe. The exact-set probe
  (plans/curation.py benchmark_decontam) broadcasts every benchmark
  gram string; the bloom form broadcasts a fixed-size bitset (m bits,
  k hashes) — constant memory regardless of benchmark size — at the
  price of quantified false positives. Both the flag AND the false
  positives are deterministic given (m, k, hash), so the oracle
  reproduces them bit-exactly; the query reports the per-source
  false-positive count against the exact probe.
- **Cross-split leakage** (`cross_split_near_dup`): near-duplicate
  pairs that STRADDLE the train/val/test split — the leakage exact
  decontamination misses (a test doc's near-duplicate in train). Uses
  the same banded-LSH candidate generation and md5-prefix split rule
  as the registered minhash/split queries so all constants stay
  mirrored in one place.
- **CDC upsert** (`merge_upsert_events`): MERGE-INTO semantics
  (latest-change-wins upsert of a changeset onto a base snapshot)
  expressed as two rank-1 windows and a full outer join — the
  incremental-maintenance pattern behind every "refresh the curated
  table" job.
- **Word-pair PMI** (`word_pair_pmi`): pointwise mutual information
  of word co-occurrence at document level — the classic collocation
  statistic. The document-frequency band bounds the per-doc pair
  explosion (the same cutoff argument as the inverted-index dedup
  family).

No reference analogue (the reference has no text surface) — these are
SURVEY §2.8 driver-extension components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from radio_data_pipeline_spark.functions.text import (
    WHITESPACE_WORDS_SQL,
    whitespace_words,
)
from radio_data_pipeline_spark.functions.splits import (
    SPLIT_SQL as _SPLIT_SQL,
    split_col as _split_col,
)
from radio_data_pipeline_spark.plans.llm import (
    _BUCKET_CAP,
    _K,
    _N_HASHES,
    _BAND_SIZE,
    _SIG_SQL_CORE,
    _bands_sql,
    _cand_sql,
    _docs,
)
from radio_data_pipeline_spark.plans.quality import (
    _gram_rows,
    _grams_sql,
    _WORDS_CTE,
)
from radio_data_pipeline_spark.operators.ordering import bounded_sort
from radio_data_pipeline_spark.plans.registry import register
from radio_data_pipeline_spark.sources.parquet import load_table

_DUP_K = 5  # gram length for duplicated-span coverage + bloom decontam


def _doc_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, gram) rows of k=5 word grams — shared by the
    coverage and bloom queries. Fully map-side (round-11: was a lead
    window + corpus-wide distinct shuffle): the per-doc dedup is an
    array_distinct on the gram array inside the row that owns it."""
    return _gram_rows(spark, sf_dir, _DUP_K, distinct_within_doc=True)


_GRAMS_CTE = (
    f"WITH w AS ({_WORDS_CTE}),\n"
    f"g AS (SELECT DISTINCT doc_id, unnest({_grams_sql(_DUP_K)}) AS gram "
    f"FROM w)"
)


@register(
    "duplicate_ngram_coverage",
    oracle=f"""
    {_GRAMS_CTE},
    gdf AS (SELECT gram, count(*) AS df FROM g GROUP BY gram)
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN gdf.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_grams,
           round(CAST(sum(CASE WHEN gdf.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS dup_coverage
    FROM g JOIN gdf USING (gram)
    GROUP BY g.doc_id
    ORDER BY g.doc_id
    """,
    doc="Per-document duplicated-span coverage: the fraction of a "
        "doc's distinct 5-grams that appear in >= 2 documents — the "
        "document-level dedup-filter signal (drop/downweight docs "
        "whose content mostly exists elsewhere). Plan: one gram "
        "explode, one gram-keyed count, one join back on the gram key "
        "— the join reuses the gram hash partitioning of the count, "
        "and per-gram frequency skew is irrelevant because the "
        "aggregate is a counted join, not a collect.",
    tags=("dedup", "quality", "ngram"),
)
def duplicate_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _doc_grams(spark, sf_dir)
    gdf = g.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    return (
        g.join(gdf, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"),
             F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
             .alias("n_dup_grams"))
        .select("doc_id", "n_grams", "n_dup_grams",
                F.round(F.col("n_dup_grams").cast("double")
                        / F.col("n_grams"), 6).alias("dup_coverage"))
        .orderBy("doc_id")
    )


_CONT_MAX_DF = 100
_CONT_THRESHOLD = 0.5


@register(
    "minhash_containment_pairs",
    oracle=f"""
    WITH w AS ({_WORDS_CTE}),
    shl AS (SELECT doc_id,
                   list_transform(range(1, greatest(len(words) - {_K - 1}, 0)
                                  + 1),
                                  i -> array_to_string(words[i:i+{_K - 1}],
                                                       ' ')) AS sh
            FROM w),
    sh0 AS (SELECT doc_id AS id, unnest(list_distinct(sh)) AS shingle
            FROM shl),
    rare AS (SELECT shingle FROM sh0 GROUP BY shingle
             HAVING count(*) <= {_CONT_MAX_DF}),
    sh AS (SELECT sh0.id, sh0.shingle FROM sh0 JOIN rare USING (shingle)),
    sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT i.id_a, i.id_b, i.n_common,
           round(CAST(i.n_common AS DOUBLE) / sa.n, 6) AS cont_a,
           round(CAST(i.n_common AS DOUBLE) / sb.n, 6) AS cont_b
    FROM inter i
    JOIN sizes sa ON sa.id = i.id_a
    JOIN sizes sb ON sb.id = i.id_b
    WHERE greatest(CAST(i.n_common AS DOUBLE) / sa.n,
                   CAST(i.n_common AS DOUBLE) / sb.n) >= {_CONT_THRESHOLD}
    ORDER BY id_a, id_b
    """,
    doc="Asymmetric containment |A∩B|/|A| over inverted-index "
        "candidate pairs: the near-superset detector (short doc "
        "quoted inside a long one has low Jaccard but containment "
        "~1). Same document-frequency cutoff and single "
        "shingle-keyed shuffle as ngram_jaccard_pairs; integer set "
        "arithmetic, exact across engines.",
    tags=("dedup", "containment"),
)
def minhash_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from radio_data_pipeline_spark.functions.dedup import containment_pairs
    return (containment_pairs(_docs(spark, sf_dir), k=_K,
                              threshold=_CONT_THRESHOLD,
                              max_df=_CONT_MAX_DF)
            .orderBy("id_a", "id_b"))


@register(
    "bpe_pair_counts",
    oracle=f"""
    WITH wrows AS (
      SELECT unnest({WHITESPACE_WORDS_SQL}) AS w
      FROM documents
    ),
    wf AS (SELECT w, count(*) AS freq FROM wrows WHERE w <> '' GROUP BY w),
    cs AS (SELECT freq, regexp_extract_all(w, '.') AS cs FROM wf),
    pairs AS (
      SELECT freq,
             unnest(list_transform(range(1, len(cs)),
                                   i -> cs[i] || cs[i+1])) AS pair
      FROM cs
    )
    SELECT pair, CAST(sum(freq) AS BIGINT) AS n
    FROM pairs
    GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 20
    """,
    doc="First BPE merge iteration: adjacent character-pair counts "
        "weighted by word frequency, top 20. The distributed shape "
        "tokenizer training repeats per merge: aggregate words FIRST "
        "(the char explode then runs over the distinct vocabulary — "
        "~sqrt of corpus token count — not over every token "
        "occurrence), explode pairs, one map-side-combinable count. "
        "TakeOrderedAndProject keeps the top-k on executors.",
    tags=("tokenizer", "text"),
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    words = (docs.select(
        F.explode(whitespace_words(F.col("text"))).alias("w"))
        .filter(F.col("w") != ""))
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    cs = wf.select(
        "freq", F.regexp_extract_all(F.col("w"), F.lit("."), 0).alias("cs"))
    pairs = cs.select(
        "freq",
        F.explode(F.expr(
            "CASE WHEN size(cs) >= 2 THEN "
            "transform(sequence(1, size(cs) - 1), "
            "i -> concat(element_at(cs, i), element_at(cs, i + 1))) "
            "ELSE array() END")).alias("pair"))
    return (
        pairs.groupBy("pair").agg(F.sum("freq").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(20)
    )


_BLOOM_M = 65536   # bits in the filter
_BLOOM_K = 3       # hash functions
_BENCH_MOD = 97    # doc_id % 97 == 0 -> benchmark subset (mirrors curation)


def _bloom_pos(gram: F.Column, i: int) -> F.Column:
    """Hash position i of a gram: 32-bit slice of md5('i|gram') mod m.
    Identical arithmetic in the oracle, so membership — including
    false positives — is reproduced bit-exactly."""
    return (F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{i}|"), gram)), 1, 8), 16, 10)
        .cast("long") % _BLOOM_M)


def _bloom_pos_sql(gram_expr: str, i_expr: str) -> str:
    return (f"(('0x' || substr(md5(CAST({i_expr} AS VARCHAR) || '|' || "
            f"{gram_expr}), 1, 8))::BIGINT % {_BLOOM_M})")


@register(
    "bloom_decontam_stats",
    oracle=f"""
    {_GRAMS_CTE},
    b AS (SELECT DISTINCT gram FROM g WHERE doc_id % {_BENCH_MOD} = 0),
    idx AS (SELECT unnest(range({_BLOOM_K})) AS i),
    bbits AS (SELECT DISTINCT {_bloom_pos_sql('b.gram', 'idx.i')} AS bit
              FROM b, idx),
    tg AS (SELECT DISTINCT gram FROM g WHERE doc_id % {_BENCH_MOD} <> 0),
    probe AS (SELECT tg.gram, idx.i,
                     {_bloom_pos_sql('tg.gram', 'idx.i')} AS bit
              FROM tg, idx),
    flagged AS (SELECT gram FROM probe JOIN bbits USING (bit)
                GROUP BY gram HAVING count(DISTINCT i) = {_BLOOM_K}),
    docflags AS (
      SELECT g.doc_id,
             max(CASE WHEN f.gram IS NOT NULL THEN 1 ELSE 0 END) AS flagged,
             max(CASE WHEN b2.gram IS NOT NULL THEN 1 ELSE 0 END) AS exact
      FROM g
      LEFT JOIN flagged f ON g.gram = f.gram
      LEFT JOIN b b2 ON g.gram = b2.gram
      WHERE g.doc_id % {_BENCH_MOD} <> 0
      GROUP BY g.doc_id
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(flagged) AS BIGINT) AS n_flagged,
           CAST(sum(exact) AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN flagged = 1 AND exact = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos
    FROM docflags
    JOIN documents d USING (doc_id)
    GROUP BY d.source
    ORDER BY d.source
    """,
    doc="Bloom-filter benchmark decontamination: the constant-memory "
        "broadcast form of the exact n-gram probe. The benchmark "
        "subset's 5-grams set m=65536 bits via k=3 md5-derived "
        "hashes; a corpus gram is flagged iff ALL k bits are set. "
        "Reports per-source flagged/exact/false-positive doc counts — "
        "the false positives ARE the operator's contract, "
        "deterministically reproduced by the oracle's identical bit "
        "arithmetic. Scale: the bitset is O(m) bytes broadcast "
        "(vs O(benchmark grams) strings for the exact probe); probes "
        "run at distinct-GRAM level, not per occurrence; doc flags "
        "are one gram-keyed join reusing the gram partitioning.",
    tags=("curation", "decontam", "sketch"),
)
def bloom_decontam_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _doc_grams(spark, sf_dir)
    bench = (g.filter(F.col("doc_id") % _BENCH_MOD == 0)
             .select("gram").distinct())
    bloom_bits = (bench.select(F.explode(F.array(
        *[_bloom_pos(F.col("gram"), i) for i in range(_BLOOM_K)]))
        .alias("bit")).distinct())
    train_g = g.filter(F.col("doc_id") % _BENCH_MOD != 0)
    tg = train_g.select("gram").distinct()
    probe = tg.select(
        "gram",
        F.posexplode(F.array(
            *[_bloom_pos(F.col("gram"), i) for i in range(_BLOOM_K)]))
        .alias("i", "bit"))
    flagged = (probe.join(F.broadcast(bloom_bits), "bit")
               .groupBy("gram")
               .agg(F.countDistinct("i").alias("nhit"))
               .filter(F.col("nhit") == _BLOOM_K)
               .select("gram"))
    docflags = (
        train_g
        .join(flagged.withColumn("is_flagged", F.lit(1)), "gram", "left")
        .join(bench.withColumn("is_exact", F.lit(1)), "gram", "left")
        .groupBy("doc_id")
        .agg(F.max(F.coalesce(F.col("is_flagged"), F.lit(0)))
             .alias("flagged"),
             F.max(F.coalesce(F.col("is_exact"), F.lit(0))).alias("exact"))
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        docflags.join(docs, "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("flagged").alias("n_flagged"),
             F.sum("exact").alias("n_exact"),
             F.sum(F.when((F.col("flagged") == 1) & (F.col("exact") == 0),
                          1).otherwise(0)).alias("n_false_pos"))
        .transform(bounded_sort, "source")
    )




@register(
    "cross_split_near_dup",
    oracle=f"""
    {_SIG_SQL_CORE},
    bands AS ({_bands_sql()}),
    cand AS ({_cand_sql()})
    SELECT id_a, id_b,
           {_SPLIT_SQL.format(id='id_a')} AS split_a,
           {_SPLIT_SQL.format(id='id_b')} AS split_b
    FROM cand
    WHERE {_SPLIT_SQL.format(id='id_a')} <> {_SPLIT_SQL.format(id='id_b')}
    ORDER BY id_a, id_b
    """,
    doc="Train/val/test leakage audit: MinHash-LSH near-duplicate "
        "candidate pairs that STRADDLE the corpus split — the "
        "contamination exact decontamination misses (a test document "
        "whose near-duplicate sits in train). Reuses the registered "
        "banded-LSH candidate generation (same bands, bucket cap) and "
        "the md5-prefix split rule of corpus_split_assignment, so "
        "every constant stays mirrored once. Scale: candidate "
        "generation is the capped band join; the split labels are "
        "map-side expressions on the pair ids — no extra shuffle.",
    tags=("dedup", "decontam", "split"),
)
def cross_split_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from radio_data_pipeline_spark.functions.dedup import minhash_lsh_pairs
    pairs = minhash_lsh_pairs(_docs(spark, sf_dir), n_hashes=_N_HASHES,
                              band_size=_BAND_SIZE, k=_K,
                              bucket_cap=_BUCKET_CAP)
    out = pairs.select(
        "id_a", "id_b",
        _split_col(F.col("id_a")).alias("split_a"),
        _split_col(F.col("id_b")).alias("split_b"))
    return (out.filter(F.col("split_a") != F.col("split_b"))
            .orderBy("id_a", "id_b"))


_CUTOFF_US = 1_705_276_800_000_000  # 2024-01-15T00:00:00Z in epoch micros


@register(
    "merge_upsert_events",
    oracle=f"""
    WITH base AS (
      SELECT user_id, event_type, value, epoch_us(ts) AS ts_us,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY epoch_us(ts) DESC, event_id DESC)
               AS rn
      FROM events WHERE epoch_us(ts) < {_CUTOFF_US}
    ),
    changes AS (
      SELECT user_id, event_type, value, epoch_us(ts) AS ts_us,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY epoch_us(ts) DESC, event_id DESC)
               AS rn
      FROM events WHERE epoch_us(ts) >= {_CUTOFF_US}
    )
    SELECT coalesce(b.user_id, c.user_id) AS user_id,
           coalesce(b.event_type, c.event_type) AS event_type,
           round(coalesce(c.value, b.value), 6) AS final_value,
           coalesce(c.ts_us, b.ts_us) AS final_ts_us,
           CASE WHEN b.user_id IS NULL THEN 'insert'
                WHEN c.user_id IS NULL THEN 'keep'
                ELSE 'update' END AS op
    FROM (SELECT * FROM base WHERE rn = 1) b
    FULL OUTER JOIN (SELECT * FROM changes WHERE rn = 1) c
      ON b.user_id = c.user_id AND b.event_type = c.event_type
    ORDER BY user_id, event_type
    """,
    doc="MERGE INTO / CDC upsert semantics: a changeset (events after "
        "the cutoff, latest-per-key) applied onto a base snapshot "
        "(latest-per-key before the cutoff) — matched keys update, "
        "new keys insert, untouched keys keep. Two rank-1 windows + "
        "one full outer join, all keyed on (user_id, event_type): "
        "the windows' hash partitioning is exactly the join's, so "
        "the whole MERGE is one logical shuffle — the incremental "
        "table-maintenance pattern at any scale. Time compared on "
        "exact integer micros (epoch_us) per the events contract.",
    tags=("cdc", "merge", "window"),
)
def merge_upsert_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id", "event_type")
         .orderBy(F.desc("ts_us"), F.desc("event_id")))

    def latest(df: DataFrame) -> DataFrame:
        return (df.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("user_id", "event_type", "value", "ts_us"))

    base = latest(ev.filter(F.col("ts_us") < _CUTOFF_US)).alias("b")
    changes = latest(ev.filter(F.col("ts_us") >= _CUTOFF_US)).alias("c")
    return (
        base.join(changes, ["user_id", "event_type"], "full_outer")
        .select(
            "user_id", "event_type",
            F.round(F.coalesce(F.col("c.value"), F.col("b.value")), 6)
            .alias("final_value"),
            F.coalesce(F.col("c.ts_us"), F.col("b.ts_us"))
            .alias("final_ts_us"),
            F.when(F.col("b.ts_us").isNull(), F.lit("insert"))
            .when(F.col("c.ts_us").isNull(), F.lit("keep"))
            .otherwise(F.lit("update")).alias("op"))
        .orderBy("user_id", "event_type")
    )


_PMI_MIN_DF = 5
_PMI_MAX_DF = 450
_PMI_MIN_PAIR = 5


@register(
    "word_pair_pmi",
    oracle=f"""
    WITH w AS ({_WORDS_CTE}),
    dw AS (SELECT DISTINCT doc_id, unnest(words) AS word FROM w
           WHERE len(words) > 0),
    dwc AS (SELECT doc_id, word FROM dw WHERE word <> ''),
    band AS (SELECT word, count(*) AS df FROM dwc GROUP BY word
             HAVING count(*) BETWEEN {_PMI_MIN_DF} AND {_PMI_MAX_DF}),
    fw AS (SELECT dwc.doc_id, dwc.word, band.df
           FROM dwc JOIN band USING (word)),
    n AS (SELECT count(*) AS n_docs FROM documents),
    pairs AS (
      SELECT a.word AS word_a, b.word AS word_b,
             count(*) AS c_ab, any_value(a.df) AS c_a, any_value(b.df) AS c_b
      FROM fw a JOIN fw b ON a.doc_id = b.doc_id AND a.word < b.word
      GROUP BY a.word, b.word
      HAVING count(*) >= {_PMI_MIN_PAIR}
    )
    SELECT word_a, word_b, CAST(c_ab AS BIGINT) AS c_ab,
           round(ln(CAST(c_ab AS DOUBLE) * n.n_docs / (c_a * c_b)), 6)
             AS pmi
    FROM pairs, n
    ORDER BY pmi DESC, word_a, word_b
    LIMIT 20
    """,
    doc="Document-level pointwise mutual information of word pairs "
        "(the collocation statistic): pmi = ln(P(a,b)/(P(a)P(b))) "
        "over document-presence probabilities, top 20. The "
        "document-frequency band [5, 450] bounds the per-document "
        "pair join (the same cutoff argument as the inverted-index "
        "dedup family: high-DF words are stopwords carrying no "
        "association signal, singleton words can't reach the pair "
        "minimum). One doc_id-keyed self-join, counts combine "
        "map-side, top-k via TakeOrderedAndProject.",
    tags=("text", "stats", "collocation"),
)
def word_pair_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    dw = (docs.select(
        "doc_id",
        F.explode(F.array_distinct(
            whitespace_words(F.col("text")))).alias("word"))
        .filter(F.col("word") != ""))
    band = (dw.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
            .filter((F.col("df") >= _PMI_MIN_DF)
                    & (F.col("df") <= _PMI_MAX_DF)))
    fw = dw.join(band, "word")
    n_docs = load_table(spark, sf_dir, "documents") \
        .agg(F.count(F.lit(1)).alias("n_docs"))
    pairs = (
        fw.alias("a")
        .join(fw.alias("b"), (F.col("a.doc_id") == F.col("b.doc_id"))
              & (F.col("a.word") < F.col("b.word")))
        .groupBy(F.col("a.word").alias("word_a"),
                 F.col("b.word").alias("word_b"))
        .agg(F.count(F.lit(1)).alias("c_ab"),
             F.first(F.col("a.df")).alias("c_a"),
             F.first(F.col("b.df")).alias("c_b"))
        .filter(F.col("c_ab") >= _PMI_MIN_PAIR)
    )
    return (
        pairs.crossJoin(F.broadcast(n_docs))
        .select("word_a", "word_b", F.col("c_ab").cast("bigint").alias("c_ab"),
                F.round(F.log(F.col("c_ab").cast("double") * F.col("n_docs")
                              / (F.col("c_a") * F.col("c_b"))), 6)
                .alias("pmi"))
        .orderBy(F.desc("pmi"), "word_a", "word_b")
        .limit(20)
    )
