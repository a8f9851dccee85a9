"""Training-data pipeline operators, continued: PII redaction,
corpus language-model statistics, length histograms, deterministic
dataset splits, and per-entity outlier screening.

These close out the curation surface around plans/llm.py /
quality.py / curation.py: the scrubbing, scoring, and partitioning
steps between "filtered corpus" and "training shards".

The synthetic documents contain no natural PII, so the redaction
query injects a deterministic email + phone per document *inside the
query* (both engines build the same string) and then detects/redacts
it — the regex plumbing, counting, and full-text redaction hash are
what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from radio_data_pipeline_spark.operators.ordering import bounded_sort
from radio_data_pipeline_spark.plans.quality import _word_rows, _WORDS_CTE
from radio_data_pipeline_spark.functions.splits import SPLIT_SQL, split_col
from radio_data_pipeline_spark.plans.registry import (
    defer_unpersist,
    register,
)
from radio_data_pipeline_spark.sources.layout import zorder_key_sql
from radio_data_pipeline_spark.sources.parquet import load_table

_EMAIL_RE = r"[a-z0-9]+@[a-z]+\.[a-z]+"
_PHONE_RE = r"\+1-555-[0-9]{4}"


@register(
    "pii_redaction_stats",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             coalesce(text, '') || ' contact user'
               || CAST(doc_id AS VARCHAR) || '@mail.com or call +1-555-'
               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT)
             AS n_phones,
           md5(regexp_replace(
                 regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
    FROM s
    ORDER BY doc_id
    """,
    doc="PII detection + redaction: regex-count emails/phones and hash "
        "the fully redacted text (the hash proves every occurrence was "
        "replaced, not just counted). Deterministic synthetic PII is "
        "appended per document inside the query because the corpus has "
        "none. Pure per-row regexp expressions — map-only, no shuffle, "
        "streams through whole-stage codegen at any scale.",
    tags=("text", "pii", "redaction"),
)
def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@mail.com or call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"))
    redacted = F.regexp_replace(
        F.regexp_replace(t, _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE, "<PHONE>")
    return (
        docs.select(
            "doc_id",
            F.regexp_count(t, F.lit(_EMAIL_RE)).cast("long")
             .alias("n_emails"),
            F.regexp_count(t, F.lit(_PHONE_RE)).cast("long")
             .alias("n_phones"),
            F.md5(redacted).alias("redacted_md5"))
        .orderBy("doc_id")
    )


@register(
    "unigram_logprob_scores",
    oracle=f"""
    WITH w AS ({_WORDS_CTE}),
    r AS (SELECT doc_id, unnest(words) AS w FROM w),
    f AS (SELECT w, count(*) AS c FROM r GROUP BY w),
    tot AS (SELECT count(*) AS t FROM r)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           round(avg(-ln(c * 1.0 / t)), 6) AS avg_neg_logprob
    FROM r JOIN f USING (w) CROSS JOIN tot
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="Unigram language-model scoring: per-document mean negative "
        "log-probability under the corpus' own unigram distribution — "
        "the classic cheap perplexity proxy for quality filtering. The "
        "frequency table is Zipf-shaped (vocabulary << corpus), so the "
        "word->count lookup is a broadcast join back onto the token "
        "stream; per-document aggregation shuffles on doc_id once. At "
        "vocabulary sizes beyond broadcast range the same plan runs as "
        "a shuffle join keyed on the word — no structural change.",
    tags=("text", "quality", "lm"),
)
def unigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = _word_rows(spark, sf_dir).select("doc_id", "w")
    freq = rows.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = rows.agg(F.count(F.lit(1)).alias("t"))
    return (
        rows.join(F.broadcast(freq), "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_words"),
             F.round(F.avg(-F.log(F.col("c") / F.col("t"))), 6)
              .alias("avg_neg_logprob"))
        .orderBy("doc_id")
    )


@register(
    "doc_length_histogram",
    oracle="""
    SELECT least(CAST(floor(n_chars / 200) AS BIGINT), 9) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY bucket
    ORDER BY bucket
    """,
    doc="Document-length histogram: fixed-width 200-char buckets with "
        "a top catch-all — the length-distribution report every "
        "curation run produces. One map-side bucketing expression and "
        "a 10-group aggregation; partial aggregation means almost "
        "nothing shuffles regardless of corpus size.",
    tags=("text", "stats", "histogram"),
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.least(F.floor(F.col("n_chars") / 200), F.lit(9).cast("long"))
    return (
        docs.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.min("n_chars").alias("min_chars"),
             F.max("n_chars").alias("max_chars"))
        .transform(bounded_sort, "bucket")
    )


@register(
    "corpus_split_assignment",
    oracle=f"""
    SELECT {SPLIT_SQL.format(id='doc_id')} AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY split
    ORDER BY split
    """,
    doc="Deterministic train/val/test split (~80/10/10) via an "
        "md5-prefix threshold on the key — engine-portable and stable "
        "under repartitioning, unlike rand()-seeded splits; the same "
        "document lands in the same split from any engine or cluster "
        "layout. Reported as per-split document and char totals.",
    tags=("sampling", "split"),
)
def corpus_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    split = split_col(F.col("doc_id"))
    return (
        docs.groupBy(split.alias("split"))
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_chars").alias("total_chars"))
        .transform(bounded_sort, "split")
    )


@register(
    "events_user_zscore_outliers",
    oracle="""
    WITH s AS (
      SELECT event_type, value,
             avg(value) OVER (PARTITION BY user_id) AS mu,
             stddev_pop(value) OVER (PARTITION BY user_id) AS sd
      FROM events
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_outliers
    FROM s
    WHERE sd > 0 AND abs((value - mu) / sd) > 3.0
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Per-user z-score outlier screen: each event's value against "
        "its user's own mean/stddev (unordered window partition — a "
        "hash repartition on user_id, no sort), outliers counted per "
        "event type. user_id is high-cardinality in real data, so "
        "window state is bounded per partition; the final aggregation "
        "is a handful of groups.",
    tags=("window", "stats", "anomaly"),
)
def events_user_zscore_outliers(spark: SparkSession, sf_dir: str
                                ) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    win = Window.partitionBy("user_id")
    s = ev.select(
        "event_type", "value",
        F.avg("value").over(win).alias("mu"),
        F.stddev_pop("value").over(win).alias("sd"))
    return (
        s.filter((F.col("sd") > 0)
                 & (F.abs((F.col("value") - F.col("mu")) / F.col("sd")) > 3.0))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_outliers"))
        .transform(bounded_sort, "event_type")
    )


@register(
    "events_view_purchase_attribution",
    oracle="""
    WITH v AS (SELECT user_id, epoch_us(ts) AS vts FROM events
               WHERE event_type = 'view'),
    p AS (SELECT user_id, epoch_us(ts) AS pts FROM events
          WHERE event_type = 'purchase')
    SELECT v.user_id,
           CAST(count(*) AS BIGINT) AS n_attributed,
           round(avg((p.pts - v.vts) / 1000000.0), 6) AS avg_delay_s
    FROM v JOIN p ON p.user_id = v.user_id
                 AND p.pts > v.vts
                 AND p.pts <= v.vts + 1800000000
    GROUP BY v.user_id
    ORDER BY v.user_id
    """,
    doc="Interval attribution join: purchases within 30 minutes after "
        "a view by the same user (every qualifying view-purchase pair, "
        "the ad-attribution / conversion-window primitive). Executes "
        "as an equi-join on user_id with the time band as residual — "
        "the range-join class; state per user is bounded by the "
        "window, which is also exactly the stream-stream-join form in "
        "streaming/events.py (same condition, plus watermarks).",
    tags=("join", "range", "events"),
)
def events_view_purchase_attribution(spark: SparkSession, sf_dir: str
                                     ) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = (ev.filter(F.col("event_type") == "view")
         .select(F.col("user_id").alias("v_user"),
                 F.col("ts_us").alias("vts")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select(F.col("user_id").alias("p_user"),
                 F.col("ts_us").alias("pts")))
    max_delay_us = 30 * 60 * 1_000_000
    return (
        v.join(p, (F.col("p_user") == F.col("v_user"))
               & (F.col("pts") > F.col("vts"))
               & (F.col("pts") <= F.col("vts") + max_delay_us))
        .groupBy(F.col("v_user").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_attributed"),
             F.round(F.avg((F.col("pts") - F.col("vts")) / 1_000_000.0), 6)
              .alias("avg_delay_s"))
        .orderBy("user_id")
    )


@register(
    "events_latest_per_user_type",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, event_id, value,
             row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_type, event_id AS latest_event_id,
           round(value, 6) AS latest_value
    FROM ranked WHERE rn = 1
    ORDER BY user_id, event_type
    """,
    doc="Last-writer-wins compaction: the latest event per "
        "(user_id, event_type) with a deterministic event_id "
        "tiebreak — the upsert/SCD-1 snapshot primitive for CDC-style "
        "pipelines without a table format. One shuffle on the "
        "compaction key; row_number=1 avoids any global sort and "
        "prunes in-partition.",
    tags=("window", "dedup", "compaction"),
)
def events_latest_per_user_type(spark: SparkSession, sf_dir: str
                                ) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    win = (Window.partitionBy("user_id", "event_type")
           .orderBy(F.desc("ts"), F.desc("event_id")))
    return (
        # one range exchange serves window + tail sort: the sort keys
        # equal the window partition keys exactly (prefix rule;
        # orders_rank_in_customer idiom, r12)
        ev.repartitionByRange("user_id", "event_type")
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type",
                F.col("event_id").alias("latest_event_id"),
                F.round("value", 6).alias("latest_value"))
        .orderBy("user_id", "event_type")
    )


@register(
    "doc_chunks_udtf",
    oracle=r"""
    WITH w AS (
      SELECT doc_id,
             string_split_regex(lower(trim(coalesce(text, ''))), '\s+')
               AS words
      FROM documents WHERE doc_id < 50
    ),
    s AS (SELECT doc_id, words,
                 unnest(range(0, len(words), 10)) AS start
          FROM w)
    SELECT doc_id,
           CAST(start // 10 AS INT) AS chunk_idx,
           CAST(least(10, len(words) - start) AS INT) AS n_words,
           words[start + 1] AS first_word
    FROM s
    ORDER BY doc_id, chunk_idx
    """,
    doc="Python UDTF surface demo (the one UDF class the other "
        "queries don't exercise — scalar pandas UDFs, applyInPandas, "
        "and mapInPandas all appear elsewhere): a table function "
        "exploding each document into 10-word chunks via LATERAL. "
        "Deliberately bounded to doc_id < 50 — per-row Python is the "
        "slow path, and the same chunking is expressible with "
        "F.sequence + transform for hot paths; this query exists to "
        "pin the UDTF API surface and its lateral-join planning.",
    tags=("udtf", "text"),
)
def doc_chunks_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: int, n_words: int, first_word: string")
    class ChunkDoc:
        def eval(self, text):
            # tokenization mirrors the oracle's string_split_regex
            # over trim(): strip(' ') removes SPACES only, exactly
            # like SQL trim — a bare .strip() would also eat tabs/
            # newlines and tokenize edge documents differently
            # (an empty/whitespace doc yields one '' token)
            words = re.split(r"\s+", (text or "").lower().strip(" "))
            for start in range(0, len(words), 10):
                yield (start // 10, min(10, len(words) - start),
                       words[start])

    spark.udtf.register("doc_chunks", ChunkDoc)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("__docs_for_udtf")
    # ORDER BY tail outside the SQL as a bounded_sort: the doc_id < 50
    # prune bounds the output by construction at ANY corpus size, and
    # the in-SQL ORDER BY's boundary-sampling job re-ran the per-row
    # Python UDTF stage — the most expensive stage this query has —
    # once more per action (r12). (doc_id, chunk_idx) is unique per
    # row, so the order is identical.
    from radio_data_pipeline_spark.operators.ordering import bounded_sort
    return spark.sql("""
        SELECT d.doc_id, c.chunk_idx, c.n_words, c.first_word
        FROM __docs_for_udtf d, LATERAL doc_chunks(d.text) c
    """).transform(bounded_sort, "doc_id", "chunk_idx")


@register(
    "events_funnel_counts",
    oracle="""
    WITH v AS (SELECT user_id, min(epoch_us(ts)) AS vts FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS cts
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.vts
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS pts
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.cts
          GROUP BY e.user_id)
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_viewed,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_clicked_after,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchased_after
    """,
    doc="Ordered funnel analysis: users who viewed, then clicked after "
        "their first view, then purchased after that first click — the "
        "strictly-ordered conversion funnel. Each stage is a per-user "
        "aggregate joined to the previous stage's first-timestamp "
        "(all stages shuffle on the same user_id key, so a cluster "
        "keeps one partitioning across the whole funnel); stage "
        "counts are three one-row aggregates.",
    tags=("events", "funnel", "join"),
)
def events_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_us")
    v = (ev.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts_us").alias("vts")))
    c = (ev.filter(F.col("event_type") == "click")
         .join(v, "user_id")
         .filter(F.col("ts_us") > F.col("vts"))
         .groupBy("user_id").agg(F.min("ts_us").alias("cts")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .join(c, "user_id")
         .filter(F.col("ts_us") > F.col("cts"))
         .groupBy("user_id").agg(F.min("ts_us").alias("pts")))
    nv = v.agg(F.count(F.lit(1)).alias("n_viewed"))
    nc = c.agg(F.count(F.lit(1)).alias("n_clicked_after"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchased_after"))
    return nv.crossJoin(nc).crossJoin(np_)


@register(
    "user_weekly_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id,
             f.cohort_week,
             CAST((epoch_us(date_trunc('week', e.ts))
                   - epoch_us(f.cohort_week))
                  // 604800000000 AS BIGINT) AS week_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT epoch_us(cohort_week) AS cohort_week_us,
           week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM activity
    WHERE week_offset <= 3
    GROUP BY cohort_week_us, week_offset
    ORDER BY cohort_week_us, week_offset
    """,
    doc="Cohort retention matrix: users grouped by the week of their "
        "first event, counted in each subsequent activity week "
        "(offsets 0-3) — the standard retention report. The cohort "
        "table is per-user (broadcastable relative to events at every "
        "scale ratio that matters); distinct user-week pairs shuffle "
        "once on user_id and the final matrix is tiny.",
    tags=("events", "retention", "window"),
)
def user_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = (ev.groupBy("user_id")
              .agg(F.min(F.date_trunc("week", F.col("ts")))
                   .alias("cohort_week")))
    week_us = 7 * 86400 * 1_000_000
    activity = (
        ev.join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            F.unix_micros("cohort_week").alias("cohort_week_us"),
            ((F.unix_micros(F.date_trunc("week", F.col("ts")))
              - F.unix_micros("cohort_week")) / week_us)
            .cast("long").alias("week_offset"))
        .distinct()
    )
    return (
        activity.filter(F.col("week_offset") <= 3)
        .groupBy("cohort_week_us", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week_us", "week_offset")
    )


@register(
    "events_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type, m.med,
             quantile_cont(abs(e.value - m.med), 0.5) AS mad
      FROM events e JOIN med m ON e.event_type = m.event_type
      GROUP BY e.event_type, m.med
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_outliers
    FROM events e JOIN mad m ON e.event_type = m.event_type
    WHERE m.mad > 0
      AND abs(e.value - m.med) > 3 * 1.4826 * m.mad
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    doc="Robust outlier screen via median absolute deviation — the "
        "distribution-free cousin of the z-score screen and the same "
        "robust-statistics family as the reference's Chauvenet "
        "rejection (continuum.py:72-109). Two decorrelated exact-"
        "median aggregates (event_type keys the shuffles; the "
        "per-type median tables are broadcast back), then a map-side "
        "threshold filter. At 100 TB swap percentile for "
        "percentile_approx (t-digest) — same plan, fixed state.",
    tags=("stats", "robust", "anomaly"),
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = (ev.groupBy("event_type")
           .agg(F.expr("percentile(value, 0.5)").alias("med")))
    mad = (ev.join(F.broadcast(med), "event_type")
           .groupBy("event_type", "med")
           .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad")))
    return (
        ev.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad") > 0)
                & (F.abs(F.col("value") - F.col("med"))
                   > 3 * 1.4826 * F.col("mad")))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_outliers"))
        .transform(bounded_sort, "event_type")
    )


@register(
    "token_compression_ratio",
    oracle="""
    WITH t AS (
      SELECT lang,
             length(coalesce(text, '')) AS n_chars_raw,
             len(regexp_extract_all(coalesce(text, ''),
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens
      FROM documents
    )
    SELECT lang,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(sum(n_chars_raw) * 1.0 / sum(n_tokens), 6)
             AS chars_per_token,
           round(avg(n_tokens), 6) AS avg_tokens_per_doc
    FROM t
    WHERE n_tokens > 0
    GROUP BY lang
    ORDER BY lang
    """,
    doc="Token compression ratio per language: characters per BPE-ish "
        "token — the tokenizer-efficiency signal used to budget "
        "context windows per language and to spot pathological "
        "content (very low ratios = symbol soup, very high = "
        "unsegmented scripts). Map-only regexp counting + a "
        "few-group aggregation.",
    tags=("text", "tokens", "stats"),
)
def token_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from radio_data_pipeline_spark.functions.text import (
        bpe_ish_token_count,
    )

    docs = load_table(spark, sf_dir, "documents")
    text = F.coalesce(F.col("text"), F.lit(""))
    n_tokens = bpe_ish_token_count(text)
    t = docs.select("lang", F.length(text).alias("n_chars_raw"),
                    n_tokens.alias("n_tokens"))
    return (
        t.filter(F.col("n_tokens") > 0)
        .groupBy("lang")
        .agg(F.sum("n_tokens").alias("total_tokens"),
             F.round(F.sum("n_chars_raw") / F.sum("n_tokens"), 6)
              .alias("chars_per_token"),
             F.round(F.avg("n_tokens"), 6).alias("avg_tokens_per_doc"))
        .transform(bounded_sort, "lang")
    )


@register(
    "source_mixture_weights",
    oracle="""
    WITH per_source AS (
      SELECT source, count(*) AS n_docs FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(n_docs) AS total, count(*) AS n_sources
            FROM per_source)
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           round(n_docs * 1.0 / total, 6) AS actual_frac,
           round((1.0 / n_sources) / (n_docs * 1.0 / total), 6)
             AS sample_weight
    FROM per_source CROSS JOIN tot
    ORDER BY source
    """,
    doc="Data-mixture rebalancing weights: per-source sampling weight "
        "that would equalize the corpus mixture (target uniform over "
        "sources; substitute any target vector the same way) — the "
        "knob pretraining data recipes tune. Per-source counts are a "
        "tiny aggregate; the totals are a one-row broadcast cross "
        "join, so nothing large shuffles twice.",
    tags=("sampling", "mixture", "stats"),
)
def source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"))
    tot = per_source.agg(F.sum("n_docs").alias("total"),
                         F.count(F.lit(1)).alias("n_sources"))
    actual = F.col("n_docs") / F.col("total")
    return (
        per_source.crossJoin(F.broadcast(tot))
        .select("source", "n_docs",
                F.round(actual, 6).alias("actual_frac"),
                F.round((1.0 / F.col("n_sources")) / actual, 6)
                 .alias("sample_weight"))
        .transform(bounded_sort, "source")
    )


@register(
    "events_trailing_hour_sum",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 6)
             AS trailing_sum
    FROM events
    ORDER BY event_id
    """,
    doc="Time-based RANGE frame: per event, the sum of the same "
        "user's values in the trailing hour — a true range frame over "
        "the event-time axis (irregular timestamps; a ROWS frame "
        "would be wrong), the sliding-feature primitive for "
        "point-in-time-correct ML features. One user-keyed window "
        "sort; frame state is bounded by the hour horizon.",
    tags=("window", "range-frame", "events"),
)
def events_trailing_hour_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hour_us = 3_600_000_000
    w = (Window.partitionBy("user_id").orderBy("ts_us")
         .rangeBetween(-hour_us, 0))
    return (
        ev.select("event_id", "user_id",
                  F.round(F.sum("value").over(w), 6).alias("trailing_sum"))
        .orderBy("event_id")
    )


@register(
    "events_value_locf",
    oracle="""
    SELECT event_id, user_id,
           round(last_value(CASE WHEN event_type <> 'error'
                                 THEN value END IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS filled_value
    FROM events
    ORDER BY event_id
    """,
    doc="Forward fill (last observation carried forward): error "
        "events' values are treated as missing and replaced by the "
        "user's most recent non-error value — IGNORE NULLS window "
        "semantics, the gap-filling primitive for sensor/telemetry "
        "streams (the reference's NaN masking F6 is the array-column "
        "cousin). Deterministic tiebreak on event_id; one user-keyed "
        "window sort.",
    tags=("window", "locf", "events"),
)
def events_value_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    masked = F.when(F.col("event_type") != "error", F.col("value"))
    w = (Window.partitionBy("user_id").orderBy("ts_us", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        ev.select("event_id", "user_id",
                  F.round(F.last(masked, ignorenulls=True).over(w), 6)
                   .alias("filled_value"))
        .orderBy("event_id")
    )


@register(
    "bigram_logprob_scores",
    oracle=f"""
    WITH w AS ({_WORDS_CTE}),
    r AS (SELECT doc_id, unnest(words) AS w,
                 generate_subscripts(words, 1) AS pos
          FROM w),
    b AS (SELECT doc_id, lag(w) OVER (PARTITION BY doc_id ORDER BY pos)
                   AS pw, w
          FROM r),
    bi AS (SELECT * FROM b WHERE pw IS NOT NULL),
    bc AS (SELECT pw, w, count(*) AS c FROM bi GROUP BY pw, w),
    pc AS (SELECT pw, count(*) AS cp FROM bi GROUP BY pw)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(-ln(c * 1.0 / cp)), 6) AS avg_neg_logprob2
    FROM bi JOIN bc USING (pw, w) JOIN pc USING (pw)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="Bigram language-model scoring: per-document mean "
        "-ln P(w|prev) under the corpus' own MLE bigram model "
        "(history mass = count of bigrams starting with prev, so "
        "probabilities sum to 1 per history) — the second rung of the "
        "cheap-perplexity ladder above unigram_logprob_scores. The "
        "bigram stream comes from a lag over the doc-keyed window the "
        "tokenizer already produced; bigram/history count tables are "
        "Zipf-shaped and broadcast back; one doc_id aggregation.",
    tags=("text", "quality", "lm"),
)
def bigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = _word_rows(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("pos")
    bi = (rows.withColumn("pw", F.lag("w").over(w))
          .filter(F.col("pw").isNotNull())
          .select("doc_id", "pw", "w"))
    bc = bi.groupBy("pw", "w").agg(F.count(F.lit(1)).alias("c"))
    pc = bi.groupBy("pw").agg(F.count(F.lit(1)).alias("cp"))
    return (
        bi.join(F.broadcast(bc), ["pw", "w"])
        .join(F.broadcast(pc), ["pw"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"),
             F.round(F.avg(-F.log(F.col("c") / F.col("cp"))), 6)
              .alias("avg_neg_logprob2"))
        .orderBy("doc_id")
    )


@register(
    "skew_salted_type_join",
    oracle="""
    WITH dim AS (
      SELECT event_type AS d_type, length(event_type) AS type_weight
      FROM (SELECT DISTINCT event_type FROM events)
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(e.value * d.type_weight), 2) AS weighted_value
    FROM events e JOIN dim d ON e.event_type = d.d_type
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    doc="Salted skew join registered as a first-class query: events "
        "(5 distinct event_type values — the worst-case hot-key "
        "distribution, every key is hot) joined to a tiny per-type "
        "dimension through operators/skew.salted_join, which spreads "
        "each key over 16 (key, salt) partitions and replicates the "
        "dimension per salt. The oracle is the PLAIN join — salting "
        "must be a pure physical rewrite with identical results. In "
        "production this path is for small-but-over-broadcast-limit "
        "dimensions; broadcast wins below that (and IS what AQE "
        "picks here — the query pins semantics, not the planner "
        "choice).",
    tags=("join", "skew", "salting"),
)
def skew_salted_type_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from radio_data_pipeline_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events")
    dim = (ev.select("event_type").distinct()
           .select(F.col("event_type").alias("d_type"),
                   F.length("event_type").alias("type_weight")))
    joined = salted_join(
        ev.select(F.col("event_type").alias("d_type"), "value", "event_id"),
        dim, "d_type", n_salts=16)
    return (
        joined.groupBy(F.col("d_type").alias("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum(F.col("value") * F.col("type_weight")), 2)
              .alias("weighted_value"))
        .transform(bounded_sort, "event_type")
    )


_KMEANS_K = 4


@register(
    "kmeans_embeddings",
    oracle=f"""
    WITH r AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings
    ),
    c0 AS (SELECT vec_id AS cluster, pos, val AS cval FROM r
           WHERE vec_id < {_KMEANS_K}),
    d1 AS (SELECT r.vec_id, c.cluster,
                  sum((r.val - c.cval) * (r.val - c.cval)) AS d2
           FROM r JOIN c0 c USING (pos) GROUP BY r.vec_id, c.cluster),
    a1 AS (SELECT vec_id, cluster FROM (
             SELECT vec_id, cluster,
                    row_number() OVER (PARTITION BY vec_id
                                       ORDER BY d2, cluster) AS rn
             FROM d1) WHERE rn = 1),
    c1 AS (SELECT a1.cluster, r.pos, avg(r.val) AS cval
           FROM a1 JOIN r USING (vec_id) GROUP BY a1.cluster, r.pos),
    d2 AS (SELECT r.vec_id, c.cluster,
                  sum((r.val - c.cval) * (r.val - c.cval)) AS d2
           FROM r JOIN c1 c USING (pos) GROUP BY r.vec_id, c.cluster),
    a2 AS (SELECT vec_id, cluster FROM (
             SELECT vec_id, cluster,
                    row_number() OVER (PARTITION BY vec_id
                                       ORDER BY d2, cluster) AS rn
             FROM d2) WHERE rn = 1)
    SELECT a2.cluster,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(avg(dd.d2), 4) AS avg_dist2
    FROM a2 JOIN d2 dd ON dd.vec_id = a2.vec_id
                      AND dd.cluster = a2.cluster
    GROUP BY a2.cluster
    ORDER BY a2.cluster
    """,
    doc="Distributed k-means (Lloyd's algorithm, k=4, 2 assignment "
        "rounds, deterministic first-k init and lowest-index tiebreak) "
        "over the embedding table — the iterative ML primitive, fully "
        "relational: vectors live posexploded as (vec_id, pos, val); "
        "each round is [broadcast centroid join on pos -> per-(vector,"
        "centroid) distance aggregation -> argmin via one row_number "
        "window -> element-wise centroid mean]. ZERO driver round "
        "trips — centroids are (k x dim)-row DataFrames, so 1000 "
        "executors iterate without collecting the model; the oracle "
        "unrolls the same two rounds as CTEs. Output: per-cluster "
        "size and mean squared distance.",
    tags=("ml", "iterative", "clustering"),
)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    r = emb.select(
        "vec_id",
        F.posexplode("embedding").alias("pos0", "valf")) \
        .select("vec_id", (F.col("pos0") + 1).alias("pos"),
                F.col("valf").cast("double").alias("val"))

    c = (r.filter(F.col("vec_id") < _KMEANS_K)
         .select(F.col("vec_id").alias("cluster"), "pos",
                 F.col("val").alias("cval")))

    d = a = None
    for _ in range(2):
        d = (r.join(F.broadcast(c), "pos")
             .groupBy("vec_id", "cluster")
             .agg(F.sum((F.col("val") - F.col("cval"))
                        * (F.col("val") - F.col("cval"))).alias("d2")))
        w = Window.partitionBy("vec_id").orderBy("d2", "cluster")
        a = (d.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") == 1).select("vec_id", "cluster"))
        c = (a.join(r, "vec_id")
             .groupBy("cluster", "pos")
             .agg(F.avg("val").alias("cval")))

    dd = d.select("vec_id", F.col("cluster").alias("d_cluster"), "d2")
    return (
        a.join(dd, (a.vec_id == dd.vec_id)
               & (a.cluster == F.col("d_cluster")))
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_vecs"),
             F.round(F.avg("d2"), 4).alias("avg_dist2"))
        .transform(bounded_sort, "cluster")
    )


@register(
    "events_trapezoid_integral",
    oracle="""
    WITH s AS (
      SELECT user_id, value, epoch_us(ts) AS tus,
             lag(value) OVER (PARTITION BY user_id
                              ORDER BY epoch_us(ts), event_id) AS pv,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_id) AS pt
      FROM events
    )
    SELECT user_id,
           round(sum((tus - pt) / 1000000.0 * (value + pv) / 2.0), 2)
             AS integral
    FROM s
    WHERE pv IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Trapezoidal time integration per user: sum of "
        "dt * (v + v_prev)/2 over consecutive samples — the "
        "irregular-sampling integral (the events-table analogue of "
        "the reference's continuum integration A1 x time "
        "normalization M11, where sample spacing varies). One lag "
        "window and one aggregation, both on the user_id "
        "partitioning.",
    tags=("window", "integration", "events"),
)
def events_trapezoid_integral(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    s = ev.select(
        "user_id", "value", "ts_us",
        F.lag("value").over(w).alias("pv"),
        F.lag("ts_us").over(w).alias("pt"))
    return (
        s.filter(F.col("pv").isNotNull())
        .groupBy("user_id")
        .agg(F.round(F.sum((F.col("ts_us") - F.col("pt")) / 1_000_000.0
                           * (F.col("value") + F.col("pv")) / 2.0), 2)
             .alias("integral"))
        .orderBy("user_id")
    )


@register(
    "null_semantics_audit",
    oracle="""
    WITH t AS (
      SELECT CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS k,
             CASE WHEN doc_id % 5 = 0 THEN NULL ELSE n_chars END AS v
      FROM documents
    )
    SELECT coalesce(k, '<null>') AS key_group,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(v) AS BIGINT) AS n_nonnull_v,
           CAST(count(DISTINCT v) AS BIGINT) AS n_distinct_v,
           CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_v
    FROM t
    GROUP BY k
    ORDER BY key_group
    """,
    doc="Three-valued-logic audit over deterministically injected "
        "NULLs: NULL keys collapse into one group, count(col) skips "
        "NULLs while count(*) doesn't, DISTINCT ignores NULLs — the "
        "semantics corner every engine must agree on before any "
        "null-bearing aggregate can be trusted; pinned here against "
        "the oracle on identical injected data.",
    tags=("nulls", "semantics", "agg"),
)
def null_semantics_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    k = F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(F.col("lang"))
    v = F.when(F.col("doc_id") % 5 == 0, F.lit(None)) \
        .otherwise(F.col("n_chars"))
    t = docs.select(k.alias("k"), v.alias("v"))
    return (
        t.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.count("v").alias("n_nonnull_v"),
             F.countDistinct("v").alias("n_distinct_v"),
             F.sum(F.col("v").isNull().cast("long")).alias("n_null_v"))
        .select(F.coalesce(F.col("k"), F.lit("<null>")).alias("key_group"),
                "n_rows", "n_nonnull_v", "n_distinct_v", "n_null_v")
        .transform(bounded_sort, "key_group")
    )


@register(
    "decimal_revenue_exact",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
             AS exact_revenue
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Exact DECIMAL aggregation: prices cast to DECIMAL(18,2) and "
        "summed in fixed-point — bit-exact across engines and "
        "partitionings (float sums differ in final ulps with "
        "aggregation order; money math must not). Output rendered as "
        "text so the oracle compares exact digits, not a float "
        "round-trip.",
    tags=("decimal", "agg", "exactness"),
)
def decimal_revenue_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
             .cast("string").alias("exact_revenue"))
        .transform(bounded_sort, "l_returnflag")
    )


@register(
    "join_key_skew_stats",
    oracle="""
    WITH per_key AS (
      SELECT 'lineitem.l_orderkey' AS key_name, l_orderkey AS k,
             count(*) AS n
      FROM lineitem GROUP BY l_orderkey
      UNION ALL
      SELECT 'events.user_id', user_id, count(*) FROM events
      GROUP BY user_id
      UNION ALL
      SELECT 'orders.o_custkey', o_custkey, count(*) FROM orders
      GROUP BY o_custkey
    )
    SELECT key_name,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(n) AS BIGINT) AS max_rows,
           round(avg(n), 6) AS avg_rows,
           round(max(n) / avg(n), 6) AS skew_ratio
    FROM per_key
    GROUP BY key_name
    ORDER BY key_name
    """,
    doc="Join-key skew diagnostics: per candidate shuffle key, the "
        "key count, hottest-key row count, mean, and max/mean skew "
        "ratio — the report that decides between plain shuffle, AQE "
        "skew-join, and salting before a big join runs (the planning "
        "input for operators/skew.salted_join). Each branch is one "
        "partial-aggregated groupBy on its own key; the union of "
        "per-key tables is lines-of-keys sized, not data sized.",
    tags=("diagnostics", "skew", "agg"),
)
def join_key_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    def per_key(df: DataFrame, key_name: str, col: str) -> DataFrame:
        return (df.groupBy(F.col(col).alias("k"))
                .agg(F.count(F.lit(1)).alias("n"))
                .select(F.lit(key_name).alias("key_name"), "k", "n"))

    li = per_key(load_table(spark, sf_dir, "lineitem"),
                 "lineitem.l_orderkey", "l_orderkey")
    ev = per_key(load_table(spark, sf_dir, "events"),
                 "events.user_id", "user_id")
    od = per_key(load_table(spark, sf_dir, "orders"),
                 "orders.o_custkey", "o_custkey")
    return (
        li.unionByName(ev).unionByName(od)
        .groupBy("key_name")
        .agg(F.count(F.lit(1)).alias("n_keys"),
             F.max("n").alias("max_rows"),
             F.round(F.avg("n"), 6).alias("avg_rows"),
             F.round(F.max("n") / F.avg("n"), 6).alias("skew_ratio"))
        .transform(bounded_sort, "key_name")
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id)
               AS next_type
      FROM events
    ),
    c AS (SELECT event_type, next_type, count(*) AS n FROM s
          WHERE next_type IS NOT NULL GROUP BY event_type, next_type),
    t AS (SELECT event_type, sum(n) AS tot FROM c GROUP BY event_type)
    SELECT c.event_type, c.next_type,
           CAST(c.n AS BIGINT) AS n_transitions,
           round(c.n * 1.0 / t.tot, 6) AS p_next
    FROM c JOIN t USING (event_type)
    ORDER BY c.event_type, c.next_type
    """,
    doc="First-order Markov transition matrix over per-user event "
        "sequences: P(next type | current type) from a lead() over "
        "the user-time ordering — the sequence-mining primitive "
        "behind behavioral modeling and next-event prediction "
        "features. One user-keyed window sort; the 5x5 transition "
        "table aggregates map-side.",
    tags=("window", "sequence", "markov"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    s = ev.select("event_type",
                  F.lead("event_type").over(w).alias("next_type"))
    c = (s.filter(F.col("next_type").isNotNull())
         .groupBy("event_type", "next_type")
         .agg(F.count(F.lit(1)).alias("n")))
    # row totals as a window over the BOUNDED transition table (<= 25
    # rows of a 5x5 type cross) instead of groupBy + broadcast join:
    # the broadcast build was a second driver job that re-executed the
    # whole lead-window + count chain per action (r12 count_jobs:
    # jobs=2, 4 stages each). sum(n) over (partition by event_type)
    # assigns every c-row the identical tot the join produced.
    tot = F.sum("n").over(Window.partitionBy("event_type"))
    return (
        c.select("event_type", "next_type",
                 F.col("n").alias("n_transitions"),
                 F.round(F.col("n") / tot, 6).alias("p_next"))
        .transform(bounded_sort, "event_type", "next_type")
    )


@register(
    "fuzzy_part_name_pairs",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
    FROM names a JOIN names b
      ON substring(a.p_name, 1, 1) = substring(b.p_name, 1, 1)
     AND abs(length(a.p_name) - length(b.p_name)) <= 3
     AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY name_a, name_b
    """,
    doc="Fuzzy string matching with BLOCKING: distinct part-name "
        "pairs within Levenshtein distance 3, compared only inside "
        "(first-char, length-band) blocks — the standard "
        "entity-resolution prefilter, same shape as the dedup "
        "family's LSH blocking. The length constraint is exact "
        "(dist <= 3 bounds the length delta to 3, enforced via "
        "band-explode so the join is a pure equi-join); the "
        "first-char block is the deliberate recall trade-off every "
        "blocking scheme makes (a typo in position 1 lands in a "
        "different block; add a second pass on last-char blocks to "
        "recover those). The plan is a shuffled equi-join on "
        "(char, band) — no nested-loop product, so vocabulary size "
        "can grow 1000x without going quadratic.",
    tags=("fuzzy", "join", "text", "blocking"),
)
def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = load_table(spark, sf_dir, "part").select("p_name").distinct()
    band = F.expr("length(p_name) div 4")
    a = names.select(F.col("p_name").alias("name_a"),
                     F.substring("p_name", 1, 1).alias("c_a"),
                     F.length("p_name").alias("len_a"),
                     band.alias("band_a"))
    # b-side emits every band a <=3-length-delta partner could live in
    # (at most 3 consecutive bands), so band equality is lossless for
    # the |len delta| <= 3 predicate — the equi-join stays exact.
    b = names.select(F.col("p_name").alias("name_b"),
                     F.substring("p_name", 1, 1).alias("c_b"),
                     F.length("p_name").alias("len_b"),
                     F.explode(F.sequence(
                         F.expr("(length(p_name) - 3) div 4"),
                         F.expr("(length(p_name) + 3) div 4")))
                     .alias("band_b"))
    return (
        a.join(b, (F.col("c_a") == F.col("c_b"))
               & (F.col("band_a") == F.col("band_b"))
               & (F.col("name_a") < F.col("name_b"))
               & (F.abs(F.col("len_a") - F.col("len_b")) <= 3))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 3)
        .select("name_a", "name_b", "dist")
        .orderBy("name_a", "name_b")
    )


@register(
    "hll_mergeable_weekly_users",
    oracle="""
    SELECT epoch_us(date_trunc('week', ts)) AS week_us,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS merged_within_5pct
    FROM events
    GROUP BY week_us
    ORDER BY week_us
    """,
    doc="Mergeable-sketch re-aggregation (Datasketches HLL): per-DAY "
        "user sketches are built once, then UNIONED up to weeks — the "
        "100 TB rollup pattern where raw data is touched once and "
        "every coarser granularity comes from merging kilobyte "
        "sketches (distinct counts are NOT additive; sketches are). "
        "The weekly estimate is asserted within 5% of the exact "
        "distinct count, which is what the oracle pins (sketches are "
        "deterministic for fixed data, so the bound is stable).",
    tags=("sketch", "approx", "rollup"),
)
def hll_mergeable_weekly_users(spark: SparkSession, sf_dir: str
                               ) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    )
    weekly = (
        daily.groupBy(F.date_trunc("week", F.col("day")).alias("week"))
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
    )
    exact = (
        ev.groupBy(F.date_trunc("week", F.col("ts")).alias("week"))
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    return (
        exact.join(weekly, "week")
        .select(F.unix_micros("week").alias("week_us"),
                F.col("exact_users").cast("bigint").alias("exact_users"),
                (F.abs(F.col("est") - F.col("exact_users"))
                 <= 0.05 * F.col("exact_users")).alias("merged_within_5pct"))
        .orderBy("week_us")
    )


@register(
    "theta_audience_overlap",
    oracle="""
    SELECT
      CAST((SELECT count(DISTINCT user_id) FROM events
            WHERE event_type = 'view') AS BIGINT) AS n_view,
      CAST((SELECT count(DISTINCT user_id) FROM events
            WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
      CAST((SELECT count(*) FROM
             (SELECT DISTINCT user_id FROM events
              WHERE event_type = 'view'
              INTERSECT
              SELECT DISTINCT user_id FROM events
              WHERE event_type = 'purchase') t) AS BIGINT) AS n_both_exact,
      TRUE AS overlap_within_5pct
    """,
    doc="Theta-sketch set intersection: audience overlap (distinct "
        "users who both viewed and purchased) estimated by "
        "intersecting two per-type sketches — the sketch family that "
        "supports set algebra, so overlap questions at 100 TB need "
        "no distinct-join of raw ids, only kilobyte sketch merges. "
        "The estimate is asserted within 5% of the exact INTERSECT "
        "(with a +-1 floor for small audiences), which the oracle "
        "pins; sketches are deterministic for fixed data.",
    tags=("sketch", "approx", "setop"),
)
def theta_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    both = ev.filter(F.col("event_type").isin("view", "purchase"))
    sk = (both.groupBy("event_type")
          .agg(F.expr("theta_sketch_agg(user_id)").alias("sk")))
    # coalesce(1) before the intersection: theta_intersection_agg's
    # identity element is the INFINITE set, so a partial-agg buffer
    # that receives ZERO rows throws SketchesStateException at
    # getResult() — which happens whenever the grouped-sketch shuffle
    # leaves empty partitions (AQE off / fixed shuffle.partitions;
    # found by the r12 count_jobs sweep, which runs AQE-off like the
    # bench session — AQE's post-shuffle coalescing was masking it).
    # sk is domain-bounded (<= #event_types rows), so one partition
    # is the honest shape at any scale; same rows into a commutative
    # intersection, result unchanged.
    est = sk.coalesce(1).agg(
        F.expr("theta_sketch_estimate(theta_intersection_agg(sk))")
        .alias("est_both"))
    v = ev.filter(F.col("event_type") == "view") \
        .agg(F.countDistinct("user_id").alias("n_view"))
    p = ev.filter(F.col("event_type") == "purchase") \
        .agg(F.countDistinct("user_id").alias("n_purchase"))
    e = (ev.filter(F.col("event_type") == "view").select("user_id")
         .intersect(ev.filter(F.col("event_type") == "purchase")
                    .select("user_id"))
         .agg(F.count(F.lit(1)).alias("n_both_exact")))
    return (
        v.crossJoin(p).crossJoin(e).crossJoin(F.broadcast(est))
        .select(
            F.col("n_view").cast("bigint").alias("n_view"),
            F.col("n_purchase").cast("bigint").alias("n_purchase"),
            F.col("n_both_exact").cast("bigint").alias("n_both_exact"),
            (F.abs(F.col("est_both") - F.col("n_both_exact"))
             <= F.greatest(F.lit(1.0), 0.05 * F.col("n_both_exact")))
            .alias("overlap_within_5pct"))
    )


_ZKEY_SQL = zorder_key_sql(
    "user_id", "(CAST(floor(value) AS BIGINT) - vm.vmin)")


@register(
    "zorder_locality_events",
    oracle=f"""
    WITH vm AS (
      SELECT CAST(floor(min(value)) AS BIGINT) AS vmin FROM events
    ), k AS (
      SELECT user_id, CAST(floor(value) AS BIGINT) AS vbucket,
             {_ZKEY_SQL} AS zkey
      FROM events, vm
    )
    SELECT zkey >> 10 AS zbucket,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(user_id) AS BIGINT) AS min_user,
           CAST(max(user_id) AS BIGINT) AS max_user,
           min(vbucket) AS min_vbucket,
           max(vbucket) AS max_vbucket
    FROM k
    GROUP BY zbucket
    ORDER BY zbucket
    """,
    doc="Z-order (Morton) locality audit: events keyed by the "
        "bit-interleave of (user_id, floor(value)), grouped into "
        "contiguous curve segments (zkey >> 10), reporting each "
        "segment's span in BOTH dimensions. The point of the layout: "
        "every segment covers a narrow user range AND a narrow value "
        "range simultaneously, so files written in zkey order serve "
        "min/max pruning for filters on either column — the "
        "multi-dimensional data-skipping sort "
        "(sources/layout.py write_zordered performs the write; "
        "tests/test_layout.py proves the per-file span shrinkage). "
        "Pure bit arithmetic, whole-stage codegen, one aggregation "
        "shuffle.",
    tags=("layout", "zorder", "data-skipping"),
)
def zorder_locality_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from radio_data_pipeline_spark.sources.layout import zorder_key

    ev = load_table(spark, sf_dir, "events")
    vbucket = F.floor("value").cast("long")
    # zorder_key interleaves the LOW bits of non-negative dimensions;
    # a negative floor(value) would mask to the top of the bit range
    # and destroy the locality the layout exists for. Offset by the
    # per-dataset min (one-row scalar aggregate, broadcast) so the
    # interleaved dimension is always >= 0; the reported vbucket spans
    # stay in original units.
    vmin = ev.agg(F.min(vbucket).alias("vmin"))
    k = ev.crossJoin(F.broadcast(vmin)).select(
        "user_id", vbucket.alias("vbucket"),
        zorder_key(F.col("user_id"),
                   vbucket - F.col("vmin")).alias("zkey"))
    return (
        k.groupBy(F.shiftright("zkey", 10).alias("zbucket"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min("user_id").cast("long").alias("min_user"),
             F.max("user_id").cast("long").alias("max_user"),
             F.min("vbucket").alias("min_vbucket"),
             F.max("vbucket").alias("max_vbucket"))
        .transform(bounded_sort, "zbucket")
    )


@register(
    "events_value_moments",
    oracle="""
    WITH s AS (
      SELECT event_type,
             count(*) AS n,
             sum(value) AS s1, sum(value * value) AS s2,
             sum(value * value * value) AS s3,
             sum(value * value * value * value) AS s4
      FROM events
      GROUP BY event_type
    ),
    m AS (
      SELECT event_type, n, s1 / n AS mean,
             s2 / n - (s1 / n) * (s1 / n) AS m2,
             s3 / n - 3 * (s1 / n) * (s2 / n)
                  + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
             s4 / n - 4 * (s1 / n) * (s3 / n)
                  + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                  - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
      FROM s
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round(mean, 6) AS mean,
           round(sqrt(m2), 6) AS stddev,
           round(m3 / pow(m2, 1.5), 6) AS skewness,
           round(m4 / (m2 * m2) - 3, 6) AS excess_kurtosis
    FROM m
    ORDER BY event_type
    """,
    doc="Single-pass distribution moments per event type: mean, "
        "stddev, skewness, excess kurtosis, all derived from the raw "
        "power sums (n, sum v, sum v^2..v^4) of ONE aggregation — the "
        "mergeable-state generalization of the reference's mean (A4) "
        "and sum-of-squares (A5) statistics. Power sums are "
        "map-side-combinable, so 1000 executors each reduce their "
        "partition to 5 numbers per group and the shuffle carries "
        "fixed-size state regardless of row count (the same "
        "mergeability argument as the HLL/theta sketch family, but "
        "exact). Identical raw-moment arithmetic on both engines.",
    tags=("aggregation", "statistics"),
)
def events_value_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s1"), F.sum(v * v).alias("s2"),
        F.sum(v * v * v).alias("s3"), F.sum(v * v * v * v).alias("s4"))
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    mean = s1 / n
    m2 = s2 / n - mean * mean
    m3 = s3 / n - 3 * mean * (s2 / n) + 2 * mean * mean * mean
    m4 = (s4 / n - 4 * mean * (s3 / n)
          + 6 * mean * mean * (s2 / n) - 3 * mean * mean * mean * mean)
    return (
        s.select(
            "event_type", n.cast("bigint").alias("n"),
            F.round(mean, 6).alias("mean"),
            F.round(F.sqrt(m2), 6).alias("stddev"),
            F.round(m3 / F.pow(m2, F.lit(1.5)), 6).alias("skewness"),
            F.round(m4 / (m2 * m2) - 3, 6).alias("excess_kurtosis"))
        .transform(bounded_sort, "event_type")
    )


@register(
    "user_type_scd2",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, epoch_us(ts) AS tus, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id)
               AS prev_type
      FROM events
    ),
    c AS (
      SELECT user_id, event_type, tus, event_id
      FROM o
      WHERE prev_type IS NULL OR event_type <> prev_type
    ),
    v AS (
      SELECT user_id, event_type, tus AS valid_from_us,
             lead(tus) OVER (PARTITION BY user_id
                             ORDER BY tus, event_id) AS valid_to_us,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY tus, event_id) AS version
      FROM c
    )
    SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
           valid_from_us, valid_to_us,
           (valid_to_us IS NULL) AS is_current
    FROM v
    ORDER BY user_id, version
    """,
    doc="Slowly-changing-dimension type-2 history build: per user, "
        "each run of consecutive identical event_types collapses to "
        "one versioned row with [valid_from, valid_to) interval "
        "(NULL valid_to = current) — the warehouse pattern that turns "
        "an event stream into a temporally-joinable dimension, and "
        "the relational twin of the reference's segment extraction "
        "(O15: change-point -> interval). Two windows and a filter, "
        "all on the user_id partitioning established once; no "
        "repartition between stages.",
    tags=("window", "scd", "temporal"),
)
def user_type_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    # one range exchange serves both user_id windows + the tail
    # orderBy(user_id, version) via the prefix rule (r12)
    o = ev.repartitionByRange("user_id").select(
        "user_id", "event_type", F.col("ts_us").alias("tus"), "event_id",
        F.lag("event_type").over(w).alias("prev_type"))
    c = o.where(F.col("prev_type").isNull()
                | (F.col("event_type") != F.col("prev_type")))
    # (tus, event_id) — the same tie-break the changepoint window
    # used; tus alone leaves version/valid_to nondeterministic when
    # two changepoints share a timestamp
    wv = Window.partitionBy("user_id").orderBy("tus", "event_id")
    v = c.select(
        "user_id", "event_type", F.col("tus").alias("valid_from_us"),
        F.lead("tus").over(wv).alias("valid_to_us"),
        F.row_number().over(wv).alias("version"))
    return (
        v.select("user_id", F.col("version").cast("bigint").alias("version"),
                 "event_type", "valid_from_us", "valid_to_us",
                 F.col("valid_to_us").isNull().alias("is_current"))
        .orderBy("user_id", "version")
    )


@register(
    "events_daily_gapfill",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             count(*) AS n_events, sum(value) AS total_value
      FROM events
      GROUP BY event_type, day
    ),
    span AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
    spine AS (
      SELECT t.event_type, CAST(g.day AS DATE) AS day
      FROM (SELECT DISTINCT event_type FROM d) t,
           (SELECT unnest(generate_series((SELECT lo FROM span),
                                          (SELECT hi FROM span),
                                          INTERVAL 1 DAY)) AS day) g
    )
    SELECT s.event_type,
           CAST(epoch_us(CAST(s.day AS TIMESTAMP)) AS BIGINT) AS day_us,
           CAST(coalesce(d.n_events, 0) AS BIGINT) AS n_events,
           round(coalesce(d.total_value, 0), 2) AS total_value
    FROM spine s
    LEFT JOIN d ON s.event_type = d.event_type AND s.day = d.day
    ORDER BY s.event_type, day_us
    """,
    doc="Calendar-spine gap filling: daily (event_type, count, value) "
        "series densified to EVERY day in the observed span, missing "
        "days zero-filled — the densification step before any "
        "time-series model or day-over-day comparison (a left join "
        "against a generated spine, the dual of LOCF forward-fill "
        "which only patches interior NULLs). The spine is "
        "sequence(min_day, max_day) exploded against the distinct "
        "type dimension. The fact table is aggregated BEFORE the "
        "outer join, so the join touches two dimension-sized inputs "
        "(days x types), never the raw facts; the aggregated side is "
        "the broadcast build side (Spark cannot broadcast the "
        "preserved side of an outer join), and the span rides along "
        "as a one-row broadcast aggregate.",
    tags=("window", "gapfill", "events"),
)
def events_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = (ev.groupBy("event_type",
                    F.date_trunc("DAY", "ts").cast("date").alias("day"))
         .agg(F.count(F.lit(1)).alias("n_events"),
              F.sum("value").alias("total_value")))
    span = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = (d.select("event_type").distinct()
             .crossJoin(F.broadcast(span))
             .select("event_type",
                     F.explode(F.sequence("lo", "hi")).alias("day")))
    return (
        spine.join(F.broadcast(d), ["event_type", "day"], "left")
        .select("event_type",
                F.unix_micros(F.col("day").cast("timestamp"))
                 .alias("day_us"),
                F.coalesce("n_events", F.lit(0)).cast("bigint")
                 .alias("n_events"),
                F.round(F.coalesce("total_value", F.lit(0.0)), 2)
                 .alias("total_value"))
        .orderBy("event_type", "day_us")
    )


def _corr_sql(x: str, y: str, alias: str) -> str:
    return (f"round((count(*) * sum({x} * {y}) - sum({x}) * sum({y}))"
            f" / sqrt((count(*) * sum({x} * {x}) - sum({x}) * sum({x}))"
            f" * (count(*) * sum({y} * {y}) - sum({y}) * sum({y}))), 6)"
            f" AS {alias}")


_CORR_PAIRS = [("l_quantity", "l_extendedprice", "r_qty_price"),
               ("l_quantity", "l_discount", "r_qty_disc"),
               ("l_quantity", "l_tax", "r_qty_tax"),
               ("l_extendedprice", "l_discount", "r_price_disc"),
               ("l_extendedprice", "l_tax", "r_price_tax"),
               ("l_discount", "l_tax", "r_disc_tax")]


@register(
    "lineitem_corr_matrix",
    oracle=f"""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           {", ".join(_corr_sql(x, y, a) for x, y, a in _CORR_PAIRS)}
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Pairwise Pearson correlation matrix of the four lineitem "
        "measures per return flag, computed from RAW POWER SUMS "
        "(count, sum x, sum x^2, sum xy) in ONE aggregation pass — "
        "not the built-in corr(), whose streaming update order would "
        "differ between engines; the explicit sums make the "
        "arithmetic engine-identical AND mergeable (fixed-size state "
        "per group, map-side combinable — the events_value_moments "
        "argument extended to the multivariate case). One shuffle of "
        "14 numbers per group regardless of row count.",
    tags=("aggregation", "statistics"),
)
def lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def corr_col(x: str, y: str, alias: str) -> F.Column:
        cx, cy, cn = F.col(x), F.col(y), F.count(F.lit(1))
        num = cn * F.sum(cx * cy) - F.sum(cx) * F.sum(cy)
        den = F.sqrt((cn * F.sum(cx * cx) - F.sum(cx) * F.sum(cx))
                     * (cn * F.sum(cy * cy) - F.sum(cy) * F.sum(cy)))
        return F.round(num / den, 6).alias(alias)

    return (
        li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
             *[corr_col(x, y, a) for x, y, a in _CORR_PAIRS])
        .transform(bounded_sort, "l_returnflag")
    )


@register(
    "events_winsorized_mean",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CAST(quantile_cont(value, 0.01) AS DOUBLE) AS p01,
             CAST(quantile_cont(value, 0.99) AS DOUBLE) AS p99
      FROM events
      GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(value), 6) AS raw_mean,
           round(avg(least(greatest(value, b.p01), b.p99)), 6)
             AS winsorized_mean,
           round(CAST(b.p01 AS DOUBLE), 6) AS p01,
           round(CAST(b.p99 AS DOUBLE), 6) AS p99
    FROM events e JOIN b ON e.event_type = b.event_type
    GROUP BY e.event_type, b.p01, b.p99
    ORDER BY e.event_type
    """,
    doc="Winsorized mean per event type: exact P1/P99 bounds "
        "(interpolated percentile, identical definition on both "
        "engines) computed in a first aggregation pass, broadcast "
        "back onto the facts, values clipped into [p01, p99], then "
        "re-averaged — the two-pass robust-mean idiom (clip, don't "
        "drop) that tames heavy-tailed metrics, the bounded-influence "
        "cousin of the MAD screen and the RCR rejection family. The "
        "percentile table is groups-sized, so the join back is a "
        "broadcast; the fact table is scanned twice but never "
        "reshuffled on a new key.",
    tags=("aggregation", "robust", "statistics"),
)
def events_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    b = (ev.groupBy("event_type")
         .agg(F.percentile("value", 0.01).alias("p01"),
              F.percentile("value", 0.99).alias("p99")))
    clipped = F.least(F.greatest(F.col("value"), F.col("p01")),
                      F.col("p99"))
    return (
        ev.join(F.broadcast(b), "event_type")
        .groupBy("event_type", "p01", "p99")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
             F.round(F.avg("value"), 6).alias("raw_mean"),
             F.round(F.avg(clipped), 6).alias("winsorized_mean"))
        .select("event_type", "n", "raw_mean", "winsorized_mean",
                F.round("p01", 6).alias("p01"),
                F.round("p99", 6).alias("p99"))
        .transform(bounded_sort, "event_type")
    )


@register(
    "orders_pareto_share",
    oracle="""
    WITH c AS (
      SELECT o_custkey, sum(o_totalprice) AS rev
      FROM orders GROUP BY o_custkey
    ),
    d AS (
      SELECT o_custkey, rev,
             ntile(10) OVER (ORDER BY rev DESC, o_custkey) AS decile
      FROM c
    ),
    g AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
             sum(rev) AS decile_rev
      FROM d GROUP BY decile
    )
    SELECT decile, n_customers,
           round(decile_rev, 2) AS decile_revenue,
           round(sum(decile_rev) OVER (ORDER BY decile)
                 / sum(decile_rev) OVER (), 6) AS cum_share
    FROM g
    ORDER BY decile
    """,
    doc="Revenue concentration (Pareto/Lorenz) report: customers "
        "ranked into spend deciles, each decile's revenue and the "
        "cumulative share — 'the top 10% of customers carry X% of "
        "revenue', the concentration curve behind corpus source "
        "weighting and skew planning alike. The global ntile needs a "
        "TOTAL ordering, delivered by the two-pass partition-offset "
        "builder (sources/layout.global_ntile — deterministic range "
        "buckets + per-bucket sorts + closed-form tile from the "
        "global position): NO Exchange SinglePartition anywhere in "
        "the plan, so the ranking stays bucket-parallel even if the "
        "per-customer aggregate reaches fact scale. The decile "
        "re-agg and share windows then run over exactly 10 rows "
        "(bounded global window, adjudicated in PLANS.md).",
    tags=("window", "analytics", "distribution"),
)
def orders_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from radio_data_pipeline_spark.sources.layout import global_ntile

    orders = load_table(spark, sf_dir, "orders")
    # persist the keyed aggregate: the ntile builder runs three
    # driver-side jobs (count, boundary sample, bucket counts) before
    # the final plan, and unpersisted each re-runs the fact scan +
    # groupBy. Released harness-side via registry.release_deferred()
    # — NOT an eager localCheckpoint on the result, which truncated
    # the returned plan to Scan ExistingRDD and blinded the gwin
    # audit (r7 ADVICE); the returned frame stays lazy.
    c = defer_unpersist(
        orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("rev")).persist())
    # rev DESC == -rev ASC (ties broken by custkey either way)
    d = global_ntile(c, [-F.col("rev"), F.col("o_custkey")], 10,
                     tile_col="decile")
    g = (d.groupBy("decile")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"),
              F.sum("rev").alias("decile_rev")))
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    wt = Window.rowsBetween(Window.unboundedPreceding,
                            Window.unboundedFollowing)
    return (
        g.select("decile", "n_customers",
                 F.round("decile_rev", 2).alias("decile_revenue"),
                 F.round(F.sum("decile_rev").over(wc)
                         / F.sum("decile_rev").over(wt), 6)
                  .alias("cum_share"))
        .transform(bounded_sort, "decile"))


@register(
    "events_autocorr_lag1",
    oracle="""
    WITH p AS (
      SELECT user_id, value AS x,
             lag(value) OVER (PARTITION BY user_id
                              ORDER BY epoch_us(ts), event_id) AS y
      FROM events
    ),
    s AS (
      SELECT user_id, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
             sum(x * x) AS sxx, sum(y * y) AS syy
      FROM p WHERE y IS NOT NULL
      GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS autocorr_lag1
    FROM s
    WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
    ORDER BY user_id
    """,
    doc="Lag-1 autocorrelation of each user's value series: Pearson r "
        "between consecutive samples (event-time order, event_id "
        "tie-break) — the first time-series diagnostic (white noise "
        "~0, trending/sticky ~1, mean-reverting <0), the numeric "
        "cousin of the categorical event_transition_matrix. One lag "
        "window then power sums, both riding the user_id "
        "partitioning; degenerate (zero-variance) series are "
        "excluded identically on both engines.",
    tags=("window", "statistics", "timeseries"),
)
def events_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    # one range exchange serves the lag window, the user_id groupBy
    # (clustering satisfied, no second exchange) and the tail
    # orderBy(user_id) — prefix rule (r12)
    p = ev.repartitionByRange("user_id") \
        .select("user_id", F.col("value").alias("x"),
                F.lag("value").over(w).alias("y")) \
        .where(F.col("y").isNotNull())
    x, y = F.col("x"), F.col("y")
    s = p.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"), F.sum(y * y).alias("syy"))
    n, sx, sy, sxy, sxx, syy = (F.col(c) for c in
                                ("n", "sx", "sy", "sxy", "sxx", "syy"))
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    return (
        s.where((vx > 0) & (vy > 0))
        .select("user_id", n.cast("bigint").alias("n_pairs"),
                F.round((n * sxy - sx * sy) / F.sqrt(vx * vy), 6)
                 .alias("autocorr_lag1"))
        .orderBy("user_id")
    )


@register(
    "lineitem_benford_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(floor(l_extendedprice
                        / pow(10, floor(log10(l_extendedprice))))
                  AS BIGINT) AS digit
      FROM lineitem WHERE l_extendedprice > 0
    )
    SELECT digit,
           CAST(count(*) AS BIGINT) AS n,
           round(count(*) * 1.0 / (SELECT count(*) FROM d), 6)
             AS observed_freq,
           round(log10(1 + 1.0 / digit), 6) AS benford_freq
    FROM d
    GROUP BY digit
    ORDER BY digit
    """,
    doc="Benford first-significant-digit audit of extended prices: "
        "observed digit frequencies next to the Benford expectation "
        "log10(1 + 1/d) — the classic large-scale data-quality / "
        "fabrication screen (natural multiplicative data follows it; "
        "synthetic or truncated pipelines visibly don't). Map-side "
        "digit extraction in pure expressions, one 9-group "
        "aggregation, total count as a scalar subquery (broadcast "
        "one-row aggregate).",
    tags=("aggregation", "audit", "quality"),
)
def lineitem_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem") \
        .where(F.col("l_extendedprice") > 0)
    digit = F.floor(F.col("l_extendedprice")
                    / F.pow(F.lit(10.0),
                            F.floor(F.log10("l_extendedprice")))) \
        .cast("bigint")
    d = li.select(digit.alias("digit"))
    # total as a global window over the BOUNDED digit table (<= 9
    # rows) instead of a scalar aggregate broadcast: the broadcast
    # build was a second driver job that re-scanned lineitem per
    # action (every d-row lands in exactly one digit group, so
    # sum(cnt) over () == count(*) of d). Window over <= 9 rows —
    # the orders_pareto_share gwin precedent. The bounded_sort tail
    # then drops the sort-sampling job too: 3 jobs -> 1 (r12).
    tot = F.sum("cnt").over(Window.partitionBy())
    return (
        d.groupBy("digit").agg(F.count(F.lit(1)).alias("cnt"))
        .select("digit", F.col("cnt").cast("bigint").alias("n"),
                F.round(F.col("cnt") / tot, 6)
                 .alias("observed_freq"),
                F.round(F.log10(1 + 1.0 / F.col("digit")), 6)
                 .alias("benford_freq"))
        .transform(bounded_sort, "digit")
    )


@register(
    "orders_gini_coefficient",
    oracle="""
    WITH c AS (
      SELECT o_custkey, sum(o_totalprice) AS rev
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT rev, row_number() OVER (ORDER BY rev, o_custkey) AS i
      FROM c
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           round(2.0 * sum(i * rev) / (count(*) * sum(rev))
                 - (count(*) + 1.0) / count(*), 6) AS gini
    FROM r
    """,
    doc="Gini coefficient of customer spend: the scalar inequality "
        "index behind the Pareto decile report (0 = uniform, 1 = one "
        "customer holds everything), via the rank formula "
        "G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over ascending-ranked "
        "totals — the metric used to monitor corpus source balance "
        "and revenue concentration alike. The global rank is the "
        "two-pass partition-offset builder "
        "(sources/layout.global_row_number): identical positions, "
        "no Exchange SinglePartition, bucket-parallel sorts — the "
        "plan holds even when the keyed aggregate reaches fact "
        "scale.",
    tags=("window", "analytics", "distribution"),
)
def orders_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    from radio_data_pipeline_spark.sources.layout import (
        global_row_number)

    orders = load_table(spark, sf_dir, "orders")
    # persist + deferred harness-side release: see orders_pareto_share
    c = defer_unpersist(
        orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("rev")).persist())
    r = global_row_number(
        c, [F.col("rev"), F.col("o_custkey")], rank_col="i") \
        .select("rev", "i")
    n, srev = F.count(F.lit(1)), F.sum("rev")
    return r.agg(
        n.cast("bigint").alias("n_customers"),
        F.round(2.0 * F.sum(F.col("i") * F.col("rev")) / (n * srev)
                - (n + 1.0) / n, 6).alias("gini"))


@register(
    "customer_rfm_segments",
    oracle="""
    WITH c AS (
      SELECT o_custkey, max(o_orderdate) AS last_order,
             count(*) AS frequency, sum(o_totalprice) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    m AS (SELECT max(last_order) AS maxd FROM c),
    s AS (
      SELECT o_custkey,
             CAST(date_diff('day', last_order, m.maxd) AS BIGINT) AS recency_days,
             CAST(frequency AS BIGINT) AS frequency,
             monetary,
             ntile(5) OVER (ORDER BY date_diff('day', last_order, m.maxd) DESC,
                            o_custkey) AS r_score,
             ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
             ntile(5) OVER (ORDER BY monetary, o_custkey) AS m_score
      FROM c CROSS JOIN m
    )
    SELECT o_custkey, recency_days, frequency,
           round(monetary, 2) AS monetary,
           r_score, f_score, m_score,
           CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
                WHEN f_score >= 4 THEN 'loyal'
                WHEN r_score >= 4 THEN 'recent'
                WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
                ELSE 'hibernating' END AS segment
    FROM s
    ORDER BY o_custkey
    """,
    doc="RFM customer segmentation: per-customer recency (days since "
        "last order vs corpus max date), frequency, monetary, each "
        "quintile-scored (deterministic custkey tie-breaks), then the "
        "standard champion/loyal/recent/at_risk/hibernating labels — "
        "the warehouse segmentation workload. Facts reduce to one row "
        "per customer FIRST; the three quintile scores come from the "
        "two-pass partition-offset ntile builder "
        "(sources/layout.global_ntile — bit-identical to the window "
        "form, zero Exchange SinglePartition), so the plan holds at "
        "any customer cardinality; the corpus max date rides along "
        "as a one-row broadcast aggregate, not a driver-side "
        "constant.",
    tags=("window", "analytics", "segmentation"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from radio_data_pipeline_spark.sources.layout import global_ntile

    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("o_totalprice").alias("monetary"))
    m = c.agg(F.max("last_order").alias("maxd"))
    s = defer_unpersist(
        c.crossJoin(F.broadcast(m))
        .withColumn("recency_days",
                    F.datediff("maxd", "last_order").cast("bigint"))
        .persist())
    # DESC numeric orderings spelled as ASC negations; custkey breaks
    # every tie, so the total order (and thus each score) is exact.
    # The three scores rank the PERSISTED base independently and join
    # back by key — chained on an unpersisted frame, each builder's
    # three driver-side jobs re-executed the full upstream lineage
    # including the previous ntile's offset join (~12 fact scans
    # where one suffices). The persisted base also backs the FOUR
    # references to `s` in the returned lazy plan; released
    # harness-side via registry.release_deferred() (r7 ADVICE — no
    # eager localCheckpoint, the plan stays auditable)
    out = s
    for cols, name in (
            ([-F.col("recency_days"), F.col("o_custkey")], "r_score"),
            ([F.col("frequency"), F.col("o_custkey")], "f_score"),
            ([F.col("monetary"), F.col("o_custkey")], "m_score")):
        out = out.join(global_ntile(s, cols, 5, tile_col=name)
                       .select("o_custkey", name), "o_custkey")
    segment = (
        F.when((F.col("r_score") >= 4) & (F.col("f_score") >= 4),
               "champion")
        .when(F.col("f_score") >= 4, "loyal")
        .when(F.col("r_score") >= 4, "recent")
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 3),
              "at_risk")
        .otherwise("hibernating"))
    return (
        out.select("o_custkey", "recency_days",
                   F.col("frequency").cast("bigint").alias("frequency"),
                   F.round("monetary", 2).alias("monetary"),
                   "r_score", "f_score", "m_score",
                   segment.alias("segment"))
        .orderBy("o_custkey"))


_AFFINITY_MIN_CO = 5


@register(
    "part_type_affinity",
    oracle=f"""
    WITH ot AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_type AS t
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT count(DISTINCT ok) AS n FROM ot),
    s AS (SELECT t, count(*) AS c FROM ot GROUP BY t),
    j AS (
      SELECT a.t AS type_a, b.t AS type_b, count(*) AS c_ab
      FROM ot a JOIN ot b ON a.ok = b.ok AND a.t < b.t
      GROUP BY a.t, b.t
    )
    SELECT type_a, type_b,
           CAST(c_ab AS BIGINT) AS n_co_orders,
           round(c_ab * 1.0 * (SELECT n FROM n) / (sa.c * 1.0 * sb.c), 6)
             AS lift
    FROM j
    JOIN s sa ON j.type_a = sa.t
    JOIN s sb ON j.type_b = sb.t
    WHERE c_ab >= {_AFFINITY_MIN_CO}
    ORDER BY type_a, type_b
    """,
    doc="Market-basket affinity: lift = P(a,b) / (P(a) P(b)) for every "
        "part-type pair co-occurring in >= 5 orders (lift > 1 = "
        "bought together more than chance) — the association-rule "
        "primitive behind recommenders and co-occurrence embeddings. "
        "Baskets are (order, type) DISTINCT pairs (part dimension "
        "broadcast onto lineitem), the pair join is the SAME "
        "bounded-fanout self-join as the co-purchase graph (<= 7 "
        "lines/order caps pairs per order at 21), marginals are "
        "broadcast back, and the min-support cut applies BEFORE any "
        "wide output materializes.",
    tags=("analytics", "association", "join"),
)
def part_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    # persist the basket table for the within-query diamond (r12):
    # ot feeds FOUR consumers (the grand total, the per-type
    # marginals, and both sides of the pair self-join), and without
    # the persist each broadcast build re-executed the lineitem-part
    # join + distinct per action (6 driver jobs in the r12 count_jobs
    # sweep). Released via release_deferred (the registry's
    # global-rank-builder convention, §20 timing semantics); the
    # persisted frame is the deduped (order, type) pairs — the same
    # magnitude class as the gini/pareto per-customer aggregate, and
    # storing it once beats recomputing the join three more times at
    # any scale (MEMORY_AND_DISK spills, never fails).
    ot = defer_unpersist(
        (li.join(F.broadcast(part),
                 li["l_partkey"] == part["p_partkey"])
         .select(F.col("l_orderkey").alias("ok"),
                 F.col("p_type").alias("t"))
         .distinct()).persist())
    n = ot.agg(F.countDistinct("ok").alias("n"))
    s = ot.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    a, b = ot.alias("a"), ot.alias("b")
    j = (a.join(b, (F.col("a.ok") == F.col("b.ok"))
                & (F.col("a.t") < F.col("b.t")))
         .groupBy(F.col("a.t").alias("type_a"),
                  F.col("b.t").alias("type_b"))
         .agg(F.count(F.lit(1)).alias("c_ab"))
         .where(F.col("c_ab") >= _AFFINITY_MIN_CO))
    sa = s.select(F.col("t").alias("ta"), F.col("c").alias("ca"))
    sb = s.select(F.col("t").alias("tb"), F.col("c").alias("cb"))
    return (
        j.join(F.broadcast(sa), j["type_a"] == sa["ta"])
        .join(F.broadcast(sb), j["type_b"] == sb["tb"])
        .crossJoin(F.broadcast(n))
        .select("type_a", "type_b",
                F.col("c_ab").cast("bigint").alias("n_co_orders"),
                F.round(F.col("c_ab") * F.col("n")
                        / (F.col("ca") * 1.0 * F.col("cb")), 6)
                 .alias("lift"))
        .orderBy("type_a", "type_b")
    )


@register(
    "orders_priority_month_chi2",
    oracle="""
    WITH x AS (
      SELECT o_orderpriority AS pri, month(o_orderdate) AS mo
      FROM orders
    ),
    o AS (SELECT pri, mo, count(*) AS obs FROM x GROUP BY pri, mo),
    rp AS (SELECT pri, count(*) AS cp FROM x GROUP BY pri),
    rm AS (SELECT mo, count(*) AS cm FROM x GROUP BY mo),
    n AS (SELECT count(*) AS n FROM x),
    cells AS (
      SELECT rp.pri, rm.mo,
             coalesce(o.obs, 0) AS obs,
             rp.cp * 1.0 * rm.cm / (SELECT n FROM n) AS expected
      FROM rp CROSS JOIN rm
      LEFT JOIN o ON o.pri = rp.pri AND o.mo = rm.mo
    )
    SELECT CAST((SELECT n FROM n) AS BIGINT) AS n_orders,
           CAST(((SELECT count(*) FROM rp) - 1)
                * ((SELECT count(*) FROM rm) - 1) AS BIGINT) AS dof,
           round(sum((obs - expected) * (obs - expected) / expected), 6)
             AS chi2
    FROM cells
    """,
    doc="Chi-square independence test of order priority vs calendar "
        "month: observed cell counts against marginal-product "
        "expectations over the FULL category cross (zero-observed "
        "cells contribute their expectation — a left join against "
        "the marginal cross, not just the observed cells) — the "
        "categorical drift/seasonality screen a pipeline runs before "
        "trusting a month's data mix, complementing the Benford "
        "digit audit. Facts reduce to the contingency table first; "
        "the 60-cell cross and all marginals are broadcast-sized.",
    tags=("aggregation", "audit", "statistics"),
)
def orders_priority_month_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    x = orders.select(F.col("o_orderpriority").alias("pri"),
                      F.month("o_orderdate").alias("mo"))
    # ONE orders pass (r12): the previous shape aggregated the fact
    # table FOUR independent ways (cell counts + both marginals + the
    # grand total), and every broadcast build re-ran the orders scan —
    # 6 driver jobs per action in the r12 count_jobs sweep. Every
    # marginal is derivable from the contingency table itself (each
    # order lands in exactly one (pri, mo) cell, so count-per-pri ==
    # sum of cell counts over mo, etc.), so aggregate once into the
    # BOUNDED <= 60-row cell table, persist it for the within-query
    # diamond (released via release_deferred, the registry's
    # global-rank-builder convention), and derive marginals/totals
    # from those 60 rows.
    o = defer_unpersist(
        x.groupBy("pri", "mo").agg(F.count(F.lit(1)).alias("obs"))
        .persist())
    rp = o.groupBy("pri").agg(F.sum("obs").alias("cp"))
    rm = o.groupBy("mo").agg(F.sum("obs").alias("cm"))
    n = o.agg(F.sum("obs").alias("n"))
    np_ = rp.agg(F.count(F.lit(1)).alias("np"))
    nm = rm.agg(F.count(F.lit(1)).alias("nm"))
    cells = (rp.crossJoin(rm)
             .join(o, ["pri", "mo"], "left")
             .crossJoin(F.broadcast(n))
             .select(F.coalesce("obs", F.lit(0)).alias("obs"),
                     (F.col("cp") * 1.0 * F.col("cm") / F.col("n"))
                     .alias("expected")))
    chi2 = cells.agg(
        F.round(F.sum((F.col("obs") - F.col("expected"))
                      * (F.col("obs") - F.col("expected"))
                      / F.col("expected")), 6).alias("chi2"))
    return (
        chi2.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(np_))
        .crossJoin(F.broadcast(nm))
        .select(F.col("n").cast("bigint").alias("n_orders"),
                ((F.col("np") - 1) * (F.col("nm") - 1)).cast("bigint")
                 .alias("dof"),
                "chi2")
    )
