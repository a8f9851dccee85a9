"""Analytics wave 4: sketch-based frequency estimation, tolerance
as-of joins, spectral embedding analysis, and diversified retrieval —
four operator families that round out the engine's ML-adjacent
surface.

- **Count-min heavy hitters** (`countmin_heavy_hitters`): the
  mergeable frequency sketch. Like the bloom decontamination
  operator, the sketch arithmetic (d hash rows x w counters,
  estimate = min over rows) is md5-derived and bit-exactly mirrored
  in the oracle, so the OVERESTIMATES — the sketch's defining error —
  are deterministic and asserted, not hand-waved. Scale: the sketch
  is a d*w-cell aggregate (map-side combinable, fixed size regardless
  of key cardinality); estimates for the report's top keys probe d
  cells each.
- **Tolerance as-of join** (`events_asof_tolerance`): the
  merge-asof(tolerance=...) semantics — each purchase matched to the
  most recent SAME-USER view no older than the tolerance window.
  Same single-pass IGNORE NULLS window as events_asof_prior_view
  (linear, no range join), plus the gap bound as a post-filter; the
  matched gap is emitted so downstream attribution can weight by
  recency.
- **Power-iteration top singular dimension**
  (`embedding_top_singular_dim`): dominant right singular vector of
  the embedding matrix via two power iterations on the d x d Gram
  matrix. The Gram is computed in ONE distributed pass (explode to
  (i, j, v_i*v_j) and sum — at 100 TB you'd accumulate per-partition
  d x d outer products via treeAggregate, which is the same
  aggregation tree with a denser per-task accumulator); the
  iterations then run on the d^2-row Gram table, broadcast-sized.
  Fully relational, so the oracle replays it exactly.
- **MMR diversified retrieval** (`mmr_diversified_topk`): maximal
  marginal relevance — greedy top-k that trades relevance against
  similarity to already-selected results. Greedy selection is
  inherently sequential, so the candidate pool is first cut to the
  relevance top-20 (distributed TakeOrdered) and the k=3 unrolled
  selection runs over that tiny pool as three broadcast-joined
  argmax steps; scores are rounded to 9 decimals before each argmax
  so the greedy path is engine-exact.

No reference analogue; SURVEY §2.8 driver-extension components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from radio_data_pipeline_spark.plans.registry import register
from radio_data_pipeline_spark.sources.parquet import (
    load_table,
    load_table_fanned,
)

# --------------------------------------------------------------- count-min

_CMS_D = 3       # hash rows
_CMS_W = 1024    # counters per row
_CMS_TOPN = 10


def _cms_pos(key: F.Column, j: int) -> F.Column:
    return (F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{j}|"), key.cast("string"))), 1, 8), 16, 10)
        .cast("long") % _CMS_W)


def _cms_pos_sql(key_expr: str, j_expr: str) -> str:
    return (f"(('0x' || substr(md5(CAST({j_expr} AS VARCHAR) || '|' || "
            f"CAST({key_expr} AS VARCHAR)), 1, 8))::BIGINT % {_CMS_W})")


@register(
    "countmin_heavy_hitters",
    oracle=f"""
    WITH idx AS (SELECT unnest(range({_CMS_D})) AS j),
    cms AS (
      SELECT idx.j, {_cms_pos_sql('e.user_id', 'idx.j')} AS pos,
             count(*) AS c
      FROM events e, idx
      GROUP BY idx.j, pos
    ),
    exact AS (
      SELECT user_id, count(*) AS exact_n
      FROM events GROUP BY user_id
      ORDER BY exact_n DESC, user_id
      LIMIT {_CMS_TOPN}
    ),
    est AS (
      SELECT x.user_id, x.exact_n, min(cms.c) AS est_n
      FROM exact x, idx
      JOIN cms ON cms.j = idx.j
             AND cms.pos = {_cms_pos_sql('x.user_id', 'idx.j')}
      GROUP BY x.user_id, x.exact_n
    )
    SELECT user_id, CAST(exact_n AS BIGINT) AS exact_n,
           CAST(est_n AS BIGINT) AS est_n,
           CAST(est_n - exact_n AS BIGINT) AS overestimate
    FROM est
    ORDER BY exact_n DESC, user_id
    """,
    doc="Count-min sketch frequency estimation (d=3 x w=1024, "
        "md5-derived positions): per-user event counts estimated as "
        "min over the d counter rows, reported for the exact top-10 "
        "users with the sketch's overestimate. The sketch build is "
        "one fixed-size (d*w cells) map-side-combinable aggregate — "
        "the 100 TB path for frequency questions where per-key exact "
        "counts would shuffle the world; estimates never "
        "underestimate (asserted in tests), and the oracle replays "
        "the identical hash arithmetic so the overestimates match "
        "bit-exactly.",
    tags=("sketch", "approx", "frequency"),
)
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cms = (
        ev.select(F.posexplode(F.array(
            *[_cms_pos(F.col("user_id"), j) for j in range(_CMS_D)]))
            .alias("j", "pos"))
        .groupBy("j", "pos")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = (ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
             .orderBy(F.desc("exact_n"), "user_id")
             .limit(_CMS_TOPN))
    probes = exact.select(
        "user_id", "exact_n",
        F.posexplode(F.array(
            *[_cms_pos(F.col("user_id"), j) for j in range(_CMS_D)]))
        .alias("j", "pos"))
    return (
        probes.join(cms, ["j", "pos"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("c").alias("est_n"))
        .select("user_id",
                F.col("exact_n").cast("bigint").alias("exact_n"),
                F.col("est_n").cast("bigint").alias("est_n"),
                (F.col("est_n") - F.col("exact_n")).cast("bigint")
                .alias("overestimate"))
        .orderBy(F.desc("exact_n"), "user_id")
    )


# ------------------------------------------------------- tolerance as-of

_ASOF_TOL_US = 30 * 60 * 1_000_000  # 30 minutes


@register(
    "events_asof_tolerance",
    oracle=f"""
    SELECT event_id, user_id, prior_view_event,
           epoch_us(ts) - prior_view_ts_us AS gap_us
    FROM (
      SELECT event_id, user_id, event_type, ts,
             last_value(CASE WHEN event_type = 'view' THEN event_id END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prior_view_event,
             last_value(CASE WHEN event_type = 'view'
                             THEN epoch_us(ts) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prior_view_ts_us
      FROM events
    )
    WHERE event_type = 'purchase' AND prior_view_event IS NOT NULL
      AND epoch_us(ts) - prior_view_ts_us <= {_ASOF_TOL_US}
    ORDER BY event_id
    """,
    doc="As-of join with tolerance (merge_asof(tolerance=30min) "
        "semantics): each purchase matched to the most recent "
        "same-user view no older than 30 minutes, with the matched "
        "gap emitted for recency-weighted attribution. Same "
        "single-pass IGNORE NULLS window as events_asof_prior_view — "
        "linear in events, one user_id-keyed sort shuffle, no range "
        "join — the tolerance is a pure post-filter. Exact integer "
        "micros per the events contract.",
    tags=("window", "asof", "range"),
)
def events_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts_us", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    is_view = F.col("event_type") == "view"
    out = ev.select(
        "event_id", "user_id", "event_type", "ts_us",
        F.last(F.when(is_view, F.col("event_id")), ignorenulls=True)
        .over(w).alias("prior_view_event"),
        F.last(F.when(is_view, F.col("ts_us")), ignorenulls=True)
        .over(w).alias("prior_view_ts_us"))
    return (
        out.filter((F.col("event_type") == "purchase")
                   & F.col("prior_view_event").isNotNull()
                   & ((F.col("ts_us") - F.col("prior_view_ts_us"))
                      <= _ASOF_TOL_US))
        .select("event_id", "user_id", "prior_view_event",
                (F.col("ts_us") - F.col("prior_view_ts_us")).alias("gap_us"))
        .orderBy("event_id")
    )


# ------------------------------------------- power-iteration top component

@register(
    "embedding_top_singular_dim",
    oracle="""
    WITH x AS (
      SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    gram AS (
      SELECT a.i AS i, b.i AS j, sum(a.v * b.v) AS g
      FROM x a JOIN x b ON a.vec_id = b.vec_id
      GROUP BY a.i, b.i
    ),
    d AS (SELECT count(DISTINCT i) AS d FROM gram),
    v1r AS (
      SELECT i, sum(g / sqrt(d.d)) AS u FROM gram, d GROUP BY i
    ),
    n1 AS (SELECT sqrt(sum(u * u)) AS nrm FROM v1r),
    v1 AS (SELECT i, u / n1.nrm AS v FROM v1r, n1),
    v2r AS (
      SELECT gram.i, sum(gram.g * v1.v) AS u
      FROM gram JOIN v1 ON gram.j = v1.i
      GROUP BY gram.i
    ),
    n2 AS (SELECT sqrt(sum(u * u)) AS nrm FROM v2r),
    v2 AS (SELECT i, u / n2.nrm AS v FROM v2r, n2)
    SELECT CAST(i AS INT) AS pos, round(v, 6) AS component
    FROM v2
    ORDER BY pos
    """,
    doc="Dominant right singular vector of the embedding matrix via "
        "two power iterations on the d x d Gram: the first principal "
        "axis of the corpus (uncentered), the building block of "
        "spectral whitening / low-rank probes. The Gram is ONE "
        "distributed pass (explode to (i, j, v_i*v_j), sum — at "
        "100 TB the same tree aggregates per-partition d x d outer "
        "products, identical math, denser accumulator); the "
        "iterations run on the d^2-row broadcast-sized Gram, so no "
        "driver-side linear algebra and no iteration over the data. "
        "Deterministic: v0 = ones/sqrt(d), fixed two steps.",
    tags=("linalg", "embedding", "spectral"),
)
def embedding_top_singular_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table_fanned(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        (F.posexplode(F.col("embedding").cast("array<double>"))
         .alias("i0", "v"))).select(
        "vec_id", (F.col("i0") + 1).alias("i"), "v")
    gram = (
        x.alias("a").join(x.alias("b"), F.col("a.vec_id") == F.col("b.vec_id"))
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.sum(F.col("a.v") * F.col("b.v")).alias("g"))
    )
    d = gram.agg(F.countDistinct("i").alias("d"))
    v1r = (gram.crossJoin(F.broadcast(d))
           .groupBy("i")
           .agg(F.sum(F.col("g") / F.sqrt(F.col("d"))).alias("u")))
    n1 = v1r.agg(F.sqrt(F.sum(F.col("u") * F.col("u"))).alias("nrm"))
    v1 = (v1r.crossJoin(F.broadcast(n1))
          .select("i", (F.col("u") / F.col("nrm")).alias("v")))
    v2r = (gram.join(v1.withColumnRenamed("i", "j"), "j")
           .groupBy("i")
           .agg(F.sum(F.col("g") * F.col("v")).alias("u")))
    n2 = v2r.agg(F.sqrt(F.sum(F.col("u") * F.col("u"))).alias("nrm"))
    return (
        v2r.crossJoin(F.broadcast(n2))
        .select(F.col("i").cast("int").alias("pos"),
                F.round(F.col("u") / F.col("nrm"), 6).alias("component"))
        .orderBy("pos")
    )


# --------------------------------------------------------- MMR retrieval

_MMR_POOL = 20
_MMR_LAMBDA = 0.5


def _cos_sql(a: str, b: str) -> str:
    return (f"(list_dot_product({a}, {b}) / "
            f"(sqrt(list_dot_product({a}, {a})) * "
            f"sqrt(list_dot_product({b}, {b}))))")


@register(
    "mmr_diversified_topk",
    oracle=f"""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
      WHERE vec_id = 0
    ),
    pool AS (
      SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS ev,
             round({_cos_sql('CAST(e.embedding AS DOUBLE[])', 'q.qv')}, 9)
               AS rel
      FROM embeddings e, q
      WHERE e.vec_id <> 0
      ORDER BY rel DESC, e.vec_id
      LIMIT {_MMR_POOL}
    ),
    s1 AS (SELECT vec_id, ev, rel FROM pool
           ORDER BY rel DESC, vec_id LIMIT 1),
    r2 AS (
      SELECT p.vec_id, p.ev, p.rel,
             round(p.rel - {_MMR_LAMBDA} *
                   round({_cos_sql('p.ev', 's1.ev')}, 9), 9) AS score
      FROM pool p, s1 WHERE p.vec_id <> s1.vec_id
    ),
    s2 AS (SELECT vec_id, ev, rel, score FROM r2
           ORDER BY score DESC, vec_id LIMIT 1),
    r3 AS (
      SELECT p.vec_id, p.rel,
             round(p.rel - {_MMR_LAMBDA} * greatest(
                   round({_cos_sql('p.ev', 's1.ev')}, 9),
                   round({_cos_sql('p.ev', 's2.ev')}, 9)), 9) AS score
      FROM pool p, s1, s2
      WHERE p.vec_id <> s1.vec_id AND p.vec_id <> s2.vec_id
    ),
    s3 AS (SELECT vec_id, rel, score FROM r3
           ORDER BY score DESC, vec_id LIMIT 1)
    SELECT 1 AS rank, vec_id, round(rel, 6) AS relevance,
           round(rel, 6) AS mmr_score FROM s1
    UNION ALL
    SELECT 2, vec_id, round(rel, 6), round(score, 6) FROM s2
    UNION ALL
    SELECT 3, vec_id, round(rel, 6), round(score, 6) FROM s3
    ORDER BY rank
    """,
    doc="Maximal marginal relevance retrieval (k=3, lambda=0.5): "
        "greedy top-k trading query relevance against similarity to "
        "already-selected results — the diversified-retrieval "
        "operator behind dedup-aware RAG candidate selection. Greedy "
        "selection is sequential by definition, so the pool is first "
        "cut to the relevance top-20 via distributed TakeOrdered; "
        "the k=3 unrolled selection then runs as three one-row "
        "broadcast argmax steps over the tiny pool. Scores rounded "
        "to 9 decimals before each argmax so the greedy path is "
        "engine-exact; ties break on vec_id.",
    tags=("similarity", "retrieval", "mmr"),
)
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from radio_data_pipeline_spark.plans.arrays import _query_vec
    emb = load_table_fanned(spark, sf_dir, "embeddings")
    qarr = F.array(*[F.lit(v) for v in _query_vec(emb)]) \
        .cast("array<double>")

    def dot(a: F.Column, b: F.Column) -> F.Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x)

    def cos(a: F.Column, b: F.Column) -> F.Column:
        return F.round(
            dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b))), 9)

    ev = F.col("embedding").cast("array<double>")
    pool = (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", ev.alias("ev"), cos(ev, qarr).alias("rel"))
        .orderBy(F.desc("rel"), "vec_id")
        .limit(_MMR_POOL)
        # the pool feeds every greedy step (s1, r2, r3) and ends in
        # TakeOrderedAndProject, which has NO exchange for Spark's
        # ReusedExchange to dedupe — without materialization the
        # scan+cosine+top-k subtree re-runs ~6x per action
        .localCheckpoint(eager=False)
    )
    s1 = (pool.orderBy(F.desc("rel"), "vec_id").limit(1)
          .select(F.col("vec_id").alias("s1_id"), F.col("ev").alias("s1_ev"),
                  F.col("rel").alias("s1_rel")))
    r2 = (pool.crossJoin(F.broadcast(s1))
          .filter(F.col("vec_id") != F.col("s1_id"))
          .withColumn("score", F.round(
              F.col("rel") - _MMR_LAMBDA
              * cos(F.col("ev"), F.col("s1_ev")), 9)))
    s2 = (r2.orderBy(F.desc("score"), "vec_id").limit(1)
          .select(F.col("vec_id").alias("s2_id"), F.col("ev").alias("s2_ev"),
                  F.col("rel").alias("s2_rel"),
                  F.col("score").alias("s2_score")))
    r3 = (pool.crossJoin(F.broadcast(s1)).crossJoin(F.broadcast(s2))
          .filter((F.col("vec_id") != F.col("s1_id"))
                  & (F.col("vec_id") != F.col("s2_id")))
          .withColumn("score", F.round(
              F.col("rel") - _MMR_LAMBDA * F.greatest(
                  cos(F.col("ev"), F.col("s1_ev")),
                  cos(F.col("ev"), F.col("s2_ev"))), 9)))
    s3 = (r3.orderBy(F.desc("score"), "vec_id").limit(1)
          .select(F.col("vec_id").alias("s3_id"),
                  F.col("rel").alias("s3_rel"),
                  F.col("score").alias("s3_score")))
    one = (s1.select(F.lit(1).alias("rank"),
                     F.col("s1_id").alias("vec_id"),
                     F.round("s1_rel", 6).alias("relevance"),
                     F.round("s1_rel", 6).alias("mmr_score")))
    two = (s2.select(F.lit(2).alias("rank"),
                     F.col("s2_id").alias("vec_id"),
                     F.round("s2_rel", 6).alias("relevance"),
                     F.round("s2_score", 6).alias("mmr_score")))
    three = (s3.select(F.lit(3).alias("rank"),
                       F.col("s3_id").alias("vec_id"),
                       F.round("s3_rel", 6).alias("relevance"),
                       F.round("s3_score", 6).alias("mmr_score")))
    return one.unionAll(two).unionAll(three).orderBy("rank")
