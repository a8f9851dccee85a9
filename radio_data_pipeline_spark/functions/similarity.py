"""Embedding similarity search: brute-force cosine top-k (baseline)
and an LSH-bucketed variant (the scale path).

Dot products and norms are in-order folds over the array column
(`F.aggregate`) — JVM-side, no explode, no Python. The LSH variant
hashes vectors to sign-pattern buckets of R random hyperplanes so the
candidate set per query is |bucket| instead of N; hyperplanes are
generated driver-side from a fixed seed and folded into literal
expressions (they are metadata, like the reference's frequency axis).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(_as_double(a), _as_double(b),
                                  lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(_as_double(a), F.lit(0.0),
                              lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def _query_literal(query_vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in query_vec])


def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id",
                ) -> DataFrame:
    """Brute-force exact top-k by cosine: one map stage + a global
    TakeOrdered (no sort shuffle). The O(N·d) scan is the correctness
    baseline the ANN variants are judged against."""
    q = _query_literal(query_vec)
    return (
        df.select(F.col(id_col),
                  F.round(cosine_similarity(F.col(vec_col), q), 6)
                  .alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-pattern bucket id: bit r set iff <v, plane_r> > 0."""
    bucket = F.lit(0).cast("long")
    for r, plane in enumerate(planes):
        proj = dot_product(vec_col, _query_literal(list(plane)))
        bucket = bucket + F.when(proj > 0, F.lit(2 ** r).cast("long")) \
                           .otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_bucket_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                    n_planes: int = 6, seed: int = 7,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    ) -> DataFrame:
    """Approximate top-k: restrict the cosine scan to the query's LSH
    bucket. At scale the table is written bucketed/partitioned by this
    bucket id, so the scan prunes to ~N/2^R rows before any compute;
    here the bucket predicate is evaluated inline."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qvec = np.asarray(query_vec, dtype=float)
    q_bucket = int(sum((1 << r) for r, p in enumerate(planes)
                       if float(np.dot(p, qvec)) > 0))
    bucketed = df.withColumn("_bucket", lsh_bucket(F.col(vec_col), planes))
    q = _query_literal(query_vec)
    return (
        bucketed.filter(F.col("_bucket") == q_bucket)
        .select(F.col(id_col),
                F.round(cosine_similarity(F.col(vec_col), q), 6)
                .alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
