"""Reusable distributed-graph primitives over edge DataFrames.

The registered plan queries (plans/graph.py) bind these to the
co-purchase graph; the functions themselves take ANY canonical
undirected edge list, so property tests can drive them with random
graphs against brute-force references (tests/test_wave5_properties.py)
and library users can point them at their own edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_stats(und: DataFrame) -> DataFrame:
    """Exact triangle count + global clustering coefficient.

    ``und`` must be a canonical undirected edge list: columns
    ``u < v``, one row per edge, no duplicates, no self-loops.

    Degree-ordered node-iterator: orient every edge from its
    (degree, id)-smaller endpoint, enumerate wedges by self-joining
    oriented edges on the source, close them against the oriented
    edge list. The orientation bounds every out-neighborhood by
    O(sqrt(|E|)) — the hub-node guard that keeps the wedge join
    sub-quadratic on power-law graphs. Three hash joins, no driver
    round trips.

    The edge list feeds three consumers (degrees, orientation, edge
    count) and the oriented list three more (both wedge sides + the
    closing probe); both are lazily localCheckpoint-ed. Measured
    honestly (sf0.1 co-purchase graph): within a SINGLE action
    Spark's ReusedExchange already dedupes the identical subtrees, so
    a fresh execution is unchanged (~13.5 s either way) — the wins
    are (a) repeated actions on the same DataFrame skip the edge
    rebuild entirely (13.5 s -> 8.2 s re-run, the interactive /
    multi-metric pattern), and (b) the physical plan shrinks from a
    6x-duplicated tree to one reference, cutting codegen compile on
    the cold run (~29 s -> ~20 s). Lazy, so building the plan
    schedules no job. Same multi-consumer materialization rule
    pipeline.py applies to segmentation subtrees.
    """
    und = und.localCheckpoint(eager=False)
    deg = (und.select(F.col("u").alias("node"))
           .unionAll(und.select(F.col("v").alias("node")))
           .groupBy("node")
           .agg(F.count(F.lit(1)).cast("bigint").alias("d")))
    # (degree, id) total order as a STRUCT key — lexicographic struct
    # comparison gives the exact (d, node) order with no numeric
    # packing, so arbitrary id ranges (TPC-H partkey at SF >= 5000
    # exceeds any fixed pack base) cannot collide or misorder
    k = deg.select("node", F.struct("d", "node").alias("okey"))
    ku = k.select(F.col("node").alias("u"), F.col("okey").alias("ukey"))
    kv = k.select(F.col("node").alias("v"), F.col("okey").alias("vkey"))
    o = (und.join(ku, "u").join(kv, "v")
         .select(
             F.when(F.col("ukey") < F.col("vkey"), F.col("u"))
             .otherwise(F.col("v")).alias("src"),
             F.when(F.col("ukey") < F.col("vkey"), F.col("vkey"))
             .otherwise(F.col("ukey")).alias("dst_key"),
             F.when(F.col("ukey") < F.col("vkey"), F.col("v"))
             .otherwise(F.col("u")).alias("dst"))
         .localCheckpoint(eager=False))
    e1 = o.select(F.col("src").alias("s1"), F.col("dst_key").alias("k1"),
                  F.col("dst").alias("d1"))
    e2 = o.select(F.col("src").alias("s2"), F.col("dst_key").alias("k2"),
                  F.col("dst").alias("d2"))
    wedges = e1.join(e2, (F.col("s1") == F.col("s2"))
                     & (F.col("k1") < F.col("k2")))
    tri = (wedges.join(o, (F.col("src") == F.col("d1"))
                       & (F.col("dst") == F.col("d2")))
           .agg(F.count(F.lit(1)).alias("t")))
    wedge_total = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / F.lit(2)).cast("bigint")
        .alias("w"))
    n_nodes = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    n_edges = und.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return (
        n_nodes.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .crossJoin(F.broadcast(wedge_total))
        .select("n_nodes", "n_edges",
                F.col("t").cast("bigint").alias("n_triangles"),
                F.col("w").alias("n_wedges"),
                F.when(F.col("w") > 0,
                       F.round(F.lit(3.0) * F.col("t") / F.col("w"), 6))
                .alias("global_clustering"))
    )
