"""Pin that AQE's skew-join splitting — the mechanism the scale story
leans on for hot keys (SURVEY §9, session.py skewJoin.enabled) —
actually ENGAGES on a skewed sort-merge join, rather than existing
only as a config line. Thresholds are lowered so the toy-sized build
crosses AQE's size triggers; on a cluster the defaults (256 MB
partition, 5x median) play the same role.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partitions(spark):
    old = {
        k: spark.conf.get(k, None) for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        # one hot key (0) carrying ~300k rows vs 100 cold keys; forbid
        # broadcast so the join must shuffle, and drop AQE's skew
        # thresholds under the hot partition's size
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "256KB")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        # payload must be incompressible and survive column pruning
        # into the shuffle, or the hot partition compresses below the
        # skew threshold and AQE (correctly) coalesces instead
        big = spark.range(300_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 100).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"))
        dim = spark.range(100).select(
            F.col("id").alias("k"),
            F.concat(F.lit("name_"), F.col("id")).alias("name"))

        joined = big.join(dim, "k")
        rows = joined.collect()      # executes THIS plan, so AQE
        assert len(rows) == 300_000  # finalizes it (count() would
                                     # build a separate execution)

        executed = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in executed
        assert "SortMergeJoin" in executed or "ShuffledHashJoin" in executed
        assert "skew=true" in executed, (
            "AQE did not mark the skewed join; plan:\n" + executed[:2000])
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_sessionize_equals_unsalted_form(spark):
    """salted_sessionize == the plain single-window sessionization,
    exactly — including sessions that SPAN bucket boundaries (merge),
    chained merges across 3+ buckets, buckets with one event, and
    multi-bucket gaps (r5 verdict #6)."""
    import random

    from pyspark.sql import Window

    from radio_data_pipeline_spark.operators.skew import (
        salted_sessionize,
    )

    rng = random.Random(42)
    day = 1000  # bucket width in fake ts units
    gap = 50
    rows = []
    eid = 0
    for user in range(5):
        t = rng.randrange(100)
        for _ in range(rng.randrange(150, 250)):
            # mix of small steps (same session, often crossing a
            # bucket edge), exact-gap steps, and big jumps
            t += rng.choice([1, 5, gap, gap + 1, 300, 2500])
            rows.append((user, t, eid))
            eid += 1
    # one user entirely inside a single bucket
    rows += [(9, 10 + i, 10_000 + i) for i in range(5)]
    # one session deliberately spanning 4 buckets: steps < gap forever
    t = 950
    for i in range(200):
        t += 20
        rows.append((8, t, 20_000 + i))
    df = spark.createDataFrame(rows, "user long, ts long, eid long")

    got = salted_sessionize(
        df, "user", "ts", gap,
        bucket=F.floor(F.col("ts") / day), tiebreak_cols=("eid",))

    w = Window.partitionBy("user").orderBy("ts", "eid")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts").over(w)
    want = (df.withColumn(
        "_f", F.when(prev.isNull() | (F.col("ts") - prev > gap), 1)
               .otherwise(0))
        .withColumn("session_id", F.sum("_f").over(wrun).cast("long"))
        .drop("_f"))

    g = {(r["user"], r["eid"]): r["session_id"] for r in got.collect()}
    x = {(r["user"], r["eid"]): r["session_id"] for r in want.collect()}
    assert g == x
    assert set(got.columns) == {"user", "ts", "eid", "session_id"}
