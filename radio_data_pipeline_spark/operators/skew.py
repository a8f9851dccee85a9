"""Skew mitigation: salted joins.

AQE's skew-join split (enabled in session.py) handles most skew by
splitting oversized shuffle partitions, but it only works for
sort-merge joins with statistics; salting is the explicit fallback
when one join key dominates (the classic hot-user / null-key / default
-value problem at 100 TB): the big side spreads each hot key over
``n_salts`` shuffle partitions, the small side is replicated
``n_salts`` times, and the join key becomes (key, salt).

Cost model: small-side replication multiplies its shuffle volume by
n_salts — use only when the small side is orders of magnitude smaller
(if it fits in a broadcast, broadcast instead; salting is for the
mid-size dimension that is too big to broadcast but joins a skewed
fact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Join `big` (skewed) with `small` on `key`, spreading each big-
    side key over n_salts partitions. Result equals big.join(small,
    key, how) exactly (asserted in tests) for big-side-preserving join
    types; right/full outer are rejected because unmatched small-side
    rows would surface once per salt replica. Salt derivation hashes
    the whole big row, so even a single hot key value distributes
    evenly and the operation stays deterministic."""
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi", "left_anti", "leftanti",
               "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched "
            "small-side rows would be emitted once per salt replica; "
            "use a plain join (with AQE skew handling) for right/full "
            "outer")
    salt: Column = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                          F.lit(n_salts)).cast("int")
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return big_s.join(small_s, [key, "_salt"], how).drop("_salt")


def salted_sessionize(df: DataFrame, key_col: str, ts_col: str,
                      gap: int, bucket: Column,
                      tiebreak_cols: tuple[str, ...] = (),
                      session_col: str = "session_id") -> DataFrame:
    """Gap-based sessionization whose window key is salted by a
    calendar bucket — the mitigation BENCH_SCALING §12 prescribes for
    the sessionize family's one hazard at 100 TB: a hot key's rows all
    land in ONE window task (a 1%-hot-key day at corpus scale is ~1 TB
    of single-task sort). Result is EXACTLY the unsalted
    lag->flag->running-sum sessionization (pinned by equivalence
    test): per (key, bucket) the heavy window computes local session
    ids, then a per-(key, bucket) SUMMARY — one row per key-bucket,
    thousands of times smaller than the events — is stitched across
    buckets (merge a bucket's first session into the previous
    bucket's last when the boundary gap is within ``gap``; offset the
    rest), and the per-bucket base/merge pair joins back on
    (key, bucket). The hot key's single-task bound drops from ALL its
    rows to its rows per bucket; the stitch window is per key over
    #buckets rows, not #events.

    ``bucket`` must be a NONDECREASING function of ``ts_col`` (a
    calendar truncation: day, hour) — bucket order is session order.
    ``ts_col`` is numeric (epoch micros/nanos); ``gap`` is in the same
    unit. ``tiebreak_cols`` disambiguate equal timestamps (same
    contract as the unsalted form: without a unique ordering the
    running count is engine-nondeterministic). Appends ``session_col``
    (1-based per key, in time order)."""
    from pyspark.sql import Window

    order = [ts_col, *tiebreak_cols]
    b = df.withColumn("_sb", bucket)
    w_loc = Window.partitionBy(key_col, "_sb").orderBy(*order)
    w_run = w_loc.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow)
    prev_ts = F.lag(ts_col).over(w_loc)
    flagged = b.withColumn(
        "_flag",
        F.when(prev_ts.isNull()
               | (F.col(ts_col) - prev_ts > gap), 1).otherwise(0))
    local = flagged.withColumn("_lsid", F.sum("_flag").over(w_run))

    summ = (local.groupBy(key_col, "_sb")
            .agg(F.min(ts_col).alias("_first_ts"),
                 F.max(ts_col).alias("_last_ts"),
                 F.max("_lsid").alias("_nloc")))
    w_b = Window.partitionBy(key_col).orderBy("_sb")
    prev_last = F.lag("_last_ts").over(w_b)
    merged = summ.withColumn(
        "_merge",
        F.when(prev_last.isNotNull()
               & (F.col("_first_ts") - prev_last <= gap), 1)
         .otherwise(0))
    w_base = w_b.rowsBetween(Window.unboundedPreceding, -1)
    stitched = merged.withColumn(
        "_base",
        F.coalesce(F.sum(F.col("_nloc") - F.col("_merge")).over(w_base),
                   F.lit(0))).select(key_col, "_sb", "_base", "_merge")

    out = (local.join(stitched, [key_col, "_sb"])
           .withColumn(session_col,
                       (F.col("_base") + F.col("_lsid")
                        - F.col("_merge")).cast("long"))
           .drop("_sb", "_flag", "_lsid", "_base", "_merge"))
    return out
