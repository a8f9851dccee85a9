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
