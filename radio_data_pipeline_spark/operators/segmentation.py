"""Calibration-segment detection — reference O13/O14/O15
(utils.py:126-214, SURVEY.md §2.4): the ordered, stateful core of the
pipeline.

Spark strategy (SURVEY §7 step 5): the state machine runs per
observation stream via ``applyInPandas`` — each (obs_id, IFNUM, PLNUM)
group is one telescope observation (thousands of rows, never more than
fits in one task), sorted in-group by row_idx, scanned sequentially.
The shuffle is keyed by the observation id, so a 100 TB corpus of
millions of observations parallelizes perfectly; no single group ever
approaches executor memory.

Documented divergences from the reference (intended semantics, pinned
by tests):
- the reference's ``and data_start_ind`` truthiness check
  (utils.py:171) treats a data start at index 0 as "not started"; we
  use an explicit None check;
- ``if not post_cal_start_ind`` (utils.py:200) coerces a legitimate
  post-cal start at index 0 to len-1; we use an explicit None check.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

GROUP_COLS = ["obs_id", "IFNUM", "PLNUM"]


def _scan_post_cal(swpvalid: np.ndarray, calstate: np.ndarray) -> int | None:
    """Fallback-path post-cal scan (utils.py:184-198): track the start
    of the current run of >=2 consecutive SWPVALID==0 rows (any break
    resets it — blip tolerance), stopping at the first cal spike."""
    post: int | None = None
    for ind in range(len(swpvalid)):
        if ind > 0 and swpvalid[ind] == 0 and swpvalid[ind - 1] == 0:
            if post is None:
                post = ind - 1
        else:
            post = None
        if swpvalid[ind] == 0 and calstate[ind] == 1:
            break
    return post


def find_calibration_indices(calstate: np.ndarray, swpvalid: np.ndarray,
                             obsmode: Iterable[str], header_obsmode: str,
                             channel_count: int,
                             ) -> tuple[int | None, int, int | None]:
    """The per-observation state machine (single sequential pass).

    Returns (data_start, post_cal_start, off_start):
    - data_start: first CALSTATE==0 & SWPVALID==1 row after a cal spike
      (None if no cal spike at all and the fallback path is used ->
      0);
    - post_cal_start: first row of the trailing >=2-run of SWPVALID==0
      (defaults to len-1);
    - off_start: first row whose OBSMODE contains 'onoff:off' (only
      for onoff observations).

    Tentative science segments with <= 3*channel_count valid rows
    before the sweep drops are discarded as false starts
    (utils.py:166-173); channel_count is the number of (IFNUM, PLNUM)
    streams in the file — the reference's naming quirk, kept
    (continuum.py:28).
    """
    n = len(calstate)
    data_start: int | None = None
    post_cal: int | None = None
    counter = 0
    cal_started = False
    pre_cal_complete = False

    for ind in range(n):
        if calstate[ind] == 1:
            cal_started = True
        if (cal_started and calstate[ind] == 0 and swpvalid[ind] == 1
                and not pre_cal_complete):
            data_start = ind
            pre_cal_complete = True
        if (ind > 0 and pre_cal_complete and swpvalid[ind] == 0
                and swpvalid[ind - 1] == 0):
            if post_cal is None:
                post_cal = ind - 1
        else:
            post_cal = None
        if pre_cal_complete and calstate[ind] == 0 and swpvalid[ind] == 1:
            counter += 1
        if (counter <= 3 * channel_count and swpvalid[ind] == 0
                and data_start is not None):
            data_start = None
            pre_cal_complete = False
        if pre_cal_complete and swpvalid[ind] == 0 and calstate[ind] == 1:
            break

    if not pre_cal_complete:
        # Fallback (utils.py:180-198): no pre-cal spike — science
        # starts at row 0; re-scan for the post-cal run only.
        data_start = 0
        post_cal = _scan_post_cal(swpvalid, calstate)

    if post_cal is None:
        post_cal = n - 1

    off_start: int | None = None
    if header_obsmode == "onoff":
        for ind, mode in enumerate(obsmode):
            if mode is not None and "onoff:off" in mode:
                off_start = ind
                break

    return data_start, post_cal, off_start


_RESULT_SCHEMA = T.StructType([
    T.StructField("obs_id", T.LongType()),
    T.StructField("IFNUM", T.IntegerType()),
    T.StructField("PLNUM", T.IntegerType()),
    T.StructField("data_start_idx", T.IntegerType()),
    T.StructField("post_cal_start_idx", T.IntegerType()),
    T.StructField("off_start_idx", T.IntegerType()),
])


def find_calibrations(df: DataFrame, channel_count: int | None = None,
                      header_obsmode: str = "track",
                      order_col: str = "row_idx") -> DataFrame:
    """O13/O14 over every observation stream at once.

    channel_count=None computes the reference's definition — the
    PRODUCT len(unique IFNUM) * len(unique PLNUM) per obs
    (continuum.py:26-28), which differs from the count of observed
    (IFNUM, PLNUM) pairs when stream combinations are missing — with
    one tiny aggregate; the result joins back by obs_id (broadcast).
    """
    if channel_count is None:
        counts = (df.groupBy("obs_id")
                  .agg((F.countDistinct("IFNUM") *
                        F.countDistinct("PLNUM")).alias("_cc")))
        # one row per observation; AQE broadcasts while small
        df = df.join(counts, "obs_id")
    else:
        df = df.withColumn("_cc", F.lit(channel_count))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        ds, pc, off = find_calibration_indices(
            pdf["CALSTATE"].to_numpy(),
            pdf["SWPVALID"].to_numpy(),
            pdf["OBSMODE"].tolist() if "OBSMODE" in pdf else [""] * len(pdf),
            header_obsmode,
            int(pdf["_cc"].iloc[0]),
        )
        return pd.DataFrame([{
            "obs_id": pdf["obs_id"].iloc[0],
            "IFNUM": pdf["IFNUM"].iloc[0],
            "PLNUM": pdf["PLNUM"].iloc[0],
            "data_start_idx": ds,
            "post_cal_start_idx": pc,
            "off_start_idx": off,
        }])

    cols = [c for c in df.columns
            if c in {*GROUP_COLS, "CALSTATE", "SWPVALID", "OBSMODE",
                     order_col, "_cc"}]
    return (df.select(*cols)
            .groupBy(*GROUP_COLS)
            .applyInPandas(run, schema=_RESULT_SCHEMA))


def label_segments(df: DataFrame, indices: DataFrame,
                   order_col: str = "row_idx") -> DataFrame:
    """O15 (continuum.py:161-171): label each row pre_cal / science /
    post_cal using the per-stream indices. Row position within the
    stream comes from a window row_number (explicit ordering — the
    reference trusts file order, SURVEY §4); the indices table is one
    row per stream. No broadcast hint: AQE broadcasts it while small,
    and at millions of streams the join rides the stream-key
    partitioning the window already established."""
    from pyspark.sql import Window
    w = Window.partitionBy(*GROUP_COLS).orderBy(order_col)
    pos = F.row_number().over(w) - 1
    labeled = (
        df.withColumn("_pos", pos)
        .join(indices, GROUP_COLS, "left")
        .withColumn(
            "segment",
            F.when(F.col("_pos") < F.col("data_start_idx"), "pre_cal")
             .when(F.col("_pos") >= F.col("post_cal_start_idx"), "post_cal")
             .otherwise("science"),
        )
        .withColumn(
            "onoff",
            F.when(F.col("off_start_idx").isNull(), F.lit(None).cast("string"))
             .when(F.col("_pos") >= F.col("off_start_idx"), "off")
             .otherwise("on"),
        )
    )
    return labeled
