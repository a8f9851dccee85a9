"""Validation operators — reference validate.py (SURVEY.md §2.2 F5-F7,
§2.5 M11, §2.1 S2).

The reference validates one file eagerly and prints failures
(validate.py:48-49, 69-70); here validation is a lazy transformation
plus an explicit FAILFAST schema on read, so corrupt inputs surface as
errors instead of silent prints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Columns the reference checks for non-negativity (validate.py:56-57).
PHYSICAL_COLUMNS = [
    "TSYS", "TCAL", "ELEVATIO", "TAMBIENT", "PRESSURE", "HUMIDITY",
    "DURATION", "EXPOSURE", "LST", "RESTFREQ", "FREQRES", "TRGTLONG",
    "MJD", "UTSECS",
]

# Canonical observation schema (SURVEY.md §1.4); used for FAILFAST
# ingest — the Spark analogue of hdul.verify('exception')
# (validate.py:20).
OBSERVATION_SCHEMA = T.StructType([
    T.StructField("obs_id", T.LongType()),
    T.StructField("row_idx", T.IntegerType()),
    T.StructField("DATE_OBS", T.TimestampType()),
    T.StructField("DATA", T.ArrayType(T.DoubleType())),
    T.StructField("IFNUM", T.IntegerType()),
    T.StructField("PLNUM", T.IntegerType()),
    T.StructField("CALSTATE", T.IntegerType()),
    T.StructField("SWPVALID", T.IntegerType()),
    T.StructField("OBSMODE", T.StringType()),
    T.StructField("ELEVATIO", T.DoubleType()),
    T.StructField("TAMBIENT", T.DoubleType()),
    T.StructField("PRESSURE", T.DoubleType()),
    T.StructField("HUMIDITY", T.DoubleType()),
    T.StructField("TSYS", T.DoubleType()),
    T.StructField("TCAL", T.DoubleType()),
    T.StructField("DURATION", T.DoubleType()),
    T.StructField("EXPOSURE", T.DoubleType()),
    T.StructField("LST", T.DoubleType()),
    T.StructField("RESTFREQ", T.DoubleType()),
    T.StructField("FREQRES", T.DoubleType()),
    T.StructField("TRGTLONG", T.DoubleType()),
    T.StructField("MJD", T.DoubleType()),
    T.StructField("UTSECS", T.DoubleType()),
])


def mask_nan_values(df: DataFrame, data_col: str = "DATA") -> DataFrame:
    """Reference F6 (validate.py:25-37): mask (not drop) NaN elements
    of the DATA vector. NaN -> NULL so downstream array sums skip them
    exactly like NumPy masked sums do."""
    return df.withColumn(
        data_col,
        F.transform(F.col(data_col),
                    lambda x: F.when(F.isnan(x), F.lit(None)).otherwise(x)),
    )


def physical_filter(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Reference F5 (validate.py:51-70): drop rows where any present
    physical column is negative. The reference filters column-by-column
    sequentially and skips absent columns with a warning; here it is
    one conjunctive predicate over the intersection with the actual
    schema, which Catalyst pushes into the scan."""
    columns = PHYSICAL_COLUMNS if columns is None else columns
    present = [c for c in columns if c in df.columns]
    pred = F.lit(True)
    for c in present:
        pred = pred & (F.col(c).isNull() | (F.col(c) >= 0))
    return df.filter(pred)


def valid_timestamp_flag(df: DataFrame, ts_col: str = "DATE_OBS",
                         flag_col: str = "_ts_valid") -> DataFrame:
    """Reference M11 validation (validate.py:39-49): the reference only
    *prints* unparseable DATE-OBS values; we surface a boolean flag so
    callers can count/quarantine bad rows without a driver round-trip."""
    col = F.col(ts_col)
    if dict(df.dtypes)[ts_col] in ("timestamp", "timestamp_ntz"):
        return df.withColumn(flag_col, col.isNotNull())
    return df.withColumn(flag_col, F.try_to_timestamp(col).isNotNull())


def crop_channels(df: DataFrame, start: int, stop: int,
                  data_col: str = "DATA") -> DataFrame:
    """Reference F7 (validate.py:72-102): slice every DATA vector to
    the [start, stop] channel window from the 'START,STOP channels'
    header card. Spark slice() is 1-based; reference slicing is
    0-based inclusive of stop (data[start:stop+1], validate.py:102)."""
    return df.withColumn(data_col,
                         F.slice(F.col(data_col), start + 1, stop - start + 1))


def validate_observation(df: DataFrame,
                         channel_window: tuple[int, int] | None = None,
                         ) -> DataFrame:
    """Full validation stage (validate.py:104-127): NaN mask ->
    timestamp flag -> physicality filter -> channel crop. Lazy; one
    pass over the data when an action runs."""
    out = mask_nan_values(df)
    out = valid_timestamp_flag(out)
    out = physical_filter(out)
    if channel_window is not None:
        out = crop_channels(out, *channel_window)
    return out


def physical_filter_observed(df: DataFrame,
                             columns: list[str] | None = None):
    """`physical_filter` plus pipeline observability: returns
    (filtered_df, Observation) where the Observation reports — from
    the SAME pass that executes the query, at zero extra cost —
    `n_input` rows seen and `n_negative` rows the filter dropped.

    The reference prints validation complaints as side effects
    (validate.py:69-70); `df.observe` is the Spark-native replacement:
    accumulator-style metrics attached to the lineage, collected on
    ANY action, no second scan, works identically on a 1000-executor
    cluster. Read `obs.get` after an action on the returned frame.
    """
    from pyspark.sql import Observation

    cols = [c for c in (columns or PHYSICAL_COLUMNS) if c in df.columns]
    bad = None
    for c in cols:
        neg = (F.col(c) < 0) & F.col(c).isNotNull()
        bad = neg if bad is None else (bad | neg)
    if bad is None:
        bad = F.lit(False)
    obs = Observation("physical_validation")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_input"),
        # coalesce: SUM over zero rows is NULL — an empty input must
        # report 0 dropped, not None (monitoring does `> 0` checks)
        F.coalesce(F.sum(bad.cast("long")), F.lit(0))
        .alias("n_negative"))
    return physical_filter(observed, columns), obs
