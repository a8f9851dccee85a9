"""End-to-end reduction pipelines — the Spark equivalents of the
reference entry points (SURVEY.md §3):

- ``continuum_pipeline``  = Continuum(...).continuum()  (continuum.py:140-191)
- ``spectrum_pipeline``   = Spectrum(...).spectrum()    (spectrum.py:46-71)

Each is a composition of lazy transformations; the only driver
round-trips are the per-segment calibration-height scalars (M5/M6),
matching SURVEY §3's lifecycle note.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from radio_data_pipeline_spark.operators.calibration import (
    CalibrationHeight,
    apply_gain_calibration,
    calibration_height,
    rcr_fit_segments,
)
from radio_data_pipeline_spark.operators.filters import (
    filter_frequency_ranges,
    filter_time_ranges,
    select_stream,
)
from radio_data_pipeline_spark.operators.header import ObservationHeader
from radio_data_pipeline_spark.operators.integrate import (
    integrate_continuum,
    integrate_spectrum,
    on_off_spectrum,
)
from radio_data_pipeline_spark.operators.segmentation import (
    find_calibrations,
    find_calibrations_hybrid,
    label_segments,
)


def _prepare(df: DataFrame, header: ObservationHeader, ifnum: int, plnum: int,
             include_time=None, exclude_time=None,
             include_freq=None, exclude_freq=None,
             extra_predicate=None):
    """Shared front half: stream count (A3 on the UNFILTERED input,
    continuum.py:24-28) -> stream select (F1) -> time crop (F3) ->
    frequency crop / axis derivation (F4/P2)."""
    # reference semantics (continuum.py:26-28): channel_count is the
    # PRODUCT len(unique IFNUM) * len(unique PLNUM), not the count of
    # observed (IFNUM, PLNUM) pairs — they diverge when some stream
    # combinations are missing, shifting the 3*channel_count
    # false-start threshold in the segmentation state machine.
    # Returned as a THUNK: only the continuum path needs it, and the
    # aggregate is a full-input scan the spectrum path must not pay
    def stream_count() -> int:
        row = df.agg(F.countDistinct("IFNUM").alias("i"),
                     F.countDistinct("PLNUM").alias("p")).first()
        return row["i"] * row["p"]
    out = select_stream(df, ifnum, plnum)
    if extra_predicate is not None:
        out = out.filter(extra_predicate)
    if include_time or exclude_time:
        out = filter_time_ranges(out, "DATE_OBS", include_time, exclude_time)
    frequencies = header.frequencies(ifnum)
    if include_freq or exclude_freq:
        out, frequencies = filter_frequency_ranges(
            out, frequencies, include_freq, exclude_freq)
    return out, frequencies, stream_count


def continuum_pipeline(df: DataFrame, header: ObservationHeader,
                       ifnum: int = 0, plnum: int = 0,
                       include_time=None, exclude_time=None,
                       include_freq=None, exclude_freq=None) -> DataFrame:
    """Full gain-calibrated continuum: returns (obs_id, t, intensity).

    Stage map (continuum.py:140-191): crops -> find_calibrations (O13)
    -> segment labels (O15) -> per-segment diode on/off integration
    (F2+A1) -> robust fits (M2/M3/M4) -> calibration heights (M5) ->
    science integration (A1) -> gain calibration (M6).
    """
    data, _freqs, stream_count = _prepare(
        df, header, ifnum, plnum, include_time, exclude_time,
        include_freq, exclude_freq)

    indices = find_calibrations(data, channel_count=stream_count(),
                                header_obsmode=header.obsmode)
    # lazy localCheckpoint, not cache(): the subtree feeds cal_rows
    # AND science, and checkpoint blocks are released by the
    # ContextCleaner when the frame is collected — an unpersist-less
    # cache would accumulate across a corpus loop (same rule as
    # continuum_pipeline_distributed)
    labeled = label_segments(data, indices).localCheckpoint(eager=False)

    # Calibration segments: diode on/off split (F2: SWPVALID==0 within
    # the pre/post windows, continuum.py:51-59) -> continuum integrate.
    cal_rows = labeled.filter(
        F.col("segment").isin("pre_cal", "post_cal")
        & (F.col("SWPVALID") == 0))
    cal_cont = integrate_continuum(cal_rows, epoch_ts=header.date,
                                   keep_cols=["obs_id", "IFNUM", "PLNUM",
                                              "segment", "CALSTATE"])
    fits = rcr_fit_segments(cal_cont).toPandas()

    pre = calibration_height(fits[fits["segment"] == "pre_cal"])
    post = calibration_height(fits[fits["segment"] == "post_cal"])

    science = labeled.filter(F.col("segment") == "science")
    cont = integrate_continuum(science, epoch_ts=header.date,
                               keep_cols=["obs_id"])
    return apply_gain_calibration(cont, pre, post)


def spectrum_pipeline(df: DataFrame, header: ObservationHeader,
                      ifnum: int = 0, plnum: int = 0,
                      include_time=None, exclude_time=None,
                      include_freq=None, exclude_freq=None) -> DataFrame:
    """ON-OFF (or plain) spectrum: returns (pos, frequency, intensity).

    Stage map (spectrum.py:46-71): stream + CALSTATE==0 & SWPVALID==0
    pre-filter (F1+F2, spectrum.py:31-32) -> crops -> off transition
    (O14) -> A2 integration with ON-OFF subtraction (M7).
    """
    pred = (F.col("CALSTATE") == 0) & (F.col("SWPVALID") == 0)
    data, freqs, _stream_count = _prepare(
        df, header, ifnum, plnum, include_time, exclude_time,
        include_freq, exclude_freq, extra_predicate=pred)

    if header.obsmode == "onoff":
        # Falsy-index quirk (spectrum.py:63): the reference treats an
        # off-transition at row 0 the same as "no transition"; we treat
        # any non-null transition as real (documented divergence).
        spec = on_off_spectrum(data, on_pred=~F.col("OBSMODE")
                               .contains("onoff:off"))
    else:
        spec = integrate_spectrum(data)

    # frequency axis as a broadcast (pos, frequency) join, NOT an
    # N-channel literal array expression: at HIRES widths (16k+
    # channels) a literal F.array(...) is a giant expression tree —
    # the measured codegen-blowup failure mode (BENCH_SCALING.md §4).
    # The axis is one tiny driver-built table; the join is a broadcast
    # hash join on pos, constant-size no matter the channel count.
    freq_df = df.sparkSession.createDataFrame(
        [(i, float(f)) for i, f in enumerate(freqs)],
        "pos int, frequency double")
    return (spec.join(F.broadcast(freq_df), "pos")
            .select("pos", "frequency", "intensity")
            .orderBy("pos"))


def continuum_pipeline_distributed(df: DataFrame,
                                   header_obsmode: str = "track",
                                   channel_count: int | None = None,
                                   ) -> DataFrame:
    """The 1M-observation continuum: every (obs_id, IFNUM, PLNUM)
    stream of `df` reduced in ONE lineage with ZERO driver round-trips
    — segmentation, per-segment robust fits, calibration heights, and
    gain application are all joins/aggregations keyed on the stream id.

    Returns (obs_id, IFNUM, PLNUM, t, intensity) for the science rows
    of every stream. Differences vs continuum_pipeline (the
    single-observation reference shape): no time/frequency crops (those
    are per-header driver parameters; apply them upstream per
    observation group if needed), and channel_count defaults to each
    observation's own stream count (continuum.py:24-28 semantics)
    computed distributively.

    Scale: the only shuffles are keyed on the observation stream —
    segmentation (applyInPandas), the segment fits (applyInPandas over
    dozens-of-row groups), and two broadcast joins of one-row-per-
    stream tables back onto the science rows.
    """
    from radio_data_pipeline_spark.operators.calibration import (
        apply_gain_calibration_distributed,
        calibration_heights_df,
    )

    # hybrid segmentation: window-compiled (pure JVM) for every stream
    # where the discard counter cannot fire, applyInPandas only for
    # the rest — on a clean corpus the Python stage sees ~zero rows
    indices = find_calibrations_hybrid(df, channel_count=channel_count,
                                       header_obsmode=header_obsmode)
    # labeled feeds three consumers (cal fits, science, time bounds):
    # localCheckpoint materializes the segmentation subtree (shuffle +
    # Python state machine) once and truncates lineage; unlike
    # persist(), its blocks are released by the ContextCleaner when
    # the result DataFrame is garbage-collected, so repeated pipeline
    # calls in a long-lived session do not accumulate cached copies.
    labeled = label_segments(df, indices).localCheckpoint(eager=False)

    cal_rows = labeled.filter(
        F.col("segment").isin("pre_cal", "post_cal")
        & (F.col("SWPVALID") == 0))
    cal_cont = integrate_continuum(
        cal_rows, keep_cols=["obs_id", "IFNUM", "PLNUM", "segment",
                             "CALSTATE"])
    heights = calibration_heights_df(rcr_fit_segments(cal_cont))

    science = labeled.filter(F.col("segment") == "science")
    cont = integrate_continuum(science,
                               keep_cols=["obs_id", "IFNUM", "PLNUM"])
    return apply_gain_calibration_distributed(cont, heights)


def spectrum_pipeline_distributed(df: DataFrame,
                                  header_obsmode: str = "track",
                                  channel_count: int | None = None,
                                  ) -> DataFrame:
    """All-streams spectrum in one lineage: the ON-OFF subtraction (M7)
    folded into ONE signed aggregation — rows labeled 'off' contribute
    -value — so the whole reduction is a single posexplode + groupBy
    keyed on (stream, channel). Shuffle volume after map-side partial
    aggregation is O(streams x channels), independent of row count.

    Returns (obs_id, IFNUM, PLNUM, pos, intensity); join the per-ifnum
    frequency axis (header.frequencies) on pos downstream."""
    if header_obsmode != "onoff":
        # track mode: no ON/OFF split exists, so skip the segmentation
        # machinery entirely (its output would be a constant +1 sign)
        # — the reduction is a plain signed-less aggregation
        filtered = df.filter((F.col("CALSTATE") == 0)
                             & (F.col("SWPVALID") == 0))
        return (
            filtered.select("obs_id", "IFNUM", "PLNUM",
                            F.posexplode("DATA").alias("pos", "val"))
            .groupBy("obs_id", "IFNUM", "PLNUM", "pos")
            .agg(F.sum("val").alias("intensity"))
        )
    indices = find_calibrations_hybrid(df, channel_count=channel_count,
                                       header_obsmode=header_obsmode)
    labeled = label_segments(df, indices)
    filtered = labeled.filter((F.col("CALSTATE") == 0)
                              & (F.col("SWPVALID") == 0))
    sign = F.when(F.col("onoff") == "off", F.lit(-1.0)) \
            .otherwise(F.lit(1.0))
    return (
        filtered.select("obs_id", "IFNUM", "PLNUM", sign.alias("_sign"),
                        F.posexplode("DATA").alias("pos", "val"))
        .groupBy("obs_id", "IFNUM", "PLNUM", "pos")
        .agg(F.sum(F.col("val") * F.col("_sign")).alias("intensity"))
    )


def reduce_sdfits(spark, path: str, ifnum: int = 0, plnum: int = 0,
                  include_time=None, exclude_time=None,
                  include_freq=None, exclude_freq=None,
                  ) -> dict[str, DataFrame]:
    """The reference's full entry point (main.py:20-47) for one SDFITS
    file: scan (S1/S2) -> validation -> continuum + spectrum products.

    Returns {"validated": ..., "continuum": ..., "spectrum": ...} —
    all lazy except the calibration-height scalar fetch inside
    continuum_pipeline. Multi-file globs work for the validated scan;
    the reduction products assume one observation per call, like the
    reference (loop over files for a corpus, or use the operators
    directly for the fully-distributed path)."""
    from radio_data_pipeline_spark.operators.header import ObservationHeader
    from radio_data_pipeline_spark.operators.validation import (
        validate_observation,
    )
    from radio_data_pipeline_spark.sources.fits import (
        read_sdfits,
        read_sdfits_headers,
    )
    import json

    hdr_row = read_sdfits_headers(spark, path).collect()[0]
    header = ObservationHeader.from_fits(
        json.loads(hdr_row["header_json"]),
        json.loads(hdr_row["history_json"]))

    raw = read_sdfits(spark, path)
    validated = validate_observation(raw, channel_window=header.channel_window)
    kw = dict(include_time=include_time, exclude_time=exclude_time,
              include_freq=include_freq, exclude_freq=exclude_freq)
    return {
        "validated": validated,
        "continuum": continuum_pipeline(validated, header, ifnum, plnum,
                                        **kw),
        "spectrum": spectrum_pipeline(validated, header, ifnum, plnum,
                                      **kw),
    }
