"""Radio-pipeline queries in the driver contract.

The driver tables carry no observation data, so these queries
synthesize a deterministic multi-observation corpus (seeded generator,
sources/synthetic.py — same fixtures the equivalence tests pin) and
run the engine's distributed reductions over it. They are rows-only
checks (the calibration state machine and robust fits are sequential
per-stream algorithms with no SQL equivalent — exactly the case the
contract's no-oracle path exists for); their numeric correctness is
pinned instead by tests/test_radio_pipeline.py equivalence against the
reference-shaped per-stream pipeline and by the segmentation property
tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from radio_data_pipeline_spark.plans.registry import register

_N_OBS = 4


def _corpus(spark: SparkSession) -> DataFrame:
    from radio_data_pipeline_spark.sources.synthetic import (
        ObsSpec,
        make_observation_set,
    )
    specs = [ObsSpec(obs_id=i, n_science=24,
                     onoff=(i % 2 == 1),
                     false_start=(i % 4 == 2))
             for i in range(_N_OBS)]
    return spark.createDataFrame(make_observation_set(specs))


@register(
    "radio_segmentation_indices",
    oracle=None,  # sequential per-stream state machine — non-SQL (O13/O14)
    doc="Calibration-segment detection (reference utils.py:126-214) "
        "over a deterministic 4-observation x 4-stream corpus: the "
        "applyInPandas state machine keyed on the observation stream. "
        "Correctness pinned by Hypothesis equivalence tests (batch == "
        "incremental) and synthetic-pattern fixtures.",
    tags=("radio", "mapInPandas", "stateful"),
)
def radio_segmentation_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from radio_data_pipeline_spark.operators.segmentation import (
        find_calibrations,
    )
    # header_obsmode='onoff' so the O14 off-transition scan actually
    # runs: the onoff observations get a real off_start_idx, track
    # observations still yield NULL
    return (find_calibrations(_corpus(spark), header_obsmode="onoff")
            .orderBy("obs_id", "IFNUM", "PLNUM"))


@register(
    "radio_continuum_distributed",
    oracle=None,  # robust per-segment fits + state machine — non-SQL
    doc="Gain-calibrated continuum (reference continuum.py:140-191) for "
        "every stream of the synthetic corpus in one lineage — "
        "segmentation, RCR fits, calibration heights, interpolated "
        "gain division, zero driver round-trips. Equivalence with the "
        "reference-shaped per-stream pipeline pinned by test.",
    tags=("radio", "mapInPandas", "calibration"),
)
def radio_continuum_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from radio_data_pipeline_spark.pipeline import (
        continuum_pipeline_distributed,
    )
    out = continuum_pipeline_distributed(_corpus(spark))
    return (out.select("obs_id", "IFNUM", "PLNUM",
                       F.round("t", 6).alias("t"),
                       F.round("intensity", 6).alias("intensity"))
            .orderBy("obs_id", "IFNUM", "PLNUM", "t"))


@register(
    "radio_validation",
    oracle=None,  # operates on the synthesized corpus, not driver tables
    doc="Full validation stage (reference validate.py:104-127): NaN "
        "masking, timestamp flag, physicality filter, channel crop — "
        "over a corpus with injected negative-TSYS and NaN-DATA rows; "
        "returns per-stream surviving-row counts and masked-element "
        "sums so the check is value-bearing.",
    tags=("radio", "validation"),
)
def radio_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from radio_data_pipeline_spark.operators.validation import (
        validate_observation,
    )
    from radio_data_pipeline_spark.sources.synthetic import (
        ObsSpec,
        corrupt_nan,
        corrupt_negative,
        make_observation,
    )
    frames = []
    for i in range(2):
        pdf = make_observation(ObsSpec(obs_id=i, n_science=24))
        frames.append(corrupt_negative(corrupt_nan(pdf, n=4), n=3))
    df = spark.createDataFrame(pd.concat(frames, ignore_index=True))
    validated = validate_observation(df, channel_window=(4, 59))
    return (validated.groupBy("obs_id")
            .agg(F.count(F.lit(1)).alias("n_valid_rows"),
                 F.round(F.sum(F.aggregate(
                     "DATA", F.lit(0.0),
                     lambda a, x: a + F.coalesce(x, F.lit(0.0)))), 6)
                 .alias("total_intensity"),
                 F.sum(F.size("DATA")).alias("n_elements"))
            .orderBy("obs_id"))


@register(
    "radio_atmosphere_correction",
    oracle=None,  # Arrow pandas-UDF transmission vectors — non-SQL
    doc="Atmosphere correction M8-M10 (reference atmosphere_correction"
        ".py:59-86): per-row Buck vapor density -> attenuation model -> "
        "transmission array (Arrow pandas UDF) -> element-wise gain "
        "division via zip_with. Returns per-stream corrected/raw "
        "intensity ratios (> 1 since transmission < 1). The scalar Buck "
        "step is separately oracle-checked as buck_vapor_density.",
    tags=("radio", "mapInPandas", "atmosphere"),
)
def radio_atmosphere_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from radio_data_pipeline_spark.operators.atmosphere import (
        apply_atmosphere_correction,
    )
    from radio_data_pipeline_spark.operators.header import ObservationHeader
    raw_sum = F.aggregate("DATA", F.lit(0.0), lambda a, x: a + x)
    # stash the raw per-row sum BEFORE correction so the ratio is one
    # pass — no self-join, no second evaluation of the UDF lineage
    corpus = _corpus(spark).withColumn("_raw", raw_sum)
    header = ObservationHeader(date="2024-03-01T00:00:00")
    corrected = apply_atmosphere_correction(corpus, header.frequencies(0))
    return (
        corrected.groupBy("obs_id", "IFNUM", "PLNUM")
        .agg(F.round(F.avg(raw_sum / F.col("_raw")), 6)
             .alias("avg_gain_ratio"))
        .orderBy("obs_id", "IFNUM", "PLNUM")
    )


@register(
    "radio_merge",
    oracle=None,  # merges the synthesized corpus, not driver tables
    doc="Observation merge A6 (reference file_merge.py:45-54): "
        "schema-checked unionByName of two observation sets; returns "
        "per-source row counts proving count additivity (the merge "
        "precondition tests cover the schema-mismatch rejection).",
    tags=("radio", "merge"),
)
def radio_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from radio_data_pipeline_spark.operators.merge import (
        merge_observations,
    )
    from radio_data_pipeline_spark.sources.synthetic import (
        ObsSpec,
        make_observation_set,
    )
    a = spark.createDataFrame(
        make_observation_set([ObsSpec(obs_id=10, n_science=12)]))
    b = spark.createDataFrame(
        make_observation_set([ObsSpec(obs_id=11, n_science=16)]))
    merged = merge_observations([a, b])
    return (merged.groupBy("obs_id")
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .orderBy("obs_id"))


@register(
    "radio_spectrum_distributed",
    oracle=None,  # depends on the segmentation machine's ON/OFF split
    doc="ON-OFF spectrum (reference spectrum.py:46-71) for every "
        "stream: one signed posexplode aggregation keyed on (stream, "
        "channel); shuffle volume O(streams x channels) after map-side "
        "partial aggregation.",
    tags=("radio", "mapInPandas", "array"),
)
def radio_spectrum_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from radio_data_pipeline_spark.pipeline import (
        spectrum_pipeline_distributed,
    )
    out = spectrum_pipeline_distributed(_corpus(spark),
                                        header_obsmode="onoff")
    return (out.select("obs_id", "IFNUM", "PLNUM", "pos",
                       F.round("intensity", 6).alias("intensity"))
            .orderBy("obs_id", "IFNUM", "PLNUM", "pos"))
