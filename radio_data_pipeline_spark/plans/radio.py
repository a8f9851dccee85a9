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
    return (find_calibrations(_corpus(spark))
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
