"""Committed radio-corpus parquet fixtures for the driver oracle gate.

The six ``radio_*`` queries exercise the reference's hard core
(utils.py:126-214, continuum.py:140-191, spectrum.py:46-71) over a
deterministic synthetic corpus (sources/synthetic.py, seeded). The
driver's DuckDB oracle can only verify values it can read, so the
corpus is materialized ONCE into committed parquet files both engines
read bit-identically:

- Spark side: ``spark.read.parquet`` on the fixture (no per-run
  regeneration — identical inputs across engines and across rounds);
- DuckDB side: ``read_parquet('<same file>')`` inside the oracle SQL.

DATE_OBS is stored as timestamp[us, UTC] so epoch extraction
(``cast(ts as double)``) is session-timezone-independent on both
engines.

Regenerate with ``python tools/gen_radio_fixtures.py`` after changing
the generator or the specs below; the tool also re-pins the expected
outputs of the sequential operators (plans/_radio_expected.py).
"""

from __future__ import annotations

from pathlib import Path

# repo-checkout default; a NON-editable install does not ship the
# repo-root fixtures/ tree, so installed users point RDPS_FIXTURE_DIR
# at a checkout's fixtures/radio (or regenerate with
# tools/gen_radio_fixtures.py) — the registry embeds these paths into
# the oracle SQL at import time, so the variable must be set before
# the first plans import
import os as _os

FIXTURE_DIR = Path(
    _os.environ.get("RDPS_FIXTURE_DIR")
    or Path(__file__).resolve().parents[2] / "fixtures" / "radio")
CORPUS_PATH = FIXTURE_DIR / "corpus.parquet"
MERGE_PATH = FIXTURE_DIR / "merge.parquet"
VALIDATION_PATH = FIXTURE_DIR / "validation.parquet"
HIRES_PATH = FIXTURE_DIR / "hires.parquet"

_N_OBS = 4
HIRES_CHANNELS = 16384


def corpus_specs():
    """The 4-observation x 4-stream corpus the radio queries reduce:
    mixed track/onoff modes and one false-start stream so every state
    of the O13 machine (incl. the discard counter) is exercised."""
    from radio_data_pipeline_spark.sources.synthetic import ObsSpec
    return [ObsSpec(obs_id=i, n_science=24,
                    onoff=(i % 2 == 1),
                    false_start=(i % 4 == 2))
            for i in range(_N_OBS)]


def merge_frames():
    """Two single-stream observation sets for the A6 merge query."""
    from radio_data_pipeline_spark.sources.synthetic import (
        ObsSpec,
        make_observation_set,
    )
    import pandas as pd
    a = make_observation_set([ObsSpec(obs_id=10, n_science=12)])
    b = make_observation_set([ObsSpec(obs_id=11, n_science=16)])
    return pd.concat([a, b], ignore_index=True)


def validation_frames():
    """Two corrupted observations (NaN DATA elements + negative TSYS)
    for the full validation stage (F5/F6/F7/M11)."""
    from radio_data_pipeline_spark.sources.synthetic import (
        ObsSpec,
        corrupt_nan,
        corrupt_negative,
        make_observation,
    )
    import pandas as pd
    frames = []
    for i in range(2):
        pdf = make_observation(ObsSpec(obs_id=i, n_science=24))
        frames.append(corrupt_negative(corrupt_nan(pdf, n=4), n=3))
    return pd.concat(frames, ignore_index=True)


def hires_frames():
    """One HIRES observation at 16,384 channels (SURVEY §1.1: real
    HIRES observations carry 16 k+ channels; the committed corpus uses
    64) as two polarization streams — the wide-channel stress for the
    spectrum/continuum reductions. Row count stays small (24/stream)
    so the fixture is compact while the CHANNEL axis is full-width:
    every per-channel structure (posexplode widths, frequency-axis
    join, integrate folds) runs at production width."""
    from radio_data_pipeline_spark.sources.synthetic import (
        ObsSpec,
        make_observation,
    )
    import pandas as pd
    # n_science MUST exceed the false-start discard threshold on BOTH
    # sides of the onoff transition blip: the state machine discards
    # science runs of <= 3 x stream_count rows (utils.py:166-173),
    # and this observation has 2 streams -> threshold 6. With
    # n_science=24 the pre-blip run is 12 and the post-blip run is 10,
    # so segmentation/RCR/heights/gain all genuinely execute at 16 k
    # channels (a shorter spec silently degrades to the
    # no-calibration fallback — caught by round-4 review).
    spec = ObsSpec(obs_id=20, n_channels=HIRES_CHANNELS,
                   n_science=24, n_cal=4, onoff=True)
    return pd.concat([make_observation(spec, ifnum=0, plnum=p)
                      for p in (0, 1)], ignore_index=True)


def _write_parquet(pdf, path: Path) -> None:
    """pandas -> single parquet file with DATE_OBS as
    timestamp[us, UTC] (instant semantics on both engines)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.Table.from_pandas(pdf, preserve_index=False)
    i = table.schema.get_field_index("DATE_OBS")
    col = table.column(i).cast(pa.timestamp("us", tz="UTC"))
    table = table.set_column(i, pa.field("DATE_OBS",
                                         pa.timestamp("us", tz="UTC")), col)
    path.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, path)


def write_fixtures() -> None:
    from radio_data_pipeline_spark.sources.synthetic import (
        make_observation_set,
    )
    _write_parquet(make_observation_set(corpus_specs()), CORPUS_PATH)
    _write_parquet(merge_frames(), MERGE_PATH)
    _write_parquet(validation_frames(), VALIDATION_PATH)
    _write_parquet(hires_frames(), HIRES_PATH)


def read_corpus(spark):
    return spark.read.parquet(str(CORPUS_PATH))


def read_merge(spark):
    return spark.read.parquet(str(MERGE_PATH))


def read_validation(spark):
    return spark.read.parquet(str(VALIDATION_PATH))


def read_hires(spark):
    return spark.read.parquet(str(HIRES_PATH))
