"""Deterministic synthetic observation generator (FIXTURES.md §1).

Stands in for an SDFITS file: one pandas/Spark table per observation
with the canonical schema (SURVEY.md §1.4) and the cal-spike row
pattern the segmentation state machine must handle, plus the corrupt
variants of FIXTURES.md §2. Used by tests and by the radio-path bench;
the driver's TPC-H-ish tables cover the generic operator oracles.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from radio_data_pipeline_spark.operators.header import ObservationHeader


@dataclass
class ObsSpec:
    obs_id: int = 0
    n_channels: int = 64
    n_science: int = 60
    n_cal: int = 8              # rows per diode state per cal spike
    onoff: bool = False
    pre_cal: bool = True
    post_cal: bool = True
    false_start: bool = False   # short discarded segment (utils.py:166-173)
    cal_height: float = 40.0    # injected diode delta per channel sum
    drift: float = 0.01
    noise: float = 0.5
    seed: int = 42
    base_level: float = 10.0
    start: datetime = field(default_factory=lambda: datetime(2024, 3, 1))


def make_header(spec: ObsSpec) -> ObservationHeader:
    return ObservationHeader(
        date=spec.start.strftime("%Y-%m-%dT%H:%M:%S"),
        obsmode="onoff" if spec.onoff else "track",
        obsfreq=1400.0, obsbw=80.0, datamode="HIRES",
        hires_bands=[1400.0, 1600.0],
        channel_window=(0, spec.n_channels - 1),
    )


def make_observation(spec: ObsSpec, ifnum: int = 0, plnum: int = 0,
                     ) -> pd.DataFrame:
    """Generate one (obs_id, IFNUM, PLNUM) stream with the FIXTURES.md
    cal pattern: [pre-cal on, pre-cal off, (false start,) science with
    mid blip, post-cal off-run, post-cal on]."""
    rng = np.random.default_rng(spec.seed + spec.obs_id * 1000
                                + ifnum * 10 + plnum)
    rows: list[dict] = []

    def emit(calstate: int, swpvalid: int, mode: str, diode: bool) -> None:
        i = len(rows)
        per_chan = spec.base_level / spec.n_channels
        level = per_chan + spec.drift * i / spec.n_channels
        data = rng.normal(level, spec.noise / spec.n_channels,
                          spec.n_channels)
        if diode:
            data = data + spec.cal_height / spec.n_channels
        rows.append({
            "obs_id": spec.obs_id,
            "row_idx": i,
            "DATE_OBS": spec.start + timedelta(seconds=float(i)),
            "DATA": data.astype(float).tolist(),
            "IFNUM": ifnum, "PLNUM": plnum,
            "CALSTATE": calstate, "SWPVALID": swpvalid,
            "OBSMODE": mode,
            "ELEVATIO": 45.0 + 10 * np.sin(i / 50.0),
            "TAMBIENT": 15.0, "PRESSURE": 1000.0, "HUMIDITY": 40.0,
            "TSYS": 30.0, "TCAL": 1.5, "DURATION": 1.0, "EXPOSURE": 0.9,
            "LST": float(i % 86400), "RESTFREQ": 1400.0, "FREQRES": 1.25,
            "TRGTLONG": 180.0, "MJD": 60370.0 + i / 86400.0,
            "UTSECS": float(i),
        })

    mode_on = "onoff:on" if spec.onoff else "track"
    mode_off = "onoff:off" if spec.onoff else "track"

    if spec.pre_cal:
        for _ in range(spec.n_cal):
            emit(1, 0, mode_on, diode=True)
        for _ in range(spec.n_cal):
            emit(0, 0, mode_on, diode=False)
    if spec.false_start:
        # a tentative science run of <= 3*stream_count rows, then sweep
        # drop: the state machine must discard it
        for _ in range(2):
            emit(0, 1, mode_on, diode=False)
        emit(0, 0, mode_on, diode=False)
    half = spec.n_science // 2
    for i in range(spec.n_science):
        mode = mode_on if i < half else mode_off
        if spec.onoff and i in (half, half + 1):
            emit(0, 0, mode, diode=False)  # transition blip rows
        else:
            emit(0, 1, mode, diode=False)
    if spec.post_cal:
        for _ in range(max(spec.n_cal, 4)):
            emit(0, 0, mode_off, diode=False)
        for _ in range(max(spec.n_cal, 4)):
            emit(1, 0, mode_off, diode=True)
    return pd.DataFrame(rows)


def make_observation_set(specs: list[ObsSpec]) -> pd.DataFrame:
    """Multiple observations x streams — the merge/multi-file case."""
    frames = []
    for spec in specs:
        for ifnum in (0, 1):
            for plnum in (0, 1):
                frames.append(make_observation(spec, ifnum, plnum))
    return pd.concat(frames, ignore_index=True)


def corrupt_negative(pdf: pd.DataFrame, n: int = 5) -> pd.DataFrame:
    """FIXTURES.md §2 corrupt_negative: flip TSYS sign on n rows."""
    out = pdf.copy()
    out.loc[out.index[:n], "TSYS"] = -abs(out.loc[out.index[:n], "TSYS"])
    return out


def corrupt_nan(pdf: pd.DataFrame, n: int = 5) -> pd.DataFrame:
    """FIXTURES.md §2 corrupt_nan: NaN elements inside DATA vectors."""
    out = pdf.copy()
    for i in out.index[:n]:
        vec = list(out.at[i, "DATA"])
        vec[0] = float("nan")
        vec[len(vec) // 2] = float("nan")
        out.at[i, "DATA"] = vec
    return out


def make_clustered_embeddings(n: int = 4000, dim: int = 64,
                              n_clusters: int = 16, separation: float = 4.0,
                              noise: float = 0.5, seed: int = 5):
    """Mixture-of-Gaussians embedding corpus: `n_clusters` centers at
    scale `separation`, points jittered with `noise`. Real embedding
    corpora are clustered — the driver's near-iid synthetic embeddings
    (sigma2/sigma1 = 0.992, BENCH_SCALING.md §8) are ANN's
    information-theoretic worst case, so the recall frontier must also
    be measured on the clustered shape. Returns (vectors ndarray
    [n, dim], cluster assignment ndarray [n])."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)) * separation
    assign = rng.integers(0, n_clusters, n)
    vecs = centers[assign] + rng.standard_normal((n, dim)) * noise
    return vecs, assign
