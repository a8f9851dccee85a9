"""Atmosphere correction — reference atmosphere_correction.py
(SURVEY.md §2.5 M8-M10).

Pipeline: per-row weather -> water-vapor density (Buck equation, pure
column math) -> ITU-R P.676 gaseous attenuation over the frequency
axis (vectorized pandas UDF) -> element-wise gain application via
zip_with. Everything is per-row independent, so the whole stage is
shuffle-free and scales embarrassingly.

The `itur` library the reference uses (atmosphere_correction.py:47-57)
is not available here; the UDF uses a documented deterministic
fallback model (same shape: attenuation increasing with frequency,
air-mass ~ 1/sin(elevation) slant-path scaling) gated behind an
import-try so the real model slots in unchanged when present.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - itur not installed in this environment
    import itur  # type: ignore
    HAVE_ITUR = True
except Exception:  # pragma: no cover
    itur = None
    HAVE_ITUR = False


def buck_vapor_density_expr(temp_c: Column, humidity_pct: Column) -> Column:
    """Water-vapor density rho [g/m^3] from the Buck saturation vapor
    pressure equation — reference M8 (atmosphere_correction.py:25-45).

    Coefficients are the reference's exactly (Buck-1981 with the
    reference's constant enhancement factor, atmosphere_correction.py:34
    and :37) so computed values match bit-for-bit:
    ``(1.0007 + 3.46e-6) * 6.1121 * exp(17.502*t/(t+240.97))`` above
    freezing, ``(1.0003 + 4.18e-6) * 6.1115 * exp(22.452*t/(t+272.55))``
    below. (The reference's enhancement factor omits the pressure term
    of the published Buck correction — reproduced as-is for parity.)

    Reference quirk, documented divergence: the reference tests
    ``temperature + 273.15 >= 0`` on an input that is *already* Kelvin
    (caller converts at atmosphere_correction.py:72), so its
    below-freezing Buck variant is unreachable. We take Celsius in and
    branch on the actual freezing point, keeping the below-freezing
    branch reachable for genuinely sub-zero Celsius input.
    """
    above = (1.0007 + 3.46e-6) * 6.1121 * F.exp(
        17.502 * temp_c / (temp_c + 240.97))
    below = (1.0003 + 4.18e-6) * 6.1115 * F.exp(
        22.452 * temp_c / (temp_c + 272.55))
    e_s = F.when(temp_c >= 0, above).otherwise(below)
    t_k = temp_c + 273.15
    return 216.7 * ((humidity_pct / 100.0) * e_s) / t_k


def _fallback_specific_attenuation(freq_ghz: float, rho: float,
                                   pressure_hpa: float, temp_k: float) -> float:
    """Deterministic stand-in for ITU-R P.676 zenith gaseous
    attenuation [dB]: oxygen continuum rising toward the 60 GHz
    complex plus a water-vapor term peaking near the 22.235 GHz line.
    NOT the published model — a smooth, monotone-in-rho surrogate used
    only when `itur` is absent, pinned by golden tests."""
    p_ratio = pressure_hpa / 1013.25
    t_ratio = 288.15 / temp_k
    oxy = 0.0067 * p_ratio * t_ratio * (1.0 + (freq_ghz / 60.0) ** 2)
    line = (freq_ghz - 22.235) ** 2
    wv = rho * (0.05 + 3.6 / (line + 8.5)) * (freq_ghz / 22.235) ** 2 * 1e-3 * t_ratio
    return oxy + wv


def transmission_udf(frequencies_ghz: list[float]):
    """Build a pandas UDF computing the per-row atmospheric
    transmission vector 10^(-A/10) over the (broadcast) frequency axis
    — reference M9 (atmosphere_correction.py:47-57).

    mapInPandas/pandas_udf keeps this Arrow-batched; the frequency
    axis is a closure constant (it is header metadata, identical for
    every row of an observation stream)."""
    freqs = list(frequencies_ghz)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _transmission(elev_deg: pd.Series, tambient_c: pd.Series,
                      pressure_hpa: pd.Series, humidity_pct: pd.Series,
                      ) -> pd.Series:
        out = []
        for elev, t_c, p, h in zip(elev_deg, tambient_c, pressure_hpa,
                                   humidity_pct):
            t_k = t_c + 273.15
            # reference's Buck-1981 coefficients (see
            # buck_vapor_density_expr); above-freezing branch only —
            # per-row weather here comes from validated telemetry
            e_s = (1.0007 + 3.46e-6) * 6.1121 * math.exp(
                17.502 * t_c / (t_c + 240.97))
            rho = 216.7 * ((h / 100.0) * e_s) / t_k
            if HAVE_ITUR:  # pragma: no cover
                import astropy.units as u  # type: ignore
                att = itur.models.itu676.gaseous_attenuation_slant_path(
                    freqs * u.GHz, elev, rho, p, t_k, mode="approx").value
                trans = [10 ** (-a / 10.0) for a in att]
            else:
                airmass = 1.0 / max(math.sin(math.radians(max(elev, 5.0))), 1e-6)
                trans = [
                    10 ** (-(_fallback_specific_attenuation(f, rho, p, t_k)
                             * airmass) / 10.0)
                    for f in freqs
                ]
            out.append(trans)
        return pd.Series(out)

    return _transmission


def apply_atmosphere_correction(df: DataFrame, frequencies_mhz: list[float],
                                data_col: str = "DATA") -> DataFrame:
    """Reference M10 (atmosphere_correction.py:59-86): DATA /=
    transmission element-wise, per-row weather. Frequencies arrive in
    MHz and are converted to GHz exactly as the reference does
    (atmosphere_correction.py:68)."""
    udf = transmission_udf([f / 1000.0 for f in frequencies_mhz])
    with_t = df.withColumn(
        "_transmission",
        udf(F.col("ELEVATIO"), F.col("TAMBIENT"), F.col("PRESSURE"),
            F.col("HUMIDITY")),
    )
    corrected = with_t.withColumn(
        data_col,
        F.zip_with(F.col(data_col), F.col("_transmission"),
                   lambda d, t: d / t),
    )
    return corrected.drop("_transmission")
