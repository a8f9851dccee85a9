"""Atmosphere correction — reference atmosphere_correction.py
(SURVEY.md §2.5 M8-M10).

Pipeline: per-row weather -> water-vapor density (Buck equation, pure
column math) -> ITU-R P.676 gaseous attenuation over the frequency
axis (vectorized pandas UDF) -> element-wise gain application via
zip_with. Everything is per-row independent, so the whole stage is
shuffle-free and scales embarrassingly.

The `itur` library the reference uses (atmosphere_correction.py:47-57)
is not available here; the UDF computes the PUBLISHED simplified
gaseous-attenuation algorithm of Rec. ITU-R P.676 (the early-Annex-2 /
CCIR-676 approximation: oxygen + water-vapour specific-attenuation
polynomials, equivalent heights, cosecant slant path) behind an
import-try so `itur`'s line-by-line model slots in unchanged when
present. Golden tests pin the implementation against independently
computed values of the published formulas (test_atmosphere_multimodal).
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


def p676_gamma_oxygen(f_ghz, pressure_hpa: float, temp_k: float):
    """Dry-air (oxygen) specific attenuation [dB/km] from the
    published simplified algorithm of Rec. ITU-R P.676 (early Annex 2,
    the CCIR-676 approximation reproduced in standard propagation
    texts), valid 1-350 GHz at sea level.

    Reference conditions are 1013 hPa / 15 degC; ambient scaling uses
    the recommendation's corrections: quadratic pressure dependence
    (collision broadening) and -1.0 %/degC temperature coefficient.

    Vectorized over ``f_ghz`` (numpy array or scalar).
    """
    import numpy as np

    f = np.asarray(f_ghz, dtype=float)
    # f < 57 GHz branch
    lo = (7.19e-3 + 6.09 / (f ** 2 + 0.227)
          + 4.81 / ((f - 57.0) ** 2 + 1.50)) * f ** 2 * 1e-3
    # 63 <= f <= 350 GHz branch
    hi = (3.79e-7 * f + 0.265 / ((f - 63.0) ** 2 + 1.59)
          + 0.028 / ((f - 118.0) ** 2 + 1.47)) * (f + 198.0) ** 2 * 1e-3
    # 57-63 GHz: the recommendation prescribes interpolating across
    # the unresolved 60-GHz oxygen complex (known to smooth out the
    # true ~15 dB/km peak)
    g57 = (7.19e-3 + 6.09 / (57.0 ** 2 + 0.227) + 4.81 / 1.50) \
        * 57.0 ** 2 * 1e-3
    g63 = (3.79e-7 * 63.0 + 0.265 / 1.59
           + 0.028 / ((63.0 - 118.0) ** 2 + 1.47)) * (63.0 + 198.0) ** 2 \
        * 1e-3
    mid = g57 + (g63 - g57) * (f - 57.0) / 6.0
    gamma = np.where(f < 57.0, lo, np.where(f > 63.0, hi, mid))
    t_c = temp_k - 273.15
    scale = (pressure_hpa / 1013.0) ** 2 * (1.0 - 0.01 * (t_c - 15.0))
    return gamma * np.maximum(scale, 0.0)


def p676_gamma_water(f_ghz, rho: float, temp_k: float):
    """Water-vapour specific attenuation [dB/km], same published
    simplified algorithm (valid 1-350 GHz): the 22.235 / 183.31 /
    325.15 GHz line terms over an f^2 * rho envelope, with the
    recommendation's -0.6 %/degC temperature correction.
    ``rho`` is water-vapour density [g/m^3]."""
    import numpy as np

    f = np.asarray(f_ghz, dtype=float)
    gamma = (0.050 + 0.0021 * rho
             + 3.6 / ((f - 22.2) ** 2 + 8.5)
             + 10.6 / ((f - 183.3) ** 2 + 9.0)
             + 8.9 / ((f - 325.4) ** 2 + 26.3)) * f ** 2 * rho * 1e-4
    t_c = temp_k - 273.15
    return gamma * max(1.0 - 0.006 * (t_c - 15.0), 0.0)


def p676_equivalent_heights(f_ghz):
    """Equivalent heights (h_o, h_w) [km] for the zenith path, from
    the same simplified algorithm: constant 6 km dry height below the
    oxygen complex, water height 1.6 km (clear air) with resonant
    enhancements at the three vapour lines."""
    import numpy as np

    f = np.asarray(f_ghz, dtype=float)
    h_o = np.full_like(f, 6.0)
    h_w = 1.6 * (1.0 + 3.0 / ((f - 22.2) ** 2 + 5.0)
                 + 5.0 / ((f - 183.3) ** 2 + 6.0)
                 + 2.5 / ((f - 325.4) ** 2 + 4.0))
    return h_o, h_w


def p676_slant_attenuation(f_ghz, elev_deg: float, rho: float,
                           pressure_hpa: float, temp_k: float):
    """Total slant-path gaseous attenuation [dB] by the cosecant law
    (elevation clamped to 5 deg, below which the flat-atmosphere
    cosecant model is invalid): A = (gamma_o*h_o + gamma_w*h_w) /
    sin(elev). This is the published approximation the reference
    reaches through `itur`'s mode='approx' path
    (atmosphere_correction.py:55)."""
    import numpy as np

    h_o, h_w = p676_equivalent_heights(f_ghz)
    zenith = (p676_gamma_oxygen(f_ghz, pressure_hpa, temp_k) * h_o
              + p676_gamma_water(f_ghz, rho, temp_k) * h_w)
    airmass = 1.0 / max(math.sin(math.radians(max(elev_deg, 5.0))), 1e-6)
    return np.asarray(zenith) * airmass


def transmission_udf(frequencies_ghz: list[float]):
    """Build a pandas UDF computing the per-row atmospheric
    transmission vector 10^(-A/10) over the (broadcast) frequency axis
    — reference M9 (atmosphere_correction.py:47-57).

    mapInPandas/pandas_udf keeps this Arrow-batched; the frequency
    axis is a closure constant (it is header metadata, identical for
    every row of an observation stream)."""
    import numpy as np

    freqs = list(frequencies_ghz)
    freqs_arr = np.asarray(freqs, dtype=float)

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
                # published P.676 simplified algorithm, numpy-
                # vectorized over the channel axis (per-row weather
                # scalars, per-observation frequency vector)
                att = p676_slant_attenuation(freqs_arr, elev, rho, p, t_k)
                trans = (10.0 ** (-att / 10.0)).tolist()
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
