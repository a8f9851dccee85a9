"""Optional-extra cross-validation against the REAL reference
libraries (r3 verdict items 5-6).

The reference pipeline leans on three libraries that are not
installable in this container (verified: no network; `rcr`, `itur`,
`astropy` all absent): the RCR robust-rejection library
(continuum.py:85-94), `itur`'s ITU-R P.676 implementation
(atmosphere_correction.py:47-57), and astropy's FITS codec
(validate.py:18-23). The repo reimplements each from the published
algorithm; these tests close the parity loop WHEN the extras are
present (`pip install rcr itur astropy` in a CI extra) and skip with
an explicit reason otherwise — the gap stays visible in the test
report instead of silently untested.

Tolerances are the honest contract per library:
- rcr: same algorithm (Maples et al. 2018 bulk rejection about the
  robust location) -> exact kept-set parity and tight parameter
  agreement is the assertion;
- itur: the repo implements the published SIMPLIFIED P.676 algorithm
  (the reference reaches itur's mode='approx'); modern itur versions
  carry later revisions of the recommendation, so the contract is
  few-percent agreement away from the 57-63 GHz oxygen complex
  (the documented divergence, operators/atmosphere.py);
- astropy: byte-level FITS interop both directions (our writer ->
  astropy reader, astropy writer -> our reader) with exact value
  equality.
"""

from __future__ import annotations

import io

import numpy as np
import pandas as pd
import pytest


def test_rcr_bulk_rejection_parity():
    rcr = pytest.importorskip(
        "rcr", reason="rcr not installed (not installable in this "
        "container); install the 'extras' CI target for exact parity "
        "vs rcr.SS_MEDIAN_DL")
    from radio_data_pipeline_spark.operators.calibration import (
        rcr_linear_fit,
    )

    rng = np.random.default_rng(7)
    n = 60
    x = np.arange(n, dtype=float)
    x = x - x.mean()  # reference mean-centers x (continuum.py:77-78)
    y = 2.0 + 0.05 * x + rng.normal(0, 0.2, n)
    y[:8] += 5.0  # one-sided contamination — the hard case

    # the reference's usage (continuum.py:85-94): FunctionalForm over
    # a linear model, SS_MEDIAN_DL symmetric-uncontaminated setup,
    # bulk rejection
    def linear(xv, params):
        return params[0] + xv * params[1]

    def d_b(xv, params):
        return 1.0

    def d_m(xv, params):
        return xv

    guess = [float(np.median(y)), 0.0]
    model = rcr.FunctionalForm(linear, x.tolist(), y.tolist(),
                               [d_b, d_m], guess)
    r = rcr.RCR(rcr.SS_MEDIAN_DL)
    r.setParametricModel(model)
    r.performBulkRejection(y.tolist())
    lib_keep = np.asarray(r.result.flags, dtype=bool)
    lib_b, lib_m = model.result.parameters

    b, m, keep = rcr_linear_fit(x, y)
    # exact kept-set parity is the bar; parameter agreement follows
    # on the same kept points
    assert keep.tolist() == lib_keep.tolist(), (
        f"kept sets diverge: ours {int(keep.sum())}/{n}, "
        f"rcr {int(lib_keep.sum())}/{n}")
    assert np.isclose(b, lib_b, rtol=1e-6, atol=1e-9)
    assert np.isclose(m, lib_m, rtol=1e-6, atol=1e-9)


def test_itur_p676_slant_attenuation_parity():
    itur = pytest.importorskip(
        "itur", reason="itur not installed (not installable in this "
        "container); install the 'extras' CI target for parity vs "
        "itur.models.itu676")
    from radio_data_pipeline_spark.operators.atmosphere import (
        p676_slant_attenuation,
    )

    elev, rho, pressure, temp_k = 45.0, 7.5, 1013.0, 288.15
    # away from the 57-63 GHz oxygen complex: few-percent agreement;
    # the complex itself is the documented divergence (the simplified
    # algorithm interpolates across the unresolved lines)
    for f_ghz, rtol in [(1.4, 0.10), (10.0, 0.05), (22.2, 0.10),
                        (30.0, 0.05), (90.0, 0.15)]:
        ours = float(p676_slant_attenuation(
            np.array([f_ghz]), elev, rho, pressure, temp_k)[0])
        lib = itur.models.itu676.gaseous_attenuation_slant_path(
            f_ghz, elev, rho, pressure, temp_k, mode="approx")
        lib = float(getattr(lib, "value", lib))
        assert np.isclose(ours, lib, rtol=rtol), (
            f"{f_ghz} GHz: ours {ours} vs itur {lib}")


def _sample_table() -> pd.DataFrame:
    return pd.DataFrame({
        "row_idx": np.arange(4, dtype=np.int64),
        "TSYS": np.array([30.0, 31.5, 29.8, 30.2]),
        "OBSMODE": ["track", "track", "onoff:on", "onoff:off"],
        "DATA": [list(np.linspace(i, i + 1, 8)) for i in range(4)],
    })


def test_astropy_reads_our_sdfits():
    astropy_fits = pytest.importorskip(
        "astropy.io.fits", reason="astropy not installed (not "
        "installable in this container); install the 'extras' CI "
        "target for codec cross-validation")
    from radio_data_pipeline_spark.sources.fits import write_sdfits

    pdf = _sample_table()
    buf = write_sdfits(pdf, header={"TELESCOP": "TEST"},
                       history=["reduced by unit test"])
    with astropy_fits.open(io.BytesIO(buf)) as hdul:
        assert hdul[0].header["SIMPLE"] is True
        assert hdul[0].header["TELESCOP"] == "TEST"
        assert any("reduced by unit test" in str(h)
                   for h in hdul[0].header.get("HISTORY", []))
        t = hdul[1].data
        assert list(t["row_idx"]) == [0, 1, 2, 3]
        np.testing.assert_allclose(t["TSYS"], pdf["TSYS"].to_numpy())
        assert [s.strip() for s in t["OBSMODE"]] == list(pdf["OBSMODE"])
        got = np.vstack([np.asarray(r) for r in t["DATA"]])
        exp = np.vstack([np.asarray(r) for r in pdf["DATA"]])
        np.testing.assert_allclose(got, exp)


def test_our_reader_parses_astropy_sdfits():
    astropy_fits = pytest.importorskip(
        "astropy.io.fits", reason="astropy not installed (not "
        "installable in this container); install the 'extras' CI "
        "target for codec cross-validation")
    from radio_data_pipeline_spark.sources.fits import parse_sdfits

    pdf = _sample_table()
    cols = [
        astropy_fits.Column(name="row_idx", format="K",
                            array=pdf["row_idx"].to_numpy()),
        astropy_fits.Column(name="TSYS", format="D",
                            array=pdf["TSYS"].to_numpy()),
        astropy_fits.Column(name="OBSMODE", format="10A",
                            array=np.array(pdf["OBSMODE"])),
        astropy_fits.Column(
            name="DATA", format="8D",
            array=np.vstack([np.asarray(r) for r in pdf["DATA"]])),
    ]
    hdul = astropy_fits.HDUList([
        astropy_fits.PrimaryHDU(),
        astropy_fits.BinTableHDU.from_columns(cols, name="SINGLE DISH"),
    ])
    out = io.BytesIO()
    hdul.writeto(out)
    obs = parse_sdfits(out.getvalue())
    t = obs.table
    assert list(t["row_idx"]) == [0, 1, 2, 3]
    np.testing.assert_allclose(t["TSYS"].to_numpy(),
                               pdf["TSYS"].to_numpy())
    assert [s.strip() for s in t["OBSMODE"]] == list(pdf["OBSMODE"])
    got = np.vstack([np.asarray(r) for r in t["DATA"]])
    exp = np.vstack([np.asarray(r) for r in pdf["DATA"]])
    np.testing.assert_allclose(got, exp)
