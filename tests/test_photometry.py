"""Closed-form checks for the photometric / coordinate expression library
(SURVEY.md §2.7 F1-F8) against numpy on sampled rows."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataslicer_spark.functions.photometry import (
    add_obsid,
    add_srcid,
    bandwise_ref_mag,
    calmag,
    compute_camera_coord,
    compute_ccd_coord,
    haversine_arcsec,
)


@pytest.fixture(scope="module")
def astro_df(spark):
    rng = np.random.default_rng(7)
    n = 500
    rows = [
        (
            int(i),
            float(rng.uniform(15, 21)),       # mag
            float(rng.uniform(0.01, 0.1)),    # sigmag
            float(rng.uniform(25, 27)),       # MAGZP
            float(rng.uniform(0.001, 0.01)),  # MAGZPUNC
            float(rng.uniform(-0.1, 0.1)),    # CLRCOEFF
            float(rng.uniform(0.001, 0.01)),  # CLRCOUNC
            float(rng.uniform(14, 20)),       # gmag
            float(rng.uniform(14, 20)),       # rmag
            float(rng.uniform(14, 20)),       # imag
            float(rng.uniform(0.01, 0.05)),   # e_gmag
            float(rng.uniform(0.01, 0.05)),   # e_rmag
            int(rng.integers(0, 64)),         # RCID
            float(rng.uniform(0, 3072)),      # xpos
            float(rng.uniform(0, 3080)),      # ypos
            int(rng.integers(1, 4)),          # FILTERID
        )
        for i in range(n)
    ]
    schema = (
        "sourceid long, mag double, sigmag double, MAGZP double, MAGZPUNC double,"
        " CLRCOEFF double, CLRCOUNC double, gmag double, rmag double, imag double,"
        " e_gmag double, e_rmag double, RCID int, xpos double, ypos double,"
        " FILTERID int"
    )
    return spark.createDataFrame(rows, schema)


def test_calmag_with_color_matches_numpy(astro_df):
    out = calmag(
        astro_df,
        mag_col="mag", err_mag_col="sigmag",
        zp_col="MAGZP", zp_err_col="MAGZPUNC",
        clrcoeff_col="CLRCOEFF", clrcoeff_err_col="CLRCOUNC",
        color1_col="gmag", color2_col="rmag",
        color1_err_col="e_gmag", color2_err_col="e_rmag",
    ).toPandas()
    color = out.gmag - out.rmag
    expect_cal = out.mag + out.MAGZP + out.CLRCOEFF * color
    d_color = np.sqrt(out.e_gmag**2 + out.e_rmag**2)
    expect_err = np.sqrt(
        out.sigmag**2 + out.MAGZPUNC**2
        + (out.CLRCOUNC * color) ** 2 + (out.CLRCOEFF * d_color) ** 2
    )
    np.testing.assert_allclose(out.cal_mag, expect_cal, rtol=1e-12)
    np.testing.assert_allclose(out.err_cal_mag, expect_err, rtol=1e-12)


def test_calmag_no_color(astro_df):
    out = calmag(
        astro_df, mag_col="mag", err_mag_col="sigmag",
        zp_col="MAGZP", zp_err_col="MAGZPUNC",
        clrcoeff_col=None, color1_col=None,
        cal_name="c", err_cal_name="e",
    ).toPandas()
    np.testing.assert_allclose(out.c, out.mag + out.MAGZP, rtol=1e-12)
    np.testing.assert_allclose(out.e, np.sqrt(out.sigmag**2 + out.MAGZPUNC**2),
                               rtol=1e-12)
    dropped = calmag(
        astro_df, mag_col="mag", zp_col="MAGZP",
        clrcoeff_col=None, color1_col=None, dropmag=True,
    )
    assert "mag" not in dropped.columns


def test_calmag_error_monotone_in_inputs(astro_df):
    # property: increasing sigmag can only increase the propagated error
    out = calmag(
        astro_df.withColumn("sigmag2", F.col("sigmag") * 2),
        mag_col="mag", err_mag_col="sigmag",
        zp_col="MAGZP", zp_err_col="MAGZPUNC",
        clrcoeff_col=None, color1_col=None,
    )
    out2 = calmag(
        astro_df.withColumn("sigmag", F.col("sigmag") * 2),
        mag_col="mag", err_mag_col="sigmag",
        zp_col="MAGZP", zp_err_col="MAGZPUNC",
        clrcoeff_col=None, color1_col=None,
    )
    a = out.toPandas().err_cal_mag
    b = out2.toPandas().err_cal_mag
    assert (b >= a).all()


def test_bandwise_ref_mag(astro_df):
    out = bandwise_ref_mag(astro_df).toPandas()
    expect = np.where(
        out.FILTERID == 1, out.gmag, np.where(out.FILTERID == 2, out.rmag, out.imag)
    )
    np.testing.assert_array_equal(out.ps1mag_band, expect)


def test_ccd_coord_quadrant_offsets(astro_df):
    out = compute_ccd_coord(astro_df).toPandas()
    q = out.RCID % 4 + 1
    xll = np.where(np.isin(q, [1, 4]), 3072, 0)
    yll = np.where(np.isin(q, [1, 2]), 3080, 0)
    np.testing.assert_allclose(out.xccd, xll + out.xpos, rtol=1e-12)
    np.testing.assert_allclose(out.yccd, yll + out.ypos, rtol=1e-12)


def test_camera_coord_matches_reference_formula(astro_df):
    out = compute_camera_coord(astro_df, xgap_pix=7, ygap_pix=10).toPandas()
    rc = out.RCID.to_numpy()
    ccd = rc // 4 + 1
    q = rc % 4 + 1
    yrc = 2 * ((ccd - 1) // 4) + np.isin(q, [1, 2]).astype(int)
    xrc = 2 * (4 - (ccd - 1) % 4) - 1 - np.isin(q, [2, 3]).astype(int)
    xll = (xrc // 2) * 7 + xrc * 3072
    yll = (yrc // 2) * 10 + yrc * 3080
    np.testing.assert_allclose(out.xcam, xll + out.xpos, rtol=1e-12)
    np.testing.assert_allclose(out.ycam, yll + out.ypos, rtol=1e-12)


def test_key_synthesis_string_concat_semantics(spark):
    df = spark.createDataFrame([(12, 3), (1, 23)], "EXPID long, RCID int")
    out = add_obsid(df).toPandas().sort_values("EXPID")
    # decimal-string concat, NOT arithmetic: both give 123 (non-injective,
    # kept for reference parity — metadata.py:167-169)
    assert out.OBSID.tolist() == [123, 123]


def test_srcid_chain(spark):
    df = spark.createDataFrame([(100, 7, 42)], "EXPID long, RCID int, sourceid long")
    out = add_srcid(add_obsid(df)).first()
    assert out.OBSID == 1007
    assert out.srcID == 100742


def test_haversine_known_values(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0, 1.0 / 3600.0, 0.0),   # 1 arcsec apart in RA on equator
         (10.0, 45.0, 10.0, 45.0)],        # identical points
        "ra1 double, dec1 double, ra2 double, dec2 double",
    )
    out = df.select(
        haversine_arcsec(F.col("ra1"), F.col("dec1"), F.col("ra2"), F.col("dec2"))
        .alias("d")
    ).collect()
    assert out[0].d == pytest.approx(1.0, rel=1e-9)
    assert out[1].d == pytest.approx(0.0, abs=1e-12)


def test_ccd_coord_rotate_negates(astro_df):
    out = compute_ccd_coord(astro_df, rotate=True).toPandas()
    q = out.RCID % 4 + 1
    xll = np.where(np.isin(q, [1, 4]), 3072, 0)
    yll = np.where(np.isin(q, [1, 2]), 3080, 0)
    np.testing.assert_allclose(out.xccd, xll - out.xpos, rtol=1e-12)
    np.testing.assert_allclose(out.yccd, yll - out.ypos, rtol=1e-12)


def test_camera_coord_rotate_negates(astro_df):
    plain = compute_camera_coord(astro_df).toPandas().sort_values("sourceid")
    rot = compute_camera_coord(astro_df, rotate=True).toPandas().sort_values("sourceid")
    # rotation flips the position sign relative to the same corner
    np.testing.assert_allclose(
        rot.xcam.to_numpy() + plain.xpos.to_numpy(),
        plain.xcam.to_numpy() - plain.xpos.to_numpy(), rtol=1e-12,
    )
