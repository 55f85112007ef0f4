"""Photometric / coordinate column expressions (SURVEY.md §2.7: F1-F6, F8).

Everything here is built from ``pyspark.sql.functions`` only, so the whole
family stays inside whole-stage codegen — these are the expressions the
reference evaluates eagerly with numpy (srcdf.py:366-443 etc.).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..utils import check_col


# ---------------------------------------------------------------------------
# F1 — photometric calibration with error propagation (srcdf.py:366-443)
# ---------------------------------------------------------------------------

def calmag(
    df: DataFrame,
    mag_col: str,
    err_mag_col: str | None = None,
    zp_col: str = "MAGZP",
    zp_err_col: str = "MAGZPUNC",
    clrcoeff_col: str | None = "CLRCOEFF",
    clrcoeff_err_col: str | None = "CLRCOUNC",
    color1_col: str | None = None,
    color2_col: str | None = None,
    color1_err_col: str | None = None,
    color2_err_col: str | None = None,
    cal_name: str | None = None,
    err_cal_name: str | None = None,
    dropmag: bool = False,
) -> DataFrame:
    """Calibrate instrumental magnitudes; propagate errors in closed form.

    Reference formulas (srcdf.py:425-443):

    - with color term:  ``cal = mag + zp + clrcoeff·(c1 − c2)``;
      ``err² = err_mag² + zp_err² + (clrcoeff_err·color)² + (clrcoeff·d_color)²``
      with ``d_color = sqrt(e1² + e2²)``.
    - without:          ``cal = mag + zp``; ``err² = err_mag² + zp_err²``.

    Output column names default to ``cal_<mag>`` / ``err_cal_<mag>``
    (srcdf.py:409-410).  ``dropmag`` removes the instrumental column.
    """
    cal_name = cal_name or f"cal_{mag_col}"
    err_cal_name = err_cal_name or f"err_cal_{mag_col}"
    use_color = clrcoeff_col is not None and color1_col is not None
    needed = [mag_col, zp_col]
    if use_color:
        needed += [clrcoeff_col, color1_col, color2_col]
    check_col(needed, df)

    mag, zp = F.col(mag_col), F.col(zp_col)
    if use_color:
        color = F.col(color1_col) - F.col(color2_col)
        out = df.withColumn(cal_name, mag + zp + F.col(clrcoeff_col) * color)
    else:
        out = df.withColumn(cal_name, mag + zp)

    if err_mag_col is not None:
        check_col([err_mag_col, zp_err_col], out)
        # Squares via multiplication, not pow(): multiplication is exactly
        # rounded IEEE (bit-reproducible across engines); pow() is libm.
        sq = lambda c: c * c  # noqa: E731
        err2 = sq(F.col(err_mag_col)) + sq(F.col(zp_err_col))
        if use_color and clrcoeff_err_col is not None:
            err2 = err2 + sq(F.col(clrcoeff_err_col) * color)
            if color1_err_col is not None and color2_err_col is not None:
                d_color = F.sqrt(
                    sq(F.col(color1_err_col)) + sq(F.col(color2_err_col))
                )
                err2 = err2 + sq(F.col(clrcoeff_col) * d_color)
        out = out.withColumn(err_cal_name, F.sqrt(err2))

    if dropmag:
        out = out.drop(mag_col)
    return out


# ---------------------------------------------------------------------------
# F2 — band-conditional column pick (objtable.py:243-254, 307-313)
# ---------------------------------------------------------------------------

def band_conditional_color(
    df: DataFrame,
    filterid_col: str = "FILTERID",
    g_col: str = "gmag",
    r_col: str = "rmag",
    i_col: str = "imag",
    out_color1: str = "color1",
    out_color2: str = "color2",
) -> DataFrame:
    """FILTERID ∈ {1,2} → (g, r) colors; FILTERID = 3 → (r, i).

    The reference implements this three different ways (``.where``,
    ``.loc`` masks, aux columns — SURVEY.md §2.7 F2); in Spark it is one
    CASE WHEN pair.
    """
    check_col([filterid_col, g_col, r_col, i_col], df)
    in_gr = F.col(filterid_col).isin(1, 2)
    return df.withColumn(
        out_color1, F.when(in_gr, F.col(g_col)).otherwise(F.col(r_col))
    ).withColumn(out_color2, F.when(in_gr, F.col(r_col)).otherwise(F.col(i_col)))


def bandwise_ref_mag(
    df: DataFrame,
    filterid_col: str = "FILTERID",
    g_col: str = "gmag",
    r_col: str = "rmag",
    i_col: str = "imag",
    out_col: str = "ps1mag_band",
) -> DataFrame:
    """F2 — pick the reference magnitude matching the observation band
    (``add_bandwise_PS1mag_for_filter`` _objtable_methods.py:158-188)."""
    check_col([filterid_col, g_col, r_col, i_col], df)
    f = F.col(filterid_col)
    return df.withColumn(
        out_col,
        F.when(f == 1, F.col(g_col))
        .when(f == 2, F.col(r_col))
        .otherwise(F.col(i_col)),
    )


# ---------------------------------------------------------------------------
# F3/F4 — camera / CCD plane coordinates (srcdf.py:446-575)
# ---------------------------------------------------------------------------

XSIZE, YSIZE = 3072, 3080  # detector pixel extent (srcdf.py:30)


def compute_ccd_coord(
    df: DataFrame,
    rc_col: str = "RCID",
    xname: str = "xpos",
    yname: str = "ypos",
    rotate: bool = False,
) -> DataFrame:
    """F4 — readout-channel → CCD-plane pixel coordinates.

    Reference (srcdf.py:509-575): ``q = rcid % 4 + 1``; rotation negates
    both axes; lower-left corner ``xll = XSIZE·(q∈{1,4})``,
    ``yll = YSIZE·(q∈{1,2})``; output ``(xccd, yccd)``.
    """
    check_col([rc_col, xname, yname], df)
    q = F.col(rc_col) % 4 + 1
    x = -F.col(xname) if rotate else F.col(xname)
    y = -F.col(yname) if rotate else F.col(yname)
    xll = F.when(q.isin(1, 4), F.lit(XSIZE)).otherwise(F.lit(0))
    yll = F.when(q.isin(1, 2), F.lit(YSIZE)).otherwise(F.lit(0))
    return df.withColumn("xccd", xll + x).withColumn("yccd", yll + y)


def compute_camera_coord(
    df: DataFrame,
    rc_col: str = "RCID",
    xname: str = "xpos",
    yname: str = "ypos",
    xgap_pix: int = 7,
    ygap_pix: int = 10,
    rotate: bool = False,
) -> DataFrame:
    """F3 — readout-channel → full camera-plane coordinates.

    Reference (srcdf.py:446-506; the objtable facade has a NameError — bug
    B2 — we implement the documented intent): integer arithmetic
    ``ccd = rcid//4 + 1``, ``q = rcid%4 + 1``;
    ``yrc = 2·((ccd−1)//4) + (q∈{1,2})``;
    ``xrc = 2·(4 − (ccd−1)%4) − 1 − (q∈{2,3})``;
    corner ``xll = (xrc//2)·xgap + xrc·XSIZE`` (same for y), then
    ``cam = ll ± pos`` (rotation flips the sign).
    """
    check_col([rc_col, xname, yname], df)
    rc = F.col(rc_col)
    ccd = (rc / 4).cast("int") + 1
    q = rc % 4 + 1
    yrc = 2 * ((ccd - 1) / 4).cast("int") + q.isin(1, 2).cast("int")
    xrc = 2 * (4 - (ccd - 1) % 4) - 1 - q.isin(2, 3).cast("int")
    xll = (xrc / 2).cast("int") * xgap_pix + xrc * XSIZE
    yll = (yrc / 2).cast("int") * ygap_pix + yrc * YSIZE
    x = -F.col(xname) if rotate else F.col(xname)
    y = -F.col(yname) if rotate else F.col(yname)
    return df.withColumn("xcam", xll + x).withColumn("ycam", yll + y)


# ---------------------------------------------------------------------------
# F5/F6 — unit conversions & distance metrics
# ---------------------------------------------------------------------------

def arcsec_to_radians(arcsec: float) -> float:
    """F5 — reference: np.radians(arcsec/3600) (objtable.py:154-156)."""
    import math

    return math.radians(arcsec / 3600.0)


def haversine_arcsec(
    ra1: Column, dec1: Column, ra2: Column, dec2: Column
) -> Column:
    """F6 — great-circle distance in arcseconds between two (deg, deg)
    positions, as a pure Catalyst expression.

    ``2·asin(sqrt(sin²(Δφ/2) + cosφ1·cosφ2·sin²(Δλ/2)))`` — the formula the
    reference delegates to sklearn/astropy (objtable.py:156,
    PS1Cal_matching.py:100-104).
    """
    phi1, phi2 = F.radians(dec1), F.radians(dec2)
    dphi = (phi2 - phi1) / 2
    dlam = (F.radians(ra2) - F.radians(ra1)) / 2
    a = F.pow(F.sin(dphi), 2) + F.cos(phi1) * F.cos(phi2) * F.pow(F.sin(dlam), 2)
    return F.degrees(2 * F.asin(F.sqrt(a))) * 3600.0


# ---------------------------------------------------------------------------
# F8 — string-concat integer keys (metadata.py:167-169, objtable.py:106-108)
# ---------------------------------------------------------------------------

def concat_int_key(a: Column | str, b: Column | str) -> Column:
    """``int(str(a) + str(b))`` — decimal string concatenation, then cast.

    NOT arithmetic: ``(12, 3)`` → 123 but ``(1, 23)`` → 123 too — the
    reference's key synthesis is non-injective (SURVEY.md §7 watch-list);
    kept for parity, call sites should prefer composite keys at scale.
    """
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.concat(ca.cast("string"), cb.cast("string")).cast("long")


def add_obsid(df: DataFrame, expid_col: str = "EXPID", rcid_col: str = "RCID") -> DataFrame:
    """OBSID = int(str(EXPID) + str(RCID)) (metadata.py:167-169)."""
    check_col([expid_col, rcid_col], df)
    return df.withColumn("OBSID", concat_int_key(expid_col, rcid_col))


def add_srcid(df: DataFrame, obsid_col: str = "OBSID", sourceid_col: str = "sourceid") -> DataFrame:
    """srcID = int(str(OBSID) + str(sourceid)) (objtable.py:106-108)."""
    check_col([obsid_col, sourceid_col], df)
    return df.withColumn("srcID", concat_int_key(obsid_col, sourceid_col))


__all__ = [
    "calmag",
    "band_conditional_color",
    "bandwise_ref_mag",
    "compute_ccd_coord",
    "compute_camera_coord",
    "arcsec_to_radians",
    "haversine_arcsec",
    "concat_int_key",
    "add_obsid",
    "add_srcid",
    "XSIZE",
    "YSIZE",
]
