"""Spatial join kernels (SURVEY.md §2.3: J5 sky crossmatch, J6 point-in-
circle tagging; §2.5 W1/W2 windows).

The reference does these with per-row KD-tree / healpix cone searches
(PS1Cal_matching.py:99-217) and a Python loop over dust grains
(srcdf.py:666-682).  Here both are **set-based**:

- J5: cell-bucketed equi-join.  Both sides get a spatial cell id; the
  *catalog* side is exploded to its 3×3 cell neighborhood (9× a dimension
  table, not the fact table), the join is a plain equi-join on the cell id
  (hash-partitioned, AQE-skew-safe), the exact distance predicate filters,
  and a window keeps the closest match per source.  At 100 TB the fact
  table shuffles once on cell id — or not at all if the lake is already
  bucketed by cell.
- J6: broadcast theta-join against the (tiny) circle table + largest-wins
  window (reference semantics: grains applied in ascending radius order so
  the largest overwrites — srcdf.py:666).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.photometry import haversine_arcsec
from ..utils import check_col


# ---------------------------------------------------------------------------
# planar nearest-neighbor join (generic kernel; also the oracle-checkable
# variant of J5)
# ---------------------------------------------------------------------------

def nn_join_planar(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    left_xy: tuple[str, str] = ("x", "y"),
    right_xy: tuple[str, str] = ("x", "y"),
    right_cols: Sequence[str] | None = None,
    left_id: str = "id",
    right_id: str = "id",
    keep_unmatched: bool = False,
) -> DataFrame:
    """Closest right-side point within ``radius`` for every left row.

    Plan shape: cell-grid bucketing (cell = radius) → explode right side to
    its 9-cell neighborhood → equi-join on cell → exact squared-distance
    filter → ``row_number`` per left id ordered by (dist², right_id) for a
    deterministic nearest match (SURVEY.md §7 tie watch-list).

    ``keep_unmatched=True`` reproduces the reference's NaN-flag mode
    (PS1Cal_matching.py:114-117): left rows with no neighbor keep NULL
    match columns instead of being dropped.

    Scale: the exploded side should be the smaller (catalog) side; the big
    side shuffles once on the cell key.  Output adds ``dist2`` (squared
    distance — exact arithmetic, no sqrt needed for comparison).
    """
    lx, ly = left_xy
    rx, ry = right_xy
    check_col([lx, ly, left_id], left)
    check_col([rx, ry, right_id], right)
    if right_cols is None:
        right_cols = [c for c in right.columns]

    inv = 1.0 / radius
    # explode the right side to its 3×3 neighborhood
    r = right.select(
        *[F.col(c) for c in dict.fromkeys(list(right_cols) + [rx, ry, right_id])],
        F.explode(
            F.array(*[F.lit(d) for d in (-1, 0, 1)])
        ).alias("__dcx"),
    ).select(
        "*",
        F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])).alias("__dcy"),
    )
    r = r.withColumn("__cx", F.floor(F.col(rx) * inv).cast("long") + F.col("__dcx"))
    r = r.withColumn("__cy", F.floor(F.col(ry) * inv).cast("long") + F.col("__dcy"))
    r = r.drop("__dcx", "__dcy")
    # rename clashing right columns
    renames = {}
    for c in r.columns:
        if c in left.columns and not c.startswith("__"):
            renames[c] = f"{c}_match"
    for old, new in renames.items():
        r = r.withColumnRenamed(old, new)
    rx_m = renames.get(rx, rx)
    ry_m = renames.get(ry, ry)
    rid_m = renames.get(right_id, right_id)

    l = left.withColumn("__cx", F.floor(F.col(lx) * inv).cast("long")).withColumn(
        "__cy", F.floor(F.col(ly) * inv).cast("long")
    )
    dx = F.col(lx) - F.col(rx_m)
    dy = F.col(ly) - F.col(ry_m)
    dist2 = dx * dx + dy * dy

    joined = (
        l.join(r, on=["__cx", "__cy"], how="inner")
        .withColumn("dist2", dist2)
        .filter(F.col("dist2") <= radius * radius)
        .drop("__cx", "__cy")
    )
    w = Window.partitionBy(left_id).orderBy(F.col("dist2").asc(), F.col(rid_m).asc())
    nearest = (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if keep_unmatched:
        match_cols = [c for c in nearest.columns if c not in left.columns]
        return left.join(
            nearest.select(left_id, *match_cols), on=left_id, how="left"
        )
    return nearest


# ---------------------------------------------------------------------------
# J5 — sky crossmatch (spherical nearest neighbor within rs_arcsec)
# ---------------------------------------------------------------------------

def crossmatch_sky(
    sources: DataFrame,
    catalog: DataFrame,
    rs_arcsec: float,
    source_id: str = "srcID",
    source_radec: tuple[str, str] = ("ra", "dec"),
    catalog_radec: tuple[str, str] = ("ra", "dec"),
    catalog_cols: Sequence[str] | None = None,
    catalog_id: str = "_id",
    keep_unmatched: bool = False,
    dist_col: str = "dist2ps1",
) -> DataFrame:
    """Nearest catalog star within ``rs_arcsec`` of each source.

    Reference behavior (``match_to_PS1cal`` _objtable_methods.py:25-155 +
    PS1Cal_matching.py:99-217): for each source (or cluster centroid) find
    the *closest* calibrator within the search radius; either drop
    unmatched sources or keep them with a NaN distance
    (PS1Cal_matching.py:114-117).

    Spark-first plan: declination-band bucketing.  The sky is cut into dec
    bands of height ``rs``; within a band, RA cells are widened by
    1/cos(dec) so a fixed cell always covers ≥ rs of great-circle arc
    (correct at the poles, where fixed-RA cells would miss neighbors).
    The catalog explodes to the 3 adjacent dec bands and, per band, the
    RA cells overlapping its ±rs RA window.  The join is a plain equi-join
    on (band, ra_cell); haversine (pure Catalyst trig) filters to the true
    radius; a window picks the closest with a deterministic tiebreak.

    The reference's ``use='fieldid'`` strategy (pre-prune catalog by field)
    is partition pruning on the catalog table and composes orthogonally:
    filter the catalog before calling.
    """
    s_ra, s_dec = source_radec
    c_ra, c_dec = catalog_radec
    check_col([s_ra, s_dec, source_id], sources)
    check_col([c_ra, c_dec, catalog_id], catalog)
    if catalog_cols is None:
        catalog_cols = list(catalog.columns)

    eps_deg = rs_arcsec / 3600.0

    def band_of(dec: Column) -> Column:
        return F.floor(dec / eps_deg).cast("long")

    def ra_cell_width(band: Column) -> Column:
        # widest |dec| in the band bounds the RA compression; clamp cos to
        # avoid div-by-zero at the exact pole band
        dec_edge = F.greatest(
            F.abs(band.cast("double") * eps_deg),
            F.abs((band.cast("double") + 1) * eps_deg),
        )
        cosd = F.greatest(F.cos(F.radians(dec_edge)), F.lit(1e-6))
        return eps_deg / cosd

    # ---- catalog side: explode to 3 dec bands × overlapping RA cells ----
    cat = catalog.select(*dict.fromkeys(list(catalog_cols) + [c_ra, c_dec, catalog_id]))
    renames = {c: f"{c}_cat" for c in cat.columns if c in sources.columns}
    for old, new in renames.items():
        cat = cat.withColumnRenamed(old, new)
    cra = renames.get(c_ra, c_ra)
    cdec = renames.get(c_dec, c_dec)
    cid = renames.get(catalog_id, catalog_id)

    cat = cat.withColumn(
        "__band", F.explode(
            F.array(*[band_of(F.col(cdec)) + F.lit(d) for d in (-1, 0, 1)])
        )
    )
    w_band = ra_cell_width(F.col("__band"))
    lo = F.floor((F.col(cra) - eps_deg) / w_band).cast("long")
    hi = F.floor((F.col(cra) + eps_deg) / w_band).cast("long")
    # RA window spans at most a handful of cells; sequence() enumerates them
    cat = cat.withColumn("__rcell", F.explode(F.sequence(lo, hi)))

    # ---- source side: single (band, ra_cell) ----
    src = sources.withColumn("__band", band_of(F.col(s_dec)))
    src = src.withColumn(
        "__rcell",
        F.floor(F.col(s_ra) / ra_cell_width(F.col("__band"))).cast("long"),
    )

    joined = src.join(cat, on=["__band", "__rcell"], how="inner")
    dist = haversine_arcsec(F.col(s_ra), F.col(s_dec), F.col(cra), F.col(cdec))
    joined = (
        joined.withColumn(dist_col, dist)
        .filter(F.col(dist_col) <= rs_arcsec)
        .drop("__band", "__rcell")
    )
    w = Window.partitionBy(source_id).orderBy(F.col(dist_col).asc(), F.col(cid).asc())
    nearest = (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if keep_unmatched:
        match_cols = [c for c in nearest.columns if c not in sources.columns]
        return sources.join(
            nearest.select(source_id, *match_cols), on=source_id, how="left"
        )
    return nearest


# ---------------------------------------------------------------------------
# J6 — point-in-circle tagging (dust grains)
# ---------------------------------------------------------------------------

def tag_dust(
    sources: DataFrame,
    dust: DataFrame,
    source_xy: tuple[str, str] = ("xpos", "ypos"),
    dust_cols: tuple[str, str, str] = ("x", "y", "r"),
    dust_id: str | None = None,
    rscale: float = 1.0,
) -> DataFrame:
    """Tag sources falling inside dust circles; largest grain wins.

    Reference (``srcdf.tag_dust`` srcdf.py:616-694): loops circles in
    ascending radius so later (larger) grains overwrite — i.e. on multiple
    containment the LARGEST grain's (x, y, r) is kept.  Spark-first: the
    dust table is tiny → broadcast theta-join on the containment predicate
    ``(x−dx)² + (y−dy)² ≤ (rscale·r)²`` + ``row_number`` over
    ``r desc`` (W2).  Output keeps every source row and adds
    ``dust_x/dust_y/dust_r`` (NULL when clean).

    Use :func:`split_dust` for the reference's ``(clean, dusty)`` pair.
    """
    sx, sy = source_xy
    dx_c, dy_c, dr_c = dust_cols
    check_col([sx, sy], sources)
    check_col([dx_c, dy_c, dr_c], dust)

    d = dust.select(
        F.col(dx_c).alias("dust_x"),
        F.col(dy_c).alias("dust_y"),
        F.col(dr_c).alias("dust_r"),
        *([F.col(dust_id).alias("__dust_id")] if dust_id else []),
    )
    ddx = F.col(sx) - F.col("dust_x")
    ddy = F.col(sy) - F.col("dust_y")
    rr = F.col("dust_r") * rscale
    cond = ddx * ddx + ddy * ddy <= rr * rr

    src = sources.withColumn("__sid", F.monotonically_increasing_id())
    hits = src.join(F.broadcast(d), cond, "inner")
    tiebreak = [F.col("__dust_id").asc()] if dust_id else [
        F.col("dust_x").asc(), F.col("dust_y").asc()
    ]
    w = Window.partitionBy("__sid").orderBy(F.col("dust_r").desc(), *tiebreak)
    best = (
        hits.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("__sid", "dust_x", "dust_y", "dust_r")
    )
    return src.join(best, on="__sid", how="left").drop("__sid")


def split_dust(tagged: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, dusty) split of :func:`tag_dust` output
    (reference returns this pair — srcdf.py:689-694)."""
    return (
        tagged.filter(F.col("dust_r").isNull()).drop("dust_x", "dust_y", "dust_r"),
        tagged.filter(F.col("dust_r").isNotNull()),
    )


__all__ = ["nn_join_planar", "crossmatch_sky", "tag_dust", "split_dust"]
