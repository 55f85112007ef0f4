"""Property tests for the spatial kernels (J5/J6): the bucketed joins must
reproduce exact brute-force nearest-neighbor / containment results,
including near the poles for the sky crossmatch."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataslicer_spark.operators.spatial import (
    crossmatch_sky,
    nn_join_planar,
    split_dust,
    tag_dust,
)


def _haversine_arcsec(ra1, dec1, ra2, dec2):
    p1, p2 = np.radians(dec1), np.radians(dec2)
    dphi = (p2 - p1) / 2
    dlam = (np.radians(ra2) - np.radians(ra1)) / 2
    a = np.sin(dphi) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlam) ** 2
    return np.degrees(2 * np.arcsin(np.sqrt(a))) * 3600.0


@pytest.fixture(scope="module")
def planar_points(spark):
    rng = np.random.default_rng(11)
    left = [(int(i), float(x), float(y)) for i, (x, y) in
            enumerate(rng.uniform(0, 100, (300, 2)))]
    right = [(int(i), float(x), float(y)) for i, (x, y) in
             enumerate(rng.uniform(0, 100, (80, 2)))]
    ldf = spark.createDataFrame(left, "id long, x double, y double")
    rdf = spark.createDataFrame(right, "rid long, x double, y double")
    return ldf, rdf, np.array([p[1:] for p in left]), np.array([p[1:] for p in right])


def test_nn_join_planar_matches_bruteforce(planar_points):
    ldf, rdf, L, R = planar_points
    radius = 7.5
    out = nn_join_planar(
        ldf, rdf, radius, left_id="id", right_id="rid",
    ).select("id", "rid", "dist2").toPandas().set_index("id")

    d2 = ((L[:, None, :] - R[None, :, :]) ** 2).sum(axis=2)
    for i in range(len(L)):
        within = np.where(d2[i] <= radius * radius)[0]
        if len(within) == 0:
            assert i not in out.index
        else:
            best = within[np.lexsort((within, d2[i][within]))][0]
            assert out.loc[i, "rid"] == best
            assert out.loc[i, "dist2"] == pytest.approx(d2[i][best], rel=1e-12)


def test_nn_join_planar_keep_unmatched(planar_points):
    ldf, rdf, L, R = planar_points
    out = nn_join_planar(
        ldf, rdf, 2.0, left_id="id", right_id="rid", keep_unmatched=True
    )
    assert out.count() == len(L)  # every left row kept
    assert out.filter(F.col("rid").isNull()).count() > 0  # some unmatched


@pytest.fixture(scope="module")
def sky_points(spark):
    rng = np.random.default_rng(13)
    n_src, n_cat = 250, 120
    # mixed field: equatorial clump, mid-dec, and near-pole clump (dec ~89.99)
    src = np.concatenate([
        np.column_stack([rng.uniform(0, 1, 100), rng.uniform(-0.5, 0.5, 100)]),
        np.column_stack([rng.uniform(120, 121, 100), rng.uniform(44.5, 45.5, 100)]),
        np.column_stack([rng.uniform(0, 360, 50), rng.uniform(89.97, 89.999, 50)]),
    ])
    cat = np.concatenate([
        src[rng.choice(n_src, 60), :] + rng.normal(0, 0.0003, (60, 2)),
        np.column_stack([rng.uniform(0, 360, 60), rng.uniform(-90, 90, 60)]),
    ])
    sdf = spark.createDataFrame(
        [(int(i), float(r), float(d)) for i, (r, d) in enumerate(src)],
        "srcID long, ra double, dec double",
    )
    cdf = spark.createDataFrame(
        [(int(i), float(r), float(d)) for i, (r, d) in enumerate(cat)],
        "_id long, ra double, dec double",
    )
    return sdf, cdf, src, cat


def test_crossmatch_sky_matches_bruteforce(sky_points):
    sdf, cdf, src, cat = sky_points
    rs = 3.0  # arcsec
    out = crossmatch_sky(sdf, cdf, rs).select(
        "srcID", "_id", "dist2ps1"
    ).toPandas().set_index("srcID")

    d = _haversine_arcsec(
        src[:, None, 0], src[:, None, 1], cat[None, :, 0], cat[None, :, 1]
    )
    n_matched = 0
    for i in range(len(src)):
        within = np.where(d[i] <= rs)[0]
        if len(within) == 0:
            assert i not in out.index
        else:
            n_matched += 1
            best = within[np.lexsort((within, d[i][within]))][0]
            assert out.loc[i, "_id"] == best, f"src {i}"
            assert out.loc[i, "dist2ps1"] == pytest.approx(d[i][best], rel=1e-6)
    assert n_matched > 30  # the fixture guarantees plenty of true matches
    assert len(out) == n_matched


def test_crossmatch_sky_keep_unmatched_nan_mode(sky_points):
    sdf, cdf, src, cat = sky_points
    out = crossmatch_sky(sdf, cdf, 3.0, keep_unmatched=True)
    assert out.count() == len(src)
    # reference NaN-flag mode: unmatched rows keep NULL distance
    assert out.filter(F.col("dist2ps1").isNull()).count() > 0


def test_tag_dust_largest_wins_and_split(spark):
    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 10.0, 0.0), (3, 100.0, 100.0)],
        "pid long, xpos double, ypos double",
    )
    # point 1 inside both grains; grain B is larger and must win
    dust = spark.createDataFrame(
        [(1, 0.0, 0.0, 2.0), (2, 1.0, 0.0, 5.0), (3, 10.0, 0.5, 1.0)],
        "gid long, x double, y double, r double",
    )
    tagged = tag_dust(pts, dust, dust_id="gid")
    got = {r.pid: r.dust_r for r in tagged.collect()}
    assert got[1] == 5.0   # largest wins
    assert got[2] == 1.0
    assert got[3] is None  # clean
    clean, dusty = split_dust(tagged)
    assert [r.pid for r in clean.collect()] == [3]
    assert sorted(r.pid for r in dusty.collect()) == [1, 2]


def test_tag_dust_rscale(spark):
    pts = spark.createDataFrame([(1, 3.0, 0.0)], "pid long, xpos double, ypos double")
    dust = spark.createDataFrame([(1, 0.0, 0.0, 2.0)], "gid long, x double, y double, r double")
    assert tag_dust(pts, dust, dust_id="gid").first().dust_r is None
    assert tag_dust(pts, dust, dust_id="gid", rscale=2.0).first().dust_r == 2.0
