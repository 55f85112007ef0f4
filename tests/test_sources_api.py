"""Tests for the sources layer (cache, FITS plumbing, external lookup,
multimodal) and the SlicerFrame/SlicerDataset API wrapper."""

from __future__ import annotations

import os
import struct
import tempfile

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataslicer_spark.api import SlicerDataset, SlicerFrame
from dataslicer_spark.plans.astro_pipeline import make_astro_fixture
from dataslicer_spark.sources.external import (
    external_lookup_join,
    prune_catalog_by_keys,
)
from dataslicer_spark.sources.fits import read_fits_headers, read_fits_tables
from dataslicer_spark.sources.multimodal import (
    decode_media,
    deterministic_fake_decoder,
    extract_image_features,
    frame_sample,
    read_binary_assets,
)
from dataslicer_spark.sources.parquet_cache import ParquetCache


# ---------------------------------------------------------------------------
# S6 — parquet write-through cache
# ---------------------------------------------------------------------------

def test_parquet_cache_roundtrip_and_invalidation(spark, lineitem):
    with tempfile.TemporaryDirectory() as d:
        cache = ParquetCache(d)
        calls = []

        def compute():
            calls.append(1)
            return lineitem.select("l_orderkey", "l_quantity")

        a = cache.load_or_compute(spark, "ds", "objtable", compute)
        b = cache.load_or_compute(spark, "ds", "objtable", compute)
        assert len(calls) == 1  # second load hit the cache
        assert a.count() == b.count() == lineitem.count()

        # requesting a column the cache lacks → recompute (column-aware
        # invalidation, dataset.py:126-139)
        def compute2():
            calls.append(1)
            return lineitem.select("l_orderkey", "l_quantity", "l_discount")

        c = cache.load_or_compute(
            spark, "ds", "objtable", compute2,
            required_columns=["l_orderkey", "*discount*"],
        )
        assert len(calls) == 2
        assert "l_discount" in c.columns

        # wildcard-satisfied request → cache hit
        cache.load_or_compute(
            spark, "ds", "objtable", compute2, required_columns=["l_disc*"]
        )
        assert len(calls) == 2

        # force_reload bypasses
        cache.load_or_compute(spark, "ds", "objtable", compute2, force_reload=True)
        assert len(calls) == 3


# ---------------------------------------------------------------------------
# S2/S3 — FITS plumbing with a synthetic parser (astropy absent)
# ---------------------------------------------------------------------------

def _fake_fits_bytes(n_rows: int, seed: int) -> bytes:
    # "FITS file" = packed (seed, n_rows); the parser decodes it
    return struct.pack("<ii", seed, n_rows)


def _make_fake_parser():
    # defined via closure so cloudpickle ships it by value to executors
    # (a test-module-level function would be pickled by reference and the
    # executors cannot import the tests package)
    def fake_parser(raw: bytes) -> pd.DataFrame:
        import struct as _struct

        import numpy as _np
        import pandas as _pd

        seed, n = _struct.unpack("<ii", raw)
        rng = _np.random.default_rng(seed)
        return _pd.DataFrame(
            {
                "sourceid": _np.arange(n, dtype=_np.int64),
                "ra": rng.uniform(0, 360, n),
                "dec": rng.uniform(-90, 90, n),
                "mag": rng.uniform(15, 21, n),
                "flags": rng.integers(0, 3, n).astype(_np.int32),
            }
        )

    return fake_parser


def test_read_fits_tables_plumbing(spark):
    with tempfile.TemporaryDirectory() as d:
        for i in range(4):
            with open(os.path.join(d, f"file{i}.fits"), "wb") as f:
                f.write(_fake_fits_bytes(50 + 10 * i, seed=i))
        schema = T.StructType(
            [
                T.StructField("sourceid", T.LongType()),
                T.StructField("ra", T.DoubleType()),
                T.StructField("mag", T.DoubleType()),
                T.StructField("PATH", T.StringType()),
            ]
        )
        out = read_fits_tables(
            spark, os.path.join(d, "*.fits"), parser=_make_fake_parser(),
            schema=schema, select_columns=["sourceid", "ra", "mag"],
            select_rows="mag < 18",
        )
        pdf = out.toPandas()
        # union of 4 files, filter applied inside the reader
        assert set(pdf.columns) == {"sourceid", "ra", "mag", "PATH"}
        assert (pdf.mag < 18).all()
        assert pdf.PATH.nunique() == 4
        # row counts match per-file filtered parses
        expect = sum((_make_fake_parser()(_fake_fits_bytes(50 + 10 * i, i)).mag < 18).sum()
                     for i in range(4))
        assert len(pdf) == expect


def test_read_fits_tables_wildcard_projection(spark):
    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "a.fits"), "wb") as f:
            f.write(_fake_fits_bytes(20, seed=9))
        schema = T.StructType(
            [
                T.StructField("ra", T.DoubleType()),
                T.StructField("dec", T.DoubleType()),
                T.StructField("PATH", T.StringType()),
            ]
        )
        out = read_fits_tables(
            spark, os.path.join(d, "*.fits"), parser=_make_fake_parser(),
            schema=schema, select_columns=["ra", "de*"],
        )
        assert out.count() == 20


def test_read_fits_headers_skips_corrupt(spark):
    with tempfile.TemporaryDirectory() as d:
        for i in range(3):
            open(os.path.join(d, f"h{i}.fits"), "w").write(str(i))

        def header_fn(path: str) -> dict:
            i = int(path[-6])
            if i == 1:
                raise OSError("corrupted")
            return {"EXPID": 100 + i, "RCID": i, "MAGZP": 25.0 + i,
                    "APCOR1": 0.1, "APCOR2": 0.2, "JUNK": "x"}

        with pytest.warns(UserWarning, match="corrupted"):
            out = read_fits_headers(
                spark, os.path.join(d, "*.fits"), header_fn=header_fn,
                header_keys=["EXPID", "RCID", "MAGZP", "APCOR*"],
            )
        pdf = out.toPandas()
        assert len(pdf) == 2  # corrupt file skipped
        assert set(pdf.columns) == {"EXPID", "RCID", "MAGZP", "APCOR1",
                                    "APCOR2", "PATH"}


# ---------------------------------------------------------------------------
# S11 — external fetch-then-broadcast
# ---------------------------------------------------------------------------

def test_external_lookup_join(spark, orders):
    seen_keys = []

    def fetch(keys):
        seen_keys.append(sorted(keys))
        # duplicate rows test the dedup (metadata.py:82-83)
        return pd.DataFrame(
            {"o_custkey": list(keys) + list(keys)[:5],
             "airmass": [1.0 + (k % 7) / 10 for k in keys]
             + [9.9] * min(len(keys), 5)}
        )

    small = orders.limit(200).cache()
    out = external_lookup_join(small, "o_custkey", fetch, how="inner")
    assert out.count() == small.count()  # dedup prevented fanout
    assert len(seen_keys) == 1  # ONE batched fetch, not per-row
    assert "airmass" in out.columns


def test_external_lookup_max_keys(spark, lineitem):
    with pytest.raises(ValueError, match="max_keys"):
        external_lookup_join(
            lineitem, "l_orderkey", lambda ks: pd.DataFrame({"l_orderkey": ks}),
            max_keys=10,
        )


def test_prune_catalog_by_keys(spark, customer, orders):
    big = orders.filter(F.col("o_totalprice") > 150000)
    pruned = prune_catalog_by_keys(
        customer, big.withColumnRenamed("o_custkey", "c_custkey"), ["c_custkey"]
    )
    expect = big.select("o_custkey").distinct().count()
    assert pruned.count() == expect


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def media_df(spark):
    with tempfile.TemporaryDirectory() as d:
        rng = np.random.default_rng(5)
        for i in range(6):
            with open(os.path.join(d, f"img{i}.png"), "wb") as f:
                f.write(rng.bytes(100 + i))
        yield read_binary_assets(spark, os.path.join(d, "*.png")).cache()


def test_read_binary_assets_schema(media_df):
    assert media_df.count() == 6
    row = media_df.first()
    assert row.meta.media_type == "image"
    assert row.meta.format == "png"
    assert isinstance(row.content, (bytes, bytearray))


def test_decode_media_default_raises(media_df):
    with pytest.raises(Exception, match="codec|decoder"):
        decode_media(media_df).collect()


def test_decode_and_features_with_fake_codec(media_df):
    decoded = decode_media(media_df, decoder=deterministic_fake_decoder)
    pdf = decoded.toPandas()
    assert len(pdf) == 6
    assert (pdf.height == 8).all() and (pdf.n_channels == 3).all()
    assert all(len(p) == 8 * 8 * 3 for p in pdf.pixels)

    feats = extract_image_features(decoded).toPandas()
    assert len(feats) == 6
    assert feats.mean_intensity.between(0, 255).all()
    assert all(len(c) == 3 for c in feats.channel_means)

    # determinism: same bytes → same decode
    again = decode_media(media_df, decoder=deterministic_fake_decoder).toPandas()
    a = pdf.sort_values("path").reset_index(drop=True)
    b = again.sort_values("path").reset_index(drop=True)
    assert all(list(x) == list(y) for x, y in zip(a.pixels, b.pixels))


def test_sha_cycle_decoder_replayable_features(media_df):
    """sha_cycle_decoder: pixel j == sha256 digest byte j%32, and the
    exact-sum feature math matches numpy's float formulas to fp noise —
    the property the DuckDB mm_image_features oracle relies on."""
    import hashlib

    from dataslicer_spark.sources.multimodal import sha_cycle_decoder

    decoded = decode_media(media_df, decoder=sha_cycle_decoder)
    pdf = decoded.toPandas().sort_values("path").reset_index(drop=True)
    raws = {
        r.path: bytes(r.content)
        for r in media_df.select("path", "content").collect()
    }
    for r in pdf.itertuples():
        digest = hashlib.sha256(raws[r.path]).digest()
        expect = [digest[j % 32] for j in range(8 * 8 * 3)]
        assert list(r.pixels) == expect

    feats = extract_image_features(decoded).toPandas()
    for r in feats.itertuples():
        digest = hashlib.sha256(raws[r.path]).digest()
        arr = np.array([digest[j % 32] for j in range(192)], dtype=np.float64)
        assert r.mean_intensity == arr.mean()  # integer sums: exact
        assert abs(r.std_intensity - arr.std()) < 1e-10


def test_frame_sample(media_df):
    frames = frame_sample(media_df, n_frames=3).toPandas()
    assert len(frames) == 18  # 6 blobs × 3 frames
    assert set(frames.frame_idx) == {0, 1, 2}


def test_resize_images(media_df):
    from dataslicer_spark.sources.multimodal import resize_images

    decoded = decode_media(media_df, decoder=deterministic_fake_decoder)
    resized = resize_images(decoded, out_height=4, out_width=2).toPandas()
    assert len(resized) == 6
    assert (resized.height == 4).all() and (resized.width == 2).all()
    assert all(len(p) == 4 * 2 * 3 for p in resized.pixels)
    # nearest-neighbor parity with numpy on one image
    src = decode_media(media_df, decoder=deterministic_fake_decoder).toPandas()
    src = src.sort_values("path").reset_index(drop=True)
    res = resized.sort_values("path").reset_index(drop=True)
    a = np.asarray(src.loc[0, "pixels"], dtype=np.int64).reshape(8, 8, 3)
    yi = (np.arange(4) * 8) // 4
    xi = (np.arange(2) * 8) // 2
    expect = a[yi][:, xi].reshape(-1)
    assert list(res.loc[0, "pixels"]) == list(expect)
    # composes with the feature extractor
    feats = extract_image_features(
        resize_images(decode_media(media_df, decoder=deterministic_fake_decoder), 4, 2)
    ).toPandas()
    assert len(feats) == 6


# ---------------------------------------------------------------------------
# API wrapper
# ---------------------------------------------------------------------------

def test_slicer_dataset_facade(spark, sf_dir):
    sources, metadata, _ = make_astro_fixture(spark, sf_dir)
    ds = SlicerDataset(spark, "t", metadata=metadata, objtable=sources)
    n0 = ds.objtable.count()
    ds.select_objects("flags == 0 and snr > @s", {"s": 2})
    assert ds.objtable.count() < n0
    ds.merge_metadata_to_sources(["MAGZP", "FILTERID"], join_on="OBSID")
    assert {"MAGZP", "FILTERID"} <= set(ds.objtable.columns)
    ds.metadata_driven_prune("FILTERID == 1")
    kept = ds.objtable.df.select("OBSID").distinct().collect()
    assert {r.OBSID for r in kept} <= {3}  # exposure 3 is band 1 (e%3+1)


def test_slicer_frame_verbs_chain(spark, sf_dir):
    sources, metadata, ps1cal = make_astro_fixture(spark, sf_dir)
    sf = (
        SlicerFrame(sources)
        .query_df("flags == 0")
        .cluster_sources(3.0, 2, purge_df=True)
    )
    assert "clusterID" in sf.columns
    matched = sf.match_to_PS1cal(ps1cal, 3.0, use="clusters")
    assert "dist2ps1" in matched.columns
    kept, rejected = matched.select_clusters("dist2ps1 < 1.0")
    assert kept.count() + rejected.count() == matched.count()


def test_slicer_frame_extension_verbs(spark, sf_dir):
    import pandas as pd

    left = SlicerFrame(
        spark.createDataFrame(
            pd.DataFrame({"k": [1, 1, 2], "ts": [10, 20, 5], "lid": [0, 1, 2]})
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2], "ts": [8, 9], "rv": [1.0, 2.0]})
    )
    out = left.asof_join(right, "ts", ["k"], ["rv"])
    got = {r.lid: r.rv for r in out.df.collect()}
    assert got == {0: 1.0, 1: 1.0, 2: None}

    li = SlicerFrame(
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    )
    est = li.approx_distinct(["l_orderkey"]).df.collect()[0].n_l_orderkey
    exact = li.df.select("l_orderkey").distinct().count()
    assert abs(est - exact) / exact < 0.05

    docs = SlicerFrame(
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    )
    reps, stats = docs.dedup_exact("doc_id")
    assert reps.count() == stats.count()


def test_slicer_frame_unloaded_raises(spark):
    ds = SlicerDataset(spark, "empty")
    with pytest.raises(RuntimeError, match="load"):
        ds.select_objects("x > 1")


def test_slicerframe_search_and_shards(spark, tmp_path):
    from dataslicer_spark.api import SlicerFrame

    sf = SlicerFrame(
        spark.createDataFrame(
            [(1, "spark fast spark"), (2, "slow table"), (3, "spark")],
            "doc_id long, text string",
        )
    )
    hits = sf.search(["spark"], k=2)
    rows = hits.df.collect()
    # doc 3 ("spark", dl=1) outranks doc 1 (dl=3): length normalization
    assert [r.doc_id for r in rows] == [3, 1] and len(rows) == 2
    m = sf.to_training_shards(str(tmp_path / "sh"), "doc_id", 2)
    assert m["total_rows"] == 3


def test_slicerframe_round7_verbs(spark, tmp_path):
    from pyspark.sql import functions as F

    sf = SlicerFrame(
        spark.createDataFrame(
            [
                (1, "b0 b1 b2 b3 b4 tail one"),
                (2, "b0 b1 b2 b3 b4 tail two"),
                (3, "café  x\x07y"),
            ],
            "doc_id long, text string",
        )
    )
    # clean_text: NFC + control strip + whitespace collapse
    cleaned = sf.clean_text()
    row = {r.doc_id: (r.text, r.was_changed) for r in cleaned.df.collect()}
    assert row[3] == ("café xy", True)
    assert row[1][1] is False

    # dedup_spans: shared 5-token prefix removed from the later doc
    scrubbed = sf.dedup_spans("doc_id", k=5)
    got = {r.doc_id: r.text for r in scrubbed.df.collect()}
    assert got[1].startswith("b0") and got[2] == "two"

    # to_warc round trip through the reader
    from dataslicer_spark.sources.warc import read_warc

    wpath = str(tmp_path / "w")
    sf.df.sparkSession  # noqa: B018 — session alive
    SlicerFrame(
        sf.df.select(
            F.concat(F.lit("http://x/"), F.col("doc_id")).alias("u"), "text"
        )
    ).to_warc(wpath, "u", "text")
    assert (
        read_warc(spark, wpath).filter(F.col("warc_type") == "response").count()
        == 3
    )

    # to_bucketed_table writes a catalog table with bucket metadata
    from dataslicer_spark.sources.bucketed import bucket_spec

    sf.to_bucketed_table("api_bucketed_t", ["doc_id"], 2)
    try:
        assert bucket_spec(spark, "api_bucketed_t") == (["doc_id"], 2)
    finally:
        spark.sql("DROP TABLE IF EXISTS api_bucketed_t")


def test_csv_sink_source_roundtrip(spark, tmp_path):
    """S4 (gzip CSV sink) + S5 (CSV source, dataset_base.py:139-170
    semantics: header + inferSchema read of a cached csv): write through
    the facade sink, read back with the engine-native source, exact
    values and inferred types."""
    import pyspark.sql.functions as F

    from dataslicer_spark.api import SlicerFrame

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.25), (3, "c,with comma", 0.0)],
        "k long, name string, val double",
    )
    path = str(tmp_path / "csvcache")
    SlicerFrame(df).to_csv(path)
    import glob as g

    files = g.glob(path + "/part-*.csv.gz")
    assert files, "sink must write gzip csv shards"
    back = spark.read.csv(path, header=True, inferSchema=True)
    got = {r.k: (r.name, r.val) for r in back.collect()}
    assert got == {1: ("a", 1.5), 2: ("b", -2.25), 3: ("c,with comma", 0.0)}
    # inferSchema restores numeric types (the reference relies on
    # pandas' read_csv inference the same way)
    kinds = dict(back.dtypes)
    assert kinds["k"] in ("int", "bigint") and kinds["val"] == "double"
