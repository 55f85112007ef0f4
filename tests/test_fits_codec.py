"""S2/S3 certified against REAL FITS bytes (round-8 stretch): the
zero-dependency binary-table codec (sources/fits_codec.py) + the
committed hand-verified fixture tests/fixtures/sample_bintable.fits,
read through BOTH Spark paths — the Spark 4 Python DataSource
(``spark.read.format("fits")``) and the binaryFile+mapInPandas scan
(``read_fits_tables``) — with exact values.

Reference semantics certified: df_utils.py:11-74 (one BINTABLE
extension per file, endianness normalization, wildcard projection, row
filter in the reader) and metadata.py:106-175 (header scan with
corrupt-file skip)."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import types as T

from dataslicer_spark.sources.fits_codec import (
    parse_fits_bintable,
    read_fits_header_dict,
    write_fits_bintable,
)

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "sample_bintable.fits"
)
CODEC = "dataslicer_spark.sources.fits_codec:parse_fits_bintable"

# the fixture's exact contents (mirrors its generator)
N = 12
EXPECT = {
    "sourceid": np.arange(1001, 1001 + N, dtype=np.int64),
    "ra": (np.arange(N) * 7919 % 3600) / 10.0,
    "dec": (np.arange(N) * 104729 % 1200) / 10.0 - 60.0,
    "mag": (15.0 + np.arange(N) * 0.25).astype(np.float32),
    "flags": (np.arange(N) % 3).astype(np.int16),
    "good": np.arange(N) % 3 == 0,
    "band": ["g", "r", "i"] * 4,
}


def test_fixture_is_standard_conformant_bytes():
    raw = open(FIXTURE, "rb").read()
    # 2880-byte blocks; SIMPLE card with fixed-format T in column 30;
    # BINTABLE XTENSION; big-endian data rows — checked against the
    # FITS 4.0 layout directly, independent of the codec under test
    assert len(raw) % 2880 == 0
    assert raw[:30] == b"SIMPLE  =                    T"
    assert raw[2880:2900] == b"XTENSION= 'BINTABLE'"
    data = raw[5760:]
    assert int.from_bytes(data[:8], "big") == 1001  # row 0 sourceid, >i8


def test_codec_parses_committed_fixture_exactly():
    df = parse_fits_bintable(open(FIXTURE, "rb").read())
    assert list(df.columns) == list(EXPECT)
    for col, want in EXPECT.items():
        got = df[col].to_numpy()
        assert np.array_equal(got, np.asarray(want)), col
    # dtypes survive: float32 stays float32, int16 stays int16
    assert df["mag"].dtype == np.float32
    assert df["flags"].dtype == np.int16
    assert df["good"].dtype == np.bool_


def test_spark_datasource_reads_real_fits(spark, tmp_path):
    from dataslicer_spark.sources.fits_datasource import register_fits_source

    register_fits_source(spark)
    shutil.copy(FIXTURE, tmp_path / "a.fits")
    shutil.copy(FIXTURE, tmp_path / "b.fits")
    out = (
        spark.read.format("fits")
        .option("parser", CODEC)
        .load(str(tmp_path / "*.fits"))
    )
    rows = out.collect()
    assert len(rows) == 2 * N
    assert out.rdd.getNumPartitions() == 2  # one partition per file
    got = {
        (r.sourceid, r.band): (r.ra, r.dec, r.flags, r.good)
        for r in rows
        if r.PATH.endswith("a.fits")
    }
    for i in range(N):
        sid = 1001 + i
        band = ["g", "r", "i"][i % 3]
        ra, dec, flags, good = got[(sid, band)]
        assert ra == (i * 7919 % 3600) / 10.0
        assert dec == (i * 104729 % 1200) / 10.0 - 60.0
        assert flags == i % 3
        assert good == (i % 3 == 0)


def test_spark_datasource_filter_pushdown_values(spark, tmp_path):
    from dataslicer_spark.sources.fits_datasource import register_fits_source

    register_fits_source(spark)
    shutil.copy(FIXTURE, tmp_path / "a.fits")
    out = (
        spark.read.format("fits")
        .option("parser", CODEC)
        .load(str(tmp_path / "*.fits"))
        .filter("flags = 0")
        .select("sourceid", "mag")
    )
    got = {r.sourceid: r.mag for r in out.collect()}
    want = {
        1001 + i: np.float32(15.0 + i * 0.25) for i in range(N) if i % 3 == 0
    }
    assert got == pytest.approx(want)


def test_read_fits_tables_projection_and_row_filter(spark, tmp_path):
    from dataslicer_spark.sources.fits import read_fits_tables

    shutil.copy(FIXTURE, tmp_path / "x.fits")
    schema = T.StructType(
        [
            T.StructField("sourceid", T.LongType()),
            T.StructField("ra", T.DoubleType()),
            T.StructField("PATH", T.StringType()),
        ]
    )
    out = read_fits_tables(
        spark,
        str(tmp_path / "*.fits"),
        parser=parse_fits_bintable,
        schema=schema,
        select_columns=["sourceid", "ra"],
        select_rows="sourceid >= 1006",
    )
    rows = sorted(out.collect(), key=lambda r: r.sourceid)
    assert [r.sourceid for r in rows] == list(range(1006, 1013))
    assert rows[0].ra == (5 * 7919 % 3600) / 10.0
    assert rows[0].PATH.endswith("x.fits")


def test_header_scan_skips_corrupt_file(spark, tmp_path):
    from dataslicer_spark.sources.fits import read_fits_headers

    shutil.copy(FIXTURE, tmp_path / "ok.fits")
    (tmp_path / "bad.fits").write_bytes(b"NOT A FITS FILE")
    with pytest.warns(UserWarning, match="skipping corrupted"):
        out = read_fits_headers(
            spark,
            str(tmp_path / "*.fits"),
            header_fn=read_fits_header_dict,
        )
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.SIMPLE is True and r.BITPIX == 8 and r.PATH.endswith("ok.fits")


def test_writer_parser_roundtrip_all_dtypes():
    cols = {
        "i16": np.array([-3, 0, 32000], dtype=np.int16),
        "i32": np.array([-7, 1, 2**31 - 1], dtype=np.int32),
        "i64": np.array([-(2**40), 0, 2**40], dtype=np.int64),
        "f32": np.array([1.5, -2.25, 0.0], dtype=np.float32),
        "f64": np.array([np.pi, -1e300, 1e-300], dtype=np.float64),
        "u8": np.array([0, 128, 255], dtype=np.uint8),
        "flag": np.array([True, False, True]),
        "s": np.array(["ab", "longer-text", ""]),
    }
    df = parse_fits_bintable(write_fits_bintable(cols))
    for name, want in cols.items():
        got = df[name].to_numpy()
        if name == "s":
            assert list(got) == list(want)
        else:
            assert np.array_equal(got, want), name
            assert got.dtype == want.dtype, name


def test_unsupported_tform_raises():
    raw = bytearray(open(FIXTURE, "rb").read())
    # rewrite TFORM1 'K' to a variable-length descriptor 'PJ(5)'
    hdr = raw[2880:5760].decode()
    assert "TFORM1  = 'K" in hdr
    patched = hdr.replace("TFORM1  = 'K", "TFORM1  = 'PJ(5)", 1)[:2880]
    raw[2880:5760] = patched.ljust(2880).encode()
    with pytest.raises(ValueError, match="unsupported TFORM"):
        parse_fits_bintable(bytes(raw))


def test_truncated_data_area_raises():
    raw = open(FIXTURE, "rb").read()
    with pytest.raises(ValueError, match="truncated"):
        parse_fits_bintable(raw[: 5760 + 10])


# ---------------------------------------------------------------- property

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_scalar_cols = st.dictionaries(
    keys=st.from_regex(r"[A-Z][A-Z0-9_]{0,7}", fullmatch=True),
    values=st.sampled_from(
        [np.int16, np.int32, np.int64, np.float32, np.float64, np.bool_]
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=50, deadline=None)
@given(
    spec=_scalar_cols,
    n=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_roundtrip_property(spec, n, seed):
    """write → parse is the identity for every supported dtype mix,
    row count and value pattern (pure-python, no Spark round trip)."""
    rng = np.random.default_rng(seed)
    cols = {}
    for name, dt in spec.items():
        if dt is np.bool_:
            cols[name] = rng.integers(0, 2, n).astype(bool)
        elif np.issubdtype(dt, np.integer):
            info = np.iinfo(dt)
            cols[name] = rng.integers(
                info.min, info.max, n, dtype=np.int64
            ).astype(dt)
        else:
            cols[name] = rng.normal(0, 1e3, n).astype(dt)
    df = parse_fits_bintable(write_fits_bintable(cols))
    for name, want in cols.items():
        got = df[name].to_numpy()
        assert got.dtype == want.dtype, name
        assert np.array_equal(got, want), name


def test_one_char_string_column_stays_string():
    # TFORM decides the type: a width-1 'A' column containing only
    # "T"/"F" must NOT decode as bool (only 'L' does)
    df = parse_fits_bintable(
        write_fits_bintable(
            {
                "s1": np.array(["T", "F", "T"]),
                "b": np.array([True, False, True]),
            }
        )
    )
    assert list(df.s1) == ["T", "F", "T"] and df.s1.dtype == object
    assert list(df.b) == [True, False, True] and df.b.dtype == np.bool_
