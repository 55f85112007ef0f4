"""Tests for the Spark 4 Python DataSource FITS connector
(sources/fits_datasource.py): per-file partitions, schema inference,
projection via .schema(), and pushFilters pushdown."""

from __future__ import annotations

import os
import struct
import tempfile

import pytest
from pyspark.sql import types as T
from pyspark.sql.datasource import EqualTo, GreaterThan, IsNull, LessThan

from dataslicer_spark.sources.fits_datasource import (
    FitsDataSource,
    FitsReader,
    register_fits_source,
    synthetic_fits_parser,
)

PARSER = "dataslicer_spark.sources.fits_datasource:synthetic_fits_parser"


def _fake_fits_bytes(n_rows: int, seed: int) -> bytes:
    return struct.pack("<ii", seed, n_rows)


@pytest.fixture()
def fits_dir():
    with tempfile.TemporaryDirectory() as d:
        for i in range(4):
            with open(os.path.join(d, f"file{i}.fits"), "wb") as f:
                f.write(_fake_fits_bytes(50 + 10 * i, seed=i))
        yield d


def test_datasource_read_and_partitions(spark, fits_dir):
    register_fits_source(spark)
    out = (
        spark.read.format("fits")
        .option("parser", PARSER)
        .load(os.path.join(fits_dir, "*.fits"))
    )
    # inferred schema = parser columns + PATH
    assert set(out.columns) == {"sourceid", "ra", "dec", "mag", "flags", "PATH"}
    pdf = out.toPandas()
    assert len(pdf) == 50 + 60 + 70 + 80
    assert pdf.PATH.nunique() == 4
    # one scan partition per file — the distribution contract
    assert out.rdd.getNumPartitions() == 4


def test_datasource_projection_via_schema(spark, fits_dir):
    register_fits_source(spark)
    schema = T.StructType(
        [
            T.StructField("sourceid", T.LongType()),
            T.StructField("mag", T.DoubleType()),
            T.StructField("PATH", T.StringType()),
        ]
    )
    out = (
        spark.read.format("fits")
        .schema(schema)
        .option("parser", PARSER)
        .load(os.path.join(fits_dir, "*.fits"))
    )
    pdf = out.toPandas()
    assert list(pdf.columns) == ["sourceid", "mag", "PATH"]
    assert len(pdf) == 260


def test_datasource_filter_pushdown_results(spark, fits_dir):
    register_fits_source(spark)
    out = (
        spark.read.format("fits")
        .option("parser", PARSER)
        .load(os.path.join(fits_dir, "*.fits"))
        .filter("mag < 18 and flags = 0")
    )
    pdf = out.toPandas()
    assert (pdf["mag"] < 18).all() and (pdf["flags"] == 0).all()
    expect = 0
    for i in range(4):
        t = synthetic_fits_parser(_fake_fits_bytes(50 + 10 * i, seed=i))
        expect += int(((t["mag"] < 18) & (t["flags"] == 0)).sum())
    assert len(pdf) == expect


def test_push_filters_split():
    schema = T.StructType(
        [
            T.StructField("mag", T.DoubleType()),
            T.StructField("flags", T.IntegerType()),
            T.StructField("PATH", T.StringType()),
        ]
    )
    reader = FitsReader(schema, {"path": "/tmp/x*.fits"})
    supported_eq = EqualTo(("flags",), 0)
    supported_lt = LessThan(("mag",), 18.0)
    unsupported_null = IsNull(("mag",))       # not in our accept list
    unsupported_path = GreaterThan(("PATH",), "a")  # PATH is reader-added
    rest = list(
        reader.pushFilters(
            [supported_eq, supported_lt, unsupported_null, unsupported_path]
        )
    )
    assert reader.pushed == [supported_eq, supported_lt]
    assert rest == [unsupported_null, unsupported_path]


def test_datasource_in_filter_pushdown(spark, fits_dir):
    register_fits_source(spark)
    out = (
        spark.read.format("fits")
        .option("parser", PARSER)
        .load(os.path.join(fits_dir, "*.fits"))
        .filter("flags in (0, 2) and sourceid is not null")
    )
    pdf = out.toPandas()
    assert set(pdf["flags"].unique()) <= {0, 2}
    expect = 0
    for i in range(4):
        t = synthetic_fits_parser(_fake_fits_bytes(50 + 10 * i, seed=i))
        expect += int(t["flags"].isin([0, 2]).sum())
    assert len(pdf) == expect


def test_datasource_explicit_name():
    assert FitsDataSource.name() == "fits"
