"""WARC source/sink (sources/warc.py): byte-exact round trip including
adversarial payloads, Content-Length framing, corrupt-tail tolerance."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dataslicer_spark.sources.warc import read_warc, write_warc


def _detamper_crc(part_path):
    """Remove Hadoop's .crc sidecar so local-FS checksum validation
    doesn't mask the parser's own corrupt-tail handling."""
    d, f = os.path.split(part_path)
    crc = os.path.join(d, f".{f}.crc")
    if os.path.exists(crc):
        os.remove(crc)


ROWS = [
    (1, "plain words"),
    # payload containing WARC framing bytes — line-based parsing would
    # split here; Content-Length framing must not
    (2, "evil\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\npayload"),
    (3, "unicode: héllo wörld ∑ 中文"),
    (4, ""),  # empty payload is a valid 0-length record
    (5, "trailing spaces   "),
]


def _write(spark, tmp_path, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id int, text string").select(
        F.concat(F.lit("http://x/doc/"), F.col("doc_id")).alias("uri"),
        "text",
    )
    path = str(tmp_path / "warc")
    write_warc(df, path, "uri", "text", **kw)
    return path


def test_roundtrip_exact(spark, tmp_path):
    path = _write(spark, tmp_path, ROWS, n_shards=2)
    got = {
        int(r.target_uri.rsplit("/", 1)[-1]): r.payload
        for r in read_warc(spark, path)
        .filter(F.col("warc_type") == "response")
        .collect()
    }
    assert got == dict(ROWS)


def test_content_length_is_octets(spark, tmp_path):
    path = _write(spark, tmp_path, ROWS)
    r = (
        read_warc(spark, path)
        .filter(F.col("target_uri").endswith("/3"))
        .collect()[0]
    )
    assert r.content_length == len(ROWS[2][1].encode("utf-8"))
    assert r.content_length > len(ROWS[2][1])  # multibyte chars present


def test_null_uri_or_payload_dropped(spark, tmp_path):
    rows = [(1, "keep"), (2, None)]
    path = _write(spark, tmp_path, rows)
    out = read_warc(spark, path).filter(F.col("warc_type") == "response")
    assert out.count() == 1


def test_shard_count_and_gzip(spark, tmp_path):
    path = _write(spark, tmp_path, ROWS, n_shards=3)
    parts = [f for f in os.listdir(path) if f.startswith("part-")]
    assert len(parts) == 3
    assert all(f.endswith(".gz") for f in parts)
    # uncompressed shards parse identically
    path2 = _write(spark, tmp_path / "u", ROWS, compress=False)
    assert (
        read_warc(spark, path2)
        .filter(F.col("warc_type") == "response")
        .count()
        == len(ROWS)
    )


def test_corrupt_tail_yields_marker_not_failure(spark, tmp_path):
    path = _write(spark, tmp_path, [(1, "good record")], compress=False)
    part = next(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.startswith("part-")
    )
    with open(part, "ab") as f:
        f.write(b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 9999"
                b"\r\n\r\nshort")
    _detamper_crc(part)
    out = read_warc(spark, path).collect()
    types = sorted(r.warc_type for r in out)
    assert types == ["_corrupt", "response"]
    bad = next(r for r in out if r.warc_type == "_corrupt")
    assert "truncated" in bad.content_type


def test_truncated_gzip_is_corrupt_not_crash(spark, tmp_path):
    path = _write(spark, tmp_path, ROWS, n_shards=1)
    part = next(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.startswith("part-")
    )
    blob = open(part, "rb").read()
    with open(part, "wb") as f:
        f.write(blob[: len(blob) // 2])
    _detamper_crc(part)
    out = read_warc(spark, path).collect()
    assert all(r.warc_type in ("response", "_corrupt") for r in out)


def test_missing_content_length_header(spark, tmp_path):
    path = tmp_path / "manual"
    os.makedirs(path)
    with open(path / "part-00000.warc", "wb") as f:
        f.write(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nno length")
    out = read_warc(spark, str(path)).collect()
    assert len(out) == 1 and out[0].warc_type == "_corrupt"
    assert "Content-Length" in out[0].content_type


def test_real_world_shard_names_and_no_match_raises(spark, tmp_path):
    # Common Crawl naming (CC-MAIN-*.warc.gz) must be picked up by the
    # default glob fallback, and a directory with NO matching shards
    # must raise rather than silently return an empty frame
    import gzip

    import pytest

    path = tmp_path / "crawl"
    os.makedirs(path)
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:1>\r\n"
        b"WARC-Target-URI: http://x/1\r\nContent-Length: 5\r\n\r\n"
        b"hello\r\n\r\n"
    )
    with gzip.open(
        path / "CC-MAIN-20260815-00000.warc.gz", "wb"
    ) as f:
        f.write(rec)
    out = read_warc(spark, str(path)).collect()
    assert [r.payload for r in out] == ["hello"]
    empty = tmp_path / "nothing"
    os.makedirs(empty)
    (empty / "data.txt").write_text("not a warc")
    with pytest.raises(FileNotFoundError, match="glob"):
        read_warc(spark, str(empty))
