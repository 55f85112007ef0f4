"""WARC source/sink — web-archive ingestion, the front door of a web
corpus (Common Crawl ships as WARC; ISO 28500).

An LLM-scale text pipeline starts from crawl archives, not parquet.
This module makes WARC a first-class format on both sides:

- **sink**: each record is rendered as one WARC/1.0 response record by
  pure JVM string expressions (version line, headers, Content-Length in
  octets, CRLF framing) and written with Spark's distributed ``text``
  writer (``lineSep`` supplies the final CRLF) — so the shard files
  are exactly concatenated records, one shard per partition, gzipped
  (``.warc.gz``).  No Python runs in the write path.
- **source**: ``spark.read.format("binaryFile")`` lists the shards
  (distributed, one task per file) and a ``mapInPandas`` parser walks
  each shard by ``Content-Length`` — the only correct framing for WARC
  (payloads may contain anything, including header-lookalike bytes, so
  line-splitting is wrong by construction).  Malformed trailing bytes
  in a shard are skipped with a counted ``_corrupt`` marker record
  rather than failing the scan (PERMISSIVE semantics, like the media
  decoders in ``sources/multimodal.py``).

Scale notes: one WARC shard = one scan task, the Common Crawl layout
(~1 GB shards × ~90k files per crawl) — file-level parallelism is the
unit of work, and the parser streams each shard once.  Shard bytes
never shuffle; downstream filters/projection prune parsed columns as
usual.  Whole-file gzip (not per-record gzip members) is used for the
sink because Spark's text writer compresses per file; the reader
handles either for its own output and plain ``.warc``.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..utils import check_col

_CRLF = "\r\n"

#: parsed-record schema (payload as string: WARC stores octets; the
#: text pipeline wants UTF-8 — undecodable bytes surface via replacement
#: characters rather than a failed scan)
WARC_SCHEMA = StructType(
    [
        StructField("warc_file", StringType()),
        StructField("record_seq", IntegerType()),
        StructField("warc_type", StringType()),
        StructField("record_id", StringType()),
        StructField("warc_date", StringType()),
        StructField("target_uri", StringType()),
        StructField("content_type", StringType()),
        StructField("content_length", LongType()),
        StructField("payload", StringType()),
    ]
)


def warc_record(
    uri: Column,
    payload: Column,
    date: Column | None = None,
    record_id: Column | None = None,
    content_type: str = "text/plain",
    terminator: str = _CRLF + _CRLF,
) -> Column:
    """One WARC/1.0 response record as a JVM string expression.

    ``Content-Length`` is the payload's octet length (UTF-8 bytes, not
    characters) — the field every conformant reader frames by.
    ``terminator`` is the post-payload framing (two CRLFs per the
    spec); :func:`write_warc` passes one CRLF and lets the text
    writer's ``lineSep`` supply the other, since Spark terminates every
    row with ``lineSep`` and rejects an empty one."""
    date = date if date is not None else F.lit("2026-01-01T00:00:00Z")
    record_id = (
        record_id
        if record_id is not None
        else F.concat(F.lit("<urn:md5:"), F.md5(uri), F.lit(">"))
    )
    return F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: response" + _CRLF),
        F.lit("WARC-Record-ID: "), record_id, F.lit(_CRLF),
        F.lit("WARC-Date: "), date, F.lit(_CRLF),
        F.lit("WARC-Target-URI: "), uri, F.lit(_CRLF),
        F.lit(f"Content-Type: {content_type}" + _CRLF),
        F.lit("Content-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit(_CRLF + _CRLF),
        payload,
        F.lit(terminator),
    )


def write_warc(
    df: DataFrame,
    path: str,
    uri_col: str,
    payload_col: str,
    date_col: str | None = None,
    n_shards: int | None = None,
    compress: bool = True,
) -> None:
    """Export ``df`` as WARC shards at ``path`` (one file per
    partition; ``n_shards`` repartitions first for a fixed shard
    count).  Rows with NULL uri or payload are dropped — WARC cannot
    represent them."""
    check_col([uri_col, payload_col], df)
    recs = df.filter(
        F.col(uri_col).isNotNull() & F.col(payload_col).isNotNull()
    ).select(
        warc_record(
            F.col(uri_col),
            F.col(payload_col),
            F.col(date_col) if date_col else None,
            terminator=_CRLF,
        ).alias("value")
    )
    if n_shards:
        recs = recs.repartition(n_shards)
    w = recs.write.mode("overwrite").option("lineSep", _CRLF)
    if compress:
        w = w.option("compression", "gzip")
    w.text(path)


def _parse_shard(name: str, blob: bytes) -> Iterator[dict]:
    """Walk one shard by Content-Length framing."""
    if blob[:2] == b"\x1f\x8b":
        try:
            blob = gzip.GzipFile(fileobj=io.BytesIO(blob)).read()
        except (OSError, EOFError) as e:
            yield _corrupt(name, 0, f"gzip: {e}")
            return
    pos, seq = 0, 0
    n = len(blob)
    while True:
        start = blob.find(b"WARC/", pos)
        if start < 0:
            break
        head_end = blob.find(b"\r\n\r\n", start)
        if head_end < 0:
            yield _corrupt(name, seq, "unterminated header block")
            return
        headers: dict[str, str] = {}
        lines = blob[start:head_end].split(b"\r\n")
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            if v:
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            yield _corrupt(name, seq, "missing/invalid Content-Length")
            return
        body_start = head_end + 4
        if body_start + length > n:
            yield _corrupt(name, seq, "payload truncated")
            return
        payload = blob[body_start : body_start + length]
        yield {
            "warc_file": name,
            "record_seq": seq,
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id"),
            "warc_date": headers.get("warc-date"),
            "target_uri": headers.get("warc-target-uri"),
            "content_type": headers.get("content-type"),
            "content_length": length,
            "payload": payload.decode("utf-8", "replace"),
        }
        seq += 1
        pos = body_start + length


def _corrupt(name: str, seq: int, why: str) -> dict:
    return {
        "warc_file": name,
        "record_seq": seq,
        "warc_type": "_corrupt",
        "record_id": None,
        "warc_date": None,
        "target_uri": None,
        "content_type": why,
        "content_length": None,
        "payload": None,
    }


def read_warc(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Parse WARC shards under ``path`` into :data:`WARC_SCHEMA`.

    ``binaryFile`` gives one task per shard (Common Crawl's unit of
    parallelism); the Arrow-batched parser frames records by
    ``Content-Length``.  Corrupt shard tails become ``_corrupt`` rows
    — filter ``warc_type = 'response'`` for clean payloads.

    ``glob`` selects which files count as shards.  The default matches
    both :func:`write_warc` output (``part-*``) and real-world WARC
    names (``CC-MAIN-*.warc.gz`` etc. — anything containing ``.warc``);
    matching NO files raises instead of silently returning an empty
    frame, because "empty crawl" and "wrong glob" must not look alike.
    """

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                rec
                for p, blob in zip(pdf["path"], pdf["content"])
                for rec in _parse_shard(p.rsplit("/", 1)[-1], bytes(blob))
            ]
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    globs = [glob] if glob is not None else ["part-*", "*.warc*"]
    files = None
    for g in globs:
        cand = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", g)
            .load(path)
        )
        if cand.limit(1).count() > 0:
            files = cand
            break
    if files is None:
        raise FileNotFoundError(
            f"read_warc: no files matching {globs} under {path!r} — "
            "pass glob= to select your shard naming scheme"
        )
    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


__all__ = ["warc_record", "write_warc", "read_warc", "WARC_SCHEMA"]
