"""Zero-dependency FITS binary-table codec — real FITS bytes without
astropy, in the same spirit as the BMP/WAV codecs in
``sources/multimodal.py``.

Why this exists: the S2/S3 FITS sources (``sources/fits.py``,
``sources/fits_datasource.py`` — reference semantics ``df_utils.py:11-74``
and ``metadata.py:106-175``) accept any ``bytes -> DataFrame`` parser,
and astropy is absent from this container, so until round 8 they had
only ever parsed a synthetic stand-in format in CI.  This module
implements the actual FITS standard (NASA/IAU FITS 4.0) for the subset
the reference reads — primary HDU + one BINTABLE extension with scalar
columns — so the Spark plumbing is certified against real FITS bytes:

- 2880-byte blocks of 36 × 80-character ASCII header cards;
- ``SIMPLE``/``XTENSION='BINTABLE'`` HDU walking with data sizes from
  ``BITPIX``/``NAXIS*``/``PCOUNT``/``GCOUNT`` (so a target extension is
  found by skipping, never by guessing offsets);
- big-endian column decoding per ``TFORMn`` (L/B/I/J/K/E/D/A) via one
  ``numpy.frombuffer`` structured view — no per-row Python;
- a writer producing canonical bytes for fixtures and roundtrips.

The parser's first parameter is named ``raw`` so it plugs straight into
``spark.read.format("fits").option("parser",
"dataslicer_spark.sources.fits_codec:parse_fits_bintable")`` and into
:func:`~dataslicer_spark.sources.fits.read_fits_tables`.

Deliberately unsupported (raise, never silently misread): variable-
length arrays ('P'/'Q'), multi-element TFORM counts > 1 (except 'A'
strings), TSCAL/TZERO rescaling, and compressed HDUs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

CARD = 80
BLOCK = 2880

# TFORM letter -> (big-endian numpy dtype, byte width)
_TFORM_DTYPES = {
    "L": ("S1", 1),  # logical 'T'/'F' bytes, decoded to bool below
    "B": (">u1", 1),
    "I": (">i2", 2),
    "J": (">i4", 4),
    "K": (">i8", 8),
    "E": (">f4", 4),
    "D": (">f8", 8),
}

_NP_TO_TFORM = {
    np.dtype(np.uint8): "B",
    np.dtype(np.int16): "I",
    np.dtype(np.int32): "J",
    np.dtype(np.int64): "K",
    np.dtype(np.float32): "E",
    np.dtype(np.float64): "D",
    np.dtype(np.bool_): "L",
}


def _card(key: str, value=None, comment: str | None = None) -> bytes:
    """One 80-char header card (fixed-format value notation)."""
    if value is None:
        text = f"{key:<8}"
        if comment:
            text += f"  {comment}"
    else:
        if isinstance(value, bool):
            v = "T" if value else "F"
            body = f"{v:>20}"
        elif isinstance(value, str):
            body = f"'{value:<8}'"  # min 8 chars inside quotes, standard
        else:
            body = f"{value:>20}"
        text = f"{key:<8}= {body}"
        if comment:
            text += f" / {comment}"
    if len(text) > CARD:
        raise ValueError(f"card too long: {text!r}")
    return text.ljust(CARD).encode("ascii")


def _pad_block(b: bytes, fill: bytes = b" ") -> bytes:
    rem = len(b) % BLOCK
    return b if rem == 0 else b + fill * (BLOCK - rem)


def write_fits_bintable(columns: dict[str, np.ndarray]) -> bytes:
    """Render scalar columns as one FITS file: empty primary HDU + one
    BINTABLE extension.  Unicode/bytes columns become fixed-width 'A'
    fields (space-padded, the FITS convention)."""
    if not columns:
        raise ValueError("write_fits_bintable: no columns")
    columns = dict(columns)  # normalized copies below; don't mutate input
    n_rows = len(next(iter(columns.values())))
    names, tforms, fields = [], [], []
    for name, arr in columns.items():
        arr = np.asarray(arr)
        if len(arr) != n_rows:
            raise ValueError(f"column {name!r} length mismatch")
        if arr.dtype.kind in ("U", "S", "O"):
            as_bytes = np.array(
                [str(v).encode("ascii") for v in arr], dtype="S"
            )
            width = max(1, as_bytes.dtype.itemsize)
            names.append(name)
            tforms.append(f"{width}A")
            fields.append((name, f"S{width}"))
            columns[name] = as_bytes
        else:
            code = _NP_TO_TFORM.get(arr.dtype.newbyteorder("="))
            if code is None:
                raise ValueError(
                    f"unsupported dtype {arr.dtype} for column {name!r}"
                )
            names.append(name)
            tforms.append(code)
            if code == "L":
                fields.append((name, "S1"))
                columns[name] = np.where(arr, b"T", b"F").astype("S1")
            else:
                fields.append((name, _TFORM_DTYPES[code][0]))
                columns[name] = arr
    rec = np.zeros(n_rows, dtype=[(n, d) for n, d in fields])
    for name, arr in columns.items():
        rec[name] = arr
    row_bytes = rec.dtype.itemsize

    primary = _pad_block(
        b"".join(
            [
                _card("SIMPLE", True, "conforms to FITS standard"),
                _card("BITPIX", 8),
                _card("NAXIS", 0),
                _card("EXTEND", True),
                _card("END"),
            ]
        )
    )
    ext_cards = [
        _card("XTENSION", "BINTABLE", "binary table extension"),
        _card("BITPIX", 8),
        _card("NAXIS", 2),
        _card("NAXIS1", row_bytes, "bytes per row"),
        _card("NAXIS2", n_rows, "number of rows"),
        _card("PCOUNT", 0),
        _card("GCOUNT", 1),
        _card("TFIELDS", len(names)),
    ]
    for i, (name, tf) in enumerate(zip(names, tforms), start=1):
        ext_cards.append(_card(f"TTYPE{i}", name))
        ext_cards.append(_card(f"TFORM{i}", tf))
    ext_cards.append(_card("END"))
    ext_header = _pad_block(b"".join(ext_cards))
    data = _pad_block(rec.tobytes(), fill=b"\x00")
    return primary + ext_header + data


def _read_header(raw: bytes, off: int) -> tuple[dict, int]:
    """Parse header blocks at ``off`` until the END card; returns
    (cards, offset of the data area)."""
    cards: dict[str, str] = {}
    pos = off
    while True:
        block = raw[pos : pos + BLOCK]
        if len(block) < BLOCK:
            raise ValueError("truncated FITS header")
        pos += BLOCK
        done = False
        for i in range(0, BLOCK, CARD):
            card = block[i : i + CARD].decode("ascii", errors="replace")
            key = card[:8].strip()
            if key == "END":
                done = True
                break
            if card[8:10] == "= ":
                val = card[10:].split("/", 1)[0].strip()
                if val.startswith("'"):
                    val = val[1:].split("'", 1)[0].rstrip()
                cards[key] = val
        if done:
            return cards, pos


def _data_size(cards: dict) -> int:
    """HDU data-area size in bytes (before block padding), per the
    standard: |BITPIX|/8 · GCOUNT · (PCOUNT + Π NAXISn)."""
    naxis = int(cards.get("NAXIS", "0"))
    if naxis == 0:
        return 0
    n = 1
    for i in range(1, naxis + 1):
        n *= int(cards[f"NAXIS{i}"])
    bitpix = abs(int(cards.get("BITPIX", "8")))
    gcount = int(cards.get("GCOUNT", "1"))
    pcount = int(cards.get("PCOUNT", "0"))
    return (bitpix // 8) * gcount * (pcount + n)


def parse_fits_bintable(raw: bytes, extension: int = 1) -> pd.DataFrame:
    """bytes → DataFrame for the BINTABLE at HDU index ``extension``.

    Columns come back in native byte order (the endianness
    normalization the reference does in ``df_utils.py:66-68``); 'A'
    fields decode to stripped ``str``, 'L' to ``bool``."""
    if not raw.startswith(b"SIMPLE  ="):
        raise ValueError("not a FITS file (missing SIMPLE card)")
    off = 0
    cards: dict = {}
    for _ in range(extension + 1):
        cards, off = _read_header(raw, off)
        size = _data_size(cards)
        padded = (size + BLOCK - 1) // BLOCK * BLOCK
        data_off = off
        off += padded
    if cards.get("XTENSION", "").strip() != "BINTABLE":
        raise ValueError(
            f"HDU {extension} is not a BINTABLE "
            f"(XTENSION={cards.get('XTENSION')!r})"
        )
    n_rows = int(cards["NAXIS2"])
    row_bytes = int(cards["NAXIS1"])
    tfields = int(cards["TFIELDS"])
    names, dtypes, letters = [], [], {}
    for i in range(1, tfields + 1):
        name = cards.get(f"TTYPE{i}", f"col{i}")
        tform = cards[f"TFORM{i}"].strip()
        # split repeat count and type letter
        j = 0
        while j < len(tform) and tform[j].isdigit():
            j += 1
        count = int(tform[:j]) if j else 1
        letter = tform[j]
        if letter == "A":
            dtypes.append((name, f"S{count}"))
        elif letter in _TFORM_DTYPES and count == 1:
            dtypes.append((name, _TFORM_DTYPES[letter][0]))
        else:
            raise ValueError(
                f"unsupported TFORM {tform!r} for column {name!r}"
            )
        names.append(name)
        letters[name] = letter
    dt = np.dtype(dtypes)
    if dt.itemsize != row_bytes:
        raise ValueError(
            f"TFORM widths sum to {dt.itemsize}, NAXIS1 says {row_bytes}"
        )
    end = data_off + n_rows * row_bytes
    if end > len(raw):
        raise ValueError("truncated FITS data area")
    rec = np.frombuffer(raw[data_off:end], dtype=dt)
    out = {}
    for name in names:
        vals = rec[name]
        # the TFORM letter decides, never the values: a width-1 'A'
        # column that happens to contain only "T"/"F" must stay a
        # string, and 'L' is bool by definition
        if letters[name] == "L":
            out[name] = vals == b"T"
        elif vals.dtype.kind == "S":
            out[name] = np.array(
                [v.decode("ascii").rstrip() for v in vals], dtype=object
            )
        elif vals.dtype.byteorder == ">":
            out[name] = vals.byteswap().view(vals.dtype.newbyteorder())
        else:
            out[name] = vals
    return pd.DataFrame(out)


def read_fits_header_dict(path: str) -> dict:
    """Primary-header scan for :func:`~..sources.fits.read_fits_headers`
    (S3, reference ``metadata.load_header_meta`` metadata.py:106-175):
    returns the primary HDU's cards; numeric strings come back as int/
    float.  Raises OSError on corrupt bytes, which the caller's skip
    logic (metadata.py:156-157 semantics) turns into a warning."""
    with open(path, "rb") as fh:
        raw = fh.read()
    if not raw.startswith(b"SIMPLE  ="):
        raise OSError(f"{path}: not a FITS file")
    try:
        cards, _ = _read_header(raw, 0)
    except ValueError as e:
        raise OSError(f"{path}: {e}") from e
    out: dict = {}
    for k, v in cards.items():
        if v in ("T", "F"):
            out[k] = v == "T"
            continue
        try:
            out[k] = int(v)
        except ValueError:
            try:
                out[k] = float(v)
            except ValueError:
                out[k] = v
    return out


__all__ = [
    "write_fits_bintable",
    "parse_fits_bintable",
    "read_fits_header_dict",
]
