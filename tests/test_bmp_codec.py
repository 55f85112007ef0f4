"""Real-image end-to-end: the pure-numpy 24-bit BMP codec through the
full Spark decode → resize → featurize pipeline — no external codec."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataslicer_spark.sources.multimodal import (
    auto_decoder,
    bmp_decoder,
    bmp_encode,
    decode_media,
    extract_image_features,
    read_binary_assets,
    resize_images,
)


def _img(h, w, seed):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8
    )


@pytest.mark.parametrize("shape", [(5, 5), (3, 7), (8, 6), (1, 1), (2, 3)])
def test_bmp_roundtrip_exact(shape):
    # widths 7, 6, 1, 3 exercise every 4-byte row-padding remainder
    arr = _img(*shape, seed=shape[0] * 100 + shape[1])
    assert np.array_equal(bmp_decoder(bmp_encode(arr)), arr)


def test_bmp_decoder_topdown_layout():
    arr = _img(4, 3, seed=9)
    raw = bytearray(bmp_encode(arr))
    # flip the height sign to declare top-down, and re-order rows to match
    import struct

    h = struct.unpack_from("<i", raw, 22)[0]
    struct.pack_into("<i", raw, 22, -h)
    stride = (3 * 3 + 3) // 4 * 4
    px = np.frombuffer(bytes(raw[54:]), dtype=np.uint8).reshape(h, stride)
    raw[54:] = px[::-1].tobytes()
    assert np.array_equal(bmp_decoder(bytes(raw)), arr)


def test_bmp_decoder_rejects_garbage():
    with pytest.raises(ValueError):
        bmp_decoder(b"PNG not a bmp at all................................")
    with pytest.raises(ValueError):
        bmp_decoder(bmp_encode(_img(4, 4, 1))[:40])  # truncated
    with pytest.raises(NotImplementedError):
        auto_decoder(b"\x89PNG\r\n\x1a\n not supported without PIL......")


def test_spark_pipeline_on_real_bmp_files(spark, tmp_path):
    imgs = {f"im{i}.bmp": _img(6 + i, 5 + 2 * i, seed=i) for i in range(3)}
    for name, arr in imgs.items():
        (tmp_path / name).write_bytes(bmp_encode(arr))
    (tmp_path / "corrupt.bmp").write_bytes(b"BM garbage")

    assets = read_binary_assets(spark, str(tmp_path / "*.bmp"))
    decoded = decode_media(assets)  # default auto_decoder — REAL decode
    got = {os.path.basename(r.path): r for r in decoded.collect()}

    for name, arr in imgs.items():
        r = got[name]
        assert (r.height, r.width, r.n_channels) == (*arr.shape[:2], 3)
        assert np.array_equal(
            np.array(r.pixels, dtype=np.uint8).reshape(arr.shape), arr
        )
    assert got["corrupt.bmp"].pixels is None  # PERMISSIVE null row

    # resize composes: 4x4 nearest-neighbor, exact against numpy
    small = resize_images(decoded, 4, 4)
    for r in small.collect():
        name = os.path.basename(r.path)
        if name == "corrupt.bmp":
            assert r.pixels is None
            continue
        src = imgs[name]
        hi = (np.arange(4) * src.shape[0]) // 4
        wi = (np.arange(4) * src.shape[1]) // 4
        want = src[hi][:, wi]
        assert np.array_equal(
            np.array(r.pixels).reshape(4, 4, 3), want
        ), name

    # features on the real pixels
    feats = {
        os.path.basename(r.path): r
        for r in extract_image_features(decoded).collect()
    }
    for name, arr in imgs.items():
        assert feats[name].mean_intensity == pytest.approx(arr.mean())
