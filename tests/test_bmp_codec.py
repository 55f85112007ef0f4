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


def test_phash_image_near_dup(spark, tmp_path):
    """Perceptual-hash dedup on real BMP bytes: noisy re-encodes of the
    same photo pair up within a small Hamming distance, unrelated photos
    don't, and identical pixels hash identically (hamming 0)."""
    from dataslicer_spark.sources.multimodal import (
        image_near_dup,
        phash64_images,
    )

    rng = np.random.default_rng(42)
    # natural-ish structure: coarse random blocks upsampled — the
    # low-frequency energy pHash keys on (an analytic gradient has
    # near-zero DCT coefficients whose signs noise flips freely)
    base = np.kron(
        rng.integers(0, 256, (6, 8, 3)), np.ones((8, 8, 1))
    ).astype(np.uint8)  # 48×64
    noisy = base.astype(np.int32) + rng.integers(-6, 7, base.shape)
    noisy = np.clip(noisy, 0, 255).astype(np.uint8)
    other = np.kron(
        rng.integers(0, 256, (6, 8, 3)), np.ones((8, 8, 1))
    ).astype(np.uint8)

    d = tmp_path / "imgs"
    d.mkdir()
    (d / "a_base.bmp").write_bytes(bmp_encode(base))
    (d / "b_copy.bmp").write_bytes(bmp_encode(base))  # exact copy
    (d / "c_noisy.bmp").write_bytes(bmp_encode(noisy))  # near-dup
    (d / "d_other.bmp").write_bytes(bmp_encode(other))  # unrelated
    (d / "e_corrupt.bmp").write_bytes(b"BM junk")

    decoded = decode_media(read_binary_assets(spark, str(d / "*.bmp")))
    hashes = {
        os.path.basename(r.path): r.phash
        for r in phash64_images(decoded).collect()
    }
    assert hashes["a_base.bmp"] == hashes["b_copy.bmp"]
    assert hashes["e_corrupt.bmp"] is None

    pairs = {
        tuple(
            sorted((os.path.basename(r.id_a), os.path.basename(r.id_b)))
        ): r.hamming
        for r in image_near_dup(decoded, max_hamming=10).collect()
    }
    assert pairs[("a_base.bmp", "b_copy.bmp")] == 0
    assert ("a_base.bmp", "c_noisy.bmp") in pairs
    assert ("b_copy.bmp", "c_noisy.bmp") in pairs
    # the unrelated image pairs with nothing
    assert not any("d_other.bmp" in p for p in pairs)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        phash64_images(decoded, keep=4)
