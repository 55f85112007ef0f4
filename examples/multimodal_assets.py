"""End-user drive of the multimodal asset pipeline on REAL media files —
no external codecs: the engine's pure-numpy BMP and WAV codecs.

Run:  python examples/multimodal_assets.py

Generates a small asset directory (BMP images + WAV clips + one corrupt
file of each kind), then runs the production shapes:

  images: binaryFile scan → decode → resize 8×8 → intensity features
  audio:  binaryFile scan → decode → loudness/activity features

Corrupt files flow through as NULL rows (PERMISSIVE), never task
failures — the behavior a 100 TB asset crawl needs.
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataslicer_spark.session import get_spark
from dataslicer_spark.sources.multimodal import (
    bmp_encode,
    decode_audio,
    decode_media,
    extract_audio_features,
    extract_image_features,
    read_binary_assets,
    resize_images,
    wav_encode,
)


def main() -> None:
    spark = get_spark("multimodal-assets")
    rng = np.random.default_rng(42)
    root = tempfile.mkdtemp(prefix="mm_assets_")

    for i in range(4):
        arr = rng.integers(0, 256, (16 + i, 12 + i, 3), dtype=np.uint8)
        with open(os.path.join(root, f"img{i}.bmp"), "wb") as f:
            f.write(bmp_encode(arr))
    with open(os.path.join(root, "broken.bmp"), "wb") as f:
        f.write(b"BM not really a bitmap")
    # a near-duplicate: coarse-structure photo + its noisy re-encode
    photo = np.kron(
        rng.integers(0, 256, (6, 8, 3)), np.ones((8, 8, 1))
    ).astype(np.uint8)
    with open(os.path.join(root, "photo.bmp"), "wb") as f:
        f.write(bmp_encode(photo))
    redo = np.clip(
        photo.astype(np.int32) + rng.integers(-5, 6, photo.shape), 0, 255
    ).astype(np.uint8)
    with open(os.path.join(root, "photo_reencode.bmp"), "wb") as f:
        f.write(bmp_encode(redo))

    for i, hz in enumerate((220, 440, 880)):
        t = np.arange(8000) / 8000.0
        x = (9000 * np.sin(2 * np.pi * hz * t)).astype(np.int16)
        with open(os.path.join(root, f"clip{i}.wav"), "wb") as f:
            f.write(wav_encode(x, 8000))
    with open(os.path.join(root, "broken.wav"), "wb") as f:
        f.write(b"RIFFxxxxWAVEjunk")

    imgs = read_binary_assets(spark, os.path.join(root, "*.bmp"))
    decoded = decode_media(imgs)  # auto_decoder: real BMP decode
    feats = (
        resize_images(decoded, 8, 8)
        .transform(extract_image_features)
        .orderBy("path")
    )
    print("image features (8x8 resize):")
    feats.select(
        F.element_at(F.split("path", "/"), -1).alias("file"),
        F.round("mean_intensity", 2).alias("mean"),
        F.round("std_intensity", 2).alias("std"),
    ).show(truncate=False)

    from dataslicer_spark.sources.multimodal import image_near_dup

    dups = image_near_dup(decoded, max_hamming=10)
    print("perceptual near-dup image pairs:")
    dups.select(
        F.element_at(F.split("id_a", "/"), -1).alias("a"),
        F.element_at(F.split("id_b", "/"), -1).alias("b"),
        "hamming",
    ).show(truncate=False)

    clips = read_binary_assets(
        spark, os.path.join(root, "*.wav"), media_type="audio"
    )
    afeats = extract_audio_features(decode_audio(clips)).orderBy("path")
    print("audio features:")
    afeats.select(
        F.element_at(F.split("path", "/"), -1).alias("file"),
        "duration_ms",
        F.round("rms", 1).alias("rms"),
        "peak",
        F.round("zero_crossing_rate", 4).alias("zcr"),
    ).show(truncate=False)


if __name__ == "__main__":
    main()
