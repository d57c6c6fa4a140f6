"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The reference is modality-blind — blocks are opaque bytes
(`src/logpipe_api.h:110-112`), which is exactly the right model at 100 TB:
Spark carries `binary` payload columns with typed metadata structs, and all
decode/feature work happens in Arrow-batched `mapInPandas` stages so bytes
never round-trip through per-row Python.

The actual codec calls (PIL/ffmpeg/librosa) are NOT available in this
container, so the decode kernels are deterministic fakes behind
``_decode_*`` seams (clearly marked); the Spark-side contract — schema,
batching, partition sizing — is real and tested. Swapping in a real codec
changes only the seam function.

Scale notes: binary blobs make row groups huge — ``media_repartition``
targets a bytes-per-partition budget instead of a row count, the knob that
actually matters for executor memory with 1-10 MB payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# JPEG start-of-frame markers that carry dimensions (all SOFn except the
# non-frame C4=DHT, C8=JPG, CC=DAC)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_image_header(b: bytes) -> tuple[str | None, int | None, int | None]:
    """Pure-struct image header parse — (format, width, height), all None
    when the payload is not a recognized image. No codec libraries: PNG
    reads the IHDR chunk, JPEG walks the marker stream to the first SOFn,
    GIF reads the logical-screen descriptor. This replaces the former
    fully-stubbed decode metadata path (the *pixel* decode stays a seam —
    feature vectors at real deployments come from a real codec)."""
    if b.startswith(PNG_SIG) and len(b) >= 24 and b[12:16] == b"IHDR":
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        return ("png", w, h) if 0 < w and 0 < h else (None, None, None)
    if b.startswith(b"\xff\xd8"):  # JPEG SOI
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:  # desynced marker stream
                return (None, None, None)
            marker = b[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if 0xD0 <= marker <= 0xD9:  # standalone RSTn/SOI/EOI
                i += 2
                continue
            seglen = int.from_bytes(b[i + 2 : i + 4], "big")
            if seglen < 2:
                return (None, None, None)
            if marker in _JPEG_SOF:
                h = int.from_bytes(b[i + 5 : i + 7], "big")
                w = int.from_bytes(b[i + 7 : i + 9], "big")
                return ("jpeg", w, h) if 0 < w and 0 < h else (None, None, None)
            i += 2 + seglen
        return (None, None, None)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w = int.from_bytes(b[6:8], "little")
        h = int.from_bytes(b[8:10], "little")
        return ("gif", w, h) if 0 < w and 0 < h else (None, None, None)
    return (None, None, None)


def png_header_bytes(width: int, height: int) -> bytes:
    """A minimal syntactically-valid PNG prefix (signature + IHDR) for
    fixtures — parse_image_header reads exactly these fields. CRC is a
    fixed placeholder: header parsers (ours included, like `file`/ImageMagick
    ping paths) do not verify chunk CRCs."""
    ihdr = width.to_bytes(4, "big") + height.to_bytes(4, "big") + bytes(
        [8, 2, 0, 0, 0]  # bit depth 8, truecolor, deflate, none, none
    )
    return PNG_SIG + (13).to_bytes(4, "big") + b"IHDR" + ihdr + bytes(4)


def _decode_image(payload: bytes, meta) -> np.ndarray:
    """STUB decode seam — no image libs in this container.

    Deterministic fake: a pseudo-pixel array derived from the payload hash.
    Replace the body with `PIL.Image.open(io.BytesIO(payload))` in a real
    deployment; the mapInPandas plumbing around it does not change."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    w = int(meta["width"] or 8)
    hgt = int(meta["height"] or 8)
    return rng.random((min(hgt, 8), min(w, 8), 3), dtype=np.float32)


def _decode_audio(payload: bytes, meta) -> np.ndarray:
    """STUB decode seam (see _decode_image)."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return rng.random(64, dtype=np.float32)


def _frame_sample_video(payload: bytes, meta, every_n: int = 10) -> list[np.ndarray]:
    """STUB frame sampler: ``n_frames/every_n`` fake frames."""
    n = max(int((meta["n_frames"] or 0) // every_n), 1)
    h = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return [rng.random((4, 4, 3), dtype=np.float32) for _ in range(n)]


def extract_features(media: DataFrame, feature_dim: int = 16) -> DataFrame:
    """binary payload → fixed-dim feature vector, Arrow-batched.

    One mapInPandas pass: per batch, hash + header-parse + decode + pool.
    width/height come from a real PNG/JPEG/GIF header read
    (``parse_image_header``) and are null for non-images or unrecognized
    bytes. The output drops the payload (project early — don't carry blobs
    past the stage that needs them)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, hashes, sizes, widths, heights = [], [], [], [], []
            for payload, kind, meta in zip(pdf["payload"], pdf["kind"], pdf["meta"]):
                b = bytes(payload)
                hashes.append(hashlib.sha256(b).hexdigest())
                sizes.append(len(b))
                _, w, h = parse_image_header(b) if kind == "image" else (None,) * 3
                widths.append(w)
                heights.append(h)
                if kind == "image":
                    arr = _decode_image(b, meta).mean(axis=(0, 1))
                elif kind == "audio":
                    arr = _decode_audio(b, meta)
                else:
                    frames = _frame_sample_video(b, meta)
                    arr = np.stack([f.mean(axis=(0, 1)) for f in frames]).mean(axis=0)
                v = np.resize(arr.astype(np.float32), feature_dim)
                feats.append(v.tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "sha256": hashes,
                    "width": pd.Series(widths, dtype="Int32"),
                    "height": pd.Series(heights, dtype="Int32"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(_batches, schema=FEATURE_SCHEMA)


def media_repartition(media: DataFrame, target_mb: int = 64) -> DataFrame:
    """Partition by payload *bytes*, not rows: estimate total size from a
    cheap aggregate and repartition so each partition holds ~target_mb.
    With 1-10 MB blobs a row-count default would OOM executors."""
    row = media.agg(F.sum(F.length("payload")).alias("b")).first()
    total = (row["b"] if row else None) or 0
    n = max(int(total / (target_mb * 1024 * 1024)), 1)
    return media.repartition(n)


def gen_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(256, 4096)), dtype=np.uint8).tobytes()
        if kind == "image":
            # a real parseable PNG header in front of the noise body
            payload = png_header_bytes(32, 24) + payload
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                (
                    32 if kind == "image" else None,
                    24 if kind == "image" else None,
                    16000 if kind == "audio" else None,
                    100 if kind == "video" else None,
                    {"image": "png", "audio": "wav", "video": "h264"}[kind],
                ),
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
