"""Multimodal columns: image/audio/video as opaque binary columns with typed
metadata, processed by Arrow-batched pandas UDFs over mapInPandas.

The decode step is STUBBED (no image/audio libs in this container): decoders
raise NotImplementedError unless ``fake=True``, in which case a deterministic
fake (seeded by content hash) exercises the full Spark-side plumbing —
schema, batch shapes, partitioning — which is the part that matters for the
engine. Swap `_decode_image_real` for a Pillow/ffmpeg call on a real
cluster; nothing else changes.

Scale: mapInPandas streams Arrow batches (no per-row pickling); repartition
by a content-hash column first so big binaries spread evenly regardless of
source skew.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = ("doc_id long, width int, height int, channels int, "
                     "format string, feat array<float>")


def _decode_image_real(data: bytes) -> tuple[int, int, int, str, list[float]]:
    """Real decode path: used automatically when Pillow is installed on the
    cluster (import guarded — this container has no image libs, so without
    Pillow it raises and ``fake=True`` is the way to test the plumbing).
    Feature = per-channel means + stds + overall min/max of an 8x8
    thumbnail, normalized to [0,1] — a cheap, deterministic embedding."""
    try:
        import io

        from PIL import Image  # noqa: PLC0415 — optional dependency
    except ImportError as e:  # pragma: no cover - exercised off-container
        raise NotImplementedError(
            "image decode requires Pillow — not in this container; "
            "use fake=True for plumbing tests") from e
    img = Image.open(io.BytesIO(data))
    img.load()
    mode = img.mode
    channels = len(img.getbands())
    thumb = img.convert("RGB").resize((8, 8))
    import numpy as np
    px = np.asarray(thumb, dtype="float64") / 255.0
    feat = (list(px.mean(axis=(0, 1))) + list(px.std(axis=(0, 1)))
            + [float(px.min()), float(px.max())])
    return img.width, img.height, channels, f"pil/{mode.lower()}", \
        [float(x) for x in feat]


def _decode_image_fake(data: bytes) -> tuple[int, int, int, str, list[float]]:
    """Deterministic fake decode: dims + an 8-dim 'feature' from content md5."""
    h = hashlib.md5(data).digest()
    w, hh = 64 + h[0], 64 + h[1]
    feat = [b / 255.0 for b in h[:8]]
    return w, hh, 3, "fake/rgb", feat


def image_features(df: DataFrame, binary_col: str = "content",
                   key_col: str = "doc_id", fake: bool = False,
                   batch_partitions: int | None = None) -> DataFrame:
    """Decode + feature-extract a binary image column via mapInPandas.

    Returns (doc_id, width, height, channels, format, feat). Partitioning:
    salts by content hash when ``batch_partitions`` given, so one huge
    source file cannot pin a single task.
    """
    decode = _decode_image_fake if fake else _decode_image_real
    if batch_partitions:
        df = df.repartition(batch_partitions, F.xxhash64(F.col(binary_col)))
    src = df.select(F.col(key_col).alias("doc_id"), F.col(binary_col))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, data in zip(pdf["doc_id"], pdf[binary_col]):
                w, h, c, fmt, feat = decode(bytes(data))
                rows.append((did, w, h, c, fmt, feat))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height",
                                              "channels", "format", "feat"])

    return src.mapInPandas(run, IMAGE_META_SCHEMA)


def frame_sample(df: DataFrame, binary_col: str = "content",
                 key_col: str = "doc_id", every_n: int = 10,
                 fake: bool = False) -> DataFrame:
    """Video frame sampling stub: emits one row per sampled frame index.

    Real implementation shells to ffmpeg per batch; the fake derives a
    deterministic frame count from the content hash. Demonstrates the
    1→N (flatMap) shape of frame extraction under mapInPandas.
    """
    if not fake:
        raise NotImplementedError("ffmpeg not in this container; fake=True")
    src = df.select(F.col(key_col).alias("doc_id"), F.col(binary_col))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, data in zip(pdf["doc_id"], pdf[binary_col]):
                n_frames = 1 + hashlib.md5(bytes(data)).digest()[0] % 100
                for i in range(0, n_frames, every_n):
                    rows.append((did, i, n_frames))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "n_frames"])

    return src.mapInPandas(run, "doc_id long, frame_idx int, n_frames int")
