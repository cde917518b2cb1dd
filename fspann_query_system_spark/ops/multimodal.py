"""Multimodal column plumbing (beyond-reference mandate).

Images/audio/video are opaque ``BINARY`` columns with typed metadata
structs.  The Spark-side machinery — schemas, partition-aware batch
processing, Arrow UDF signatures — is real and tested; the actual codec
calls are STUBBED deterministically (this container ships no
image/audio libraries).  Swapping ``_decode_image_stub`` for a PIL/ffmpeg
call changes no plan shape.

Design notes for 100TB:
- binaries ride in their own column so Parquet keeps them out of scans
  that don't project them (column pruning does the work);
- decode/feature-extract run in ``mapInPandas`` so one Python worker
  amortizes codec init per batch, and ``spark.sql.files.maxPartitionBytes``
  controls bytes-per-task, not rows-per-task;
- derived features (embeddings, thumbnails) land in separate tables keyed
  by content id — re-deriving never rewrites the raw bytes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id BIGINT, kind STRING, content BINARY, "
                "meta STRUCT<width: INT, height: INT, channels: INT, "
                "sample_rate: INT, n_frames: INT>")


def make_media_table(df: DataFrame, payload_col: str, kind: str,
                     id_col: str = "doc_id") -> DataFrame:
    """Wrap any binary-bearing column into the canonical media schema.
    Metadata is synthesized deterministically from the content hash (the
    stub stand-in for header parsing)."""
    c = F.col(payload_col)
    h = F.crc32(c)
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        c.alias("content"),
        F.struct(
            (h % 640 + 16).cast("int").alias("width"),
            (h % 480 + 16).cast("int").alias("height"),
            F.lit(3).alias("channels"),
            F.when(F.lit(kind) == "audio", F.lit(16000)).otherwise(F.lit(None)).cast("int").alias("sample_rate"),
            F.when(F.lit(kind) == "video", (h % 300 + 1).cast("int")).otherwise(F.lit(None)).cast("int").alias("n_frames"),
        ).alias("meta"))


def _decode_image_stub(content: bytes, width: int, height: int) -> np.ndarray:
    """DETERMINISTIC FAKE decode: sha256-seeded pixel noise of the declared
    shape.  Real implementation: PIL.Image.open(BytesIO(content)).
    Raises on empty payloads like a real codec would."""
    if not content:
        raise ValueError("empty media payload")
    seed = int.from_bytes(hashlib.sha256(content).digest()[:8], "big")
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def image_features(media: DataFrame, feat_dim: int = 16) -> DataFrame:
    """(media_id, feat ARRAY<DOUBLE>) — decode + pooled-statistics feature
    vector per image, batched through mapInPandas.  The feature kernel
    (channel-wise moments over a grid) is real; only the decode is a stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                try:
                    img = _decode_image_stub(bytes(content), int(meta["width"]),
                                             int(meta["height"]))
                except ValueError:
                    continue
                x = img.astype(np.float64) / 255.0
                g = feat_dim // 4
                hs = np.array_split(x, g, axis=0)
                feat = np.concatenate([
                    [s.mean(), s.std()] for s in hs
                ] + [[x.mean(axis=(0, 1))[c] for c in range(3)],
                     [x.std()]]).ravel()[:feat_dim]
                feat = np.pad(feat, (0, max(0, feat_dim - len(feat))))
                ids.append(mid)
                feats.append(feat.tolist())
            if ids:
                yield pd.DataFrame({"media_id": ids,
                                    "feat": pd.Series(feats, dtype=object)})

    return (media.filter(F.col("kind") == "image")
            .select("media_id", "content", "meta")
            .mapInPandas(run, schema="media_id BIGINT, feat ARRAY<DOUBLE>"))


def resize_images(media: DataFrame, out_w: int = 32,
                  out_h: int = 32) -> DataFrame:
    """(media_id, content BINARY, meta) — nearest-neighbor resize to a
    fixed shape, the thumbnail/normalization step of an image pipeline.
    The resample index math is real; only the decode is a stub.  Output
    payload is the raw HxWx3 uint8 buffer (a real pipeline would
    re-encode; the byte length out_h*out_w*3 is asserted in tests)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bufs = [], []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                try:
                    img = _decode_image_stub(bytes(content), int(meta["width"]),
                                             int(meta["height"]))
                except ValueError:
                    continue
                h, w = img.shape[:2]
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                ids.append(mid)
                bufs.append(img[yi][:, xi].tobytes())
            if ids:
                yield pd.DataFrame({"media_id": ids,
                                    "content": pd.Series(bufs, dtype=object)})

    out = (media.filter(F.col("kind") == "image")
           .select("media_id", "content", "meta")
           .mapInPandas(run, schema="media_id BIGINT, content BINARY"))
    return out.withColumn(
        "meta", F.struct(F.lit(out_w).cast("int").alias("width"),
                         F.lit(out_h).cast("int").alias("height"),
                         F.lit(3).alias("channels"),
                         F.lit(None).cast("int").alias("sample_rate"),
                         F.lit(None).cast("int").alias("n_frames")))


def audio_features(media: DataFrame, n_windows: int = 8) -> DataFrame:
    """(media_id, feat ARRAY<DOUBLE>) — windowed RMS + zero-crossing-rate
    features per audio payload (2*n_windows dims).  The DSP kernel is
    real numpy over a sha-seeded fake waveform; a real implementation
    swaps the decode for soundfile/ffmpeg."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                raw = bytes(content)
                if not raw:
                    continue
                seed = int.from_bytes(hashlib.sha256(raw).digest()[:8], "big")
                rng = np.random.Generator(np.random.PCG64(seed))
                sr = int(meta["sample_rate"] or 16000)
                wave = rng.normal(0.0, 0.25, size=sr)   # 1s stub waveform
                win = np.array_split(wave, n_windows)
                rms = [float(np.sqrt((w * w).mean())) for w in win]
                zcr = [float((np.diff(np.sign(w)) != 0).mean()) for w in win]
                ids.append(mid)
                feats.append(rms + zcr)
            if ids:
                yield pd.DataFrame({"media_id": ids,
                                    "feat": pd.Series(feats, dtype=object)})

    return (media.filter(F.col("kind") == "audio")
            .select("media_id", "content", "meta")
            .mapInPandas(run, schema="media_id BIGINT, feat ARRAY<DOUBLE>"))


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """(media_id, frame_idx) — video frame sampling plan: explode the
    declared frame count, keep every Nth.  Decode-per-frame would slot in
    after the explode; the selection plan is the Spark-side contract."""
    return (media.filter(F.col("kind") == "video")
            .select("media_id",
                    F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1))
                    .alias("frame_idx"))
            .filter(F.col("frame_idx") % every_n == 0))


def media_summary(media: DataFrame) -> DataFrame:
    """Per-kind size/meta statistics — the scan-side sanity aggregation."""
    return (media.groupBy("kind")
            .agg(F.count("*").alias("n"),
                 F.sum(F.length("content")).alias("total_bytes"),
                 F.avg("meta.width").alias("avg_width")))
