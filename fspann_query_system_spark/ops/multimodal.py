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
    shape (the no-codec fallback).  Raises on empty payloads like a real
    codec would."""
    if not content:
        raise ValueError("empty media payload")
    seed = int.from_bytes(hashlib.sha256(content).digest()[:8], "big")
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def _decode_image_pil(content: bytes, width: int, height: int) -> np.ndarray:
    """Real decode via PIL (any format PIL reads; declared meta ignored —
    the actual image shape wins).  Import stays inside the function so the
    closure cloudpickles cleanly to Python workers."""
    from io import BytesIO
    from PIL import Image
    if not content:
        raise ValueError("empty media payload")
    img = np.asarray(Image.open(BytesIO(content)).convert("RGB"))
    if img.ndim != 3:
        raise ValueError("undecodable image payload")
    return img


def _decode_image_png(content: bytes, width: int, height: int) -> np.ndarray:
    """REAL codec, stdlib-only: PNG decode via zlib/struct (8-bit
    gray/RGB/RGBA, non-interlaced, all five scanline filters) →
    HxWx3 uint8.  Declared meta is ignored — the IHDR wins, like any
    real codec.  Non-PNG or unsupported payloads raise ValueError."""
    import struct
    import zlib
    if not content or content[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = b""
    while pos + 8 <= len(content):
        (ln,) = struct.unpack(">I", content[pos:pos + 4])
        typ = content[pos + 4:pos + 8]
        data = content[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, inter = struct.unpack(
                ">IIBBBBB", data)
            if depth != 8 or ctype not in (0, 2, 6) or inter != 0:
                raise ValueError("unsupported PNG variant")
            ch = {0: 1, 2: 3, 6: 4}[ctype]
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG")
    raw = zlib.decompress(idat)
    stride = w * ch
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG scanlines")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    p2 = 0
    for y in range(h):
        ftype = raw[p2]
        line = np.frombuffer(raw, np.uint8, stride, p2 + 1)
        p2 += 1 + stride
        if ftype == 0:
            cur = line.copy()
        elif ftype == 2:                      # Up (uint8 wraps mod 256)
            cur = line + prev
        elif ftype in (1, 3, 4):              # Sub / Average / Paeth
            cur = np.empty(stride, np.uint8)
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(prev[i])
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    c = int(prev[i - ch]) if i >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur
        prev = cur
    img = out.reshape(h, w, ch)
    if ch == 1:
        img = np.repeat(img, 3, axis=2)
    elif ch == 4:
        img = img[:, :, :3]
    return img


def default_image_decoder():
    """The real-codec dispatch, resolved at PLAN time on the driver and
    shipped to workers as a plain cloudpickled callable (plan shape is
    identical for every branch):

    - PIL importable → :func:`_decode_image_pil` (any format PIL reads);
    - otherwise, PNG payloads decode for REAL via the stdlib codec
      (:func:`_decode_image_png` — this container ships no PIL, so this
      is the branch CI exercises un-skipped);
    - non-PNG payloads without PIL fall back to the deterministic stub
      (synthetic pipelines only — same behavior as before)."""
    try:
        import PIL  # noqa: F401
        return _decode_image_pil
    except ImportError:
        def dispatch(content: bytes, width: int, height: int) -> np.ndarray:
            if content[:8] == b"\x89PNG\r\n\x1a\n":
                return _decode_image_png(content, width, height)
            return _decode_image_stub(content, width, height)
        return dispatch


def image_features(media: DataFrame, feat_dim: int = 16,
                   decoder=None) -> DataFrame:
    """(media_id, feat ARRAY<DOUBLE>) — decode + pooled-statistics feature
    vector per image, batched through mapInPandas.  ``decoder`` is any
    callable ``(bytes, width, height) -> HxWx3 uint8``; default
    :func:`default_image_decoder` (PIL if present, stub otherwise).
    Undecodable payloads are dropped, matching codec-pipeline practice."""
    decoder = decoder or default_image_decoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                try:
                    img = decoder(bytes(content), int(meta["width"]),
                                  int(meta["height"]))
                except (ValueError, OSError):
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
                  out_h: int = 32, decoder=None) -> DataFrame:
    """(media_id, content BINARY, meta) — nearest-neighbor resize to a
    fixed shape, the thumbnail/normalization step of an image pipeline.
    The resample index math is real; decode follows ``decoder`` (PIL when
    present, stub otherwise — see :func:`default_image_decoder`).  Output
    payload is the raw HxWx3 uint8 buffer (a real pipeline would
    re-encode; the byte length out_h*out_w*3 is asserted in tests)."""
    decoder = decoder or default_image_decoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bufs = [], []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                try:
                    img = decoder(bytes(content), int(meta["width"]),
                                  int(meta["height"]))
                except (ValueError, OSError):
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


def _decode_audio_stub(content: bytes, sample_rate: int) -> np.ndarray:
    """Deterministic sha-seeded 1s noise waveform (no-codec fallback)."""
    if not content:
        raise ValueError("empty audio payload")
    seed = int.from_bytes(hashlib.sha256(content).digest()[:8], "big")
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.normal(0.0, 0.25, size=sample_rate or 16000)


def _decode_audio_wav(content: bytes, sample_rate: int) -> np.ndarray:
    """REAL codec: stdlib ``wave`` parse of RIFF/WAV payloads →
    channel-averaged float64 waveform in [-1, 1] (the container ships no
    soundfile/ffmpeg, but WAV needs neither).  Declared meta sample_rate
    is ignored — the header wins."""
    import io
    import wave as wavmod
    if not content:
        raise ValueError("empty audio payload")
    with wavmod.open(io.BytesIO(content)) as w:
        sw, ch = w.getsampwidth(), w.getnchannels()
        raw = w.readframes(w.getnframes())
    dt = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
    if dt is None:
        raise ValueError(f"unsupported WAV sample width {sw}")
    a = np.frombuffer(raw, dtype=dt).astype(np.float64)
    if dt == np.uint8:                      # 8-bit WAV is unsigned
        a -= 128.0
    a = a.reshape(-1, ch).mean(axis=1)
    return a / float(1 << (8 * sw - 1))


def default_audio_decoder():
    """WAV payloads decode for real with the stdlib codec; anything the
    parser rejects is NOT silently faked — callers opt into the stub
    explicitly (``decoder=_decode_audio_stub``) for synthetic pipelines."""
    return _decode_audio_wav


def audio_features(media: DataFrame, n_windows: int = 8,
                   decoder=None) -> DataFrame:
    """(media_id, feat ARRAY<DOUBLE>) — windowed RMS + zero-crossing-rate
    features per audio payload (2*n_windows dims).  The DSP kernel is real
    numpy; ``decoder`` is ``(bytes, sample_rate) -> float waveform``:
    ``"wav"``/default → stdlib WAV parse (a real codec), ``"stub"`` →
    deterministic sha-seeded waveform for payloads that aren't audio,
    or any custom callable.  Undecodable payloads are dropped."""
    if decoder in (None, "wav"):
        decoder = default_audio_decoder()
    elif decoder == "stub":
        decoder = _decode_audio_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                try:
                    wave = decoder(bytes(content),
                                   int(meta["sample_rate"] or 16000))
                except Exception:   # wave.Error subclasses Exception only
                    continue
                if len(wave) == 0:
                    continue
                win = np.array_split(wave, n_windows)
                rms = [float(np.sqrt((w * w).mean())) for w in win]
                zcr = [float((np.diff(np.sign(w)) != 0).mean()) if len(w) > 1
                       else 0.0 for w in win]
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
    after the explode; the selection plan is the Spark-side contract.

    select_exploded (not plain explode): the inferred size()>0 filter
    would otherwise materialize the n_frames-long sequence array TWICE
    per video row — real money at feature-film frame counts."""
    from ..functions.plan import select_exploded
    return (select_exploded(media.filter(F.col("kind") == "video"),
                            F.sequence(F.lit(0), F.col("meta.n_frames") - 1),
                            "frame_idx", "media_id")
            .filter(F.col("frame_idx") % every_n == 0))


def media_summary(media: DataFrame) -> DataFrame:
    """Per-kind size/meta statistics — the scan-side sanity aggregation."""
    return (media.groupBy("kind")
            .agg(F.count("*").alias("n"),
                 F.sum(F.length("content")).alias("total_bytes"),
                 F.avg("meta.width").alias("avg_width")))
