"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus a typed metadata struct —
the pattern that survives 100 TB: bytes stay columnar in parquet,
metadata prunes without touching payloads, and decode/feature steps
run as Arrow-batched ``mapInPandas`` (never row-at-a-time Python).

Decoders come in three tiers:

1. REAL, stdlib-only (multimodal/codecs.py): binary PNM images
   (PGM/PPM) and PCM WAV audio decode fully in any environment —
   ``extract_features(codec="auto")`` lights these up for real.
2. REAL, library-gated: PIL/ffmpeg formats. PERMANENT-BY-ENVIRONMENT
   here — re-checked round 4: none of PIL/pillow, cv2, soundfile,
   librosa, av is importable and installs are disallowed;
   ``_decode_real`` raises with the deployment hint.
3. FAKE (``fake=True``): deterministic md5-derived features so the
   Spark-side plumbing (schema, batching, partitioning) stays
   testable for formats neither tier can decode.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, digest string, feature array<double>"
)


def attach_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Fill the typed metadata struct from the payload (cheap JVM ops;
    width/height stay NULL until a real decoder runs)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        ),
    )


def _decode_real(payload: bytes) -> list[float]:
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg — not present in this "
        "container; run with fake=True or deploy with decoder libs"
    )


def _decode_fake(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'embedding': md5-derived floats in [0, 1)."""
    digest = hashlib.md5(payload or b"").digest()
    return [b / 255.0 for b in digest[:dim]]


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = True,
    dim: int = 8,
    codec: str | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: one pandas batch per Arrow chunk — the decode cost
    dominates, so batch shape (not per-row overhead) sets throughput.

    ``codec="auto"`` REALLY decodes stdlib-supported containers
    (PGM/PPM images, PCM WAV — multimodal/codecs.py) and handles the
    rest per ``fake``; without it every payload goes through the
    fake/raise tier (the historical stub behavior).
    """

    def decode(p: bytes) -> list[float]:
        if codec == "auto":
            from frames_spark.multimodal.codecs import decode_auto

            out = decode_auto(p or b"")
            if out is not None:
                return out[1]
        if fake:
            return _decode_fake(p, dim)
        return _decode_real(p)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "n_bytes": payloads.map(lambda p: len(p or b"")),
                    "digest": payloads.map(
                        lambda p: hashlib.md5(p or b"").hexdigest()
                    ),
                    "feature": payloads.map(decode),
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(
    df: DataFrame, every_n: int = 10, id_col: str = "media_id"
) -> DataFrame:
    """Deterministic 1-in-n media sampling by id hash (md5, portable) —
    the 'sample frames from videos' shape without a decoder."""
    bucket = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
    return df.filter(bucket.cast("long") % every_n == 0)


FRAME_SCHEMA = (
    "media_id long, frame_idx long, frame_payload binary, frame_meta string"
)


def split_pnm_stream(payload: bytes) -> list[bytes]:
    """Split a raw multi-image PNM stream (concatenated P5/P6 frames
    — a legitimate uncompressed video container: `ffmpeg -f
    image2pipe -vcodec ppm`) into per-frame byte slices, by REAL
    header parsing (codecs.py), no libraries."""
    from frames_spark.multimodal.codecs import _pnm_header

    frames: list[bytes] = []
    i = 0
    n = len(payload)
    while i < n and payload[i : i + 2] in (b"P5", b"P6"):
        magic, (w, h, _maxval), off = _pnm_header(payload[i:])
        ch = 1 if magic == b"P5" else 3
        end = i + off + w * h * ch
        if end > n:
            break
        frames.append(payload[i:end])
        i = end
    return frames


def expand_frames(
    df: DataFrame,
    every_n_frames: int = 10,
    max_frames: int = 8,
    id_col: str = "media_id",
    payload_col: str = "payload",
    fake: bool = True,
) -> DataFrame:
    """Video -> sampled frame rows (1 row in, <= max_frames out).

    The row-EXPANDING mapInPandas shape: each Arrow batch of videos
    yields a frame batch, so the expansion happens inside the
    executor with no shuffle — the downstream repartition (if any)
    moves only the kept frames.

    Payloads that are raw PNM streams (concatenated P5/P6 frames —
    what `ffmpeg -f image2pipe` emits) REALLY split into frames via
    stdlib header parsing regardless of ``fake``; compressed
    containers (mp4/mkv) need ffmpeg/PyAV: with ``fake=True`` they
    expand into deterministic md5-derived stub frames (plumbing
    stays testable), with ``fake=False`` they raise with the
    deployment hint.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json

        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "frame_idx": [],
                "frame_payload": [], "frame_meta": [],
            }
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload or b"")
                real = split_pnm_stream(payload)
                if real:
                    kept = real[::every_n_frames][:max_frames]
                    for k, fb in enumerate(kept):
                        out["media_id"].append(mid)
                        out["frame_idx"].append(k * every_n_frames)
                        out["frame_payload"].append(fb)
                        out["frame_meta"].append(
                            json.dumps(
                                {"stub": False, "n_src_frames": len(real)}
                            )
                        )
                    continue
                if not fake:
                    raise NotImplementedError(
                        "real frame extraction for compressed containers "
                        "needs ffmpeg/PyAV — deploy with decoder libs"
                    )
                # stub tier: frame count proportional to payload size
                n_frames = min(max_frames, max(1, len(payload) // 16))
                for k in range(n_frames):
                    src_frame = k * every_n_frames
                    fake_bytes = hashlib.md5(
                        payload + src_frame.to_bytes(4, "big")
                    ).digest()
                    out["media_id"].append(mid)
                    out["frame_idx"].append(src_frame)
                    out["frame_payload"].append(fake_bytes)
                    out["frame_meta"].append(
                        json.dumps({"stub": True, "src_bytes": len(payload)})
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FRAME_SCHEMA)
