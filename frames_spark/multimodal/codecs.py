"""Pure-stdlib media codecs: REAL decode for the formats that need
no external library — binary PNM images (PGM ``P5`` grayscale, PPM
``P6`` RGB) and PCM WAV audio (stdlib ``wave``). Everything here is
deterministic byte math, so features are bit-reproducible and the
multimodal pipeline has at least one fully-lit real-decode path in
ANY environment; PIL/ffmpeg formats remain behind the documented
deployment gate in binary.py.

Each decoder returns (meta, feature) where meta is
(mime, width, height) — width/height NULL-equivalents for audio —
and feature is a fixed 8-slot vector:
  [width|n_frames, height|sample_rate, channels, depth(maxval|bits),
   mean, std, min, max]
computed over the decoded samples in float64.
"""

from __future__ import annotations

import io
import wave

import numpy as np

__all__ = ["sniff", "decode_pnm", "decode_wav", "decode_auto"]


def sniff(payload: bytes) -> str | None:
    """Magic-byte container detection for the stdlib-decodable set."""
    if not payload:
        return None
    if payload[:2] in (b"P5", b"P6") and payload[2:3] in b" \t\n\r":
        return "image/x-portable-graymap" if payload[:2] == b"P5" else "image/x-portable-pixmap"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio/wav"
    return None


def _pnm_header(payload: bytes) -> tuple[bytes, list[int], int]:
    """(magic, [width, height, maxval], raster_offset) — whitespace
    and ``#`` comments tolerated, per the netpbm spec."""
    magic = payload[:2]
    vals: list[int] = []
    i = 2
    n = len(payload)
    while len(vals) < 3 and i < n:
        c = payload[i : i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            while i < n and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isdigit():
            j = i
            while j < n and payload[j : j + 1].isdigit():
                j += 1
            vals.append(int(payload[i:j]))
            i = j
        else:
            raise ValueError(f"bad PNM header byte {c!r} at {i}")
    if len(vals) < 3:
        raise ValueError("truncated PNM header")
    return magic, vals, i + 1  # single whitespace byte before raster


def decode_pnm(payload: bytes) -> tuple[tuple[str, int, int], list[float]]:
    magic, (width, height, maxval), off = _pnm_header(payload)
    channels = 1 if magic == b"P5" else 3
    if maxval >= 256:
        raise ValueError("16-bit PNM not supported")
    need = width * height * channels
    raster = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    x = raster.astype(np.float64)
    mime = (
        "image/x-portable-graymap" if magic == b"P5" else "image/x-portable-pixmap"
    )
    feature = [
        float(width),
        float(height),
        float(channels),
        float(maxval),
        float(x.mean()),
        float(x.std()),
        float(x.min()),
        float(x.max()),
    ]
    return (mime, width, height), feature


def decode_wav(payload: bytes) -> tuple[tuple[str, None, None], list[float]]:
    with wave.open(io.BytesIO(payload), "rb") as w:
        n_channels = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    elif width == 1:
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    else:
        # 24/32-bit PCM: widen via struct for 4, reject odd widths
        if width == 4:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float64)
        else:
            raise ValueError(f"unsupported PCM sample width {width}")
    if x.size == 0:
        x = np.zeros(1)
    feature = [
        float(n_frames),
        float(rate),
        float(n_channels),
        float(width * 8),
        float(x.mean()),
        float(x.std()),
        float(x.min()),
        float(x.max()),
    ]
    return ("audio/wav", None, None), feature


def decode_auto(
    payload: bytes,
) -> tuple[tuple[str, int | None, int | None], list[float]] | None:
    """Decode if a stdlib codec claims the payload; None otherwise
    (caller decides whether to fake or raise for foreign formats)."""
    mime = sniff(payload)
    if mime is None:
        return None
    if mime == "audio/wav":
        return decode_wav(payload)
    return decode_pnm(payload)


def image_dhash(payload: bytes, hash_size: int = 8) -> int:
    """64-bit difference hash (dHash) of a PNM image — the standard
    perceptual near-dup key: grayscale, area-mean downsample to
    (hash_size+1) × hash_size cells, horizontal gradient sign bits.
    Deterministic numpy byte math (no PIL), robust to mild noise /
    re-encoding, returned as a SIGNED 64-bit value (two's complement)
    so it lands in a Spark LongType and XOR/bit_count work unchanged.
    """
    magic, (width, height, maxval), off = _pnm_header(payload)
    channels = 1 if magic == b"P5" else 3
    need = width * height * channels
    raster = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    gray = raster.reshape(height, width, channels).mean(axis=2)
    cols = np.array_split(np.arange(width), hash_size + 1)
    rows = np.array_split(np.arange(height), hash_size)
    small = np.array(
        [[gray[np.ix_(r, c)].mean() for c in cols] for r in rows]
    )
    bits = (small[:, 1:] > small[:, :-1]).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def audio_ehash(payload: bytes, hash_size: int = 8) -> int:
    """64-bit energy-envelope hash of PCM WAV audio — the audio twin
    of ``image_dhash``: mono mixdown, RMS energy over
    (hash_size² + 1) equal windows, consecutive-window gradient sign
    bits. Robust to mild noise/level changes that preserve the
    envelope shape; returned signed-64 like image_dhash so the same
    banded-Hamming near-dup machinery applies unchanged."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n_channels = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    elif width == 1:
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64)
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    if n_channels > 1:
        x = x[: (x.size // n_channels) * n_channels]
        x = x.reshape(-1, n_channels).mean(axis=1)
    n_windows = hash_size * hash_size + 1
    if x.size < n_windows:
        x = np.pad(x, (0, n_windows - x.size))
    rms = np.array(
        [np.sqrt((chunk**2).mean()) for chunk in np.array_split(x, n_windows)]
    )
    bits = rms[1:] > rms[:-1]
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v
