"""Multimodal binary-column plumbing (decode stubbed; schema,
batching, and determinism real)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frames_spark.multimodal import binary
from frames_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    """Synthesize binary payloads from document text (no media libs in
    the container; payload bytes are opaque to the pipeline anyway)."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    return binary.attach_meta(
        docs.select(
            F.col("doc_id").alias("media_id"),
            F.encode("text", "utf-8").alias("payload"),
        )
    ).cache()


def test_meta_schema_and_values(media):
    assert [f.name for f in media.schema["meta"].dataType.fields] == [
        "mime", "width", "height", "n_bytes",
    ]
    row = media.first()
    assert row.meta.n_bytes == len(row.payload)


def test_feature_extraction_deterministic(media):
    feats = binary.extract_features(media, fake=True, dim=8)
    rows = {r.media_id: r for r in feats.collect()}
    again = {r.media_id: r for r in binary.extract_features(media, fake=True, dim=8).collect()}
    assert rows.keys() == again.keys()
    sample = next(iter(rows))
    assert rows[sample].feature == again[sample].feature
    assert len(rows[sample].feature) == 8
    assert rows[sample].digest == again[sample].digest


def test_real_decode_is_stubbed(media):
    with pytest.raises(Exception, match="NotImplementedError|media decoding"):
        binary.extract_features(media, fake=False).collect()


def test_frame_sample_is_deterministic_subset(media):
    s1 = {r.media_id for r in binary.frame_sample(media, 5).collect()}
    s2 = {r.media_id for r in binary.frame_sample(media, 5).collect()}
    assert s1 == s2
    assert 0 < len(s1) < 50


def test_expand_frames_row_expansion(spark, tmp_path):
    """1 video row -> k frame rows inside the executor; deterministic
    stub frames, metadata carried."""
    import json

    from frames_spark.multimodal.binary import expand_frames

    rows = [(1, b"v" * 64), (2, b"w" * 16), (3, b"")]
    df = spark.createDataFrame(rows, "media_id: long, payload: binary")
    frames = expand_frames(df, every_n_frames=5, max_frames=3).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    assert len(by_media[1]) == 3          # 64 bytes -> capped at max_frames
    assert len(by_media[2]) == 1
    assert len(by_media[3]) == 1          # empty payload -> 1 stub frame
    assert [r.frame_idx for r in sorted(by_media[1], key=lambda r: r.frame_idx)] == [0, 5, 10]
    meta = json.loads(by_media[1][0].frame_meta)
    assert meta["src_bytes"] == 64
    # deterministic: same payload -> same frame bytes
    again = expand_frames(df, every_n_frames=5, max_frames=3).collect()
    assert {(r.media_id, r.frame_idx, bytes(r.frame_payload)) for r in frames} == \
           {(r.media_id, r.frame_idx, bytes(r.frame_payload)) for r in again}


def _pgm(w, h, pixels):
    return b"P5\n# test\n%d %d\n255\n" % (w, h) + bytes(pixels)


def _ppm(w, h, pixels):
    return b"P6 %d %d 255\n" % (w, h) + bytes(pixels)


def _wav(samples, rate=8000):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def test_stdlib_codecs_decode_for_real():
    """PGM/PPM/WAV decode without any external library — features are
    exact byte math verified against hand-computed values."""
    import numpy as np

    from frames_spark.multimodal.codecs import decode_auto, sniff

    pgm = _pgm(2, 2, [0, 100, 200, 255])
    (mime, w, h), feat = decode_auto(pgm)
    assert (mime, w, h) == ("image/x-portable-graymap", 2, 2)
    assert feat[:4] == [2.0, 2.0, 1.0, 255.0]
    assert feat[4] == np.mean([0, 100, 200, 255])

    ppm = _ppm(1, 2, [10, 20, 30, 40, 50, 60])
    (mime, w, h), feat = decode_auto(ppm)
    assert (mime, w, h) == ("image/x-portable-pixmap", 1, 2)
    assert feat[2] == 3.0 and feat[4] == 35.0

    wav = _wav([0, 1000, -1000, 500])
    (mime, w, h), feat = decode_auto(wav)
    assert mime == "audio/wav" and (w, h) == (None, None)
    assert feat[:4] == [4.0, 8000.0, 1.0, 16.0]
    assert feat[4] == 125.0  # mean of samples

    assert sniff(b"\x89PNG....") is None  # foreign formats stay gated


def test_extract_features_auto_codec(spark):
    """codec='auto' REALLY decodes the stdlib formats inside the
    Arrow-batched pipeline and falls back to the fake tier for
    foreign payloads — one mixed DataFrame, one pass."""
    import pyspark.sql.functions as F

    from frames_spark.multimodal.binary import extract_features

    rows = [
        (1, bytearray(_pgm(2, 2, [0, 100, 200, 255]))),
        (2, bytearray(_wav([0, 1000, -1000, 500]))),
        (3, bytearray(b"\x89PNG not decodable here")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {
        r["media_id"]: r["feature"]
        for r in extract_features(df, codec="auto").collect()
    }
    assert out[1][:4] == [2.0, 2.0, 1.0, 255.0]  # real image decode
    assert out[2][:4] == [4.0, 8000.0, 1.0, 16.0]  # real audio decode
    assert all(0.0 <= v < 1.0 for v in out[3])  # fake tier for PNG


def test_expand_frames_real_pnm_stream(spark):
    """A raw concatenated-PNM 'video' REALLY splits into frames (and
    each emitted frame is itself decodable); frame sampling keeps
    every Nth; compressed containers still take the stub tier."""
    import json

    from frames_spark.multimodal.binary import expand_frames
    from frames_spark.multimodal.codecs import decode_auto

    stream = b"".join(_pgm(2, 1, [i, i + 1]) for i in range(0, 12, 2))  # 6 frames
    rows = [
        (1, bytearray(stream)),
        (2, bytearray(b"\x00fake-mp4-payload-00000000")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = expand_frames(df, every_n_frames=2, max_frames=8).collect()
    mine = sorted(
        (r["frame_idx"], bytes(r["frame_payload"]))
        for r in out
        if r["media_id"] == 1
    )
    # 6 source frames sampled every 2nd -> 3 emitted
    assert [i for i, _ in mine] == [0, 2, 4]
    for k, (idx, fb) in enumerate(mine):
        (mime, w, h), feat = decode_auto(fb)
        assert (w, h) == (2, 1)
        assert feat[4] == 2 * idx + 0.5  # mean of [i, i+1] with i = 2*idx
    metas = {r["media_id"]: json.loads(r["frame_meta"]) for r in out}
    assert metas[1]["stub"] is False and metas[1]["n_src_frames"] == 6
    assert metas[2]["stub"] is True


def _pgm_bytes(arr):
    import numpy as np

    h, w = arr.shape
    return b"P5\n%d %d\n255\n" % (w, h) + arr.astype("uint8").tobytes()


def test_image_dhash_properties():
    import numpy as np

    from frames_spark.multimodal.codecs import image_dhash

    rng = np.random.RandomState(7)
    ramp = np.tile(np.linspace(10, 240, 64).astype(np.uint8), (48, 1))
    noisy = np.clip(ramp.astype(int) + rng.randint(-3, 4, ramp.shape), 0, 255)
    rand = rng.randint(0, 256, (48, 64))
    a = image_dhash(_pgm_bytes(ramp))
    assert image_dhash(_pgm_bytes(ramp)) == a  # deterministic
    ham = lambda x, y: bin((x ^ y) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert ham(a, image_dhash(_pgm_bytes(noisy))) <= 4  # noise-robust
    assert ham(a, image_dhash(_pgm_bytes(rand))) > 16  # discriminative
    # PPM (color) decodes through the same path
    rgb = np.dstack([ramp] * 3)
    ppm = b"P6\n64 48\n255\n" + rgb.astype("uint8").tobytes()
    assert ham(a, image_dhash(ppm)) == 0  # gray(color(x)) == x


def test_image_neardup_pairs_end_to_end(spark):
    import numpy as np

    from frames_spark.multimodal.imagededup import (
        image_hashes,
        image_neardup_pairs,
    )

    rng = np.random.RandomState(11)
    ramp = np.tile(np.linspace(10, 240, 64).astype(np.uint8), (48, 1))
    noisy = np.clip(ramp.astype(int) + rng.randint(-3, 4, ramp.shape), 0, 255)
    rows = [
        ("img_a", bytearray(_pgm_bytes(ramp))),
        ("img_a_noisy", bytearray(_pgm_bytes(noisy))),
        ("img_rand", bytearray(_pgm_bytes(rng.randint(0, 256, (48, 64))))),
        ("broken", bytearray(b"P5 not really")),
    ]
    df = spark.createDataFrame(rows, "file_id string, payload binary")
    hashes = image_hashes(df)
    got = {r.file_id: r.dhash for r in hashes.collect()}
    assert got["broken"] is None and got["img_a"] is not None
    pairs = image_neardup_pairs(hashes, max_hamming=8).collect()
    assert {(r.file_id_a, r.file_id_b) for r in pairs} == {
        ("img_a", "img_a_noisy")
    }
    assert all(r.hamming <= 8 for r in pairs)


def test_audio_ehash_properties():
    import io
    import wave

    import numpy as np

    from frames_spark.multimodal.codecs import audio_ehash

    def wav_bytes(samples):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(samples.astype("<i2").tobytes())
        return buf.getvalue()

    rng = np.random.RandomState(3)
    t = np.arange(8000)
    # amplitude-modulated tone: a distinctive energy envelope
    tone = (
        np.sin(2 * np.pi * 440 * t / 8000)
        * (0.2 + 0.8 * np.abs(np.sin(2 * np.pi * 3 * t / 8000)))
        * 12000
    )
    noisy = tone + rng.normal(0, 300, tone.shape)
    other = rng.normal(0, 8000, tone.shape)
    a = audio_ehash(wav_bytes(tone))
    assert audio_ehash(wav_bytes(tone)) == a
    ham = lambda x, y: bin((x ^ y) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert ham(a, audio_ehash(wav_bytes(noisy))) <= 6
    assert ham(a, audio_ehash(wav_bytes(other))) > 12


def test_audio_neardup_via_banded_pairs(spark):
    import io
    import wave

    import numpy as np

    from frames_spark.multimodal.codecs import audio_ehash
    from frames_spark.multimodal.imagededup import image_neardup_pairs

    def wav_bytes(samples):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(samples.astype("<i2").tobytes())
        return buf.getvalue()

    rng = np.random.RandomState(3)
    t = np.arange(8000)
    tone = (
        np.sin(2 * np.pi * 440 * t / 8000)
        * (0.2 + 0.8 * np.abs(np.sin(2 * np.pi * 3 * t / 8000)))
        * 12000
    )
    rows = [
        ("snd_a", audio_ehash(wav_bytes(tone))),
        ("snd_a_noisy", audio_ehash(wav_bytes(tone + rng.normal(0, 300, tone.shape)))),
        ("snd_rand", audio_ehash(wav_bytes(rng.normal(0, 8000, tone.shape)))),
    ]
    hashes = spark.createDataFrame(rows, "file_id string, dhash long")
    pairs = image_neardup_pairs(hashes, max_hamming=6).collect()
    assert {(r.file_id_a, r.file_id_b) for r in pairs} == {
        ("snd_a", "snd_a_noisy")
    }
