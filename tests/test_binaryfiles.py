"""binaryFile ingestion: content-hash ids, MIME sniffing, glob
pruning, handoff to the mapInPandas feature extractor."""

from __future__ import annotations

import pathlib

from frames_spark.multimodal.binary import extract_features
from frames_spark.sources.binaryfiles import read_binary_dir

PNG = b"\x89PNG\r\n\x1a\n" + b"\x00" * 64
JPG = b"\xff\xd8\xff\xe0" + b"\x01" * 32
WAV = b"RIFF" + b"\x24\x00\x00\x00" + b"WAVEfmt " + b"\x02" * 16
MP4 = b"\x00\x00\x00\x18ftypmp42" + b"\x03" * 40
TXT = b"not media at all"


def _mkfiles(root: pathlib.Path):
    (root / "sub").mkdir(parents=True)
    (root / "a.png").write_bytes(PNG)
    (root / "b.jpg").write_bytes(JPG)
    (root / "sub" / "c.wav").write_bytes(WAV)
    (root / "sub" / "d.mp4").write_bytes(MP4)
    (root / "e.txt").write_bytes(TXT)


def test_read_binary_dir_sniffs_and_hashes(spark, tmp_path):
    _mkfiles(tmp_path)
    df = read_binary_dir(spark, str(tmp_path))
    rows = {r.source_path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert rows["a.png"].meta.mime == "image/png"
    assert rows["b.jpg"].meta.mime == "image/jpeg"
    assert rows["c.wav"].meta.mime == "audio/wav"
    assert rows["d.mp4"].meta.mime == "video/mp4"
    assert rows["e.txt"].meta.mime == "application/octet-stream"
    assert rows["a.png"].meta.n_bytes == len(PNG)
    assert all(r.media_id is not None for r in rows.values())
    # content-hash id: same bytes elsewhere -> same id
    (tmp_path / "sub" / "copy.png").write_bytes(PNG)
    again = {
        r.source_path.rsplit("/", 1)[-1]: r.media_id
        for r in read_binary_dir(spark, str(tmp_path)).collect()
    }
    assert again["copy.png"] == again["a.png"]


def test_glob_prunes_at_listing(spark, tmp_path):
    _mkfiles(tmp_path)
    only_png = read_binary_dir(spark, str(tmp_path), glob="*.png")
    assert [r.meta.mime for r in only_png.collect()] == ["image/png"]


def test_features_from_binary_ingest(spark, tmp_path):
    _mkfiles(tmp_path)
    media = read_binary_dir(spark, str(tmp_path), glob="*.{png,jpg}")
    feats = extract_features(media, fake=True).collect()
    assert len(feats) == 2
    for r in feats:
        assert len(r.feature) == 8
        assert all(0 <= v < 1 for v in r.feature)
        assert r.digest and r.n_bytes > 0
