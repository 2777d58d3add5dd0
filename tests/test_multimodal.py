"""Multimodal plumbing: real WAV decode path + stubbed codec gates with
real Arrow/mapInPandas schemas."""

import numpy as np
import pytest

from addresses_importer_spark.config import DedupConfig
from addresses_importer_spark.datagen import fixture_with_dupes, to_spark
from addresses_importer_spark.operators.multimodal import (
    decode_stats, extract_logmel_features, frame_sample, image_decode_stub,
)

CFG = DedupConfig()


@pytest.fixture(scope="module")
def clips(spark):
    pdf, _ = fixture_with_dupes()
    return to_spark(spark, pdf)


def test_decode_stats(clips):
    rows = {r["clip_id"]: r for r in decode_stats(clips).collect()}
    assert len(rows) == 26
    for r in rows.values():
        assert r["decode_error"] is None
        assert r["n_samples"] > 0
        assert 0 < r["peak"] <= 1.0
        assert 0 < r["rms"] < r["peak"]


def test_decode_stats_error_channel(spark):
    import pandas as pd
    from addresses_importer_spark.datagen import CLIPS_SCHEMA
    bad = to_spark(spark, pd.DataFrame([
        {"clip_id": "x1", "bytes": b"\x01" * 64, "sr_hz": 8000,
         "dur_ms": 10, "codec": "opus", "transcript": "t"},
        {"clip_id": "x2", "bytes": b"junk", "sr_hz": 8000,
         "dur_ms": 10, "codec": "pcm_s16le", "transcript": "t"},
    ]), CLIPS_SCHEMA)
    rows = {r["clip_id"]: r for r in decode_stats(bad).collect()}
    assert rows["x1"]["decode_error"].startswith("unsupported_codec")
    assert rows["x2"]["decode_error"].startswith("corrupt")


def test_frame_sample_shapes(clips):
    frames = frame_sample(clips, n_frames=4, frame_len=512).collect()
    by_clip = {}
    for r in frames:
        by_clip.setdefault(r["clip_id"], []).append(r)
        assert len(r["frame"]) == 512
    for rows in by_clip.values():
        assert sorted(r["frame_idx"] for r in rows) == [0, 1, 2, 3]


def test_extract_logmel(clips):
    rows = extract_logmel_features(clips, CFG).collect()
    assert len(rows) == 26
    for r in rows:
        assert len(r["logmel_mean"]) == CFG.n_mels
        assert r["n_frames"] > 0
        assert np.isfinite(r["logmel_mean"]).all()


def test_image_stub_plumbing(spark):
    imgs = spark.createDataFrame(
        [("i1", b"\x89PNG fake"), ("i2", b"\xff\xd8 fake jpg")],
        "id string, bytes binary",
    )
    rows = image_decode_stub(imgs).collect()
    assert len(rows) == 2
    assert all(r["decode_error"] and "imaging library" in r["decode_error"]
               for r in rows)
    assert all(r["width"] is None for r in rows)
