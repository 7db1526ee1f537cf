"""Multimodal plumbing tests: deterministic decode stub, feature extraction
shape, frame-sampling fan-out, and the real-codec gate."""

import pytest

from counsel_data_pipeline_spark.io.sources import load_table
from counsel_data_pipeline_spark.ops import multimodal as mm

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return mm.documents_as_media(load_table(spark, SF, "documents"))


def test_decode_is_deterministic_and_typed(media):
    a = {r["media_id"]: r.asDict() for r in mm.decode_media(media).collect()}
    b = {r["media_id"]: r.asDict() for r in mm.decode_media(media).collect()}
    assert a == b
    assert len(a) == media.count()
    for r in a.values():
        assert 16 <= r["width"] <= 255 and 16 <= r["height"] <= 255
        if r["media_type"] == "image":
            assert r["n_frames"] == 1 and r["duration_s"] == 0.0
        else:
            assert r["n_frames"] >= 1 and r["duration_s"] > 0


def test_real_codec_is_explicitly_stubbed(media):
    with pytest.raises(NotImplementedError):
        mm.decode_media(media, codec="real")


def test_feature_extraction_shape(media):
    rows = mm.extract_features(media).collect()
    assert len(rows) == media.count()
    for r in rows[:20]:
        assert len(r["features"]) == mm.FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r["features"])


def test_frame_sampling_fanout(media):
    frames = mm.sample_frames(media, every_n=24).collect()
    per_media = {}
    for r in frames:
        per_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    decoded = {r["media_id"]: r for r in mm.decode_media(media).collect()}
    for mid, idxs in per_media.items():
        d = decoded[mid]
        assert idxs == list(range(0, max(d["n_frames"] - 1, 0) + 1, 24))
