from __future__ import annotations

import pytest

from mysql_es_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    return multimodal.synth_media(spark, 30).cache()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "payload", "meta"]
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_shapes_and_determinism(spark, media):
    f1 = multimodal.extract_features(media, dim=16).collect()
    f2 = multimodal.extract_features(media, dim=16).collect()
    by_id1 = {r.media_id: r for r in f1}
    by_id2 = {r.media_id: r for r in f2}
    assert len(by_id1) == 30
    for i, r in by_id1.items():
        assert len(r.feature) == 16
        assert r.n_bytes > 0
        assert r.feature == by_id2[i].feature  # deterministic fake decode


def test_real_decode_is_stubbed(media):
    with pytest.raises(NotImplementedError):
        multimodal.extract_features(media, real=True)


def test_frame_sample(spark, media):
    frames = multimodal.frame_sample(media, fps=2.0)
    rows = frames.collect()
    assert all(r.frame_ts == r.frame_idx / 2.0 for r in rows)
    per_media = {}
    for r in rows:
        per_media.setdefault(r.media_id, 0)
        per_media[r.media_id] += 1
    durations = {r.media_id: r.meta.duration_s for r in media.filter("kind='video'").collect()}
    for mid, n in per_media.items():
        assert n == int(durations[mid] * 2.0) + 1


def test_resize_plan(media):
    rows = multimodal.resize_plan(media, 224, 224).collect()
    assert all(r.dst_w == 224 and r.dst_h == 224 for r in rows)
    assert all(abs(r.scale_x - round(224 / r.src_w, 4)) < 1e-9 for r in rows)
