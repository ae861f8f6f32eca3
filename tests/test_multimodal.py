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


def test_real_decode_wav_png_ppm(spark, media):
    """real=True computes features from actual pixels/samples (WAV via
    stdlib wave, PNG via zlib+filters, PPM by header) — deterministic,
    full-width, and different from the digest-fake features."""
    real = {
        r.media_id: r
        for r in multimodal.extract_features(
            media, dim=16, real=True, on_video="fake"
        ).collect()
    }
    fake = {
        r.media_id: r for r in multimodal.extract_features(media, dim=16).collect()
    }
    assert len(real) == 30
    metas = {r.media_id: (r.kind, r.meta) for r in media.collect()}
    for i, r in real.items():
        kind, meta = metas[i]
        assert len(r.feature) == 16
        if kind == "image":
            # feature head = [w/1e3, h/1e3, channels, mean, std]
            assert abs(r.feature[0] - meta.width / 1e3) < 1e-6
            assert abs(r.feature[1] - meta.height / 1e3) < 1e-6
            assert r.feature[2] == 3.0
            assert 0.2 < r.feature[3] < 0.8  # gradient+noise image mean
            assert r.feature != fake[i].feature
        elif kind == "audio":
            # head = [duration, rate/1e5, channels, rms, zcr]; synth is a
            # 0.5-amplitude sine + small noise -> rms ~ 0.5/sqrt(2)
            assert abs(r.feature[0] - meta.duration_s) < 0.01
            assert abs(r.feature[1] - 1600 / 1e5) < 1e-6
            assert abs(r.feature[3] - 0.3536) < 0.02
            assert r.feature != fake[i].feature
        else:  # video fell back to the digest features
            assert r.feature == fake[i].feature


def test_real_decode_video_errors_by_default(spark, media):
    # digest (non-MJPEG) video payloads: out of scope by disposition
    with pytest.raises(Exception, match="MJPEG|disposition"):
        multimodal.extract_features(media, real=True).collect()


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


def test_real_video_decode_mjpeg(spark):
    """video_format="mjpeg" payloads are REAL concatenated baseline-JPEG
    frames; real=True decodes actual pixels (no digest fallback) and the
    feature head encodes frame count + geometry + luminance stats."""
    media = multimodal.synth_media(spark, 12, video_format="mjpeg")
    vids = {r.media_id: r.meta for r in media.filter("kind = 'video'").collect()}
    feats = {
        r.media_id: r
        for r in multimodal.extract_features(media, dim=16, real=True).collect()
    }
    assert len(feats) == 12
    for i, meta in vids.items():
        f = feats[i].feature
        assert f[0] == meta.duration_s  # n_frames stored as duration
        assert abs(f[1] - meta.width / 1e3) < 1e-6
        assert abs(f[2] - meta.height / 1e3) < 1e-6
        assert 0.2 < f[3] < 0.8  # gradient+noise gray mean
    # digest video payloads raise by default under real=True ...
    legacy = multimodal.synth_media(spark, 3)  # has one digest video row
    import pytest as _pytest

    with _pytest.raises(Exception) as ei:
        multimodal.extract_features(legacy, dim=16, real=True).collect()
    assert "MJPEG" in str(ei.value) or "disposition" in str(ei.value)
    # ... and keep deterministic digest features with on_video="fake"
    ok = multimodal.extract_features(legacy, dim=16, real=True, on_video="fake").count()
    assert ok == 3
