"""Multimodal operator tests: decode/feature-extract, resize contract,
video frame sampling (deterministic fake container; the real-codec seam
raises the documented NotImplementedError)."""

from __future__ import annotations

import numpy as np
import pytest

from crusty_spark.codec import decode_image
from crusty_spark.fixtures import images_df
from crusty_spark.training import images as IM


def test_image_stats_features(spark):
    imgs = images_df(spark, 24)
    rows = {r.image_id: r for r in IM.image_stats(imgs).collect()}
    src = {r.image_id: r for r in imgs.collect()}
    assert set(rows) == set(src)
    for iid, r in rows.items():
        assert (r.w, r.h, r.fmt) == (src[iid].w, src[iid].h, src[iid].fmt)
        px, _ = decode_image(bytes(src[iid].bytes))
        assert abs(r.mean_r - px[..., 0].mean()) < 1e-6
        assert 0.0 <= r.entropy <= 8.0


def test_image_resize_contract(spark):
    imgs = images_df(spark, 12)
    out = IM.image_resize(imgs, 16, 24).collect()
    assert len(out) == 12
    for r in out:
        assert (r.w, r.h) == (16, 24)
        px, fmt = decode_image(bytes(r.bytes))
        assert px.shape == (24, 16, 3)
        assert fmt == r.fmt


def test_resize_matches_numpy_reference(spark):
    imgs = images_df(spark, 4, sizes=[64])
    src = {r.image_id: r for r in imgs.collect()}
    out = {r.image_id: r for r in IM.image_resize(imgs, 32, 32).collect()}
    for iid, r in out.items():
        px, fmt = decode_image(bytes(src[iid].bytes))
        want = IM._resize_nn(px, 32, 32)
        got, _ = decode_image(bytes(r.bytes))
        if fmt == "jpeg":  # lossy: re-quantized once more
            assert abs(got.astype(int) - want.astype(int)).max() <= 6
        else:
            assert np.array_equal(got, want)


def test_sample_frames_and_codec_seam(spark):
    rng = np.random.default_rng(3)
    vids = []
    for v in range(3):
        frames = [
            rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8) for _ in range(5)
        ]
        vids.append((f"vid-{v}", IM.encode_fake_video(frames)))
    df = spark.createDataFrame(vids, "video_id string, bytes binary")
    rows = IM.sample_frames(df, every=2).collect()
    # 5 frames sampled every 2 -> indices 0, 2, 4
    assert sorted((r.video_id, r.frame_idx) for r in rows) == sorted(
        (f"vid-{v}", i) for v in range(3) for i in (0, 2, 4)
    )
    for r in rows:
        px, _ = decode_image(bytes(r.bytes))
        assert px.shape == (16, 16, 3)
    # the real-codec seam is explicit
    with pytest.raises(NotImplementedError):
        IM.decode_fake_video(b"RIFFxxxx-not-a-fake-container")


def test_audio_stats_and_seam(spark):
    rng = np.random.default_rng(5)
    clips = []
    for a in range(4):
        s = (rng.standard_normal(16_000 * (a + 1)) * 3000).astype(np.int16)
        clips.append((f"aud-{a}", IM.encode_fake_audio(s, 16_000), s))
    df = spark.createDataFrame([(i, b) for i, b, _ in clips], "audio_id string, bytes binary")
    rows = {r.audio_id: r for r in IM.audio_stats(df).collect()}
    for aid, _, s in clips:
        r = rows[aid]
        assert r.n_samples == len(s) and r.rate == 16_000
        assert abs(r.duration_s - len(s) / 16_000) < 1e-9
        f = s.astype(np.float64)
        assert abs(r.rms - np.sqrt((f * f).mean())) < 1e-9
    with pytest.raises(NotImplementedError):
        IM.decode_fake_audio(b"ID3\x00not-a-fake-container")
