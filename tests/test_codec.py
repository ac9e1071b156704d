from __future__ import annotations

import numpy as np
import pytest

from crusty_spark.codec import (
    decode_image,
    encode_image,
    phash64,
    phash64_batch,
    psnr,
    _to_gray_32,
)


def _pixels(seed: int, h: int = 48, w: int = 64) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("fmt", ["png", "bmp"])
def test_lossless_roundtrip(fmt):
    px = _pixels(1)
    out, got_fmt = decode_image(encode_image(px, fmt))
    assert got_fmt == fmt
    np.testing.assert_array_equal(out, px)


def test_jpeg_lossy_psnr_above_40():
    for seed in range(5):
        px = _pixels(seed)
        out, fmt = decode_image(encode_image(px, "jpeg"))
        assert fmt == "jpeg"
        assert psnr(out, px) >= 40.0


def test_jpeg_deterministic():
    px = _pixels(3)
    assert encode_image(px, "jpeg") == encode_image(px, "jpeg")


def test_phash_scalar_batch_agree():
    stack = np.stack([_to_gray_32(_pixels(s)) for s in range(8)])
    batch = phash64_batch(stack)
    for i in range(8):
        assert batch[i] == phash64(_pixels(i))


def test_phash_locality():
    px = _pixels(9)
    near = px.copy()
    near[0, 0, 0] ^= 1  # one-bit pixel change
    far = _pixels(10)
    h = phash64(px)
    d_near = bin((h ^ phash64(near)) & ((1 << 64) - 1)).count("1")
    d_far = bin((h ^ phash64(far)) & ((1 << 64) - 1)).count("1")
    assert d_near <= 4
    assert d_far > 10


def test_gray_batch_scalar_bitequal():
    """to_gray_32_batch must be BIT-equal to _to_gray_32 per image across
    mixed shapes — phash thresholds sit on medians, so even 1-ulp drift
    between the scalar (fixture/simulator) and batch (fetch UDF) paths
    could flip hash bits."""
    from crusty_spark.codec import to_gray_32_batch

    rng = np.random.default_rng(7)
    shapes = [(32, 32), (64, 32), (128, 128), (48, 96), (32, 32)]
    imgs = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for h, w in shapes]
    batch = to_gray_32_batch(imgs)
    for i, px in enumerate(imgs):
        assert np.array_equal(batch[i], _to_gray_32(px))
