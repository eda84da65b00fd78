"""Baseline JFIF codec (operators/jpeg.py): pure-numpy encoder/decoder.

JPEG is lossy — the contract is structural exactness (dims, components,
marker layout, determinism) plus bounded pixel error (PSNR), not byte
equality.
"""

from __future__ import annotations

import numpy as np
import pytest

from parallel_connected_components_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
)
from parallel_connected_components_spark.operators.multimodal import decode_image


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 5) % 256, (yy * 7) % 256, (xx + yy) % 256], axis=-1).astype(
        np.uint8
    )


@pytest.mark.parametrize("h,w", [(8, 8), (37, 53), (16, 24), (1, 1), (7, 9)])
def test_roundtrip_dims_and_quality(h, w):
    img = gradient(h, w)
    payload = encode_jpeg(img, quality=90)
    assert payload[:2] == b"\xFF\xD8" and payload[-2:] == b"\xFF\xD9"
    dec = decode_jpeg(payload)
    # padding to 8x8 blocks must be cropped back to the true SOF0 dims
    assert dec.shape == (h, w, 3)
    assert psnr(img, dec) > 35.0


def test_quality_monotone():
    img = gradient(40, 40)
    p_lo = psnr(img, decode_jpeg(encode_jpeg(img, quality=20)))
    p_hi = psnr(img, decode_jpeg(encode_jpeg(img, quality=95)))
    assert p_hi > p_lo
    assert len(encode_jpeg(img, quality=20)) < len(encode_jpeg(img, quality=95))


def test_deterministic():
    img = gradient(21, 33)
    assert encode_jpeg(img, 75) == encode_jpeg(img, 75)


def test_grayscale_input_decodes_to_rgb():
    g = ((np.arange(30)[:, None] * 3 + np.arange(22)[None, :] * 2) % 256).astype(
        np.uint8
    )
    dec = decode_jpeg(encode_jpeg(g, quality=85))
    assert dec.shape == (30, 22, 3)
    # gray in → r==g==b out (encoder replicates channels; chroma ~neutral)
    assert np.abs(dec[:, :, 0].astype(int) - dec[:, :, 1].astype(int)).max() <= 2


def test_flat_color_is_near_exact():
    img = np.full((24, 24, 3), 130, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=75))
    assert np.abs(dec.astype(int) - 130).max() <= 2


def test_decode_image_dispatches_jpeg():
    img = gradient(12, 20)
    assert decode_image(encode_jpeg(img, 90)).shape == (12, 20, 3)


def test_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")
    img = gradient(16, 16)
    payload = encode_jpeg(img, 75)
    # decoder must not hang/crash on a truncated entropy stream: it pads
    # bit reads past the end (per spec) and still returns full-shape pixels
    dec = decode_jpeg(payload[:-10])
    assert dec.shape == (16, 16, 3)


def test_decodes_with_nonstandard_tables_from_file():
    # the decoder must use the DQT tables carried by the file, not its
    # own constants: re-quantizing with quality=30 changes the DQT bytes,
    # and only a decoder that reads them reconstructs sane pixels
    img = np.full((16, 16, 3), 200, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=30))
    assert np.abs(dec.astype(int) - 200).max() <= 6
