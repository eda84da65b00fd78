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


@pytest.mark.parametrize("h,w", [(16, 16), (37, 53), (3, 5), (17, 31)])
def test_420_subsampling_roundtrip(h, w):
    # 4:2:0 is what camera/crawl JPEGs actually use; this drives the
    # decoder's 4-Y-blocks-per-MCU path and the chroma replication
    # upsample, including the 16-multiple padding crop
    img = gradient(h, w)
    payload = encode_jpeg(img, quality=90, subsampling="420")
    dec = decode_jpeg(payload)
    assert dec.shape == (h, w, 3)
    assert psnr(img, dec) > 30.0  # chroma halved: lossier than 4:4:4
    # SOF0 carries 0x22 luma sampling (walk the marker segments — a
    # naive byte search can hit FF C0 inside table payloads)
    import struct

    pos = 2
    luma_hv = None
    while pos < len(payload):
        assert payload[pos] == 0xFF
        marker = payload[pos + 1]
        seg_len = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        if marker == 0xC0:
            luma_hv = payload[pos + 4 + 7]  # prec(1) h(2) w(2) nc(1) cid(1) → hv
            break
        pos += 2 + seg_len
    assert luma_hv == 0x22


def test_444_beats_420_on_chroma_detail():
    yy, xx = np.mgrid[0:32, 0:32]
    img = np.stack(
        [(xx % 2) * 255, ((xx + 1) % 2) * 255, np.zeros_like(xx)], axis=-1
    ).astype(np.uint8)  # 1-px chroma stripes: worst case for subsampling
    p444 = psnr(img, decode_jpeg(encode_jpeg(img, 95)))
    p420 = psnr(img, decode_jpeg(encode_jpeg(img, 95, subsampling="420")))
    assert p444 > p420


def test_fuzz_roundtrip_hypothesis():
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        seed=st.integers(0, 2**31),
        q=st.sampled_from([25, 75, 95]),
        ss=st.sampled_from(["444", "420"]),
    )
    def roundtrip(h, w, seed, q, ss):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(img, q, subsampling=ss))
        assert dec.shape == (h, w, 3)
        # noise is the hardest content; the decode must still be a
        # plausible reconstruction, not garbage (empirically ≥ ~14 dB)
        assert psnr(img, dec) > 10.0

    roundtrip()


@pytest.mark.parametrize("ss", ["444", "420"])
def test_restart_markers_roundtrip(ss):
    # DRI/RSTn files are what cameras emit; the decoder must byte-align,
    # consume the marker and reset DC predictors at every interval
    # (round-4 review: the original resync silently corrupted every MCU
    # after the first interval when pad bits remained)
    img = gradient(48, 64)
    plain = encode_jpeg(img, quality=90, subsampling=ss)
    rst = encode_jpeg(img, quality=90, subsampling=ss, restart_interval=2)
    assert b"\xFF\xDD" in rst and rst.count(b"\xFF\xD0") >= 1
    p_plain = psnr(img, decode_jpeg(plain))
    p_rst = psnr(img, decode_jpeg(rst))
    # identical quantization: the two decodes must be equally good — THE
    # regression check (the broken resync decoded rst files ~35 dB worse)
    assert abs(p_plain - p_rst) < 0.5, (p_plain, p_rst)
    # absolute floor is subsampling-dependent: this gradient has sharp
    # 256-wraps, which 2x2 chroma averaging genuinely smears (~26 dB)
    assert p_rst > (35.0 if ss == "444" else 20.0)


def test_truncated_marker_header_raises_valueerror():
    # contract: malformed input raises ValueError, never struct.error
    for payload in (b"\xFF\xD8\xFF\xE0\x00", b"\xFF\xD8\xFF\xC0\x00\x08\x08"):
        with pytest.raises(ValueError):
            decode_jpeg(payload)


def test_mislabelled_sof2_with_baseline_scan_raises():
    # a baseline stream whose SOF marker was flipped to SOF2 carries a
    # Ss=0..Se=63 scan header — illegal in progressive (DC and AC bands
    # may not share a scan) and must be rejected, not misdecoded
    img = gradient(16, 16)
    payload = bytearray(encode_jpeg(img, 75))
    idx = payload.find(b"\xFF\xC0")
    payload[idx + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))


# ---------------------------------------------------------------------------
# Progressive (SOF2) decode — round 5. A fully-refined progressive file
# reconstructs the EXACT quantized coefficients of the sequential file, so
# the differential contract is bit-identical pixels, not just PSNR.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("h,w,subs", [
    (37, 53, "444"), (16, 24, "420"), (1, 1, "444"), (64, 48, "420"), (7, 9, "444"),
])
def test_progressive_bit_identical_to_baseline(h, w, subs):
    from parallel_connected_components_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    img = gradient(h, w)
    base = decode_jpeg(encode_jpeg(img, quality=85, subsampling=subs))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=85, subsampling=subs))
    assert np.array_equal(prog, base)


def test_progressive_noise_and_gray_roundtrip():
    from parallel_connected_components_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (45, 38, 3), dtype=np.uint8)
    for q in (40, 75, 95):
        base = decode_jpeg(encode_jpeg(img, quality=q))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=q))
        assert np.array_equal(prog, base), q
    g = rng.integers(0, 256, (20, 30), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(g, 80)), decode_jpeg(encode_jpeg(g, 80))
    )


def test_progressive_multiblock_eob_runs():
    """EOBn with run > 1 (symbols 0x10, 0x20 … carry extra bits): the
    Annex-K tables our encoder emits have no such symbols, so this path
    is covered by a hand-built scan using a custom DHT — 4 all-zero-AC
    blocks collapsed into one EOB4-style run."""
    import struct

    from parallel_connected_components_spark.operators import jpeg as J

    # image: 4 luma blocks (16x16), flat gray → every AC coefficient 0
    img = np.full((16, 16, 3), 128, dtype=np.uint8)
    qy = J._scaled_quant(J.QUANT_LUMA, 85)
    ycc = J._rgb_to_ycbcr(img)
    zz = J._plane_to_zz(ycc[:, :, 0] - 128.0, qy)
    assert not np.any(zz[:, :, 1:])  # flat: AC all zero
    dc = int(zz[0, 0, 0])

    # custom AC table containing EOBn symbols 0x00..0x20 + a few sizes
    ac_bits = [0, 0, 4, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    ac_vals = [0x00, 0x10, 0x20, 0xF0, 0x01, 0x11]
    dc_bits, dc_vals = J.DC_LUMA_BITS, J.DC_LUMA_VALS

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xFF\xD8")
    out += seg(0xFFDB, b"\x00" + qy.astype(np.uint8)[J.ZIGZAG].tobytes())
    out += seg(0xFFC2, struct.pack(">BHHB", 8, 16, 16, 1) + bytes([1, 0x11, 0]))
    out += seg(0xFFC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xFFC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    dc_codes = J._canonical_codes(dc_bits, dc_vals)
    ac_codes = J._canonical_codes(ac_bits, ac_vals)

    # scan 1: DC first, Al=0 (4 blocks, diff-coded)
    bw = J._BitWriter()
    pred = [0]
    for _ in range(4):
        J._emit_dc_first(bw, np.array([dc]), dc_codes, pred, 0, 0)
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    out += bw.flush()
    # scan 2: AC first 1..63, Al=0 — ONE EOB4 symbol (0x20 + 0 extra bits
    # value 0) covering all 4 blocks: eobrun = (1<<2)-1 + 0 = 3 more
    bw = J._BitWriter()
    code, ln = ac_codes[0x20]
    bw.write(code, ln)
    bw.write(0, 2)  # 2 extra bits, value 0
    out += seg(0xFFDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
    out += bw.flush()
    out += b"\xFF\xD9"

    got = decode_jpeg(bytes(out))
    want = decode_jpeg(J.encode_jpeg(img, quality=85))
    assert np.array_equal(got, want)


def test_fill_bytes_before_markers_decode():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a marker.
    Self-encoded files never emit them, but real crawl JPEGs do — insert
    padding before every non-SOI marker segment and require an identical
    decode (round-5 ADVICE fix: the padded 0xFF used to be taken as the
    marker id itself, misparsing the stream)."""
    img = gradient(24, 16)
    payload = encode_jpeg(img, quality=85)
    base = decode_jpeg(payload)
    # walk the marker stream (pre-scan only: stop at SOS — padding inside
    # entropy-coded data is a different construct) and pad each marker
    out = bytearray(payload[:2])  # SOI
    pos = 2
    while pos < len(payload):
        assert payload[pos] == 0xFF
        marker = payload[pos + 1]
        out += b"\xFF\xFF\xFF"  # three fill bytes, then the real marker
        if marker == 0xDA:  # SOS: copy the rest verbatim
            out += payload[pos:]
            break
        seg_len = int.from_bytes(payload[pos + 2:pos + 4], "big")
        out += payload[pos:pos + 2 + seg_len]
        pos += 2 + seg_len
    padded = bytes(out)
    assert padded != payload
    got = decode_jpeg(padded)
    assert got.shape == base.shape
    assert np.array_equal(got, base)
