"""Multimodal: real PPM/WAV codecs (no external libs), feature kernels,
Arrow batch shapes, real resize, strict-mode integration gate for
formats without an in-container codec."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from parallel_connected_components_spark.operators.multimodal import (
    FEATURE_DIM,
    audio_features,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    extract_features,
    gen_media,
    image_features,
    resize_images,
    resize_ppm,
    sample_frames,
)


def test_ppm_roundtrip():
    arr = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    back = decode_ppm(encode_ppm(arr))
    assert np.array_equal(arr, back)
    # comments + arbitrary whitespace in the header per spec
    with_comment = b"P6\n# a comment\n4  5\n255\n" + arr.tobytes()
    assert np.array_equal(decode_ppm(with_comment), arr)


def test_png_roundtrip():
    from parallel_connected_components_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    arr = (np.arange(9 * 7 * 3, dtype=np.int64) * 37 % 256).astype(np.uint8).reshape(9, 7, 3)
    assert np.array_equal(decode_png(encode_png(arr)), arr)


def test_png_all_filters_and_color_types():
    """Decode scanlines written with every PNG filter type (1=Sub 2=Up
    3=Average 4=Paeth — our encoder only emits 0, so these are
    hand-filtered per the spec) and the gray/alpha color types."""
    import struct
    import zlib

    from parallel_connected_components_spark.operators.multimodal import (
        _paeth,
        decode_png,
    )

    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, size=(5, 6, 3)).astype(np.uint8)
    h, w = arr.shape[:2]
    bpp = 3

    def filt(y, ftype):
        line = arr[y].reshape(-1).astype(int)
        prior = arr[y - 1].reshape(-1).astype(int) if y > 0 else np.zeros_like(line)
        out = []
        for i, x in enumerate(line):
            a = line[i - bpp] if i >= bpp else 0
            b = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            if ftype == 1:
                out.append((x - a) % 256)
            elif ftype == 2:
                out.append((x - b) % 256)
            elif ftype == 3:
                out.append((x - (a + b) // 2) % 256)
            else:
                out.append((x - _paeth(a, b, c)) % 256)
        return bytes([ftype]) + bytes(out)

    raw = b"".join(filt(y, 1 + y % 4) for y in range(h))

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), arr)

    # grayscale (ctype 0) broadcasts to 3 channels
    g = rng.randint(0, 256, size=(4, 5)).astype(np.uint8)
    raw_g = b"".join(b"\x00" + g[y].tobytes() for y in range(4))
    png_g = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 4, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw_g))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png_g), np.repeat(g[:, :, None], 3, axis=2))

    # RGBA (ctype 6) drops alpha
    rgba = rng.randint(0, 256, size=(3, 4, 4)).astype(np.uint8)
    raw_a = b"".join(b"\x00" + rgba[y].tobytes() for y in range(3))
    png_a = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw_a))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png_a), rgba[:, :, :3])


def test_wav_roundtrip():
    samples = (np.sin(np.linspace(0, 20, 800)) * 12000).astype("<i2")
    back, sr = decode_wav(encode_wav(samples, 16000))
    assert sr == 16000
    assert np.array_equal(samples, back)


def test_feature_kernels_reflect_content():
    dark = image_features(np.zeros((8, 8, 3), dtype=np.uint8))
    light = image_features(np.full((8, 8, 3), 250, dtype=np.uint8))
    assert light[9] > dark[9]  # luminance mean
    assert all(0.0 <= x < 1.0 for x in dark + light)
    low = audio_features((np.sin(np.linspace(0, 50, 4000)) * 9000).astype("<i2"), 16000)
    loud = audio_features((np.sin(np.linspace(0, 50, 4000)) * 30000).astype("<i2"), 16000)
    assert loud[1] > low[1]  # rms
    assert len(low) == len(dark) == FEATURE_DIM


def test_media_schema_and_determinism(spark):
    m1 = gen_media(spark, 60)
    assert m1.count() == 60
    assert {f.name for f in m1.schema.fields} == {
        "media_id", "kind", "payload", "width", "height", "duration_ms", "sample_rate",
    }
    m2 = gen_media(spark, 60)
    assert m1.exceptAll(m2).count() == 0
    # the seed must actually change payload content (round-3 ADVICE: it
    # had silently stopped affecting image/audio rows)
    m3 = gen_media(spark, 60, seed=99)
    assert m3.exceptAll(m1).count() > 0


def test_audio_features_zero_frame_wav():
    # a valid zero-frame WAV must yield the silent feature vector, not an
    # FFT crash (round-3 ADVICE)
    feats = audio_features(np.array([], dtype="<i2"), 16000)
    assert len(feats) == FEATURE_DIM
    assert all(v == 0.0 for v in feats)
    # and through the full decode path
    samples, sr = decode_wav(encode_wav(np.array([], dtype="<i2"), 8000))
    assert sr == 8000 and len(samples) == 0
    assert len(audio_features(samples, sr)) == FEATURE_DIM


def test_decode_media_matches_generator_metadata(spark):
    from parallel_connected_components_spark.operators.multimodal import decode_media

    media = gen_media(spark, 45, seed=3)
    dec = decode_media(media).join(
        media.select("media_id", "width", "height", "sample_rate", "duration_ms"),
        "media_id",
    )
    rows = dec.collect()
    assert len(rows) == sum(1 for i in range(45) if i % 3 != 2)  # no video rows
    for r in rows:
        if r["kind"] == "image":
            assert r["dec_width"] == r["width"] and r["dec_height"] == r["height"]
        else:
            assert r["dec_sample_rate"] == r["sample_rate"]
            # generator truncates: n_samples = int(sr * dur_ms / 1000)
            assert r["dec_n_samples"] == int(r["sample_rate"] * r["duration_ms"] / 1000)


def test_extract_features_real_decode(spark):
    media = gen_media(spark, 42)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 42
    for r in rows:
        assert len(r["feature"]) == FEATURE_DIM
        assert all(0.0 <= x < 1.0 for x in r["feature"])
        assert r["n_bytes"] > 0
    # images: the luminance-mean feature must match a local numpy decode
    img = media.filter("kind = 'image'").limit(3).collect()
    got = {r["media_id"]: r["feature"] for r in rows}
    from parallel_connected_components_spark.operators.multimodal import decode_image

    for r in img:
        expect = image_features(decode_image(bytes(r["payload"])))
        assert got[r["media_id"]] == pytest.approx(expect)
    # audio: same for the rms feature vector
    aud = media.filter("kind = 'audio'").limit(3).collect()
    for r in aud:
        expect = audio_features(*decode_wav(bytes(r["payload"])))
        assert got[r["media_id"]] == pytest.approx(expect)
    # deterministic across partitionings
    again = {r["media_id"]: r["feature"] for r in extract_features(media.repartition(7)).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["feature"]


def test_strict_mode_raises_only_without_codec(spark):
    media = gen_media(spark, 12)
    # image + audio decode for real — strict passes
    ok = extract_features(media.filter("kind != 'video'"), strict=True).collect()
    assert ok
    # video has no in-container codec — strict raises at the gate
    with pytest.raises(Exception, match="NotImplementedError|no in-container decoder"):
        extract_features(media.filter("kind = 'video'"), strict=True).collect()


def test_resize_plan_and_real_resample(spark):
    media = gen_media(spark, 60)
    planned = resize_images(media, max_side=16).collect()
    assert planned
    for r in planned:
        assert max(r["target_width"], r["target_height"]) <= 17  # rounding slack
        assert r["target_width"] >= 1 and r["target_height"] >= 1
    resized = resize_ppm(media, max_side=16).collect()
    assert len(resized) == len(planned)
    from parallel_connected_components_spark.operators.multimodal import decode_image

    formats = set()
    for r in resized:
        b = bytes(r["payload"])
        if b[:4] == b"\x89PNG":
            formats.add("png")
        elif b[:2] == b"\xFF\xD8":
            formats.add("jpeg")
        else:
            formats.add("ppm")
        arr = decode_image(b)
        assert arr.shape == (r["height"], r["width"], 3)
        assert max(r["width"], r["height"]) <= 17
    assert formats == {"ppm", "png", "jpeg"}  # container preserved through resize


def test_frame_sampling(spark):
    media = gen_media(spark, 100)
    frames = sample_frames(media, every_ms=50000)
    vids = {r["media_id"]: r["duration_ms"] for r in media.filter("kind = 'video'").collect()}
    got = frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    assert {r["media_id"] for r in got} == set(vids)
    for r in got:
        expected = (vids[r["media_id"]] - 1) // 50000 + 1
        assert r["n"] == expected


def test_decode_features_nonstrict_falls_back_on_undecodable_jpeg():
    # a malformed file carrying the JPEG magic (here: SOF2 header glued to
    # a baseline Ss=0..63 scan — illegal in progressive) can't decode:
    # non-strict must degrade to the deterministic fake instead of failing
    # the whole stage; strict must raise. (Well-formed SOF2 decodes for
    # real since round 5.)
    import pytest as _pytest

    from parallel_connected_components_spark.operators.jpeg import encode_jpeg
    from parallel_connected_components_spark.operators.multimodal import (
        _fake_decode_features,
        decode_features,
    )

    yy = np.arange(16, dtype=np.uint8)
    img = np.stack([np.tile(yy, (16, 1))] * 3, axis=-1)
    payload = bytearray(encode_jpeg(img, 75))
    payload[payload.find(b"\xFF\xC0") + 1] = 0xC2  # SOF0 -> SOF2
    payload = bytes(payload)
    got = decode_features(payload, "image", strict=False)
    assert got == _fake_decode_features(payload, "image")
    with _pytest.raises(Exception):
        decode_features(payload, "image", strict=True)


# ---------------------------------------------------------------------------
# MP3/MP4 container metadata (round 5, operators/mediameta.py): header
# parsing only — sample decode is permanently out of scope (strict gate).
# ---------------------------------------------------------------------------

def test_mp3_roundtrip_and_id3():
    from parallel_connected_components_spark.operators.mediameta import (
        encode_mp3,
        mp3_metadata,
    )

    m = mp3_metadata(encode_mp3(25, 96, 32000))
    assert m == {
        "container": "mp3", "version": 1.0, "sample_rate": 32000,
        "frames": 25, "duration_ms": 900, "bitrate_kbps": 96,
    }
    # ID3v2 prefix skipped via sync-safe size
    m2 = mp3_metadata(encode_mp3(10, 64, 32000, id3_pad=321))
    assert m2["frames"] == 10 and m2["bitrate_kbps"] == 64
    # non-32k rate (non-integral ms per frame)
    m3 = mp3_metadata(encode_mp3(38, 128, 44100))
    assert m3["sample_rate"] == 44100 and m3["frames"] == 38
    assert m3["duration_ms"] == 38 * 1152 * 1000 // 44100


def test_mp3_rejects_garbage_and_truncation():
    import pytest as _pytest

    from parallel_connected_components_spark.operators.mediameta import (
        encode_mp3,
        mp3_metadata,
    )

    for bad in (b"", b"garbage" * 64, b"\xFF\xFB\x00"):
        with _pytest.raises(ValueError):
            mp3_metadata(bad)
    # truncated final frame is excluded, count drops by one
    p = encode_mp3(5, 64, 32000)
    assert mp3_metadata(p[:-10])["frames"] == 4


def test_mp4_roundtrip_v0_v1_and_rejects():
    import pytest as _pytest

    from parallel_connected_components_spark.operators.mediameta import (
        encode_mp4,
        mp4_metadata,
    )

    m = mp4_metadata(encode_mp4(61500, tracks=2, mvhd_version=0))
    assert m == {
        "container": "mp4", "major_brand": "isom", "timescale": 1000,
        "duration_ms": 61500, "tracks": 2,
    }
    m1 = mp4_metadata(encode_mp4(123456, tracks=1, mvhd_version=1, brand="mp42"))
    assert m1["duration_ms"] == 123456 and m1["major_brand"] == "mp42"
    # non-ms timescale still converts exactly
    m2 = mp4_metadata(encode_mp4(2000, timescale=90000))
    assert m2["duration_ms"] == 2000 and m2["timescale"] == 90000
    for bad in (b"", b"\x00\x00\x00\x08ftypabcd", b"not a box at all!!"):
        with _pytest.raises(ValueError):
            mp4_metadata(bad)


def test_media_container_meta_operator(spark):
    from parallel_connected_components_spark.operators.mediameta import (
        gen_media_av,
        media_container_meta,
    )

    media = gen_media_av(spark, 40, seed=11)
    got = {r["media_id"]: r.asDict() for r in media_container_meta(media).collect()}
    meta = {r["media_id"]: r.asDict() for r in media.collect()}
    assert len(got) == 40  # every row parses (no silent drops)
    for mid, row in got.items():
        assert row["duration_ms"] == meta[mid]["duration_ms"], (mid, row)
        if row["container"] == "mp3":
            assert row["sample_rate"] == 32000
            assert row["frames"] == meta[mid]["duration_ms"] // 36
            assert row["bitrate_kbps"] in (64, 96, 128, 160)
        else:
            assert row["tracks"] == 1 + mid % 2
            assert row["major_brand"] == "isom"


def test_strict_gate_mentions_mediameta():
    import pytest as _pytest

    from parallel_connected_components_spark.operators.multimodal import (
        decode_features,
    )

    with _pytest.raises(NotImplementedError, match="media_container_meta"):
        decode_features(b"\x00\x00\x00\x14ftypisomwhatever????", "video", strict=True)
