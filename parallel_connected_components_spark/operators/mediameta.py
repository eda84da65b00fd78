"""Container-level metadata for MP3 and MP4 payloads (round-5 VERDICT
item 7): real header parsing — frame-accurate duration, bitrate, sample
rate, track counts — without any audio/video DSP decode (full codecs stay
behind the strict gate in :mod:`multimodal`; they need libraries absent
from this container and are documented out of scope there).

Target-brief surface (multimodal columns for a training-data pipeline);
the reference engine has no media handling at all. Everything here is
written from the public specs: MPEG-1/2 audio frame headers (ISO/IEC
11172-3 / 13818-3 §2.4.1) and the ISO base media file format box
structure (ISO/IEC 14496-12 §4, mvhd §8.2.2).

Scale shape: :func:`media_container_meta` is an Arrow-batched mapInPandas
projection — per-row byte parsing, no shuffle, no driver involvement.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# MPEG-1 Layer III bitrate table (kbps), index 1..14; 0 = "free" (not
# supported here), 15 = invalid. ISO/IEC 11172-3 Table B.2.
_BITRATE_V1_L3 = [None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
# MPEG-2/2.5 Layer III (ISO/IEC 13818-3)
_BITRATE_V2_L3 = [None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_RATES_V1 = [44100, 48000, 32000]
_RATES_V2 = [22050, 24000, 16000]
_RATES_V25 = [11025, 12000, 8000]


def _id3v2_size(payload: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if none). Size field is
    4 sync-safe bytes (7 bits each), excluding the 10-byte header."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    b = payload[6:10]
    if any(x & 0x80 for x in b):
        return 0  # malformed sync-safe size: treat as no tag
    size = (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]
    return 10 + size


def _parse_frame_header(h: bytes) -> dict | None:
    """One 4-byte MPEG audio frame header → fields, or None if invalid."""
    if len(h) < 4 or h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
        return None
    version_bits = (h[1] >> 3) & 0x3  # 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    layer_bits = (h[1] >> 1) & 0x3  # 1=Layer III, 2=II, 3=I
    if version_bits == 1 or layer_bits != 1:  # Layer III only
        return None
    bitrate_idx = (h[2] >> 4) & 0xF
    rate_idx = (h[2] >> 2) & 0x3
    if bitrate_idx in (0, 15) or rate_idx == 3:
        return None  # "free"/invalid bitrate or reserved rate
    padding = (h[2] >> 1) & 0x1
    if version_bits == 3:
        version, bitrate = 1.0, _BITRATE_V1_L3[bitrate_idx]
        rate = _RATES_V1[rate_idx]
        samples_per_frame = 1152
        frame_size = 144_000 * bitrate // rate + padding
    else:
        version = 2.0 if version_bits == 2 else 2.5
        bitrate = _BITRATE_V2_L3[bitrate_idx]
        rate = (_RATES_V2 if version_bits == 2 else _RATES_V25)[rate_idx]
        samples_per_frame = 576
        frame_size = 72_000 * bitrate // rate + padding
    return {
        "version": version,
        "bitrate_kbps": bitrate,
        "sample_rate": rate,
        "samples_per_frame": samples_per_frame,
        "frame_size": frame_size,
    }


def mp3_metadata(payload: bytes) -> dict:
    """Walk the MPEG Layer III frame sequence → {container, version,
    sample_rate, frames, duration_ms, bitrate_kbps (length-weighted
    average — VBR streams report the true mean)}.

    Raises ValueError on anything that is not a parseable Layer III
    stream (the strict contract every decoder in this package follows)."""
    pos = _id3v2_size(payload)
    # tolerate a little junk before the first sync (crawl truncations)
    first = None
    for probe in range(pos, min(len(payload) - 3, pos + 4096)):
        hdr = _parse_frame_header(payload[probe:probe + 4])
        if hdr is not None:
            # require the NEXT frame (if room) to also sync — a lone 11-bit
            # sync pattern appears in random data constantly
            nxt = probe + hdr["frame_size"]
            if nxt + 4 > len(payload) or _parse_frame_header(payload[nxt:nxt + 4]):
                first, pos = hdr, probe
                break
    if first is None:
        raise ValueError("no MPEG Layer III frame sync found")
    frames = 0
    samples = 0
    bit_bytes = 0
    rate = first["sample_rate"]
    version = first["version"]
    while pos + 4 <= len(payload):
        hdr = _parse_frame_header(payload[pos:pos + 4])
        if hdr is None:
            break  # trailing tag/garbage ends the stream
        if hdr["sample_rate"] != rate:
            break  # a rate change mid-stream is a different stream
        if pos + hdr["frame_size"] > len(payload):
            break  # truncated final frame: exclude it
        frames += 1
        samples += hdr["samples_per_frame"]
        bit_bytes += hdr["frame_size"]
        pos += hdr["frame_size"]
    if frames == 0:
        raise ValueError("MPEG stream has no complete frame")
    duration_ms = samples * 1000 // rate
    avg_kbps = round(bit_bytes * 8 * rate / (samples * 1000))
    return {
        "container": "mp3",
        "version": version,
        "sample_rate": rate,
        "frames": frames,
        "duration_ms": duration_ms,
        "bitrate_kbps": avg_kbps,
    }


def encode_mp3(
    frames: int, bitrate_kbps: int = 64, sample_rate: int = 32000, id3_pad: int = 0
) -> bytes:
    """Synthesize a valid MPEG-1 Layer III frame stream (headers + zeroed
    frame bodies — metadata-parseable, not playable audio; the generator's
    deterministic stand-in for real crawl audio). ``id3_pad`` > 0 prefixes
    an ID3v2 tag with that many payload bytes."""
    try:
        bidx = _BITRATE_V1_L3.index(bitrate_kbps)
    except ValueError as exc:
        raise ValueError(f"unsupported MPEG-1 L3 bitrate {bitrate_kbps}") from exc
    try:
        ridx = _RATES_V1.index(sample_rate)
    except ValueError as exc:
        raise ValueError(f"unsupported MPEG-1 sample rate {sample_rate}") from exc
    hdr = bytes(
        [0xFF, 0xFB, (bidx << 4) | (ridx << 2), 0x00]
    )  # sync, MPEG1 L3 no-CRC, no padding, stereo
    frame_size = 144_000 * bitrate_kbps // sample_rate
    frame = hdr + b"\x00" * (frame_size - 4)
    out = b""
    if id3_pad:
        size = id3_pad
        ss = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        out += b"ID3\x04\x00\x00" + ss + b"\x00" * id3_pad
    return out + frame * frames


# --------------------------------------------------------------------------
# ISO base media (MP4)
# --------------------------------------------------------------------------

def _walk_boxes(buf: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for the sibling boxes in
    buf[start:end]; handles 64-bit largesize and size==0 (to end)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", buf[pos:pos + 4])[0]
        btype = buf[pos + 4:pos + 8]
        header = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box header")
            size = struct.unpack(">Q", buf[pos + 8:pos + 16])[0]
            header = 16
        elif size == 0:
            size = end - pos  # box extends to end of enclosing scope
        if size < header or pos + size > end:
            raise ValueError(f"malformed box {btype!r}: size {size}")
        yield btype, pos + header, pos + size
        pos += size


def mp4_metadata(payload: bytes) -> dict:
    """ftyp major brand + mvhd timescale/duration + trak count →
    {container, major_brand, timescale, duration_ms, tracks}. Raises
    ValueError if the payload is not ISO-BMFF or lacks moov/mvhd."""
    brand = None
    timescale = duration = None
    tracks = 0
    saw_moov = False
    for btype, b0, b1 in _walk_boxes(payload, 0, len(payload)):
        if btype == b"ftyp":
            if b1 - b0 < 8:
                raise ValueError("ftyp too short")
            brand = payload[b0:b0 + 4].decode("latin-1")
        elif btype == b"moov":
            saw_moov = True
            for ctype, c0, c1 in _walk_boxes(payload, b0, b1):
                if ctype == b"mvhd":
                    ver = payload[c0]
                    if ver == 1:
                        timescale = struct.unpack(">I", payload[c0 + 20:c0 + 24])[0]
                        duration = struct.unpack(">Q", payload[c0 + 24:c0 + 32])[0]
                    else:
                        timescale = struct.unpack(">I", payload[c0 + 12:c0 + 16])[0]
                        duration = struct.unpack(">I", payload[c0 + 16:c0 + 20])[0]
                elif ctype == b"trak":
                    tracks += 1
    if brand is None or not saw_moov or timescale is None:
        raise ValueError("not an ISO-BMFF payload with ftyp+moov/mvhd")
    if timescale == 0:
        raise ValueError("mvhd timescale is zero")
    return {
        "container": "mp4",
        "major_brand": brand,
        "timescale": timescale,
        "duration_ms": duration * 1000 // timescale,
        "tracks": tracks,
    }


def encode_mp4(
    duration_ms: int,
    timescale: int = 1000,
    brand: str = "isom",
    tracks: int = 1,
    mvhd_version: int = 0,
    mdat_bytes: int = 64,
) -> bytes:
    """Minimal valid ISO-BMFF: ftyp + moov(mvhd + empty trak stubs) +
    mdat filler — metadata-parseable, not playable video."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    ftyp = box(b"ftyp", brand.encode("latin-1") + struct.pack(">I", 0) + b"isom")
    dur_units = duration_ms * timescale // 1000
    if mvhd_version == 1:
        mvhd_body = (
            b"\x01\x00\x00\x00"
            + struct.pack(">QQIQ", 0, 0, timescale, dur_units)
            + b"\x00" * 80
        )
    else:
        mvhd_body = (
            b"\x00\x00\x00\x00"
            + struct.pack(">IIII", 0, 0, timescale, dur_units)
            + b"\x00" * 76
        )
    moov_children = box(b"mvhd", mvhd_body) + b"".join(
        box(b"trak", box(b"tkhd", b"\x00" * 84)) for _ in range(tracks)
    )
    moov = box(b"moov", moov_children)
    mdat = box(b"mdat", b"\x00" * mdat_bytes)
    return ftyp + moov + mdat


# --------------------------------------------------------------------------
# The Spark operator
# --------------------------------------------------------------------------

def media_container_meta(media: DataFrame) -> DataFrame:
    """Parse MP3/MP4 container metadata straight from the payload column:
    → (media_id, kind, container, duration_ms, sample_rate, bitrate_kbps,
    frames, tracks, major_brand). Rows whose payload is neither are
    dropped (use :func:`multimodal.decode_media` for PPM/PNG/JPEG/WAV).
    Arrow-batched projection, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, p in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                b = bytes(p)
                if b[:3] == b"ID3" or (len(b) > 1 and b[0] == 0xFF and (b[1] & 0xE0) == 0xE0):
                    try:
                        m = mp3_metadata(b)
                    except ValueError:
                        continue
                    rows.append(
                        (mid, kind, "mp3", m["duration_ms"], m["sample_rate"],
                         m["bitrate_kbps"], m["frames"], None, None)
                    )
                elif len(b) >= 8 and b[4:8] == b"ftyp":
                    try:
                        m = mp4_metadata(b)
                    except ValueError:
                        continue
                    rows.append(
                        (mid, kind, "mp4", m["duration_ms"], None, None, None,
                         m["tracks"], m["major_brand"])
                    )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id", "kind", "container", "duration_ms",
                        "sample_rate", "bitrate_kbps", "frames", "tracks",
                        "major_brand",
                    ],
                )

    return media.mapInPandas(
        run,
        schema=(
            "media_id long, kind string, container string, duration_ms long, "
            "sample_rate int, bitrate_kbps int, frames int, tracks int, "
            "major_brand string"
        ),
    )


def gen_media_av(spark, n: int, seed: int = 11) -> DataFrame:
    """Deterministic MP3/MP4 media table for the container-metadata
    oracle. MP3 rows: MPEG-1 L3 @ 32 kHz (frame duration exactly 36 ms,
    so duration_ms metadata is exact), bitrate rotating over even-size
    table entries (frame sizes integral: 4.5 bytes/kbps); MP4 rows:
    timescale 1000 (duration in ms directly), 1-2 tracks, mvhd v0/v1
    alternating. Every parsed value is recomputable in plain SQL from the
    metadata columns + octet_length(payload)."""
    from .multimodal import MEDIA_SCHEMA

    base = spark.range(n).select(F.col("id").alias("media_id"))

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"].tolist():
                m = mid + seed * 1_000_003
                if mid % 2 == 0:
                    frames = 3 + m % 40
                    kbps = [64, 96, 128, 160][m % 4]
                    payload = encode_mp3(frames, kbps, 32000)
                    rows.append(
                        (mid, "audio", payload, None, None, frames * 36, 32000)
                    )
                else:
                    dur = 500 + (m * 131) % 60_000
                    payload = encode_mp4(
                        dur,
                        timescale=1000,
                        tracks=1 + mid % 2,
                        mvhd_version=mid % 4 // 2,
                    )
                    rows.append((mid, "video", payload, None, None, dur, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "payload", "width", "height",
                    "duration_ms", "sample_rate",
                ],
            )

    return base.mapInPandas(synth, schema=MEDIA_SCHEMA)
