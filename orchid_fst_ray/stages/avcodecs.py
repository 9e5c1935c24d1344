"""In-container audio/video codecs, pure numpy + stdlib.

Audio: a general RIFF/WAVE decoder covering the formats that need no
external DSP library — integer PCM (8/16-bit), IEEE float32, and the
two G.711 companded telephony formats (A-law / µ-law, ITU-T G.711).
Multi-channel input is downmixed to mono by averaging. Compressed
formats (MP3/AAC/...) still raise ``NotImplementedError``.

Video: an MJPEG-in-AVI muxer/demuxer (RIFF 'AVI ' container per the
public OpenDML/VFW documentation) — every frame is a standalone
baseline JPEG decoded by ``stages/imagecodecs.decode_jpeg``. MP4/
H.264/VP9 still raise ``NotImplementedError`` (they need real codec
libraries this container lacks).

Scale note: both decoders run inside actor-pool ``map_batches``
stages; per-item work is bounded by the payload byte count and the
kernels are numpy-vectorized (the G.711 expansion is a 256-entry LUT
gather; AVI demux is header walking plus per-frame JPEG decode).
"""

from __future__ import annotations

import struct

import numpy as np

from orchid_fst_ray.stages.imagecodecs import decode_jpeg, encode_jpeg

__all__ = [
    "decode_wav", "encode_wav",
    "ulaw_decode_table", "alaw_decode_table",
    "decode_avi_mjpeg", "encode_avi_mjpeg",
]


# =====================================================================
# G.711 companding (ITU-T G.711; classic public expansion formulas)
# =====================================================================

def ulaw_decode_table() -> np.ndarray:
    """256-entry µ-law byte → linear int16 LUT."""
    u = ~np.arange(256, dtype=np.uint8)
    sign = (u & 0x80) != 0
    exp = ((u >> 4) & 7).astype(np.int32)
    mant = (u & 0x0F).astype(np.int32)
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def alaw_decode_table() -> np.ndarray:
    """256-entry A-law byte → linear int16 LUT."""
    a = np.arange(256, dtype=np.uint8) ^ 0x55
    sign = (a & 0x80) != 0
    seg = ((a >> 4) & 7).astype(np.int32)
    mant = (a & 0x0F).astype(np.int32)
    t = (mant << 4) + 8
    t = np.where(seg >= 1, t + 0x100, t)
    t = np.where(seg >= 2, t << np.maximum(seg - 1, 0), t)
    return np.where(sign, t, -t).astype(np.int16)


_ULAW_DEC = ulaw_decode_table()
_ALAW_DEC = alaw_decode_table()


def _companding_encode(samples: np.ndarray, table: np.ndarray
                       ) -> np.ndarray:
    """linear int16 → companded bytes by nearest decoded value — an
    optimal quantizer against the decode LUT (encoder choice is free
    as long as the decoder is spec-exact; nearest-match minimizes
    roundtrip error)."""
    order = np.argsort(table, kind="stable")
    sorted_vals = table[order].astype(np.int32)
    pos = np.searchsorted(sorted_vals, samples.astype(np.int32))
    pos = np.clip(pos, 1, len(sorted_vals) - 1)
    left = sorted_vals[pos - 1]
    right = sorted_vals[pos]
    take_left = (samples.astype(np.int32) - left
                 ) <= (right - samples.astype(np.int32))
    best = np.where(take_left, pos - 1, pos)
    return order[best].astype(np.uint8)


# =====================================================================
# RIFF/WAVE
# =====================================================================

_WAV_FMTS = {1: "pcm", 3: "float", 6: "alaw", 7: "ulaw"}


def _riff_chunks(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        yield cid, pos + 8, ln
        pos += 8 + ln + (ln & 1)                    # chunks are even-padded


def encode_wav(samples: np.ndarray, rate: int = 16000,
               fmt: str = "pcm16") -> bytes:
    """mono samples → RIFF/WAVE bytes. ``fmt``: "pcm16" (int16 in),
    "pcm8" (unsigned 8-bit), "float32", "alaw", "ulaw"."""
    x = samples.astype(np.int16)
    if fmt == "pcm16":
        tag, bits, payload = 1, 16, x.astype("<i2").tobytes()
    elif fmt == "pcm8":
        tag, bits = 1, 8
        payload = ((x.astype(np.int32) >> 8) + 128).astype(np.uint8
                                                           ).tobytes()
    elif fmt == "float32":
        tag, bits = 3, 32
        payload = (x.astype(np.float32) / 32768.0).astype("<f4").tobytes()
    elif fmt == "alaw":
        tag, bits, payload = 6, 8, _companding_encode(x, _ALAW_DEC
                                                      ).tobytes()
    elif fmt == "ulaw":
        tag, bits, payload = 7, 8, _companding_encode(x, _ULAW_DEC
                                                      ).tobytes()
    else:
        raise ValueError(f"unknown wav fmt {fmt!r}")
    block = bits // 8
    fmtc = struct.pack("<HHIIHH", tag, 1, rate, rate * block, block, bits)
    body = (b"fmt " + struct.pack("<I", len(fmtc)) + fmtc
            + b"data" + struct.pack("<I", len(payload)) + payload)
    if len(payload) & 1:
        body += b"\x00"
    return (b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE → (mono int16 samples, sample_rate). Real decoder for
    integer PCM (8/16-bit), IEEE float32, A-law and µ-law, any channel
    count (downmixed by averaging). Compressed formats (MP3 inside
    WAV, ADPCM, extensible) raise ``NotImplementedError``."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError(
            "not a RIFF/WAVE stream (MP3/AAC need external codec libs)")
    tag = ch = rate = bits = None
    payload = None
    for cid, off, ln in _riff_chunks(data, 12, len(data)):
        if cid == b"fmt ":
            tag, ch, rate, _bps, _ba, bits = struct.unpack_from(
                "<HHIIHH", data, off)
        elif cid == b"data":
            payload = data[off:off + ln]
    if tag is None or payload is None:
        raise ValueError("WAV: missing fmt or data chunk")
    kind = _WAV_FMTS.get(tag)
    if kind is None:
        raise NotImplementedError(
            f"WAV format tag {tag}: only PCM/float32/A-law/µ-law are "
            "decodable in-container")
    if kind == "pcm" and bits == 16:
        x = np.frombuffer(payload, "<i2").astype(np.int32)
    elif kind == "pcm" and bits == 8:
        x = ((np.frombuffer(payload, np.uint8).astype(np.int32) - 128)
             << 8)
    elif kind == "float":
        if bits != 32:
            raise NotImplementedError("only 32-bit float WAV supported")
        f = np.clip(np.frombuffer(payload, "<f4"), -1.0, 1.0)
        x = np.round(f.astype(np.float64) * 32767.0).astype(np.int32)
    elif kind == "alaw":
        x = _ALAW_DEC[np.frombuffer(payload, np.uint8)].astype(np.int32)
    elif kind == "ulaw":
        x = _ULAW_DEC[np.frombuffer(payload, np.uint8)].astype(np.int32)
    else:
        raise NotImplementedError(f"WAV: {bits}-bit {kind}")
    if ch and ch > 1:
        n = (len(x) // ch) * ch
        x = x[:n].reshape(-1, ch).mean(axis=1).round().astype(np.int32)
    return x.astype(np.int16), int(rate)


# =====================================================================
# AVI / MJPEG  (RIFF 'AVI '; VFW/OpenDML public documentation)
# =====================================================================

def encode_avi_mjpeg(frames: np.ndarray, fps: int = 10,
                     quality: int = 92) -> bytes:
    """(n, h, w, 3) uint8 → minimal MJPEG AVI: one baseline-JPEG
    '00dc' chunk per frame inside LIST 'movi'."""
    n, h, w, _ = frames.shape
    blobs = [encode_jpeg(frames[i], quality=quality) for i in range(n)]
    maxb = max(len(b) for b in blobs)

    def chunk(cid: bytes, body: bytes) -> bytes:
        out = cid + struct.pack("<I", len(body)) + body
        return out + (b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack("<14I", 1_000_000 // fps, maxb * fps, 0, 0x10,
                       n, 0, 1, maxb, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0,
                                            1, fps, 0, n, maxb, 0, -1)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", b) for b in blobs))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def decode_avi_mjpeg(data: bytes) -> tuple[np.ndarray, int]:
    """MJPEG AVI → ((n, h, w, 3) uint8, fps). Real demux + per-frame
    baseline-JPEG decode. Non-MJPEG streams (H.264/...) raise
    ``NotImplementedError``."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise NotImplementedError(
            "not a RIFF/AVI stream (MP4/MKV need external codec libs)")
    fps = 10
    frames: list[np.ndarray] = []

    def walk(start: int, end: int) -> None:
        nonlocal fps
        for cid, off, ln in _riff_chunks(data, start, end):
            if cid == b"LIST":
                walk(off + 4, off + ln)
            elif cid == b"strh":
                fcc_type = data[off:off + 4]
                handler = data[off + 4:off + 8]
                if fcc_type == b"vids":
                    if handler not in (b"MJPG", b"mjpg"):
                        raise NotImplementedError(
                            f"AVI video handler {handler!r}: only MJPG "
                            "is decodable in-container")
                    scale, rate = struct.unpack_from("<II", data, off + 20)
                    if scale:
                        fps = max(1, round(rate / scale))
            elif cid[2:4] in (b"dc", b"db") and ln > 2:
                frames.append(decode_jpeg(data[off:off + ln]))

    walk(12, len(data))
    if not frames:
        raise ValueError("AVI: no video frames found")
    return np.stack(frames), fps
