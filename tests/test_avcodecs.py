"""Audio/video codec tests (`stages/avcodecs.py`): WAV decode across
PCM16 / PCM8 / float32 / A-law / µ-law (G.711 LUT expansion), stereo
downmix, MJPEG-in-AVI mux/demux roundtrips, the video/audio dispatch,
and mixed-container pipeline fidelity against the lossless twins."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from orchid_fst_ray.stages import multimodal as mm
from orchid_fst_ray.stages.avcodecs import (
    alaw_decode_table, decode_avi_mjpeg, decode_wav, encode_avi_mjpeg,
    encode_wav, ulaw_decode_table)

SF = "/root/testdata/sf0.001"


def _sine(n=4000, amp=12000):
    return (np.sin(np.linspace(0, 40 * np.pi, n)) * amp).astype(np.int16)


# ------------------------------------------------------------------ WAV

def test_wav_pcm16_exact_and_header_compat():
    x = _sine()
    blob = encode_wav(x, 16000, "pcm16")
    # byte-identical to the historical minimal PCM16 writer
    assert blob == mm.encode_wav_pcm16(x, 16000)
    y, r = decode_wav(blob)
    assert r == 16000 and np.array_equal(y, x)


def test_wav_float32_near_exact():
    y, _ = decode_wav(encode_wav(_sine(), 16000, "float32"))
    assert np.abs(y.astype(int) - _sine().astype(int)).max() <= 1


def test_wav_pcm8_quantization_bound():
    y, _ = decode_wav(encode_wav(_sine(), 16000, "pcm8"))
    assert np.abs(y.astype(int) - _sine().astype(int)).max() <= 256


@pytest.mark.parametrize("fmt", ["alaw", "ulaw"])
def test_wav_g711_companding_bound(fmt):
    x = _sine()
    y, _ = decode_wav(encode_wav(x, 16000, fmt))
    rel = (np.abs(y.astype(int) - x.astype(int))
           / np.maximum(np.abs(x.astype(int)), 256))
    # logarithmic companding: bounded RELATIVE error
    assert rel.max() < 0.07


def test_g711_tables_spec_points():
    # µ-law code 0xFF is +0; 0x7F is -0; full-scale codes hit ±8031*4
    u = ulaw_decode_table()
    assert u[0xFF] == 0 and u[0x7F] == 0
    assert u[0x80] == 32124 and u[0x00] == -32124
    # A-law decodes 256 DISTINCT levels, symmetric up to the ±8 offset
    a = alaw_decode_table()
    assert len(np.unique(a)) == 256
    assert a.max() == 4032 * 8 and a.min() == -4032 * 8


def test_wav_stereo_downmix():
    x = _sine(1000)
    st = np.stack([x, x + 100], axis=1).astype("<i2")
    fmtc = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
    pay = st.tobytes()
    body = (b"fmt " + struct.pack("<I", 16) + fmtc
            + b"data" + struct.pack("<I", len(pay)) + pay)
    blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    y, r = decode_wav(blob)
    assert r == 8000
    assert np.abs(y.astype(int) - (x.astype(int) + 50)).max() <= 1


def test_wav_unsupported_raise():
    blob = bytearray(encode_wav(_sine(100), 8000, "pcm16"))
    struct.pack_into("<H", blob, 20, 2)           # ADPCM format tag
    with pytest.raises(NotImplementedError, match="tag 2"):
        decode_wav(bytes(blob))
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"ID3\x04 mp3-ish")


# ------------------------------------------------------------------ AVI

def _clip(n=6, h=24, w=16, seed=5):
    rng = np.random.RandomState(seed)
    by = np.linspace(0, 255, h)
    bx = np.linspace(255, 0, w)
    base = (by[:, None, None] * 0.5 + bx[None, :, None] * 0.4
            + rng.randint(0, 10, (h, w, 3)))
    return np.stack([np.clip(base + i * 6, 0, 255).astype(np.uint8)
                     for i in range(n)])


def test_avi_mjpeg_roundtrip():
    fr = _clip()
    dec, fps = decode_avi_mjpeg(encode_avi_mjpeg(fr, fps=12, quality=92))
    assert dec.shape == fr.shape and fps == 12
    assert np.abs(dec.astype(int) - fr.astype(int)).mean() < 4.0


def test_avi_non_mjpeg_rejected():
    blob = bytearray(encode_avi_mjpeg(_clip(n=1), fps=10))
    k = bytes(blob).index(b"vids") + 4
    blob[k:k + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="MJPG"):
        decode_avi_mjpeg(bytes(blob))
    with pytest.raises(NotImplementedError):
        mm.decode_video(b"\x00\x00\x00\x18ftypmp42 fake mp4")


def test_decode_video_dispatch():
    fr = _clip(n=4, h=16, w=16)
    raw, fps0 = mm.decode_video(mm.encode_rawv(fr, fps=5))
    assert fps0 == 5 and np.array_equal(raw, fr)
    avi, fps1 = mm.decode_video(encode_avi_mjpeg(fr, fps=10, quality=95))
    assert fps1 == 10 and avi.shape == fr.shape
    gif, fps2 = mm.decode_video(mm.encode_gif_frames(fr, fps=10))
    assert fps2 == 10 and gif.shape == fr.shape
    assert np.abs(gif.astype(int) - fr.astype(int)).max() <= 26


# ------------------------------------------------------------ pipelines

def test_mixed_audio_pipeline_rms(ray_session):
    base = mm.audio_frame_pipeline(
        mm.synth_audio_table(SF)).to_pandas()
    mixed = mm.audio_frame_pipeline(
        mm.synth_audio_table(SF, fmt="mixed")).to_pandas()
    assert len(base) == len(mixed)
    b = base.sort_values(["item_id", "frame"])
    m = mixed.sort_values(["item_id", "frame"])
    ids = b["item_id"].to_numpy()
    rb, rm = b["rms"].to_numpy(), m["rms"].to_numpy()
    # pcm16 rows identical; every encoding within 2% relative RMS
    # (the loosest is pcm8: 8-bit quantization ≈1% on this fixture)
    exact = ids % 5 == 0
    assert np.array_equal(rb[exact], rm[exact])
    assert (np.abs(rb - rm) / np.maximum(rb, 1.0)).max() < 0.02


def test_mixed_video_pipeline_features(ray_session):
    base = mm.video_frame_pipeline(
        mm.synth_video_table(SF)).to_pandas()
    mixed = mm.video_frame_pipeline(
        mm.synth_video_table(SF, fmt="mixed")).to_pandas()
    assert len(base) == len(mixed)
    b = base.sort_values(["item_id", "frame"])
    m = mixed.sort_values(["item_id", "frame"])
    ids = b["item_id"].to_numpy()
    vb = np.stack(b["feature"].to_numpy())
    vm = np.stack(m["feature"].to_numpy())
    exact = ids % 3 == 0                         # rawv rows
    assert np.array_equal(vb[exact], vm[exact])
    # avi (q=95) and gif (posterize ≤26/255) within codec tolerance
    assert np.abs(vb - vm).max() <= 26 / 255 + 1e-6
