"""Multimodal stage tests: real PPM/WAV codecs, actor-pool pipelines,
and the explicit external-codec stub behavior."""

from __future__ import annotations

import numpy as np
import pytest

from orchid_fst_ray.stages import multimodal as mm

SF = "/root/testdata/sf0.001"


def test_ppm_roundtrip():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (17, 23, 3), dtype=np.uint8)
    assert np.array_equal(mm.decode_ppm(mm.encode_ppm(img)), img)


def test_wav_roundtrip():
    rng = np.random.RandomState(2)
    s = rng.randint(-30000, 30000, 1000).astype(np.int16)
    got, rate = mm.decode_wav_pcm16(mm.encode_wav_pcm16(s, 8000))
    assert rate == 8000
    assert np.array_equal(got, s)


def test_external_codecs_are_stubbed():
    # PNG/JPEG/BMP/GIF are decoded for REAL now
    # (tests/test_imagecodecs.py); the remaining stubs stay loud
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"RIFF\x00\x00\x00\x00WEBPwebp-ish")
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"II*\x00 tiff-ish")
    with pytest.raises(NotImplementedError):
        mm.decode_wav_pcm16(b"ID3\x04 mp3-ish")
    with pytest.raises(ValueError):
        mm.decode_ppm(b"\xff\xd8\xff\xe0 jpeg bytes are not ppm")


def test_image_feature_pipeline(ray_session):
    images = mm.synth_image_table(SF, size=32)
    feats = mm.image_feature_pipeline(images, out_size=16, grid=4)
    df = feats.to_pandas()
    assert len(df) == 500
    v = np.stack(df["feature"].to_numpy())
    assert v.shape == (500, 48)
    assert np.isfinite(v).all() and (v >= 0).all() and (v <= 1).all()
    # deterministic: same synth → same features
    df2 = mm.image_feature_pipeline(
        mm.synth_image_table(SF, size=32), out_size=16, grid=4).to_pandas()
    assert np.allclose(np.stack(df2["feature"].to_numpy()), v)


def test_resize_stage_semantics(ray_session):
    images = mm.synth_image_table(SF, size=32).limit(8)
    resized = images.map_batches(
        mm.ImageDecodeResize(out_size=8), batch_format="pyarrow")
    for b in resized.iter_batches(batch_format="pyarrow"):
        for raw, w, h in zip(b["image"].to_pylist(), b["width"].to_pylist(),
                             b["height"].to_pylist()):
            img = mm.decode_ppm(raw)
            assert img.shape == (8, 8, 3) and (w, h) == (8, 8)


def test_audio_frame_pipeline(ray_session):
    audio = mm.synth_audio_table(SF, seconds=0.1, rate=8000).limit(16)
    frames = mm.audio_frame_pipeline(audio, frame_ms=25).to_pandas()
    # 0.1 s at 25 ms frames → 4 frames per clip
    assert len(frames) == 16 * 4
    assert set(frames["frame"]) == {0, 1, 2, 3}
    assert (frames["rms"] > 0).all()


def test_rawv_roundtrip():
    import numpy as np
    frames = np.arange(2 * 4 * 4 * 3, dtype=np.uint8).reshape(2, 4, 4, 3)
    blob = mm.encode_rawv(frames, fps=5)
    got, fps = mm.decode_rawv(blob)
    assert fps == 5 and (got == frames).all()


def test_video_codec_stubbed():
    import pytest
    # MP4 stays a loud stub; RAWV/MJPEG-AVI/GIF are real (decode_video)
    with pytest.raises(NotImplementedError, match="MP4|external"):
        mm.decode_video(b"\x00\x00\x00\x18ftypmp42 fake mp4 header")
    with pytest.raises(ValueError):
        mm.decode_rawv(b"\x00\x00\x00\x18ftypmp42 not rawv")


def test_video_frame_pipeline(ray_session):
    import numpy as np
    videos = mm.synth_video_table(SF, n_frames=8, size=16).limit(12)
    out = mm.video_frame_pipeline(videos, stride=2, grid=2).to_pandas()
    # 8 frames at stride 2 → 4 sampled frames per clip
    assert len(out) == 12 * 4
    assert set(out["frame"]) == {0, 2, 4, 6}
    v = np.stack(out["feature"].to_numpy())
    assert v.shape[1] == 3 * 2 * 2
    assert np.isfinite(v).all() and (v >= 0).all() and (v <= 1).all()
    # motion is real: consecutive sampled frames differ
    first = out[out["item_id"] == out["item_id"].iloc[0]]
    f0 = np.asarray(first[first["frame"] == 0]["feature"].iloc[0])
    f2 = np.asarray(first[first["frame"] == 2]["feature"].iloc[0])
    assert not np.allclose(f0, f2)
