"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio are carried as ``binary`` columns with metadata columns
alongside (format, width/height or sample-rate). Decode / resize /
feature-extract / frame-sample are **actor-pool map_batches stages**
(callable classes — per-actor setup in ``__init__``, per-batch work in
``__call__``) sized with small batches because payload rows are wide.

Container formats decoded for REAL (pure numpy/stdlib — no external
libs): PPM (P6), PNG (zlib + unfilter, ``stages/imagecodecs.py``),
baseline JPEG (canonical Huffman + batched IDCT, same module), BMP
(24/32-bit BI_RGB), GIF (LZW, incl. interlace + animation frames),
PCM16 WAV, and the RAWV raw-RGB video container. Still STUBBED with a
loud ``NotImplementedError`` (need codec libraries this container
lacks): WEBP/TIFF, 16-bit or interlaced PNG, progressive JPEG, MP3,
and MP4. The Ray-side plumbing (schema, batch sizing, actor
signature, output layout) is real and tested either way.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from orchid_fst_ray.stages.avcodecs import (  # noqa: F401
    decode_avi_mjpeg, decode_wav, encode_avi_mjpeg, encode_wav)
from orchid_fst_ray.stages.imagecodecs import (  # noqa: F401
    decode_bmp, decode_gif, decode_gif_frames, decode_jpeg, decode_png,
    encode_bmp, encode_gif, encode_gif_frames, encode_jpeg, encode_png)

__all__ = [
    "synth_image_table", "synth_audio_table", "synth_video_table",
    "ImageDecodeResize", "ImageMeanPoolFeatures", "AudioFrameSample",
    "VideoFrameSample",
    "image_feature_pipeline", "audio_frame_pipeline",
    "video_frame_pipeline",
    "decode_ppm", "encode_ppm", "decode_image",
    "decode_png", "encode_png", "decode_jpeg", "encode_jpeg",
    "decode_bmp", "encode_bmp", "decode_gif", "encode_gif",
    "decode_gif_frames", "encode_gif_frames",
    "decode_wav_pcm16", "encode_wav_pcm16", "decode_audio",
    "decode_wav", "encode_wav",
    "decode_rawv", "encode_rawv", "decode_video",
    "decode_avi_mjpeg", "encode_avi_mjpeg",
]


# ----------------------------------------------------------- codecs (real)

def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """binary PPM (P6) → (h, w, 3) uint8. Real decoder (no stub)."""
    if not data.startswith(b"P6"):
        raise ValueError("not a PPM (P6) byte stream")
    parts = data.split(b"\n", 3)
    w, h = map(int, parts[1].split())
    maxval = int(parts[2])
    assert maxval == 255
    return np.frombuffer(parts[3], dtype=np.uint8,
                         count=h * w * 3).reshape(h, w, 3)


def decode_image(data: bytes) -> np.ndarray:
    """Any supported image byte stream → (h, w, 3) uint8, dispatched
    on magic bytes: PPM (P6), PNG, baseline JPEG, BMP, GIF — all
    decoded for real in-container. WEBP/TIFF (and progressive JPEG /
    16-bit PNG / RLE-BMP / partial-rect GIF inside their decoders)
    raise ``NotImplementedError`` — honest stubs for codecs that need
    external libraries."""
    if data[:2] == b"P6":
        return decode_ppm(data)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(data)
    if data[:2] == b"\xFF\xD8":
        return decode_jpeg(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(data)
    raise NotImplementedError(
        "unrecognized image container (PPM/PNG/baseline-JPEG/BMP/GIF "
        "are decodable in-container; WEBP/TIFF need external libs)")


def encode_wav_pcm16(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples → minimal RIFF/WAVE PCM16 bytes."""
    pcm = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ",
        16, 1, 1, rate, rate * 2, 2, 16, b"data", len(pcm))
    return hdr + pcm


def decode_wav_pcm16(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono → (samples int16, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError(
            "only PCM16 WAV decode is implemented in-container")
    fmt, ch, rate, bits = struct.unpack("<HHIxxxxxxH", data[20:36])
    if fmt != 1 or ch != 1 or bits != 16:
        raise NotImplementedError("only mono PCM16 supported")
    assert data[36:40] == b"data"
    (n,) = struct.unpack("<I", data[40:44])
    return np.frombuffer(data, dtype="<i2", count=n // 2, offset=44), rate


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Any supported audio byte stream → (mono int16 samples, rate).
    RIFF/WAVE containers are decoded for real (integer PCM 8/16-bit,
    IEEE float32, G.711 A-law/µ-law, any channel count — see
    ``stages/avcodecs.py``). MP3/AAC raise ``NotImplementedError``."""
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return decode_wav(data)
    raise NotImplementedError(
        "unrecognized audio container (WAV PCM/float/A-law/µ-law are "
        "decodable in-container; MP3/AAC need external libs)")


def decode_video(data: bytes) -> tuple[np.ndarray, int]:
    """Any supported video byte stream → ((n, h, w, 3) uint8, fps),
    dispatched on magic bytes: RAWV (raw RGB), MJPEG-in-AVI
    (``stages/avcodecs.py``), and animated GIF — all decoded for real
    in-container. MP4/MKV/H.264 raise ``NotImplementedError``."""
    if data[:4] == b"RAWV":
        return decode_rawv(data)
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return decode_avi_mjpeg(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_frames(data)
    raise NotImplementedError(
        "unrecognized video container (RAWV/MJPEG-AVI/animated-GIF are "
        "decodable in-container; MP4/MKV need external libs)")


# ----------------------------------------------- deterministic fixtures

def synth_image_table(sf_dir: str, size: int = 32, fmt: str = "ppm"):
    """One deterministic image per document id (seeded gradient +
    id-keyed noise): (item_id, image: binary, format, width, height).
    ``fmt`` picks the container: "ppm" (default), "png" / "bmp"
    (lossless — pixel-identical to the ppm variant), "jpeg"
    (baseline, q=95), "gif" (posterized when >256 colors), or
    "mixed" (per-row container cycling ppm/png/jpeg/bmp/gif by id —
    the shape of a real crawled corpus, one decode dispatch per
    row)."""
    import ray.data as rd
    encoders = {"ppm": encode_ppm, "png": encode_png,
                "jpeg": lambda im: encode_jpeg(im, quality=95),
                "bmp": encode_bmp, "gif": encode_gif}
    cycle = ["ppm", "png", "jpeg", "bmp", "gif"]

    def to_images(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        blobs, fmts = [], []
        for i in ids:
            rng = np.random.RandomState(0xC0FFEE ^ int(i))
            base = np.linspace(0, 255, size, dtype=np.float64)
            img = (base[None, :, None] * 0.5 + base[:, None, None] * 0.3
                   + rng.randint(0, 64, (size, size, 3)))
            f = cycle[int(i) % len(cycle)] if fmt == "mixed" else fmt
            blobs.append(encoders[f](np.clip(img, 0, 255).astype(np.uint8)))
            fmts.append(f)
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "image": pa.array(blobs, pa.binary()),
            "format": pa.array(fmts, pa.string()),
            "width": pa.array([size] * len(ids), pa.int32()),
            "height": pa.array([size] * len(ids), pa.int32()),
        })

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"]).map_batches(
        to_images, batch_format="pyarrow")


def synth_audio_table(sf_dir: str, seconds: float = 0.25,
                      rate: int = 16000, fmt: str = "pcm16"):
    """One deterministic WAV clip per document id (id-keyed sine mix):
    (item_id, audio: binary, format, sample_rate, n_samples). ``fmt``
    picks the sample encoding: "pcm16" (default; byte-identical to the
    historical fixture), "float32", "alaw", "ulaw", "pcm8", or
    "mixed" (per-row encoding cycling all five by id — one decode
    dispatch per row, the shape of a real crawled corpus)."""
    import ray.data as rd
    cycle = ["pcm16", "float32", "alaw", "ulaw", "pcm8"]

    def to_audio(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        n = int(seconds * rate)
        ts = np.arange(n) / rate
        blobs, fmts = [], []
        for i in ids:
            f0 = 200.0 + (int(i) % 40) * 25.0
            wave = (0.6 * np.sin(2 * np.pi * f0 * ts)
                    + 0.3 * np.sin(2 * np.pi * 2 * f0 * ts))
            f = cycle[int(i) % len(cycle)] if fmt == "mixed" else fmt
            blobs.append(encode_wav(
                (wave * 32000).astype(np.int16), rate, fmt=f))
            fmts.append(f)
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "audio": pa.array(blobs, pa.binary()),
            "format": pa.array(fmts, pa.string()),
            "sample_rate": pa.array([rate] * len(ids), pa.int32()),
            "n_samples": pa.array([n] * len(ids), pa.int32()),
        })

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"]).map_batches(
        to_audio, batch_format="pyarrow")


def encode_rawv(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n, h, w, 3) uint8 → minimal raw-RGB video container:
    b"RAWV" + u32 n/h/w/fps + concatenated frames."""
    n, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    return (b"RAWV" + struct.pack("<4I", n, h, w, fps)
            + frames.tobytes())


def decode_rawv(data: bytes) -> tuple[np.ndarray, int]:
    """RAWV container → ((n, h, w, 3) uint8, fps). Real decoder; see
    ``decode_video`` for the MJPEG-AVI / animated-GIF dispatch (MP4
    stays stubbed — needs ffmpeg)."""
    if not data.startswith(b"RAWV"):
        raise ValueError("not a RAWV byte stream")
    n, h, w, fps = struct.unpack_from("<4I", data, 4)
    frames = np.frombuffer(data, dtype=np.uint8, offset=20,
                           count=n * h * w * 3).reshape(n, h, w, 3)
    return frames, fps


def synth_video_table(sf_dir: str, n_frames: int = 8, size: int = 16,
                      fps: int = 10, fmt: str = "rawv"):
    """One deterministic clip per document id (drifting gradient —
    frame f shifts with f so motion is real):
    (item_id, video: binary, format, n_frames, height, width, fps).
    ``fmt`` picks the container: "rawv" (default, lossless), "avi"
    (MJPEG-in-AVI, codec-lossy), "gif" (animated, posterized), or
    "mixed" (per-row container cycling all three by id)."""
    import ray.data as rd
    encoders = {"rawv": encode_rawv,
                "avi": lambda fr, fp: encode_avi_mjpeg(fr, fp,
                                                       quality=95),
                "gif": encode_gif_frames}
    cycle = ["rawv", "avi", "gif"]

    def to_videos(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        blobs, fmts = [], []
        base = np.linspace(0, 255, size, dtype=np.float64)
        for i in ids:
            rng = np.random.RandomState(0xF1D0 ^ int(i))
            noise = rng.randint(0, 32, (size, size, 3))
            frames = np.empty((n_frames, size, size, 3), np.uint8)
            for f in range(n_frames):
                img = (np.roll(base, f)[None, :, None] * 0.6
                       + base[:, None, None] * 0.3 + noise)
                frames[f] = np.clip(img, 0, 255).astype(np.uint8)
            c = cycle[int(i) % len(cycle)] if fmt == "mixed" else fmt
            blobs.append(encoders[c](frames, fps))
            fmts.append(c)
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "video": pa.array(blobs, pa.binary()),
            "format": pa.array(fmts, pa.string()),
            "n_frames": pa.array([n_frames] * len(ids), pa.int32()),
            "height": pa.array([size] * len(ids), pa.int32()),
            "width": pa.array([size] * len(ids), pa.int32()),
            "fps": pa.array([fps] * len(ids), pa.int32()),
        })

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"]).map_batches(
        to_videos, batch_format="pyarrow")


# ------------------------------------------------------ actor-pool stages

class ImageDecodeResize:
    """Actor stage: decode PPM → nearest-neighbor resize → re-encode.

    ``__init__`` precomputes the resampling index grids once per actor.
    """

    def __init__(self, out_size: int = 16) -> None:
        self.out = out_size
        self._grids: dict[tuple[int, int], tuple] = {}

    def _grid(self, h: int, w: int):
        g = self._grids.get((h, w))
        if g is None:
            ys = (np.arange(self.out) * h // self.out)
            xs = (np.arange(self.out) * w // self.out)
            g = self._grids[(h, w)] = (ys[:, None], xs[None, :])
        return g

    def __call__(self, t: pa.Table) -> pa.Table:
        blobs = []
        for raw in t["image"].to_pylist():
            img = decode_image(raw)
            ys, xs = self._grid(img.shape[0], img.shape[1])
            blobs.append(encode_ppm(np.ascontiguousarray(img[ys, xs])))
        return pa.table({
            "item_id": t["item_id"],
            "image": pa.array(blobs, pa.binary()),
            # resize re-encodes as PPM whatever came in (ppm/png/jpeg)
            "format": pa.array(["ppm"] * t.num_rows, pa.string()),
            "width": pa.array([self.out] * t.num_rows, pa.int32()),
            "height": pa.array([self.out] * t.num_rows, pa.int32()),
        })


class ImageMeanPoolFeatures:
    """Actor stage: decode → grid mean-pool → flat float32 feature
    vector (the in-container stand-in for a vision embedding model;
    a real model would load weights in ``__init__``)."""

    def __init__(self, grid: int = 4) -> None:
        self.grid = grid

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = []
        g = self.grid
        for raw in t["image"].to_pylist():
            img = decode_image(raw).astype(np.float32)
            h, w, _ = img.shape
            ph, pw = h // g, w // g
            img = img[:ph * g, :pw * g]
            pooled = img.reshape(g, ph, g, pw, 3).mean(axis=(1, 3))
            feats.append(pooled.reshape(-1) / 255.0)
        dim = 3 * g * g
        return pa.table({
            "item_id": t["item_id"],
            "feature": pa.FixedSizeListArray.from_arrays(
                pa.array(np.concatenate(feats) if feats else
                         np.zeros(0, np.float32), pa.float32()), dim),
        })


class AudioFrameSample:
    """Actor stage: decode WAV → fixed-stride frame energies
    (RMS per frame) — the frame-sampling pattern for audio/video."""

    def __init__(self, frame_ms: int = 25) -> None:
        self.frame_ms = frame_ms

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, frames, energies = [], [], []
        for i, raw in zip(t["item_id"].to_pylist(),
                          t["audio"].to_pylist()):
            samples, rate = decode_audio(raw)
            flen = max(1, rate * self.frame_ms // 1000)
            n_frames = len(samples) // flen
            x = samples[:n_frames * flen].astype(np.float64)
            rms = np.sqrt((x.reshape(n_frames, flen) ** 2).mean(axis=1))
            for f in range(n_frames):
                ids.append(i)
                frames.append(f)
                energies.append(float(rms[f]))
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "frame": pa.array(frames, pa.int32()),
            "rms": pa.array(energies, pa.float64()),
        })


class VideoFrameSample:
    """Actor stage: decode → sample every ``stride``-th frame →
    per-sampled-frame grid mean-pool feature vector (the frame-sampling
    + featurize pattern for video; a real model would load weights in
    ``__init__``). One output row per sampled frame."""

    def __init__(self, stride: int = 2, grid: int = 2) -> None:
        self.stride = stride
        self.grid = grid

    def __call__(self, t: pa.Table) -> pa.Table:
        g = self.grid
        ids, fidx, feats = [], [], []
        for i, raw in zip(t["item_id"].to_pylist(),
                          t["video"].to_pylist()):
            frames, _fps = decode_video(raw)
            sel = frames[::self.stride].astype(np.float32)
            n, h, w, _ = sel.shape
            ph, pw = h // g, w // g
            pooled = (sel[:, :ph * g, :pw * g]
                      .reshape(n, g, ph, g, pw, 3).mean(axis=(2, 4)))
            for k in range(n):
                ids.append(i)
                fidx.append(k * self.stride)
                feats.append(pooled[k].reshape(-1) / 255.0)
        dim = 3 * g * g
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "frame": pa.array(fidx, pa.int32()),
            "feature": pa.FixedSizeListArray.from_arrays(
                pa.array(np.concatenate(feats) if feats else
                         np.zeros(0, np.float32), pa.float32()), dim),
        })


# ------------------------------------------------------------- pipelines

def image_feature_pipeline(images_ds, out_size: int = 16, grid: int = 4,
                           concurrency=(1, 4), batch_size: int = 64):
    """decode+resize → mean-pool features, both actor pools with small
    batches (wide binary rows). Output: (item_id, feature)."""
    resized = images_ds.map_batches(
        ImageDecodeResize, fn_constructor_kwargs={"out_size": out_size},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
    return resized.map_batches(
        ImageMeanPoolFeatures, fn_constructor_kwargs={"grid": grid},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1).sort("item_id")


def audio_frame_pipeline(audio_ds, frame_ms: int = 25,
                         concurrency=(1, 4), batch_size: int = 64):
    """decode → per-frame RMS rows. Output: (item_id, frame, rms)."""
    return audio_ds.map_batches(
        AudioFrameSample, fn_constructor_kwargs={"frame_ms": frame_ms},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1).sort(["item_id", "frame"])


def video_frame_pipeline(video_ds, stride: int = 2, grid: int = 2,
                         concurrency=(1, 4), batch_size: int = 32):
    """decode → frame-sample → per-frame features; SMALLER batches than
    image/audio (each row carries n_frames × h × w × 3 bytes).
    Output: (item_id, frame, feature)."""
    return video_ds.map_batches(
        VideoFrameSample,
        fn_constructor_kwargs={"stride": stride, "grid": grid},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1).sort(["item_id", "frame"])
