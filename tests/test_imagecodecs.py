"""PNG + baseline-JPEG codec tests (pure numpy/stdlib decoders,
`stages/imagecodecs.py`): exact PNG roundtrips, independent filter
coverage, all supported color types, JPEG roundtrip tolerances across
subsampling/restart/odd-size configurations, loud rejects for the
still-stubbed variants, and feature-pipeline parity across containers
(PNG is lossless, so its features must EQUAL the ppm twin's)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from orchid_fst_ray.stages import multimodal as mm
from orchid_fst_ray.stages.imagecodecs import (
    decode_bmp, decode_gif, decode_gif_frames, decode_jpeg, decode_png,
    encode_bmp, encode_gif, encode_gif_frames, encode_jpeg, encode_png)

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------ PNG

def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _png(w, h, ctype, raw, plte=None, depth=8, interlace=0) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


@pytest.mark.parametrize("shape", [(1, 1), (3, 7), (17, 23), (64, 64)])
def test_png_roundtrip_exact(shape):
    rng = np.random.RandomState(sum(shape))
    img = rng.randint(0, 256, (*shape, 3), np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_all_filters_decode():
    """Craft one IDAT whose rows use every filter type 0-4, applying
    the spec's filter equations independently here — pins the
    decoder's unfilter math (the module's encoder only emits 0)."""
    rng = np.random.RandomState(5)
    h, w, bpp = 10, 9, 3
    img = rng.randint(0, 256, (h, w * bpp), np.uint8).astype(np.int32)
    raw = bytearray()
    for y in range(h):
        f = y % 5
        raw.append(f)
        prev = img[y - 1] if y else np.zeros(w * bpp, np.int32)
        cur = img[y]
        for x in range(w * bpp):
            a = int(cur[x - bpp]) if x >= bpp else 0      # left
            b = int(prev[x])                               # up
            c = int(prev[x - bpp]) if x >= bpp else 0      # up-left
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:                                          # Paeth
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa_ <= pb and pa_ <= pc else \
                    (b if pb <= pc else c)
            raw.append((int(cur[x]) - pred) & 0xFF)
    out = decode_png(_png(w, h, 2, bytes(raw)))
    assert np.array_equal(out, img.astype(np.uint8).reshape(h, w, 3))


def test_png_color_types():
    rng = np.random.RandomState(9)
    h, w = 5, 6
    # grayscale (ct 0) → replicated channels
    g = rng.randint(0, 256, (h, w), np.uint8)
    raw = b"".join(b"\x00" + g[y].tobytes() for y in range(h))
    assert np.array_equal(decode_png(_png(w, h, 0, raw)),
                          np.repeat(g[:, :, None], 3, 2))
    # palette (ct 3)
    plte = rng.randint(0, 256, (16, 3), np.uint8)
    idx = rng.randint(0, 16, (h, w), np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    assert np.array_equal(decode_png(_png(w, h, 3, raw, plte=plte)),
                          plte[idx])
    # gray+alpha (ct 4) → alpha dropped
    ga = rng.randint(0, 256, (h, w, 2), np.uint8)
    raw = b"".join(b"\x00" + ga[y].tobytes() for y in range(h))
    assert np.array_equal(decode_png(_png(w, h, 4, raw)),
                          np.repeat(ga[:, :, :1], 3, 2))
    # RGBA (ct 6) → alpha dropped
    rgba = rng.randint(0, 256, (h, w, 4), np.uint8)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))
    assert np.array_equal(decode_png(_png(w, h, 6, raw)),
                          rgba[:, :, :3])


def test_png_unsupported_variants_raise():
    img = np.zeros((2, 2, 3), np.uint8)
    raw = b"\x00" + bytes(12) + b"\x00" + bytes(12)
    with pytest.raises(NotImplementedError, match="16|8-bit"):
        decode_png(_png(2, 2, 2, raw, depth=16))
    with pytest.raises(NotImplementedError, match="[Ii]nterlac"):
        decode_png(_png(2, 2, 2, raw, interlace=1))
    with pytest.raises(ValueError):
        decode_png(b"GIF89a not a png")
    assert np.array_equal(decode_png(encode_png(img)), img)


# ----------------------------------------------------------------- JPEG

def _smooth(h, w, seed=7):
    rng = np.random.RandomState(seed)
    by = np.linspace(0, 255, h)
    bx = np.linspace(255, 0, w)
    img = (by[:, None, None] * 0.5 + bx[None, :, None] * 0.4
           + rng.randint(0, 12, (h, w, 3)))
    return np.clip(img, 0, 255).astype(np.uint8)


def test_jpeg_roundtrip_444():
    img = _smooth(64, 48)
    dec = decode_jpeg(encode_jpeg(img, quality=92))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 3.0


def test_jpeg_roundtrip_420_restart_odd():
    img = _smooth(37, 29, seed=11)
    blob = encode_jpeg(img, quality=92, subsample=True,
                       restart_interval=2)
    assert b"\xff\xdd" in blob          # DRI emitted
    dec = decode_jpeg(blob)
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 6.0


def test_jpeg_solid_color_exact():
    img = np.full((24, 40, 3), 130, np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert np.abs(dec.astype(int) - 130).max() <= 1


def test_jpeg_quality_orders_error():
    img = _smooth(32, 32, seed=3)
    errs = [np.abs(decode_jpeg(encode_jpeg(img, quality=q)).astype(int)
                   - img.astype(int)).mean() for q in (95, 75, 40)]
    assert errs[0] < errs[1] < errs[2]


def test_jpeg_progressive_rejected():
    # SOI + a plausible SOF2 (progressive) segment
    sof2 = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    blob = (b"\xff\xd8\xff\xc2" + struct.pack(">H", len(sof2) + 2)
            + sof2)
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(blob)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")


# ------------------------------------------------------------------ BMP

@pytest.mark.parametrize("shape", [(1, 1), (3, 7), (17, 23), (64, 64)])
def test_bmp_roundtrip_exact(shape):
    rng = np.random.RandomState(sum(shape) + 1)
    img = rng.randint(0, 256, (*shape, 3), np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_32bit_and_topdown():
    rng = np.random.RandomState(13)
    h, w = 5, 6
    img = rng.randint(0, 256, (h, w, 3), np.uint8)
    # hand-build a 32-bit top-down BMP (negative height, BGRA rows)
    rows = np.zeros((h, w, 4), np.uint8)
    rows[:, :, :3] = img[:, :, ::-1]
    pix = rows.tobytes()
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0,
                       len(pix), 0, 0, 0, 0)
    assert np.array_equal(decode_bmp(hdr + info + pix), img)


def test_bmp_unsupported_variants_raise():
    blob = bytearray(encode_bmp(np.zeros((2, 2, 3), np.uint8)))
    rle = bytes(blob[:30]) + struct.pack("<I", 1) + bytes(blob[34:])
    with pytest.raises(NotImplementedError, match="BI_RGB"):
        decode_bmp(rle)
    with pytest.raises(ValueError):
        decode_bmp(b"GIF89a not a bmp")


# ------------------------------------------------------------------ GIF

def test_gif_roundtrip_exact_256_colors():
    rng = np.random.RandomState(17)
    img = (rng.randint(0, 6, (23, 31, 3)) * 51).astype(np.uint8)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) <= 216
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_gif_lzw_dict_reset():
    # enough pixels that the LZW table passes 4096 entries and resets
    rng = np.random.RandomState(19)
    img = (rng.randint(0, 6, (128, 128, 3)) * 51).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_gif_posterize_deterministic_tolerance():
    rng = np.random.RandomState(23)
    img = rng.randint(0, 256, (16, 16, 3), np.uint8)   # >256 colors
    a, b = decode_gif(encode_gif(img)), decode_gif(encode_gif(img))
    assert np.array_equal(a, b)
    assert np.abs(a.astype(int) - img.astype(int)).max() <= 26


def test_gif_interlaced_decode():
    """Hand-build an interlaced GIF (pass-reordered rows) and check
    the decoder untangles the Adam-style row schedule."""
    from orchid_fst_ray.stages.imagecodecs import (
        _GIF_INTERLACE, _lzw_encode)
    rng = np.random.RandomState(29)
    h, w = 13, 8
    idx = rng.randint(0, 4, (h, w)).astype(np.uint8)
    pal = (np.arange(12, dtype=np.uint8) * 20).reshape(4, 3)
    order = [y for start, step in _GIF_INTERLACE
             for y in range(start, h, step)]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x81, 0, 0)     # GCT, depth 2
    gct = np.zeros((4, 3), np.uint8)
    gct[:] = pal
    out += gct.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40)  # interlaced
    out.append(2)
    lzw = _lzw_encode(2, idx[order].ravel())
    for i in range(0, len(lzw), 255):
        out.append(len(lzw[i:i + 255]))
        out += lzw[i:i + 255]
    out += b"\x00\x3B"
    assert np.array_equal(decode_gif(bytes(out)), pal[idx])


def test_gif_animation_roundtrip():
    rng = np.random.RandomState(31)
    fr = (rng.randint(0, 6, (5, 12, 16, 3)) * 51).astype(np.uint8)
    dec, fps = decode_gif_frames(encode_gif_frames(fr, fps=10))
    assert np.array_equal(dec, fr)
    assert fps == 10


def test_gif_partial_rect_rejected():
    blob = bytearray(encode_gif(np.zeros((4, 4, 3), np.uint8)))
    k = blob.index(0x2C, 6)
    struct.pack_into("<HH", blob, k + 1, 1, 1)          # left=top=1
    with pytest.raises(NotImplementedError, match="partial"):
        decode_gif(bytes(blob))


# ------------------------------------------------- dispatch + pipelines

def test_decode_image_dispatch():
    img = _smooth(16, 16, seed=1)
    assert np.array_equal(mm.decode_image(mm.encode_ppm(img)), img)
    assert np.array_equal(mm.decode_image(encode_png(img)), img)
    assert np.array_equal(mm.decode_image(encode_bmp(img)), img)
    dec = mm.decode_image(encode_jpeg(img, quality=95))
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 3.0
    gif = mm.decode_image(encode_gif(img))
    assert np.abs(gif.astype(int) - img.astype(int)).max() <= 26
    with pytest.raises(NotImplementedError, match="WEBP|external"):
        mm.decode_image(b"RIFF\x00\x00\x00\x00WEBP....")
    with pytest.raises(NotImplementedError, match="WEBP|external"):
        mm.decode_image(b"II*\x00....")


def test_png_pipeline_features_equal_ppm(ray_session):
    base = mm.image_feature_pipeline(
        mm.synth_image_table(SF, size=32, fmt="ppm")).to_pandas()
    png = mm.image_feature_pipeline(
        mm.synth_image_table(SF, size=32, fmt="png")).to_pandas()
    assert len(base) == len(png) == 500
    v0 = np.stack(base.sort_values("item_id")["feature"].to_numpy())
    v1 = np.stack(png.sort_values("item_id")["feature"].to_numpy())
    # PNG is lossless: identical pixels → identical features
    assert np.array_equal(v0, v1)


def test_mixed_pipeline_features(ray_session):
    base = mm.image_feature_pipeline(
        mm.synth_image_table(SF, size=32, fmt="ppm")).to_pandas()
    mixed = mm.image_feature_pipeline(
        mm.synth_image_table(SF, size=32, fmt="mixed")).to_pandas()
    assert len(mixed) == 500
    v0 = np.stack(base.sort_values("item_id")["feature"].to_numpy())
    v1 = np.stack(mixed.sort_values("item_id")["feature"].to_numpy())
    ids = np.sort(base["item_id"].to_numpy())
    lossless = np.isin(ids % 5, (0, 1, 3))   # ppm / png / bmp rows
    jpeg = ids % 5 == 2
    gif = ids % 5 == 4
    assert np.array_equal(v0[lossless], v1[lossless])
    # jpeg rows (q=95) stay within codec tolerance of the ppm features
    assert np.abs(v0[jpeg] - v1[jpeg]).max() < 0.05
    # gif rows posterize to 6 levels/channel: ≤26/255 per pixel, and
    # mean-pooling keeps the feature deviation inside that bound
    assert np.abs(v0[gif] - v1[gif]).max() <= 26 / 255 + 1e-6
