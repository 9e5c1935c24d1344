"""In-container image codecs: PNG and baseline JPEG, pure numpy + stdlib.

The container has no pillow/libjpeg, but neither format *needs* one:
PNG is zlib (stdlib) + per-row unfiltering, and baseline JPEG is
canonical Huffman coding + an 8x8 IDCT — both implemented here from
the public specifications (PNG: ISO/IEC 15948 / RFC 2083; JPEG:
ITU-T T.81 Annex F/K). This replaces the round-1..3 honest stubs for
these two formats; GIF/WEBP/TIFF, 16-bit or interlaced PNG, and
progressive/arithmetic JPEG still raise ``NotImplementedError``.

Design notes (scale):
- decode runs inside actor-pool ``map_batches`` stages (one image per
  loop iteration is fine: the per-image kernels are numpy-vectorized;
  the Huffman bit loop is the only scalar part and is bounded by the
  entropy-coded byte count).
- IDCT/FDCT are batched matrix products over ALL blocks of a
  component at once (``einsum``), not per-block Python.
- PNG unfiltering vectorizes NONE/SUB/UP fully (SUB via modular
  ``np.add.accumulate``); AVERAGE/PAETH need the left-neighbour
  recurrence, so those rows fall back to a per-pixel loop across the
  row (vectorized across channels).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "decode_png", "encode_png",
    "decode_jpeg", "encode_jpeg",
    "decode_bmp", "encode_bmp",
    "decode_gif", "encode_gif",
    "decode_gif_frames", "encode_gif_frames",
]


# =====================================================================
# PNG  (ISO/IEC 15948; chunk layout + filters per the public spec)
# =====================================================================

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def encode_png(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → PNG bytes (color type 2, bit depth 8,
    filter 0 on every scanline). Lossless: ``decode_png(encode_png(x))
    == x`` exactly."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, 1 + w * 3), np.uint8)
    raw[:, 0] = 0                      # filter type NONE per row
    raw[:, 1:] = img.reshape(h, w * 3)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
            + _png_chunk(b"IEND", b""))


def _unfilter(raw: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters. ``raw`` is (h, 1 + w*bpp) uint8 with
    the filter byte leading each row; returns (h, w*bpp) uint8."""
    out = np.zeros((h, w * bpp), np.uint8)
    ftypes = raw[:, 0]
    rows = raw[:, 1:]
    for y in range(h):
        f = int(ftypes[y])
        cur = rows[y]
        prev = out[y - 1] if y else np.zeros(w * bpp, np.uint8)
        if f == 0:                                   # None
            out[y] = cur
        elif f == 1:                                 # Sub
            # recon[x] = filt[x] + recon[x-bpp] (mod 256): a modular
            # prefix sum down each bpp lane — uint8 accumulate wraps
            out[y] = np.add.accumulate(
                cur.reshape(w, bpp), axis=0, dtype=np.uint8).ravel()
        elif f == 2:                                 # Up
            out[y] = cur + prev
        elif f == 3:                                 # Average
            rec = out[y]
            up = prev.reshape(w, bpp).astype(np.int16)
            cw = cur.reshape(w, bpp).astype(np.int16)
            left = np.zeros(bpp, np.int16)
            for x in range(w):
                left = (cw[x] + ((left + up[x]) >> 1)) & 0xFF
                rec[x * bpp:(x + 1) * bpp] = left.astype(np.uint8)
        elif f == 4:                                 # Paeth
            rec = out[y]
            up = prev.reshape(w, bpp).astype(np.int16)
            cw = cur.reshape(w, bpp).astype(np.int16)
            left = np.zeros(bpp, np.int16)
            ul = np.zeros(bpp, np.int16)
            for x in range(w):
                p = left + up[x] - ul
                pa_ = np.abs(p - left)
                pb = np.abs(p - up[x])
                pc = np.abs(p - ul)
                pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                                np.where(pb <= pc, up[x], ul))
                left = (cw[x] + pred) & 0xFF
                ul = up[x]
                rec[x * bpp:(x + 1) * bpp] = left.astype(np.uint8)
        else:
            raise ValueError(f"PNG: unknown filter type {f}")
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8. Supports bit depth 8, color types
    0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA) —
    alpha is dropped, gray replicates to 3 channels. Interlaced
    (Adam7) and 16-bit images raise ``NotImplementedError``."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG byte stream")
    pos = 8
    w = h = depth = ctype = interlace = None
    plte = None
    idat = bytearray()
    while pos < len(data):
        (clen,) = struct.unpack_from(">I", data, pos)
        kind = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + clen]
        pos += 12 + clen
        if kind == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body)
        elif kind == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif kind == b"IDAT":
            idat += body
        elif kind == b"IEND":
            break
    if w is None:
        raise ValueError("PNG: missing IHDR")
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth}: only 8-bit "
                                  "images are decodable in-container")
    if interlace:
        raise NotImplementedError("PNG Adam7 interlacing not supported")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if nch is None:
        raise NotImplementedError(f"PNG color type {ctype}")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    raw = raw.reshape(h, 1 + w * nch)
    px = _unfilter(raw, h, w, nch).reshape(h, w, nch)
    if ctype == 3:
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        return plte[px[:, :, 0]]
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    if ctype == 6:
        return np.ascontiguousarray(px[:, :, :3])
    return px


# =====================================================================
# JPEG baseline  (ITU-T T.81; quant/Huffman tables from Annex K)
# =====================================================================

# zigzag index -> natural (row-major) index, T.81 Figure 5
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    np.int32)

# Annex K.1 / K.2 reference quantization tables (natural order)
_QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int32)
_QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int32)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])
_AC_CHROM = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])


def _idct_matrix() -> np.ndarray:
    """8x8 DCT-III basis: C[u, x] = c(u)/2 * cos((2x+1) u pi / 16)."""
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    c = np.cos((2 * x + 1) * u * np.pi / 16)
    c[0] *= 1 / np.sqrt(2)
    return c / 2


_C = _idct_matrix()


def _idct2_blocks(coef: np.ndarray) -> np.ndarray:
    """Batched 2-D IDCT over (n, 8, 8) dequantized coefficients."""
    return np.einsum("ux,nuv,vy->nxy", _C, coef, _C, optimize=True)


def _fdct2_blocks(px: np.ndarray) -> np.ndarray:
    """Batched 2-D FDCT over (n, 8, 8) level-shifted samples."""
    return np.einsum("ux,nxy,vy->nuv", _C, px, _C, optimize=True)


class _HuffDecoder:
    """Canonical Huffman decode tables per T.81 F.2.2.3
    (MINCODE/MAXCODE/VALPTR generated from BITS/HUFFVAL)."""

    def __init__(self, bits: list[int], huffval: list[int]) -> None:
        self.huffval = huffval
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for l in range(1, 17):
            if bits[l - 1]:
                self.valptr[l] = k
                self.mincode[l] = code
                code += bits[l - 1]
                k += bits[l - 1]
                self.maxcode[l] = code - 1
            else:
                self.maxcode[l] = -1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over a de-stuffed entropy segment."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            if self.pos < len(self.data):
                self.buf = (self.buf << 8) | self.data[self.pos]
                self.pos += 1
            else:
                self.buf <<= 8          # pad with zero bits past the end
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = (self.buf >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.buf &= (1 << self.nbits) - 1
        return v

    def decode(self, tbl: _HuffDecoder) -> int:
        code = self.bits(1)
        l = 1
        while code > tbl.maxcode[l]:
            code = (code << 1) | self.bits(1)
            l += 1
            if l > 16:
                raise ValueError("JPEG: corrupt Huffman stream")
        return tbl.huffval[tbl.valptr[l] + code - tbl.mincode[l]]


def _extend(v: int, s: int) -> int:
    """T.81 F.12: map an s-bit magnitude to its signed value."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _split_ecs(data: bytes, start: int) -> tuple[list[bytes], int]:
    """De-stuff the entropy-coded bytes from ``start``; segments split
    at RSTn markers. Returns (segments, position of the terminating
    marker's 0xFF)."""
    segs: list[bytearray] = [bytearray()]
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            segs[-1].append(b)
            i += 1
            continue
        m = data[i + 1] if i + 1 < n else 0xD9
        if m == 0x00:                      # stuffed 0xFF data byte
            segs[-1].append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:            # RSTn
            segs.append(bytearray())
            i += 2
        else:                              # real marker: ECS over
            break
    return [bytes(s) for s in segs], i


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF/JPEG bytes → (h, w, 3) uint8 RGB.

    Implements ITU-T T.81 baseline sequential DCT: DQT/DHT/SOF0/DRI/
    SOS parsing, canonical Huffman entropy decode with restart
    markers, batched dequant+IDCT per component, nearest-neighbour
    chroma upsampling, BT.601 YCbCr→RGB. Progressive (SOF2) and
    arithmetic-coded streams raise ``NotImplementedError``.
    """
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG byte stream")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None            # (h, w, comps) ; comps = [(cid, hi, vi, tq)]
    restart = 0
    i = 2
    while i < len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:              # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, i + 2)
        body = data[i + 4:i + 2 + seglen]
        if marker == 0xDB:              # DQT
            p = 0
            while p < len(body):
                pq, tq_id = body[p] >> 4, body[p] & 15
                p += 1
                if pq:
                    vals = np.frombuffer(body, ">u2", 64, p).astype(
                        np.int32)
                    p += 128
                else:
                    vals = np.frombuffer(body, np.uint8, 64, p).astype(
                        np.int32)
                    p += 64
                tbl = np.empty(64, np.int32)
                tbl[_ZIGZAG] = vals     # stored zigzag → natural order
                qt[tq_id] = tbl
        elif marker == 0xC4:            # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                bits = list(body[p + 1:p + 17])
                nv = sum(bits)
                vals = list(body[p + 17:p + 17 + nv])
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                p += 17 + nv
        elif marker == 0xC0:            # SOF0 baseline
            _prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for c in range(nc):
                cid, hv, tq_id = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq_id))
            frame = (fh, fw, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0) is decodable "
                "in-container; progressive/arithmetic streams need an "
                "external library")
        elif marker == 0xDD:            # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:            # SOS → entropy-coded data
            if frame is None:
                raise ValueError("JPEG: SOS before SOF0")
            ns = body[0]
            scan = []
            for s in range(ns):
                cs, tt = body[1 + 2 * s], body[2 + 2 * s]
                scan.append((cs, tt >> 4, tt & 15))
            segs, i = _split_ecs(data, i + 2 + seglen)
            return _decode_scan(frame, scan, qt, huff, segs, restart)
        i += 2 + seglen
    raise ValueError("JPEG: no SOS marker found")


def _decode_scan(frame, scan, qt, huff, segs, restart) -> np.ndarray:
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    if {s[0] for s in scan} != {c[0] for c in comps}:
        raise NotImplementedError(
            "non-interleaved multi-scan baseline JPEG not supported")
    by_id = {c[0]: c for c in comps}
    order = []                          # per-MCU block order = SOS order
    coefs: dict[int, np.ndarray] = {}
    meta: dict[int, tuple] = {}
    for (cid, td, ta) in scan:
        _cid, hi, vi, tq_id = by_id[cid]
        coefs[cid] = np.zeros((mcuy * vi, mcux * hi, 64), np.int32)
        meta[cid] = (hi, vi, tq_id, td, ta)
        order.append(cid)

    n_mcu = mcux * mcuy
    per_seg = restart if restart else n_mcu
    mcu = 0
    for seg in segs:
        if mcu >= n_mcu:
            break
        br = _BitReader(seg)
        pred = {cid: 0 for cid in coefs}
        for _ in range(min(per_seg, n_mcu - mcu)):
            my, mx = divmod(mcu, mcux)
            for cid in order:
                hi, vi, _tq, td, ta = meta[cid]
                dct = huff[(0, td)]
                act = huff[(1, ta)]
                for by in range(vi):
                    for bx in range(hi):
                        blk = coefs[cid][my * vi + by, mx * hi + bx]
                        s = br.decode(dct)
                        pred[cid] += _extend(br.bits(s), s)
                        blk[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = br.decode(act)
                            r, sz = rs >> 4, rs & 15
                            if sz == 0:
                                if r != 15:
                                    break       # EOB
                                k += 16
                                continue
                            k += r
                            blk[_ZIGZAG[k]] = _extend(br.bits(sz), sz)
                            k += 1
            mcu += 1

    planes = {}
    for (cid, hi, vi, tq_id) in comps:
        q = qt[tq_id]
        grid = coefs[cid]
        by, bx = grid.shape[:2]
        blocks = (grid.reshape(-1, 64) * q).reshape(-1, 8, 8)
        px = _idct2_blocks(blocks.astype(np.float64)) + 128.0
        px = (px.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3)
              .reshape(by * 8, bx * 8))
        # upsample to full MCU-grid resolution, then crop to (fh, fw)
        px = np.repeat(np.repeat(px, vmax // vi, 0), hmax // hi, 1)
        planes[cid] = px[:fh, :fw]

    ids = [c[0] for c in comps]
    if len(ids) == 1:
        y = np.clip(planes[ids[0]], 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = (planes[ids[0]], planes[ids[1]] - 128.0,
                 planes[ids[2]] - 128.0)
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------------- encoder

class _HuffEncoder:
    """(code, length) per symbol from the same BITS/HUFFVAL spec the
    decoder consumes — canonical assignment per T.81 Annex C."""

    def __init__(self, bits: list[int], huffval: list[int]) -> None:
        self.code: dict[int, tuple[int, int]] = {}
        code = 0
        k = 0
        for l in range(1, 17):
            for _ in range(bits[l - 1]):
                self.code[huffval[k]] = (code, l)
                code += 1
                k += 1
            code <<= 1


class _BitWriter:
    __slots__ = ("out", "buf", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, n: int) -> None:
        self.buf = (self.buf << n) | code
        self.nbits += n
        while self.nbits >= 8:
            b = (self.buf >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)          # byte stuffing
            self.nbits -= 8
            self.buf &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)    # pad with 1-bits


def _mag(v: int) -> tuple[int, int]:
    """Signed value → (size, s-bit code) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, v if v > 0 else v + (1 << s) - 1


def _scaled_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    lum = np.clip((_QUANT_LUM * scale + 50) // 100, 1, 255)
    chrom = np.clip((_QUANT_CHROM * scale + 50) // 100, 1, 255)
    return lum.astype(np.int32), chrom.astype(np.int32)


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes (Annex K tables
    scaled by ``quality``; ``subsample=True`` emits 4:2:0;
    ``restart_interval`` > 0 emits DRI + RSTn markers)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    qlum, qchrom = _scaled_tables(quality)
    f = img.astype(np.float64)
    y = (0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2])
    cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] \
        + 0.5 * f[:, :, 2] + 128.0
    cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] \
        - 0.081312 * f[:, :, 2] + 128.0

    if subsample:                       # 4:2:0: chroma halved via 2x2 mean
        hy, vy = 2, 2
        he = -(-h // 16) * 16
        we = -(-w // 16) * 16
    else:
        hy, vy = 1, 1
        he = -(-h // 8) * 8
        we = -(-w // 8) * 8

    def pad(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                      mode="edge")

    y = pad(y, he, we)
    cb = pad(cb, he, we)
    cr = pad(cr, he, we)
    if subsample:
        cb = cb.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))

    def quantize(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
        ph, pw = plane.shape
        blocks = (plane.reshape(ph // 8, 8, pw // 8, 8)
                  .transpose(0, 2, 1, 3).reshape(-1, 8, 8)) - 128.0
        coef = _fdct2_blocks(blocks)
        return (np.round(coef.reshape(-1, 64) / q)
                .astype(np.int32).reshape(ph // 8, pw // 8, 64))

    qy = quantize(y, qlum)
    qcb = quantize(cb, qchrom)
    qcr = quantize(cr, qchrom)

    enc = {(0, 0): _HuffEncoder(*_DC_LUM), (1, 0): _HuffEncoder(*_AC_LUM),
           (0, 1): _HuffEncoder(*_DC_CHROM),
           (1, 1): _HuffEncoder(*_AC_CHROM)}

    def put_block(bw: _BitWriter, blk: np.ndarray, pred: int,
                  dc: _HuffEncoder, ac: _HuffEncoder) -> int:
        s, bitsv = _mag(int(blk[0]) - pred)
        code, n = dc.code[s]
        bw.write(code, n)
        if s:
            bw.write(bitsv, s)
        zz = blk[_ZIGZAG]
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, n = ac.code[0xF0]
                bw.write(code, n)
                run -= 16
            s, bitsv = _mag(v)
            code, n = ac.code[(run << 4) | s]
            bw.write(code, n)
            bw.write(bitsv, s)
            run = 0
        if run:
            code, n = ac.code[0x00]
            bw.write(code, n)
        return int(blk[0])

    mcux = qcb.shape[1]
    mcuy = qcb.shape[0]
    ecs = bytearray()
    bw = _BitWriter()
    pred = [0, 0, 0]
    mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                ecs += bw.out + bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                bw = _BitWriter()
                pred = [0, 0, 0]
            for by in range(vy):
                for bx in range(hy):
                    pred[0] = put_block(
                        bw, qy[my * vy + by, mx * hy + bx], pred[0],
                        enc[(0, 0)], enc[(1, 0)])
            pred[1] = put_block(bw, qcb[my, mx], pred[1],
                                enc[(0, 1)], enc[(1, 1)])
            pred[2] = put_block(bw, qcr[my, mx], pred[2],
                                enc[(0, 1)], enc[(1, 1)])
            mcu += 1
    bw.flush()
    ecs += bw.out

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(body) + 2) + body

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(
            int(q[z]) for z in _ZIGZAG))

    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits)
                   + bytes(vals))

    out = bytearray(b"\xFF\xD8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, qlum) + dqt(1, qchrom)
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, (hy << 4) | vy, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += seg(0xC0, sof)
    out += dht(0, 0, _DC_LUM) + dht(1, 0, _AC_LUM)
    out += dht(0, 1, _DC_CHROM) + dht(1, 1, _AC_CHROM)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += ecs + b"\xFF\xD9"
    return bytes(out)


# =====================================================================
# BMP  (Windows BITMAPINFOHEADER; public file-format documentation)
# =====================================================================

def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → uncompressed 24-bit bottom-up BMP bytes.
    Lossless: ``decode_bmp(encode_bmp(x)) == x`` exactly."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pix = rows.tobytes()
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       len(pix), 2835, 2835, 0, 0)
    return hdr + info + pix


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → (h, w, 3) uint8. Supports uncompressed (BI_RGB)
    24- and 32-bit images, bottom-up or top-down. RLE/16-bit/palette
    BMPs raise ``NotImplementedError``."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP byte stream")
    (off,) = struct.unpack_from("<I", data, 10)
    hsize, w, h = struct.unpack_from("<Iii", data, 14)
    if hsize < 40:
        raise NotImplementedError("BMP core-header variant not supported")
    (bpp,) = struct.unpack_from("<H", data, 28)
    (comp,) = struct.unpack_from("<I", data, 30)
    if comp != 0:
        raise NotImplementedError(f"BMP compression {comp}: only BI_RGB "
                                  "is decodable in-container")
    if bpp not in (24, 32):
        raise NotImplementedError(f"{bpp}-bit BMP: only 24/32-bit "
                                  "BI_RGB is decodable in-container")
    top_down = h < 0
    h = abs(h)
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    rows = np.frombuffer(data, np.uint8, count=h * stride,
                         offset=off).reshape(h, stride)
    px = rows[:, :w * nb].reshape(h, w, nb)[:, :, 2::-1]  # BGR(A)→RGB
    if not top_down:
        px = px[::-1]
    return np.ascontiguousarray(px)


# =====================================================================
# GIF  (GIF87a/89a; LZW per the public specification)
# =====================================================================

def _lzw_decode(min_code: int, data: bytes, n_px: int) -> np.ndarray:
    """GIF-flavoured LZW (LSB-first variable-width codes) → palette
    indices. The per-code Python loop is bounded by the compressed
    byte count — fine inside the per-image actor loop."""
    clear = 1 << min_code
    end = clear + 1
    out = np.empty(n_px, np.uint8)
    npos = 0
    # bit reader state
    buf = np.frombuffer(data, np.uint8)
    acc = 0
    nbits = 0
    bpos = 0
    width = min_code + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while True:
        while nbits < width:
            if bpos >= len(buf):
                return out[:npos]
            acc |= int(buf[bpos]) << nbits
            nbits += 8
            bpos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF: corrupt LZW stream")
        k = len(entry)
        out[npos:npos + k] = np.frombuffer(entry, np.uint8)
        npos += k
        if npos >= n_px:
            return out
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    return out[:npos]


def _lzw_encode(min_code: int, idx: np.ndarray) -> bytes:
    """GIF LZW encoder (LSB-first variable-width, dict reset at 4096)."""
    clear = 1 << min_code
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    next_code = end + 1
    emit(clear)
    prev = -1
    for v in idx.tolist():
        if prev < 0:
            prev = v
            continue
        hit = table.get((prev, v))
        if hit is not None:
            prev = hit
            continue
        emit(prev)
        table[(prev, v)] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear)
            table.clear()
            next_code = end + 1
            width = min_code + 1
        prev = v
    if prev >= 0:
        emit(prev)
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_quantize(img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(h, w, 3) uint8 → (palette (k,3), indices (h,w)). Exact palette
    when the image has ≤256 distinct colors; otherwise a deterministic
    posterize to 6 levels/channel (≤216 colors) — GIF is an indexed
    format, >256-color sources are inherently lossy."""
    h, w, _ = img.shape
    packed = (img[:, :, 0].astype(np.uint32) << 16
              | img[:, :, 1].astype(np.uint32) << 8
              | img[:, :, 2].astype(np.uint32))
    uniq = np.unique(packed)
    if len(uniq) > 256:
        img = ((img.astype(np.uint16) + 25) // 51 * 51).astype(np.uint8)
        packed = (img[:, :, 0].astype(np.uint32) << 16
                  | img[:, :, 1].astype(np.uint32) << 8
                  | img[:, :, 2].astype(np.uint32))
        uniq = np.unique(packed)
    idx = np.searchsorted(uniq, packed).astype(np.uint8)
    pal = np.stack([(uniq >> 16) & 0xFF, (uniq >> 8) & 0xFF,
                    uniq & 0xFF], axis=1).astype(np.uint8)
    return pal, idx.reshape(h, w)


def encode_gif(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → single-frame GIF89a. Lossless when the image
    has ≤256 distinct colors (exact palette); >256-color images are
    posterized deterministically (see ``_gif_quantize``)."""
    return encode_gif_frames(img[None], fps=0)


def encode_gif_frames(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n, h, w, 3) uint8 → animated GIF89a (full-frame images, one
    shared quantization pass so every frame uses one global table)."""
    n, h, w, _ = frames.shape
    pal, idx_all = _gif_quantize(frames.reshape(n * h, w, 3))
    idx_all = idx_all.reshape(n, h, w)
    depth = max(1, int(np.ceil(np.log2(max(2, len(pal))))))
    gct = np.zeros((1 << depth, 3), np.uint8)
    gct[:len(pal)] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 7), 0, 0)
    out += gct.tobytes()
    delay = 0 if fps <= 0 else max(1, round(100 / fps))
    for f in range(n):
        if n > 1:
            out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0, delay, 0, 0)
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        min_code = max(2, depth)
        out.append(min_code)
        lzw = _lzw_encode(min_code, idx_all[f].ravel())
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → first frame as (h, w, 3) uint8."""
    frames, _fps = decode_gif_frames(data)
    return frames[0]


def decode_gif_frames(data: bytes) -> tuple[np.ndarray, int]:
    """GIF bytes → ((n, h, w, 3) uint8, fps). Real decoder: LZW,
    interlacing, local color tables, 87a and 89a. Every image
    descriptor must cover the full logical screen (partial-rect
    frame composition with disposal methods raises
    ``NotImplementedError``); transparency is ignored."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF byte stream")
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        k = 2 << (packed & 7)
        gct = np.frombuffer(data, np.uint8, count=k * 3,
                            offset=pos).reshape(k, 3)
        pos += k * 3
    frames = []
    delay_cs = 0
    while pos < len(data):
        b0 = data[pos]
        pos += 1
        if b0 == 0x3B:                                   # trailer
            break
        if b0 == 0x21:                                   # extension
            label = data[pos]
            pos += 1
            while True:
                ln = data[pos]
                if label == 0xF9 and ln == 4 and not delay_cs:
                    (delay_cs,) = struct.unpack_from("<H", data, pos + 2)
                pos += 1 + ln
                if ln == 0:
                    break
            continue
        if b0 != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{b0:02x}")
        left, top, iw, ih, ip = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if (left, top, iw, ih) != (0, 0, w, h):
            raise NotImplementedError(
                "GIF partial-rect frames (disposal composition) not "
                "supported in-container")
        pal = gct
        if ip & 0x80:
            k = 2 << (ip & 7)
            pal = np.frombuffer(data, np.uint8, count=k * 3,
                                offset=pos).reshape(k, 3)
            pos += k * 3
        if pal is None:
            raise ValueError("GIF: image without a color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while True:
            ln = data[pos]
            pos += 1
            if ln == 0:
                break
            lzw += data[pos:pos + ln]
            pos += ln
        idx = np.zeros(ih * iw, np.uint8)
        got = _lzw_decode(min_code, bytes(lzw), ih * iw)
        idx[:len(got)] = got
        idx = idx.reshape(ih, iw)
        if ip & 0x40:                                    # interlaced
            de = np.empty_like(idx)
            src = 0
            for start, step in _GIF_INTERLACE:
                rows = range(start, ih, step)
                de[list(rows)] = idx[src:src + len(rows)]
                src += len(rows)
            idx = de
        frames.append(pal[np.minimum(idx, len(pal) - 1)])
    if not frames:
        raise ValueError("GIF: no image data")
    fps = 0 if delay_cs == 0 else max(1, round(100 / delay_cs))
    return np.stack(frames), fps
