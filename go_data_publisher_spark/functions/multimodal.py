"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Decode kernels come in two tiers:

- REAL codecs for container formats parseable with stdlib + numpy alone —
  netpbm images (P5 grayscale / P6 RGB), uncompressed 24-bit BMP (BI_RGB,
  both bottom-up and top-down rasters, row padding handled), PNG (stdlib
  zlib inflate + numpy scanline unfiltering; 8-bit gray / gray+alpha /
  RGB / RGBA / palette, all five PNG filter types, CRC-verified chunks),
  baseline JPEG (ITU-T T.81 SOF0/SOF1: huffman entropy decode, restart
  markers, 4:4:4/4:2:2/4:4:0/4:2:0 sampling, vectorized numpy IDCT),
  MJPEG video in a RIFF/AVI container (tolerant LIST walk, one JPEG per
  '00dc' chunk), RIFF/WAV PCM audio (the `wave` stdlib module), and FLAC
  audio (RFC 9639: all subframe types incl. LPC, rice partitions, stereo
  decorrelation, CRC-8/16 verified — lossless, so roundtrips pin exact
  sample equality).  These are genuine decoders: the test fixture encodes
  real rasters/clips/waveforms and the features are computed from the
  decoded samples, roundtrip-pinned by tests.
- A deterministic STUB fallback for codecs whose libraries are not in this
  container (TIFF/WebP via Pillow, MP3 via soundfile/librosa,
  non-MJPEG video via PyAV).  The fallback is clearly marked; on a cluster with
  those libs, extend `_decode_image` / `_decode_audio` dispatch — the
  Spark-side plumbing (schema, partitioning, mapInPandas Arrow batch shape)
  does not change.

Per-batch loops run over *media blobs*, which is unavoidable at a codec
boundary (each blob is one decode call); all sample math is numpy.
"""

from __future__ import annotations

import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_DDL = (
    "media_id long, width int, height int, n_bytes long, mean_luma double, feature array<float>"
)

AUDIO_FEATURES_DDL = (
    "media_id long, n_samples long, sample_rate int, duration_s double, rms double"
)


# ---------------------------------------------------------------------------
# real codecs (stdlib + numpy only)
# ---------------------------------------------------------------------------

def encode_pgm(px: np.ndarray) -> bytes:
    """Binary netpbm P5 (8-bit grayscale)."""
    h, w = px.shape
    return b"P5\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


def encode_ppm(px: np.ndarray) -> bytes:
    """Binary netpbm P6 (8-bit RGB, shape (h, w, 3))."""
    h, w, _ = px.shape
    return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


def decode_netpbm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """P5/P6 → (width, height, luma uint8 matrix).  P6 luma = channel mean."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary netpbm payload: {magic!r}")
    # header = magic, width, height, maxval as whitespace/comment-separated
    # tokens, then exactly one whitespace byte before the raster
    tokens, pos, end = [], 2, len(payload)
    while len(tokens) < 3:
        while pos < end and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < end and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < end and not payload[pos : pos + 1].isspace():
            pos += 1
        if pos == start or pos >= end:
            raise ValueError("truncated netpbm header")
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported netpbm maxval {maxval}")
    if magic == b"P5":
        px = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=pos)
        return w, h, px.reshape(h, w)
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return w, h, px.reshape(h, w, 3).mean(axis=2).astype(np.uint8)


def encode_bmp(px: np.ndarray) -> bytes:
    """Uncompressed 24-bit BI_RGB BMP from an (h, w, 3) RGB array —
    BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows, BGR byte order,
    rows padded to 4 bytes (the Windows DIB layout)."""
    import struct

    h, w, _ = px.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    img_size = (row + pad) * h
    offset = 14 + 40
    header = b"BM" + struct.pack("<IHHI", offset + img_size, 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    bgr = px[..., ::-1].astype(np.uint8)
    if pad:
        padded = np.zeros((h, row + pad), dtype=np.uint8)
        padded[:, :row] = bgr.reshape(h, row)
    else:
        padded = bgr.reshape(h, row)
    return header + info + padded[::-1].tobytes()  # bottom-up


def decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Uncompressed 24-bit BMP → (width, height, luma uint8 matrix).
    Handles bottom-up (positive height) and top-down (negative) rasters and
    4-byte row padding; compressed or non-24bpp DIBs raise ValueError (the
    decode-skip path, same contract as the other real codecs)."""
    import struct

    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    # a corrupt offset below the headers would decode header bytes as
    # raster and yield plausible-looking garbage features instead of
    # hitting the decode-skip path
    if offset < 14 + hdr_size or offset > len(payload):
        raise ValueError(f"malformed BMP pixel-data offset {offset}")
    if w <= 0 or h_signed == 0:
        raise ValueError(f"malformed BMP dimensions ({w}x{h_signed})")
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    h = abs(h_signed)
    row = w * 3
    stride = row + (4 - row % 4) % 4
    if len(payload) < offset + stride * h:
        raise ValueError("truncated BMP raster")
    raster = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=offset)
    rows = raster.reshape(h, stride)[:, :row].reshape(h, w, 3)
    if h_signed > 0:
        rows = rows[::-1]  # bottom-up storage → top-down raster
    rgb = rows[..., ::-1]  # BGR → RGB
    return w, h, rgb.mean(axis=2).astype(np.uint8)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (8-bit depth, so bytes per pixel too)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _png_filter_row(ft: int, line: np.ndarray, prev: np.ndarray,
                    bpp: int) -> np.ndarray:
    """Forward PNG filter of one reconstructed scanline (encoder side).
    All references are to RECONSTRUCTED bytes, so the forward direction is
    fully vectorizable per row."""
    a = np.zeros_like(line)
    a[bpp:] = line[:-bpp]          # left neighbor (recon)
    b = prev                       # up neighbor (recon)
    c = np.zeros_like(line)
    c[bpp:] = prev[:-bpp]          # upper-left neighbor (recon)
    if ft == 0:
        return line.copy()
    if ft == 1:
        return line - a
    if ft == 2:
        return line - b
    if ft == 3:
        return line - ((a.astype(np.uint16) + b) // 2).astype(np.uint8)
    if ft == 4:
        return line - _paeth(a, b, c)
    raise ValueError(f"unknown PNG filter type {ft}")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec §9.4) over uint8 arrays."""
    ai, bi, ci = (x.astype(np.int16) for x in (a, b, c))
    p = ai + bi - ci
    pa, pb, pc = np.abs(p - ai), np.abs(p - bi), np.abs(p - ci)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(px: np.ndarray, filter_type: int = 0) -> bytes:
    """8-bit PNG from a (h, w) gray or (h, w, ch) array (ch = 2 gray+alpha,
    3 RGB, 4 RGBA).  ``filter_type`` selects the per-scanline forward filter
    (0-4) so tests can pin every decode branch; real encoders pick per-row,
    which the decoder handles identically."""
    import struct
    import zlib

    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim == 2:
        h, w, ch = *px.shape, 1
    else:
        h, w, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    flat = px.reshape(h, w * ch)
    prev = np.zeros(w * ch, dtype=np.uint8)
    out = bytearray()
    for y in range(h):
        out.append(filter_type)
        out += _png_filter_row(filter_type, flat[y], prev, ch).tobytes()
        prev = flat[y]
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
            + _png_chunk(b"IEND", b""))


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline PNG filters: raw (h·(1+stride) bytes of
    filter-type + filtered data) → (h, stride) reconstructed bytes.

    None/Up are whole-row numpy ops; Sub is a lane-wise mod-256 cumsum;
    Average/Paeth carry a left-neighbor dependency so they run one PIXEL at
    a time (vector over the bpp channels) — row-local work, and the hot
    production path for real corpora is Pillow anyway (this kernel makes
    the format genuinely decodable with stdlib-only dependencies)."""
    if raw.size != h * (1 + stride):
        raise ValueError("PNG raster size mismatch")
    rows = raw.reshape(h, 1 + stride)
    fts, data = rows[:, 0], rows[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft, line = int(fts[y]), data[y]
        if ft == 0:
            rec = line.copy()
        elif ft == 1:  # Sub: lane-wise running sum mod 256
            lanes = line.reshape(-1, bpp).astype(np.uint64)
            rec = (lanes.cumsum(axis=0) % 256).astype(np.uint8).reshape(-1)
        elif ft == 2:  # Up
            rec = line + prev
        elif ft in (3, 4):  # Average / Paeth: sequential left dependency
            rec = np.zeros(stride, dtype=np.uint8)
            zero = np.zeros(bpp, dtype=np.uint8)
            for x in range(0, stride, bpp):
                a = rec[x - bpp:x] if x else zero
                b = prev[x:x + bpp]
                if ft == 3:
                    pred = ((a.astype(np.uint16) + b) // 2).astype(np.uint8)
                else:
                    c = prev[x - bpp:x] if x else zero
                    pred = _paeth(a, b, c)
                rec[x:x + bpp] = line[x:x + bpp] + pred
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        out[y] = rec
        prev = rec
    return out


def decode_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    """PNG → (width, height, luma uint8 matrix).  8-bit depth, color types
    0/2/3/4/6, non-interlaced; chunk CRCs verified.  Alpha is dropped for
    luma (consistent with the other kernels' channel-mean convention);
    anything else (16-bit, Adam7) raises ValueError → the decode-skip path.
    """
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, end = 8, len(payload)
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= end:
        length, tag = struct.unpack_from(">I4s", payload, pos)
        body_at = pos + 8
        if body_at + length + 4 > end:
            raise ValueError("truncated PNG chunk")
        body = payload[body_at:body_at + length]
        crc = struct.unpack_from(">I", payload, body_at + length)[0]
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            if len(body) != 13:
                # struct.error is not a ValueError — it would escape the
                # decode-skip contract and kill the mapInPandas job
                raise ValueError(f"malformed PNG IHDR length {len(body)}")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos = body_at + length + 4
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, interlace={interlace})")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if w <= 0 or h <= 0:
        raise ValueError(f"malformed PNG dimensions ({w}x{h})")
    ch = _PNG_CHANNELS[color_type]
    try:
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG IDAT stream: {exc}") from exc
    px = _png_unfilter(raw, h, w * ch, ch).reshape(h, w, ch)
    if color_type == 3:
        if plte is None:
            raise ValueError("PNG palette image missing PLTE")
        if int(px.max()) >= len(plte):
            raise ValueError("PNG palette index out of range")
        px = plte[px[..., 0]]
        ch = 3
    elif color_type == 4:
        px = px[..., :1]  # drop alpha
        ch = 1
    elif color_type == 6:
        px = px[..., :3]  # drop alpha
        ch = 3
    luma = px[..., 0] if ch == 1 else px.mean(axis=2).astype(np.uint8)
    return w, h, luma


# ---------------------------------------------------------------------------
# JPEG baseline (ITU-T T.81: SOF0/SOF1, huffman entropy coding, 8-bit)
# ---------------------------------------------------------------------------

# zigzag index → natural (row-major) coefficient index (T.81 Figure 5)
_JPEG_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)


def _jpeg_dct_basis() -> np.ndarray:
    """8×8 DCT-II basis A with A[u, x] = c(u)/2 · cos((2x+1)uπ/16); the
    T.81 Annex A transforms are then F = A f Aᵀ (forward) and f = Aᵀ F A
    (inverse), applied to whole block stacks with one einsum each."""
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    a = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    a[0] /= np.sqrt(2.0)
    return a


_JPEG_BASIS = _jpeg_dct_basis()


def _jpeg_huff_lut(counts: list, symbols: list) -> dict:
    """Canonical Huffman (length, code) → symbol map from a DHT segment's
    BITS + HUFFVAL lists (the T.81 Annex C code generation)."""
    lut, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            lut[(ln, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    if k != len(symbols):
        raise ValueError("DHT symbol count does not match BITS")
    return lut


class _JpegBits:
    """MSB-first bit reader over one de-stuffed entropy-coded segment."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def bit(self) -> int:
        if self.pos >= self.nbits:
            raise ValueError("truncated JPEG entropy segment")
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, lut: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            sym = lut.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    """Amplitude sign extension (T.81 F.2.2.1 EXTEND): a t-bit value whose
    leading bit is 0 encodes a negative amplitude."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Baseline JPEG → (width, height, luma uint8 matrix).

    Real decoder, written against the public ITU-T T.81 spec with stdlib +
    numpy only: marker/DQT/DHT/SOF/SOS parsing, canonical huffman entropy
    decode (byte stuffing removed, DRI/RSTn restart intervals honored, DC
    predictors reset per restart segment), dequantize → dezigzag → one
    vectorized 8×8 IDCT einsum over the whole block stack.  Grayscale and
    YCbCr frames with sampling factors in {1, 2} (4:4:4 / 4:2:2 / 4:4:0 /
    4:2:0).  Only the Y plane is inverse-transformed — the downstream
    features are luma-only and JPEG stores luma as its own component — but
    chroma blocks are still entropy-decoded (the scan interleaves them;
    skipping bits is not possible).  Progressive (SOF2), arithmetic,
    lossless, hierarchical, 12-bit, and multi-scan variants raise
    ValueError → the decode-skip path, same contract as the other kernels.
    """
    import struct

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos, end = 2, len(payload)
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None      # (height, width, [(cid, h_s, v_s, tq), ...])
    restart = 0
    scan = None       # ([(comp_idx, dc_lut, ac_lut)], [entropy segments])
    while pos + 2 <= end:
        if payload[pos] != 0xFF:
            raise ValueError("lost JPEG marker sync")
        marker = payload[pos + 1]
        if marker == 0xFF:      # fill byte before a marker
            pos += 1
            continue
        pos += 2
        if marker == 0xD9:      # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue            # standalone markers
        if pos + 2 > end:
            raise ValueError("truncated JPEG segment header")
        seglen = struct.unpack_from(">H", payload, pos)[0]
        if seglen < 2 or pos + seglen > end:
            raise ValueError("truncated JPEG segment")
        seg = payload[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:      # DQT (may hold several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                need = 64 if pq == 0 else 128
                if pq > 1 or i + need > len(seg):
                    raise ValueError("malformed JPEG DQT")
                dt = np.uint8 if pq == 0 else ">u2"
                qt[tq] = np.frombuffer(seg, dt, 64, i).astype(np.int32)
                i += need
        elif marker == 0xC4:    # DHT (may hold several tables)
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1:i + 17])
                total = sum(counts)
                if i + 17 + total > len(seg) or tc > 1:
                    raise ValueError("malformed JPEG DHT")
                huff[(tc, th)] = _jpeg_huff_lut(
                    counts, list(seg[i + 17:i + 17 + total]))
                i += 17 + total
        elif marker in (0xC0, 0xC1):   # SOF0 / SOF1: huffman-decodable
            if len(seg) < 6:
                raise ValueError("malformed JPEG SOF")
            prec, h_img, w_img, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            if h_img <= 0 or w_img <= 0 or nc not in (1, 3) \
                    or len(seg) < 6 + 3 * nc:
                raise ValueError(
                    f"unsupported JPEG frame ({w_img}x{h_img}, {nc} comps)")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                h_s, v_s = hv >> 4, hv & 15
                if h_s not in (1, 2) or v_s not in (1, 2):
                    raise ValueError(f"unsupported JPEG sampling {h_s}x{v_s}")
                comps.append((cid, h_s, v_s, tq))
            frame = (h_img, w_img, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG mode (progressive/arithmetic/lossless)")
        elif marker == 0xDD:    # DRI
            if len(seg) < 2:
                raise ValueError("malformed JPEG DRI")
            restart = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:    # SOS: header, then the entropy-coded data
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if scan is not None:
                raise ValueError("multi-scan JPEG not supported")
            ns = seg[0] if seg else 0
            if ns != len(frame[2]) or len(seg) < 1 + 2 * ns + 3:
                raise ValueError(
                    "only single interleaved-scan JPEG supported")
            sel = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                idx = next((k for k, comp in enumerate(frame[2])
                            if comp[0] == cs), None)
                if idx is None:
                    raise ValueError(f"SOS references unknown component {cs}")
                td, ta = tdta >> 4, tdta & 15
                if (0, td) not in huff or (1, ta) not in huff:
                    raise ValueError("SOS references missing huffman table")
                sel.append((idx, huff[(0, td)], huff[(1, ta)]))
            # carve entropy data: de-stuff FF00, split at RSTn boundaries
            segs, cur, i = [], bytearray(), pos
            while i < end:
                b = payload[i]
                if b != 0xFF:
                    cur.append(b)
                    i += 1
                    continue
                m2 = payload[i + 1] if i + 1 < end else 0xD9
                if m2 == 0x00:
                    cur.append(0xFF)
                    i += 2
                elif 0xD0 <= m2 <= 0xD7:
                    segs.append(bytes(cur))
                    cur = bytearray()
                    i += 2
                else:
                    break
            segs.append(bytes(cur))
            pos = i
            scan = (sel, segs)
        # APPn / COM / other segments: skipped
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    h_img, w_img, comps = frame
    sel, segs = scan
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_cols = -(-w_img // (8 * hmax))
    mcu_rows = -(-h_img // (8 * vmax))
    n_mcus = mcu_cols * mcu_rows
    blocks = [np.zeros((mcu_rows * c[2], mcu_cols * c[1], 64), np.int32)
              for c in comps]
    done = 0
    for segdata in segs:
        if done >= n_mcus:
            break   # tolerate a stray trailing restart segment
        preds = [0] * len(comps)    # DC predictors reset at every RSTn
        reader = _JpegBits(segdata)
        quota = min(restart, n_mcus - done) if restart else n_mcus - done
        for _ in range(quota):
            my, mx = divmod(done, mcu_cols)
            for idx, dc_lut, ac_lut in sel:
                _, h_s, v_s, _ = comps[idx]
                for by in range(v_s):
                    for bx in range(h_s):
                        coeff = blocks[idx][my * v_s + by, mx * h_s + bx]
                        t = reader.huff(dc_lut)
                        if t > 15:
                            raise ValueError("bad JPEG DC category")
                        diff = _jpeg_extend(reader.bits(t), t) if t else 0
                        preds[idx] += diff
                        coeff[0] = preds[idx]
                        k = 1
                        while k < 64:
                            rs = reader.huff(ac_lut)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r != 15:
                                    break       # EOB
                                k += 16         # ZRL
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            coeff[k] = _jpeg_extend(reader.bits(s), s)
                            k += 1
            done += 1
    if done < n_mcus:
        raise ValueError(f"JPEG scan ended early ({done}/{n_mcus} MCUs)")
    # reconstruct the luma plane: dequant (zigzag) → dezigzag → IDCT,
    # one einsum over the whole block stack
    _, h_s, v_s, tq = comps[0]
    if tq not in qt:
        raise ValueError(f"JPEG luma references missing quant table {tq}")
    zz = blocks[0].reshape(-1, 64).astype(np.float64) * qt[tq][None, :]
    nat = np.zeros_like(zz)
    nat[:, _JPEG_ZIGZAG] = zz
    a = _JPEG_BASIS
    px = np.einsum("ux,nuv,vy->nxy", a, nat.reshape(-1, 8, 8), a) + 128.0
    gby, gbx = mcu_rows * v_s, mcu_cols * h_s
    grid = px.reshape(gby, gbx, 8, 8).transpose(0, 2, 1, 3) \
             .reshape(gby * 8, gbx * 8)
    comp_h = -(-h_img * v_s // vmax)
    comp_w = -(-w_img * h_s // hmax)
    luma = grid[:comp_h, :comp_w]
    if v_s != vmax or h_s != hmax:   # Y subsampled relative to another comp
        luma = np.repeat(np.repeat(luma, vmax // v_s, 0), hmax // h_s, 1)
    luma = luma[:h_img, :w_img]
    return w_img, h_img, np.clip(np.round(luma), 0, 255).astype(np.uint8)


class _BitWriter:
    """MSB-first bit writer shared by the fixture encoders.  ``stuff_ff``
    enables T.81 byte stuffing (FF → FF 00) for JPEG entropy segments;
    FLAC writes raw bytes."""

    def __init__(self, stuff_ff: bool = False):
        self.out = bytearray()
        self._stuff = stuff_ff
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._stuff and self._acc == 0xFF:
                    self.out.append(0x00)
                self._acc = 0
                self._n = 0

    u = write

    def s(self, value: int, nbits: int):
        self.write(value & ((1 << nbits) - 1), nbits)

    def pad(self, fill: int = 0):
        """Pad to a byte boundary (JPEG pads with 1-bits, FLAC with 0s)."""
        if self._n:
            n = 8 - self._n
            self.write(((1 << n) - 1) if fill else 0, n)

    align = pad


def _JpegBitWriter():
    return _BitWriter(stuff_ff=True)


def _jpeg_cat(v: int) -> int:
    """Amplitude category (bit length of |v|; 0 for 0)."""
    return int(abs(v)).bit_length()


def _jpeg_amp(v: int, t: int) -> int:
    """t-bit amplitude encoding (inverse of _jpeg_extend)."""
    return v + (1 << t) - 1 if v < 0 else v


def _jpeg_fixed_table(symbols_used) -> tuple[list, list, dict]:
    """Single-length canonical table over exactly the symbols a fixture
    image emits: length L = ceil(log2(n+1)), so the all-ones code stays
    reserved (T.81 Annex C).  Valid but unoptimized — the encoder exists
    to exercise decode_jpeg, not to compress."""
    syms = sorted(symbols_used)
    ln = 1
    while (1 << ln) - 1 < len(syms):   # codes 0..n-1 < 2^L - 1 (all-ones)
        ln += 1
    counts = [0] * 16
    counts[ln - 1] = len(syms)
    enc = {s: (ln, i) for i, s in enumerate(syms)}
    return counts, syms, enc


def _jpeg_block_tokens(zzrow: np.ndarray, pred: int) -> tuple[list, int]:
    """One block's (dc?, symbol, amp_bits, amp_value) token list + new DC
    predictor, following T.81 F.1.2 run/size coding."""
    dc = int(zzrow[0])
    t = _jpeg_cat(dc - pred)
    toks = [(True, t, t, _jpeg_amp(dc - pred, t))]
    run = 0
    last_nz = 0
    nz = np.nonzero(zzrow[1:])[0]
    last_nz = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zzrow[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            toks.append((False, 0xF0, 0, 0))    # ZRL
            run -= 16
        s = _jpeg_cat(v)
        toks.append((False, (run << 4) | s, s, _jpeg_amp(v, s)))
        run = 0
    if last_nz < 63:
        toks.append((False, 0x00, 0, 0))        # EOB
    return toks, dc


def _box_mean(p: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """fy×fx box-mean downsampling with edge-replicated padding."""
    if fy == 1 and fx == 1:
        return p
    hh, ww = p.shape
    ph, pw = -(-hh // fy) * fy, -(-ww // fx) * fx
    pp = np.pad(p, ((0, ph - hh), (0, pw - ww)), mode="edge")
    return pp.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))


def encode_jpeg_baseline(px: np.ndarray, quant: int | np.ndarray = 1,
                         restart_interval: int = 0,
                         luma_sampling: tuple[int, int] = (2, 2)) -> bytes:
    """Baseline JPEG fixture encoder (T.81 SOF0), the roundtrip twin of
    `decode_jpeg`: grayscale (h, w) as one component, RGB (h, w, 3) as
    BT.601 YCbCr with chroma subsampled by ``luma_sampling`` = (h, v) Y
    factors — (2,2) = 4:2:0, (2,1) = 4:2:2, (1,2) = 4:4:0, (1,1) = 4:4:4.
    Vectorized forward DCT (same basis as the decoder), flat or
    caller-supplied quant table, per-image single-length huffman tables,
    optional DRI/RSTn restart intervals.  Fixture-grade on purpose — it
    exists so tests can pin the decoder against analytically-known rasters
    without any codec library.
    """
    import struct

    color = px.ndim == 3
    h_img, w_img = px.shape[:2]
    if isinstance(quant, (int, np.integer)):
        qnat = np.full(64, int(quant), dtype=np.int32)
    else:
        qnat = np.asarray(quant, dtype=np.int32).reshape(64)
    qnat = np.clip(qnat, 1, 255)
    qzz = qnat[_JPEG_ZIGZAG]

    if color:
        sh, sv = luma_sampling
        if sh not in (1, 2) or sv not in (1, 2):
            raise ValueError(f"unsupported luma sampling {luma_sampling}")
        rgb = px.astype(np.float64)
        y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
            + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
            - 0.081312 * rgb[..., 2]
        planes = [y, _box_mean(cb, sv, sh), _box_mean(cr, sv, sh)]
        samps = [(sh, sv), (1, 1), (1, 1)]
        tqs = [0, 1, 1]
        classes = [0, 1, 1]     # huffman class: 0 = luma, 1 = chroma
    else:
        planes = [px.astype(np.float64)]
        samps = [(1, 1)]
        tqs = [0]
        classes = [0]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcu_cols = -(-w_img // (8 * hmax))
    mcu_rows = -(-h_img // (8 * vmax))
    n_mcus = mcu_cols * mcu_rows

    # per component: pad to the MCU grid, forward-DCT, quantize, zigzag
    a = _JPEG_BASIS
    comp_zz = []
    for plane, (h_s, v_s) in zip(planes, samps):
        th, tw = mcu_rows * v_s * 8, mcu_cols * h_s * 8
        p = np.pad(plane, ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
                   mode="edge") - 128.0
        nby, nbx = th // 8, tw // 8
        fb = p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
        coeff = np.einsum("ux,nxy,vy->nuv", a, fb.reshape(-1, 8, 8), a)
        q = np.round(coeff.reshape(-1, 64) / qnat[None, :]).astype(np.int64)
        comp_zz.append(q[:, _JPEG_ZIGZAG].reshape(nby, nbx, 64))

    # tokenize MCU-interleaved with restart-aware DC predictor resets
    segments, seg, preds = [], [], [0] * len(planes)
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            segments.append(seg)
            seg, preds = [], [0] * len(planes)
        my, mx = divmod(m, mcu_cols)
        for ci, (h_s, v_s) in enumerate(samps):
            for by in range(v_s):
                for bx in range(h_s):
                    zzrow = comp_zz[ci][my * v_s + by, mx * h_s + bx]
                    toks, preds[ci] = _jpeg_block_tokens(zzrow, preds[ci])
                    seg.extend((classes[ci], *t) for t in toks)
    segments.append(seg)

    # build the 2 (gray) or 4 (color) tables from the symbols actually used
    used: dict[tuple[int, bool], set] = {}
    for seg in segments:
        for cls, is_dc, sym, _, _ in seg:
            used.setdefault((cls, is_dc), set()).add(sym)
    tables = {k: _jpeg_fixed_table(v) for k, v in used.items()}

    out = bytearray(b"\xff\xd8")
    for tq in sorted(set(tqs)):
        out += b"\xff\xdb" + struct.pack(">HB", 2 + 1 + 64, tq) \
            + qzz.astype(np.uint8).tobytes()
    nc = len(planes)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h_img, w_img, nc)
    for ci, (h_s, v_s) in enumerate(samps):
        out += bytes([ci + 1, (h_s << 4) | v_s, tqs[ci]])
    for (cls, is_dc), (counts, syms, _) in sorted(tables.items()):
        tc = 0 if is_dc else 1
        out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(syms)) \
            + bytes([(tc << 4) | cls]) + bytes(counts) + bytes(syms)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 2 + 1 + 2 * nc + 3, nc)
    for ci in range(nc):
        out += bytes([ci + 1, (classes[ci] << 4) | classes[ci]])
    out += b"\x00\x3f\x00"      # Ss=0, Se=63, AhAl=0
    for si, seg in enumerate(segments):
        if si:
            out += bytes([0xFF, 0xD0 + ((si - 1) % 8)])
        w = _JpegBitWriter()
        for cls, is_dc, sym, nbits, amp in seg:
            ln, code = tables[(cls, is_dc)][2][sym]
            w.write(code, ln)
            if nbits:
                w.write(amp, nbits)
        w.pad(fill=1)   # T.81: trailing bits pad with 1s
        out += w.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# AVI/MJPEG video (RIFF container + one baseline JPEG per frame)
# ---------------------------------------------------------------------------

def encode_avi_mjpeg(frames: list, fps: int = 10) -> bytes:
    """Minimal RIFF/AVI container holding an MJPEG video stream — the
    fixture twin of `decode_avi_mjpeg`.  Spec-shaped headers (avih,
    strh 'vids'/'MJPG', strf BITMAPINFOHEADER) and one '00dc' chunk per
    frame, each a baseline JPEG from `encode_jpeg_baseline` at quant=1."""
    import struct

    if not frames:
        raise ValueError("AVI needs at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg_baseline(f, quant=1) for f in frames]

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(list_type: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", list_type + data)

    avih = struct.pack("<14I", 1_000_000 // fps, 0, 0, 0x10, len(jpegs),
                       0, 1, 0, w, h, 0, 0, 0, 0)
    strh = b"vids" + b"MJPG" + struct.pack(
        "<IHH8I4H", 0, 0, 0, 0, 1, fps, 0, len(jpegs), 0, 0xFFFFFFFF, 0,
        0, 0, w, h)
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _jpeg_dims(payload: bytes) -> tuple[int, int]:
    """Header-only baseline-JPEG probe: walk the marker stream to SOF0/SOF1
    and return (width, height) without entropy-decoding anything.  Raises
    ValueError on non-JPEG payloads and on the frame modes `decode_jpeg`
    rejects (progressive/arithmetic/lossless) — the cheap per-frame validity
    check frame SAMPLING runs on the frames it does NOT fully decode."""
    import struct

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos, end = 2, len(payload)
    while pos + 2 <= end:
        if payload[pos] != 0xFF:
            raise ValueError("lost JPEG marker sync")
        marker = payload[pos + 1]
        if marker == 0xFF:      # fill byte before a marker
            pos += 1
            continue
        pos += 2
        if marker == 0xD9:      # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue            # standalone markers
        if pos + 2 > end:
            raise ValueError("truncated JPEG segment header")
        seglen = struct.unpack_from(">H", payload, pos)[0]
        if seglen < 2 or pos + seglen > end:
            raise ValueError("truncated JPEG segment")
        if marker in (0xC0, 0xC1):      # SOF0 / SOF1
            if seglen < 2 + 5:
                raise ValueError("malformed JPEG SOF")
            _prec, h_img, w_img = struct.unpack_from(">BHH", payload, pos + 2)
            if h_img <= 0 or w_img <= 0:
                raise ValueError("malformed JPEG SOF")
            return w_img, h_img
        if marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG mode (progressive/arithmetic/lossless)")
        if marker == 0xDA:      # SOS before any SOF
            raise ValueError("JPEG SOS before SOF")
        pos += seglen
    raise ValueError("JPEG has no SOF marker")


def _avi_stream_blobs(payload: bytes) -> list:
    """RIFF/AVI walk → the raw '##dc'/'##db' stream chunks, undecoded.

    Separated from the JPEG decode so frame SAMPLING can skip the decode
    of unsampled frames entirely (MJPEG frames are independent — at a
    30fps corpus sampled every 30th frame that is a 30× decode saving).
    Tolerant iterative LIST walk (any nesting, odd-size chunk padding) —
    a crafted deeply-nested payload must raise ValueError (decode-skip),
    never RecursionError (job death)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    blobs: list[bytes] = []
    stack: list[bytes] = [payload[12:]]
    lists_seen = 0
    while stack:
        data = stack.pop()
        lists_seen += 1
        if lists_seen > 4096:   # decode-skip a pathological container
            raise ValueError("AVI has too many LIST chunks")
        pos = 0
        while pos + 8 <= len(data):
            fourcc = data[pos:pos + 4]
            size = struct.unpack_from("<I", data, pos + 4)[0]
            body = data[pos + 8:pos + 8 + size]
            if len(body) < size:
                raise ValueError("truncated AVI chunk")
            if fourcc == b"LIST":
                stack.append(body[4:])
            elif fourcc[2:4] in (b"dc", b"db"):
                blobs.append(body)
            pos += 8 + size + (size & 1)
    if not blobs:
        raise ValueError("AVI contains no video stream chunks")
    return blobs


def decode_avi_mjpeg(payload: bytes) -> tuple[int, int, list]:
    """RIFF/AVI MJPEG → (width, height, [luma uint8 matrix per frame]).

    Every stream chunk is decoded as a baseline JPEG via `decode_jpeg`.
    Non-MJPEG streams (raw DIB '##db', other codecs) raise ValueError
    through the JPEG decoder → the decode-skip path, as do empty
    containers and frame-size changes mid-stream."""
    dims = None
    decoded = []
    for blob in _avi_stream_blobs(payload):
        w, h, luma = decode_jpeg(blob)
        if dims is None:
            dims = (w, h)
        elif dims != (w, h):
            raise ValueError("AVI frame dimensions vary mid-stream")
        decoded.append(luma)
    return dims[0], dims[1], decoded


def encode_wav(pcm: np.ndarray, sample_rate: int) -> bytes:
    """float32 [-1, 1] mono → 16-bit PCM RIFF/WAV bytes."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes((np.clip(pcm, -1.0, 1.0) * 32767.0).astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAV 16-bit PCM → (float32 mono samples in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        n, sr, width, ch = (
            wf.getnframes(), wf.getframerate(), wf.getsampwidth(), wf.getnchannels()
        )
        if width != 2:
            raise ValueError(f"unsupported WAV sample width {width}")
        if sr <= 0 or ch <= 0:
            raise ValueError(f"malformed WAV header (rate={sr}, channels={ch})")
        raw = np.frombuffer(wf.readframes(n), dtype="<i2").astype(np.float32) / 32768.0
    if ch > 1:
        raw = raw.reshape(-1, ch).mean(axis=1)
    return raw, sr


# ---------------------------------------------------------------------------
# FLAC audio (lossless; public spec at xiph.org / RFC 9639)
# ---------------------------------------------------------------------------

def _flac_crc8(data: bytes) -> int:
    """CRC-8, polynomial 0x07, init 0 (FLAC frame-header CRC)."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _flac_crc16(data: bytes) -> int:
    """CRC-16, polynomial 0x8005, init 0 (FLAC whole-frame CRC)."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _FlacBits:
    """MSB-first bit reader that remembers byte offsets (for CRC spans)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, byte_pos: int = 0):
        self.data = data
        self.pos = byte_pos * 8

    @property
    def byte_pos(self) -> int:
        return self.pos >> 3

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def u(self, n: int) -> int:
        if self.pos + n > len(self.data) * 8:
            raise ValueError("truncated FLAC stream")
        v = 0
        for _ in range(n):
            v = (v << 1) | ((self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def s(self, n: int) -> int:
        v = self.u(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.u(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("runaway FLAC unary code")
        return q


def _flac_utf8_number(bits: _FlacBits) -> int:
    """FLAC's extended-UTF-8 frame/sample number (up to 7 bytes)."""
    b0 = bits.u(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise ValueError("malformed FLAC frame number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = bits.u(8)
        if c & 0xC0 != 0x80:
            raise ValueError("malformed FLAC frame number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


_FLAC_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
               7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}


def _flac_residual(bits: _FlacBits, block_size: int, order: int) -> np.ndarray:
    """Rice-coded residual (both 4- and 5-bit parameter methods, raw-bits
    escape), all partitions of one subframe."""
    method = bits.u(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = bits.u(4)
    if block_size % (1 << po):
        raise ValueError("FLAC partition order does not divide block size")
    out = np.empty(block_size - order, dtype=np.int64)
    at = 0
    for p in range(1 << po):
        n = (block_size >> po) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC predictor order exceeds first partition")
        param = bits.u(pbits)
        if param == escape:
            raw = bits.u(5)
            for i in range(n):
                out[at + i] = bits.s(raw) if raw else 0
        else:
            for i in range(n):
                q = bits.unary()
                u = (q << param) | bits.u(param)
                out[at + i] = -(u >> 1) - 1 if u & 1 else u >> 1
        at += n
    return out


def _flac_subframe(bits: _FlacBits, block_size: int, bps: int) -> np.ndarray:
    """One channel's subframe → int64 samples (CONSTANT / VERBATIM /
    FIXED 0-4 / LPC, wasted-bits handling)."""
    if bits.u(1):
        raise ValueError("FLAC subframe padding bit set")
    ftype = bits.u(6)
    wasted = 0
    if bits.u(1):
        wasted = 1 + bits.unary()
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC wasted bits exceed sample size")
    if ftype == 0:          # CONSTANT
        out = np.full(block_size, bits.s(eff), dtype=np.int64)
    elif ftype == 1:        # VERBATIM
        out = np.array([bits.s(eff) for _ in range(block_size)], dtype=np.int64)
    elif 8 <= ftype <= 12:  # FIXED, order 0-4
        order = ftype - 8
        warm = [bits.s(eff) for _ in range(order)]
        res = _flac_residual(bits, block_size, order)
        out = np.empty(block_size, dtype=np.int64)
        out[:order] = warm
        coefs = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}[order]
        for i in range(order, block_size):
            out[i] = res[i - order] + sum(
                c * out[i - 1 - j] for j, c in enumerate(coefs))
    elif ftype >= 32:       # LPC, order 1-32
        order = (ftype & 31) + 1
        warm = [bits.s(eff) for _ in range(order)]
        prec = bits.u(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = bits.s(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [bits.s(prec) for _ in range(order)]
        res = _flac_residual(bits, block_size, order)
        out = np.empty(block_size, dtype=np.int64)
        out[:order] = warm
        for i in range(order, block_size):
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * int(out[i - 1 - j])
            out[i] = res[i - order] + (acc >> shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    return out << wasted


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC → (float32 mono samples in [-1, 1], sample_rate) — the same
    contract as `decode_wav`.

    Real decoder against the public FLAC format (RFC 9639 / xiph spec),
    stdlib + numpy only: STREAMINFO, frame headers (both blocking
    strategies, explicit and coded block sizes/rates, CRC-8 verified),
    all subframe types (CONSTANT / VERBATIM / FIXED 0-4 / LPC with wasted
    bits), 4- and 5-bit rice partitions with raw-bit escapes, stereo
    decorrelation (left/side, right/side, mid/side), whole-frame CRC-16
    verified.  Anything malformed raises ValueError → the decode-skip
    path."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    bits = _FlacBits(payload, 4)
    # metadata blocks; STREAMINFO is mandatory and first
    last, btype, blen = bits.u(1), bits.u(7), bits.u(24)
    if btype != 0 or blen != 34:
        raise ValueError("FLAC stream missing leading STREAMINFO")
    bits.u(16), bits.u(16), bits.u(24), bits.u(24)  # block/frame size bounds
    si_rate = bits.u(20)
    si_channels = bits.u(3) + 1
    si_bps = bits.u(5) + 1
    total = bits.u(36)
    bits.pos += 128  # md5
    while not last:
        last, btype, blen = bits.u(1), bits.u(7), bits.u(24)
        if btype == 127:
            raise ValueError("invalid FLAC metadata block type")
        bits.pos += blen * 8
    if si_rate == 0 or si_channels < 1:
        raise ValueError("malformed FLAC STREAMINFO")

    chans: list[list[np.ndarray]] = []
    while bits.byte_pos < len(payload):
        frame_start = bits.byte_pos
        sync = bits.u(14)
        if sync != 0x3FFE:
            raise ValueError("lost FLAC frame sync")
        if bits.u(1):
            raise ValueError("reserved FLAC frame bit set")
        bits.u(1)                       # blocking strategy
        bs_code = bits.u(4)
        sr_code = bits.u(4)
        ch_code = bits.u(4)
        ss_code = bits.u(3)
        if bits.u(1):
            raise ValueError("reserved FLAC frame bit set")
        _flac_utf8_number(bits)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 1:
            block_size = 192
        elif bs_code <= 5:
            block_size = 576 << (bs_code - 2)
        elif bs_code == 6:
            block_size = bits.u(8) + 1
        elif bs_code == 7:
            block_size = bits.u(16) + 1
        else:
            block_size = 256 << (bs_code - 8)
        if sr_code == 0:
            rate = si_rate
        elif sr_code in _FLAC_RATES:
            rate = _FLAC_RATES[sr_code]
        elif sr_code == 12:
            rate = bits.u(8) * 1000
        elif sr_code == 13:
            rate = bits.u(16)
        elif sr_code == 14:
            rate = bits.u(16) * 10
        else:
            raise ValueError("invalid FLAC sample rate code")
        ss_map = {0: si_bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
        if ss_code not in ss_map:
            raise ValueError("reserved FLAC sample size code")
        bps = ss_map[ss_code]
        # the tail of this function normalizes every sample by STREAMINFO's
        # bps and labels the clip with one rate — a frame that overrides
        # either would decode mis-scaled/mislabeled, so treat disagreement
        # as malformed (decode-skip), consistent with the strict checks
        if bps != si_bps:
            raise ValueError(
                f"FLAC frame bps {bps} != STREAMINFO bps {si_bps}")
        if rate != si_rate:
            raise ValueError(
                f"FLAC frame rate {rate} != STREAMINFO rate {si_rate}")
        header = payload[frame_start:bits.byte_pos]
        if bits.u(8) != _flac_crc8(header):
            raise ValueError("FLAC frame header CRC-8 mismatch")
        try:
            if ch_code <= 7:
                n_ch = ch_code + 1
                subs = [_flac_subframe(bits, block_size, bps)
                        for _ in range(n_ch)]
            elif ch_code in (8, 9, 10):
                # stereo decorrelation: the side channel carries an extra bit
                a = _flac_subframe(bits, block_size,
                                   bps + (1 if ch_code == 9 else 0))
                b = _flac_subframe(bits, block_size,
                                   bps + (1 if ch_code != 9 else 0))
                if ch_code == 8:        # left/side
                    subs = [a, a - b]
                elif ch_code == 9:      # right/side (side first)
                    subs = [b + a, b]
                else:                   # mid/side
                    mid = (a << 1) | (b & 1)
                    subs = [(mid + b) >> 1, (mid - b) >> 1]
                n_ch = 2
            else:
                raise ValueError(
                    f"reserved FLAC channel assignment {ch_code}")
        except OverflowError as exc:
            # a corrupt LPC/FIXED frame can run the predictor past int64
            # BEFORE the CRC check catches the corruption; that must stay
            # a decode-skip (ValueError), never kill the mapInPandas job
            raise ValueError(f"FLAC predictor overflow: {exc}") from exc
        bits.align()
        body = payload[frame_start:bits.byte_pos]
        if bits.u(16) != _flac_crc16(body):
            raise ValueError("FLAC frame CRC-16 mismatch")
        chans.append(subs)
    if not chans:
        raise ValueError("FLAC stream has no frames")
    mono = np.concatenate([
        np.mean(np.stack(subs, axis=0), axis=0) for subs in chans])
    if total and len(mono) > total:
        mono = mono[:total]             # trim the final partial block
    return (mono / float(1 << (si_bps - 1))).astype(np.float32), rate


def _FlacBitWriter():
    return _BitWriter(stuff_ff=False)


def encode_flac(pcm: np.ndarray, sample_rate: int, block_size: int = 1024,
                subframe: str = "verbatim") -> bytes:
    """FLAC fixture encoder, the roundtrip twin of `decode_flac`: mono
    16-bit streams with VERBATIM, CONSTANT-where-possible, or FIXED
    order-2 rice-coded subframes (``subframe`` ∈ {'verbatim', 'fixed'}).
    Lossless, so tests pin exact sample equality — the strongest possible
    oracle for the decoder's rice/CRC/frame plumbing."""
    samples = np.clip(np.asarray(pcm, dtype=np.float64), -1.0, 1.0)
    ints = np.round(samples * 32767.0).astype(np.int64)
    n = len(ints)
    w = _FlacBitWriter()
    w.u(1, 1)            # last metadata block
    w.u(0, 7)            # STREAMINFO
    w.u(34, 24)
    w.u(block_size, 16)
    w.u(block_size, 16)
    w.u(0, 24)
    w.u(0, 24)
    w.u(sample_rate, 20)
    w.u(0, 3)            # channels - 1 (mono)
    w.u(15, 5)           # bps - 1 = 15
    w.u(n, 36)
    w.u(0, 128)          # md5 unset (all zero = "not checked")
    head = b"fLaC" + bytes(w.out)

    frames = bytearray()
    for fi, at in enumerate(range(0, n, block_size)):
        chunk = ints[at:at + block_size]
        bs = len(chunk)
        fw = _FlacBitWriter()
        fw.u(0x3FFE, 14)     # sync
        fw.u(0, 1)
        fw.u(0, 1)           # fixed-blocksize strategy
        fw.u(7, 4)           # block size: explicit 16-bit value - 1
        fw.u(0, 4)           # sample rate: from STREAMINFO
        fw.u(0, 4)           # mono
        fw.u(4, 3)           # 16 bps
        fw.u(0, 1)
        # frame number, standard UTF-8 (fixture frame counts stay small)
        for byte in chr(fi).encode("utf-8"):
            fw.u(byte, 8)
        fw.u(bs - 1, 16)
        hdr = bytes(fw.out)
        fw.u(_flac_crc8(hdr), 8)
        if subframe == "fixed" and bs > 2:
            fw.u(0, 1)
            fw.u(10, 6)      # FIXED order 2
            fw.u(0, 1)       # no wasted bits
            fw.s(int(chunk[0]), 16)
            fw.s(int(chunk[1]), 16)
            res = chunk[2:] - 2 * chunk[1:-1] + chunk[:-2]
            zz = np.where(res < 0, (-res << 1) - 1, res << 1).astype(np.int64)
            param = max(0, int(zz.max()).bit_length() - 1) if len(zz) else 0
            param = min(param, 14)
            fw.u(0, 2)       # 4-bit rice method
            fw.u(0, 4)       # partition order 0
            fw.u(param, 4)
            for u in zz:
                q = int(u) >> param
                if q:
                    fw.u(0, q)      # unary quotient: q zeros ...
                fw.u(1, 1)          # ... terminated by a one
                fw.u(int(u) & ((1 << param) - 1), param)
        elif len(set(chunk.tolist())) == 1:
            fw.u(0, 1)
            fw.u(0, 6)       # CONSTANT
            fw.u(0, 1)
            fw.s(int(chunk[0]), 16)
        else:
            fw.u(0, 1)
            fw.u(1, 6)       # VERBATIM
            fw.u(0, 1)
            for v in chunk:
                fw.s(int(v), 16)
        fw.align()
        body = bytes(fw.out)
        fw.u(_flac_crc16(body), 16)
        frames += fw.out
    return head + bytes(frames)


# ---------------------------------------------------------------------------
# stub fallback (codecs whose libraries this container lacks)
# ---------------------------------------------------------------------------

def _decode_image_stub(payload: bytes) -> tuple[int, int, np.ndarray]:
    """STUB fallback for non-netpbm/BMP/PNG/JPEG images (real path:
    PIL.Image.open — TIFF/WebP and friends need codec libs this container
    lacks).
    Derives deterministic (w, h, pixels) from the payload bytes so the
    downstream feature math stays exercised for opaque fixtures."""
    h64 = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    w, h = 16 + h64 % 48, 16 + (h64 >> 8) % 48
    rng = np.random.default_rng(h64 % (2**32))
    return w, h, rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def _decode_audio_stub(payload: bytes) -> tuple[np.ndarray, int]:
    """STUB fallback for non-WAV/FLAC audio (real path for MP3 and
    friends: soundfile/librosa, absent in this container)."""
    h64 = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    rng = np.random.default_rng(h64 % (2**32))
    n = 1000 + h64 % 4000
    return rng.standard_normal(n).astype(np.float32), 16000


def _decode_image(payload: bytes) -> tuple[int, int, np.ndarray]:
    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")
    if payload[:2] in (b"P5", b"P6"):
        return decode_netpbm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    return _decode_image_stub(payload)


def _decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    if payload[:4] == b"fLaC":
        return decode_flac(payload)
    return _decode_audio_stub(payload)


# malformed-media errors that mean "skip this row", not "kill the job":
# wave raises wave.Error/EOFError on non-WAV RIFF containers (AVI, WebP and
# corrupt WAVs all start with b"RIFF"), numpy raises ValueError on truncated
# rasters
_DECODE_ERRORS = (ValueError, EOFError, wave.Error)


# ---------------------------------------------------------------------------
# feature extraction over mapInPandas (Arrow batches)
# ---------------------------------------------------------------------------

def extract_image_features(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Decode + feature-extract images via mapInPandas: dimensions, mean
    luma, and an 8-bin normalized luma histogram as the feature vector."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, px = _decode_image(payload)
                except _DECODE_ERRORS:
                    continue
                hist = np.histogram(px, bins=8, range=(0, 256))[0].astype(np.float32)
                rows.append(
                    (int(mid), int(w), int(h), int(len(payload)), float(px.mean()),
                     (hist / max(1.0, hist.sum())).tolist())
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "mean_luma", "feature"]
            )

    return df.select("media_id", "payload").mapInPandas(op, schema=IMAGE_FEATURES_DDL)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract audio: sample count, container sample rate,
    duration and RMS amplitude of the decoded waveform."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    pcm, sr = _decode_audio(payload)
                except _DECODE_ERRORS:
                    continue
                rows.append(
                    (int(mid), len(pcm), int(sr), len(pcm) / sr,
                     float(np.sqrt((pcm**2).mean())) if len(pcm) else 0.0)
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_samples", "sample_rate", "duration_s", "rms"]
            )

    return df.select("media_id", "payload").mapInPandas(op, schema=AUDIO_FEATURES_DDL)


VIDEO_FRAMES_DDL = (
    "media_id long, frame_idx int, n_frames int, width int, height int, "
    "mean_luma double"
)


def extract_video_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """REAL frame sampling for RIFF/AVI MJPEG payloads: mapInPandas →
    container walk → one row per every_n-th frame with its decoded luma
    mean.  Only the SAMPLED frames are fully JPEG-decoded (MJPEG frames are
    independent; at every_n=30 that is a 30× entropy-decode saving — the
    part of this operator that must survive a 100-TB corpus); every OTHER
    frame still gets the header-only `_jpeg_dims` probe, so the per-row
    contract matches `decode_avi_mjpeg`: a non-JPEG chunk anywhere (e.g. a
    raw-DIB '00db' stream) or dimensions varying mid-stream skip the whole
    row instead of silently emitting a partial/inconsistent media.
    `sample_video_frames` remains the decode-free fan-out shape for opaque
    payloads whose codec libs this container lacks."""
    if every_n < 1:
        # validate HERE, not per-row: inside the decode loop range()'s
        # ValueError would be swallowed by the skip-path and silently drop
        # every row of the corpus
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    blobs = _avi_stream_blobs(bytes(payload))
                    if len({_jpeg_dims(b) for b in blobs}) != 1:
                        raise ValueError("AVI frame dimensions vary mid-stream")
                    sampled = [(idx, decode_jpeg(blobs[idx]))
                               for idx in range(0, len(blobs), every_n)]
                except _DECODE_ERRORS:
                    continue
                for idx, (w, h, luma) in sampled:
                    rows.append((int(mid), idx, len(blobs), w, h,
                                 float(luma.mean())))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "n_frames",
                               "width", "height", "mean_luma"])

    return df.select("media_id", "payload").mapInPandas(
        op, schema=VIDEO_FRAMES_DDL)


def sample_video_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plumbing: video blob → one row per sampled frame index.

    Decode-free by design (frame count derived from payload size): this is
    the fan-out shape for OPAQUE video payloads; `extract_video_frames` is
    the real decode path for MJPEG AVI.  The explode/partitioning shape —
    one input row fanning out to many frame rows — is the real pipeline
    shape either way.
    """
    n_frames = (F.length("payload") / 100 + 1).cast("int")
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"),
        )
    )


# ---------------------------------------------------------------------------
# fixture: REAL encoded payloads, generated distributed
# ---------------------------------------------------------------------------

def _encode_media_row(mid: int, seed: int = 3) -> tuple[str, str, bytes]:
    """Deterministic per-(seed, id) media payload: real rasters for images
    (PGM/BMP/PNG/JPEG rotation), real 16-bit sines for audio (WAV/FLAC
    rotation), and for video alternating real MJPEG AVI clips and opaque
    bytes (the opaque rows keep the stub fan-out path exercised)."""
    kind = ("image", "audio", "video")[mid % 3]
    if kind == "image":
        w, h = 16 + (mid * 7) % 48, 16 + (mid * 13) % 48
        rng = np.random.default_rng([seed, mid])
        # rotate the four real raster codecs so the mapInPandas path
        # exercises every dispatch branch (PNG also rotates its filter
        # type; JPEG rotates its restart interval)
        variant = (mid // 3) % 4
        if variant == 1:
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            return kind, "image/bmp", encode_bmp(px)
        if variant == 2:
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            return kind, "image/png", encode_png(px, filter_type=mid % 5)
        if variant == 3:
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            return kind, "image/jpeg", encode_jpeg_baseline(
                px, quant=1, restart_interval=mid % 5)
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        return kind, "image/x-portable-graymap", encode_pgm(px)
    if kind == "audio":
        sr = 8000
        n = 1000 + (mid * 37 + seed * 101) % 4000
        t = np.arange(n, dtype=np.float32) / sr
        pcm = 0.5 * np.sin(2 * np.pi * (50.0 + mid + seed) * t)
        if (mid // 3) % 2 == 1:
            # rotate the lossless codecs (and FLAC's two subframe shapes)
            sf = "fixed" if (mid // 6) % 2 else "verbatim"
            return kind, "audio/flac", encode_flac(pcm, sr, subframe=sf)
        return kind, "audio/wav", encode_wav(pcm, sr)
    rng = np.random.default_rng([seed, mid + 7])
    if (mid // 3) % 2 == 0:
        # real MJPEG AVI: a short gradient+noise clip, one JPEG per frame
        n_frames = 3 + mid % 4
        w, h = 16 + (mid * 5) % 24, 16 + (mid * 11) % 24
        base = rng.integers(0, 200, size=(h, w), dtype=np.uint8)
        frames = [np.clip(base.astype(np.int32) + 8 * i, 0, 255)
                  .astype(np.uint8) for i in range(n_frames)]
        return kind, "video/x-msvideo", encode_avi_mjpeg(frames, fps=5)
    return kind, "application/octet-stream", rng.bytes(32 + mid % 64)


def make_media_fixture(spark, n: int = 64, seed: int = 3) -> DataFrame:
    """Deterministic media table with genuinely-encoded payloads, built
    distributed via mapInPandas over a range (no driver-side row list);
    different seeds give decorrelated payloads over the same ids."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                kind, mime, payload = _encode_media_row(int(mid), seed)
                rows.append((int(mid), kind, mime, payload, {"src": "synthetic"}))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "mime", "payload", "meta"]
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)
