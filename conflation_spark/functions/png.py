"""Pure-stdlib PNG codec (zlib + struct + numpy) — no PIL dependency.

The multimodal image path (`operators/multimodal.py`) decodes real image
bytes inside a `mapInPandas` kernel. This container has no PIL/turbojpeg,
so the decoder here implements the PNG spec directly: chunk framing with
CRC verification, IHDR parsing, IDAT inflate (`zlib`), and the five
scanline filters (None/Sub/Up/Average/Paeth) unfiltered with numpy.
Supported: 8-bit greyscale (color type 0) and 8-bit RGB (color type 2),
non-interlaced — exactly what the fixture encoder emits and what a
feature-extraction pass needs.

The encoder exists so `datagen_text.gen_media_blobs` can plant REAL PNGs
(with per-row ground truth computed from the source pixels) into the
fixture; it cycles through all five filter types row by row so every
decoder unfilter path is exercised by the fixture itself, not just by
unit tests.

Reference analog: every trace point in the reference IS an image
(Mapillary image ids, /root/reference/conflation/trace_fetching/mapillary.py:41,448-456);
the reference fetches and stores them but never decodes — decoding is the
capability a training-data pipeline adds on top.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

FEATURE_GRID = 4  # 4x4 cells -> 16-dim feature


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a byte vector (a=left, b=up, c=upleft)."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa = np.abs(p - a16)
    pb = np.abs(p - b16)
    pc = np.abs(p - c16)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)).astype(
        np.uint8
    )


def encode_png(arr: np.ndarray, filter_mode: str = "cycle") -> bytes:
    """uint8 array (h, w) grey or (h, w, 3) RGB -> PNG bytes.

    ``filter_mode='cycle'`` applies filter type ``y % 5`` to row y (all five
    spec filters appear in any image with >= 5 rows); ``'none'`` uses
    filter 0 everywhere.
    """
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, nch = 0, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, nch = 2, 3
    else:
        raise ValueError(f"unsupported array shape {arr.shape}; want (h,w) or (h,w,3)")
    h, w = arr.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    raw = arr.reshape(h, w * nch)
    bpp = nch
    out_lines = []
    prev = np.zeros(w * nch, dtype=np.uint8)
    zero_lead = np.zeros(bpp, dtype=np.uint8)
    for y in range(h):
        row = raw[y]
        ft = (y % 5) if filter_mode == "cycle" else 0
        left = np.concatenate([zero_lead, row[:-bpp]]) if row.size > bpp else np.zeros_like(row)
        upleft = np.concatenate([zero_lead, prev[:-bpp]]) if row.size > bpp else np.zeros_like(row)
        if ft == 0:
            f = row
        elif ft == 1:
            f = row - left  # uint8 wraps == mod 256, per spec
        elif ft == 2:
            f = row - prev
        elif ft == 3:
            f = row - ((left.astype(np.uint16) + prev.astype(np.uint16)) // 2).astype(np.uint8)
        else:
            f = row - _paeth(left, prev, upleft)
        out_lines.append(bytes([ft]) + f.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(out_lines), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w) for greyscale, (h, w, 3) for RGB.

    Verifies the signature and every chunk CRC; supports bit depth 8,
    color types 0 (grey) and 2 (RGB), no interlace. Raises ValueError on
    anything else (truncated stream, bad CRC, unsupported format).
    """
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise ValueError("decode_png wants bytes")
    data = bytes(data)
    if len(data) < len(_PNG_SIG) or data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = len(_PNG_SIG)
    width = height = nch = None
    idat = bytearray()
    seen_end = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated PNG: chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body_end = pos + 8 + length
        if body_end + 4 > len(data):
            raise ValueError("truncated PNG: chunk body")
        payload = data[pos + 8 : body_end]
        (crc,) = struct.unpack(">I", data[body_end : body_end + 4])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or color_type not in (0, 2) or comp or filt or interlace:
                raise ValueError(
                    "unsupported PNG: need 8-bit grey/RGB non-interlaced, got "
                    f"depth={depth} color_type={color_type} interlace={interlace}"
                )
            nch = 1 if color_type == 0 else 3
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            seen_end = True
            break
        pos = body_end + 4
    if width is None or not seen_end:
        raise ValueError("truncated PNG: missing IHDR or IEND")
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise ValueError("corrupt PNG: decompressed size mismatch")
    flt = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = nch
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ft = int(flt[y, 0])
        f = flt[y, 1:]
        if ft == 0:
            rec = f.copy()
        elif ft == 2:
            rec = f + prev
        elif ft == 1:
            # rec[x] = f[x] + rec[x-1] per channel: addition is associative
            # mod 256, so a cumulative sum masked to a byte is exact
            rec = (
                np.cumsum(f.reshape(width, bpp).astype(np.uint64), axis=0) & 0xFF
            ).astype(np.uint8).reshape(stride)
        elif ft == 3:
            rec = np.empty(stride, dtype=np.uint8)
            fr = f.reshape(width, bpp)
            pr = prev.reshape(width, bpp)
            rr = rec.reshape(width, bpp)
            left = np.zeros(bpp, dtype=np.uint16)
            for x in range(width):
                rr[x] = fr[x] + ((left + pr[x].astype(np.uint16)) // 2).astype(np.uint8)
                left = rr[x].astype(np.uint16)
        elif ft == 4:
            rec = np.empty(stride, dtype=np.uint8)
            fr = f.reshape(width, bpp)
            pr = prev.reshape(width, bpp)
            rr = rec.reshape(width, bpp)
            left = np.zeros(bpp, dtype=np.uint8)
            upleft = np.zeros(bpp, dtype=np.uint8)
            for x in range(width):
                rr[x] = fr[x] + _paeth(left, pr[x], upleft)
                left = rr[x]
                upleft = pr[x]
        else:
            raise ValueError(f"corrupt PNG: filter type {ft}")
        out[y] = rec
        prev = rec
    return out.reshape(height, width) if nch == 1 else out.reshape(height, width, 3)


def image_feature_grid(arr: np.ndarray) -> np.ndarray:
    """16-dim feature: mean of pixel/255 over a FEATURE_GRID x FEATURE_GRID
    cell grid, channels pooled. Pure float64 numpy — the fixture generator
    runs this on the SOURCE pixels and the Spark kernel on the DECODED
    pixels; PNG is lossless, so a correct decoder reproduces the planted
    truth bit-for-bit (same shapes, same reduction order)."""
    a = np.asarray(arr, dtype=np.float64) / 255.0
    if a.ndim == 2:
        a = a[:, :, None]
    feats = []
    for band in np.array_split(a, FEATURE_GRID, axis=0):
        for cell in np.array_split(band, FEATURE_GRID, axis=1):
            feats.append(cell.mean() if cell.size else 0.0)
    return np.asarray(feats, dtype=np.float64)


def quantize_feature(feat: np.ndarray) -> np.ndarray:
    """Integerize at 1e-6 (floor(x*1e6 + 0.5), the repo's oracle-parity
    rule) — mirrored by the Spark-side projection so the DuckDB twin
    compares longs, never raw doubles."""
    return np.floor(np.asarray(feat, dtype=np.float64) * 1e6 + 0.5).astype(np.int64)
