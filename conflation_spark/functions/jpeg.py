"""Pure-numpy baseline JPEG codec (ITU-T T.81 sequential DCT) — no
PIL/libjpeg dependency.

Real corpora are mostly JPEG, not PNG; this closes the compressed-image
half of the multimodal seam (`operators/multimodal.py`): marker parsing
(SOI/DQT/SOF0/DHT/SOS/DRI/EOI), canonical Huffman decoding (the spec's
mincode/maxcode algorithm), dequantization, batched 8x8 inverse DCT, and
JFIF YCbCr->RGB. Supported: 8-bit baseline (SOF0) AND progressive
(SOF2 — spectral selection and successive approximation, DC and AC
first/refinement scans with EOB runs per T.81 G.1.2), 1 or 3
components, sampling factors 1/2/4 per axis (covers 4:4:4, 4:2:0,
4:2:2 — chroma upsampled by replication), interleaved and
non-interleaved scan layouts, optional restart markers. Hierarchical
(SOF3+) and arithmetic-coded streams raise ValueError — honest limits,
stated.

The encoder exists so `datagen_text.gen_jpeg_blobs` can plant REAL
JPEGs with per-row ground truth computed from the SOURCE pixels. Unlike
PNG, JPEG is LOSSY: the decoded feature matches the planted truth only
within a tolerance (the IDCT+quantization error), so the oracle row is a
tolerance gate (`jpeg_feat_ok`), not a bit-equality — see
`operators/multimodal.decode_jpeg_image` and the `jpeg_features` query.

Self-consistency caveat (documented, not hidden): with no independent
JPEG implementation in this container, a symmetric encoder/decoder bug
could in principle cancel in round-trip tests. The transform core is
therefore pinned INDEPENDENTLY: tests check the fast matrix DCT against
the textbook DCT-II double sum and the zigzag table against the spec's
published prefix, and all quantization/Huffman tables are the public
Annex K constants byte-for-byte, so any misread of them produces garbage
rather than a cancelling error.

Reference analog: the reference stores Mapillary image ids and never
decodes (/root/reference/conflation/trace_fetching/mapillary.py:41,448-456);
decoding is the training-data capability added on top.
"""

from __future__ import annotations

import struct

import numpy as np

# ITU-T T.81 Annex K.1 — example quantization tables (the de-facto
# standard every encoder scales by quality)
QT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
QT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# zigzag scan: ZIGZAG[i] = raster index of the i-th coefficient in scan order
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.3 — typical Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """8x8 DCT-II basis: C[k, n] = a(k) cos((2n+1) k pi / 16); the forward
    transform of a block X is C @ X @ C.T (orthonormal — the inverse is
    the transpose pair). Tests pin this against the textbook double sum."""
    n = np.arange(8)
    k = n[:, None]
    c = np.cos((2 * n[None, :] + 1) * k * np.pi / 16.0)
    c *= np.sqrt(2.0 / 8.0)
    c[0] *= np.sqrt(0.5)
    return c


_C = _dct_matrix()


def dct2_blocks(blocks: np.ndarray) -> np.ndarray:
    """Forward 2-D DCT over a (N, 8, 8) float array, batched."""
    return np.einsum("ij,njk,lk->nil", _C, blocks, _C, optimize=True)


def idct2_blocks(coefs: np.ndarray) -> np.ndarray:
    """Inverse 2-D DCT over a (N, 8, 8) float array, batched."""
    return np.einsum("ji,njk,kl->nil", _C, coefs, _C, optimize=True)


def scaled_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 5000/q below 50, 200-2q above; entries
    clamped to [1, 255] (baseline requires 8-bit table values)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    a = arr.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[vi]] = (code, length)
            code += 1
            vi += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)

    def emit_restart(self, idx: int) -> None:
        """Pad to a byte boundary and splice an RSTm marker into the
        entropy stream (marker bytes are raw — never byte-stuffed)."""
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (idx & 7)])


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def _mag_bits(v: int, cat: int) -> int:
    return v if v >= 0 else v + (1 << cat) - 1


def _encode_blocks(
    writer: _BitWriter,
    qcoefs: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    prev_dc: int,
) -> int:
    """Entropy-encode a run of zigzagged quantized blocks (N, 64) of one
    component; returns the last DC value for the predictor chain."""
    for blk in qcoefs:
        diff = int(blk[0]) - prev_dc
        prev_dc = int(blk[0])
        cat = _category(diff)
        code, ln = dc_codes[cat]
        writer.write(code, ln)
        if cat:
            writer.write(_mag_bits(diff, cat), cat)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = int(nz[-1]) + 1 if nz.size else 0
        for i in range(1, last + 1):
            v = int(blk[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]  # ZRL
                writer.write(code, ln)
                run -= 16
            cat = _category(v)
            code, ln = ac_codes[(run << 4) | cat]
            writer.write(code, ln)
            writer.write(_mag_bits(v, cat), cat)
            run = 0
        if last < 63:
            code, ln = ac_codes[0x00]  # EOB
            writer.write(code, ln)
    return prev_dc


def _to_block_grid(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """(H, W) -> (bh, bw, 8, 8) block grid, edge-padded to bh*8 x bw*8."""
    h, w = plane.shape
    p = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    return p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)


def _downsample2(plane: np.ndarray) -> np.ndarray:
    """2x2 mean chroma downsample (edge-padded to even dims first)."""
    h, w = plane.shape
    p = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
    return p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _prepare_encode(arr: np.ndarray, quality: int, subsampling: str):
    """Shared front half of both encoders: color transform, optional
    chroma downsample, DCT + quantization. Returns (qgrids, samp, ncomp,
    hmax, vmax, mcux, mcuy, qt, h, w) with qgrids per component shaped
    (bh_i, bw_i, 64) in zigzag order."""
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        ncomp = 1
        planes = [arr.astype(np.float64)]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        ncomp = 3
        ycc = _rgb_to_ycbcr(arr)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    else:
        raise ValueError(f"unsupported array shape {arr.shape}; want (h,w) or (h,w,3)")
    h, w = arr.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    sub420 = subsampling == "420" and ncomp == 3
    # (h_i, v_i) sampling factors per component
    samp = [(2, 2), (1, 1), (1, 1)] if sub420 else [(1, 1)] * ncomp
    if sub420:
        planes = [planes[0], _downsample2(planes[1]), _downsample2(planes[2])]
    hmax = max(s[0] for s in samp[:ncomp])
    vmax = max(s[1] for s in samp[:ncomp])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qt = [scaled_qtable(QT_LUMA, quality), scaled_qtable(QT_CHROMA, quality)]
    qgrids = []
    for ci in range(ncomp):
        hi, vi = samp[ci]
        bh, bw = mcuy * vi, mcux * hi
        tq = qt[0] if ci == 0 else qt[1]
        blocks = _to_block_grid(planes[ci], bh, bw).reshape(-1, 8, 8)
        coefs = dct2_blocks(blocks - 128.0)
        q = np.round(coefs / tq[None, :, :]).astype(np.int32)
        qgrids.append(q.reshape(bh, bw, 64)[:, :, ZIGZAG])
    return qgrids, samp, ncomp, hmax, vmax, mcux, mcuy, qt, h, w


def _emit_frame_headers(
    out: bytearray, qt, ncomp: int, samp, h: int, w: int, sof_marker: int
) -> None:
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid in range(2 if ncomp == 3 else 1):
        zz = qt[tid].reshape(64)[ZIGZAG].astype(np.uint8)
        out += _seg(0xFFDB, bytes([tid]) + zz.tobytes())
    comp_spec = b"".join(
        bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0 if ci == 0 else 1])
        for ci in range(ncomp)
    )
    out += _seg(sof_marker, struct.pack(">BHHB", 8, h, w, ncomp) + comp_spec)


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    interleave: bool = True,
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) grey or (h, w, 3) RGB -> baseline JFIF JPEG bytes
    (Annex K quantization scaled by ``quality``, Annex K Huffman).
    ``subsampling``: "444" (no chroma subsampling) or "420" (2x2 luma
    sampling, the dominant real-world layout; grey input ignores it).
    ``interleave=False`` emits one single-component SOS per component
    (the non-interleaved multi-scan layout); ``restart_interval`` > 0
    emits DRI + RSTn markers every that many MCUs with DC-predictor
    resets — both exist mainly to exercise the decoder's paths with
    genuinely different streams."""
    qgrids, samp, ncomp, hmax, vmax, mcux, mcuy, qt, h, w = _prepare_encode(
        arr, quality, subsampling
    )
    out = bytearray(b"\xff\xd8")  # SOI
    _emit_frame_headers(out, qt, ncomp, samp, h, w, 0xFFC0)
    tables = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if ncomp == 3:
        tables += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc, bits, vals in tables:
        out += _seg(0xFFC4, bytes([tc]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    if interleave:
        scan_spec = b"".join(
            bytes([ci + 1, 0x00 if ci == 0 else 0x11]) for ci in range(ncomp)
        )
        out += _seg(0xFFDA, bytes([ncomp]) + scan_spec + b"\x00\x3f\x00")
        # interleaved MCUs: per MCU each component contributes its
        # v_i x h_i blocks in raster order (T.81 A.2.3)
        writer = _BitWriter()
        prev = [0] * ncomp
        rst = 0
        for mcu in range(mcux * mcuy):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.emit_restart(rst)
                rst += 1
                prev = [0] * ncomp
            my, mx = divmod(mcu, mcux)
            for ci in range(ncomp):
                hi, vi = samp[ci]
                dc, ac = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for by in range(vi):
                    for bx in range(hi):
                        blk = qgrids[ci][my * vi + by, mx * hi + bx]
                        prev[ci] = _encode_blocks(
                            writer, blk[None, :], dc, ac, prev[ci]
                        )
        out += writer.flush()
    else:
        # non-interleaved: one single-component scan per component over
        # its OWN block grid (T.81 A.2.2); DC predictor resets per scan
        for ci in range(ncomp):
            hi, vi = samp[ci]
            cw, ch = -(-w * hi // hmax), -(-h * vi // vmax)
            bw_n, bh_n = -(-cw // 8), -(-ch // 8)
            out += _seg(
                0xFFDA, bytes([1, ci + 1, 0x00 if ci == 0 else 0x11]) + b"\x00\x3f\x00"
            )
            writer = _BitWriter()
            dc, ac = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            pred = 0
            rst = 0
            for bi in range(bh_n * bw_n):
                if restart_interval and bi and bi % restart_interval == 0:
                    writer.emit_restart(rst)
                    rst += 1
                    pred = 0
                by, bx = divmod(bi, bw_n)
                pred = _encode_blocks(
                    writer, qgrids[ci][by, bx][None, :], dc, ac, pred
                )
            out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# default progressive scan script (libjpeg's shape): DC first at Al=1,
# luma AC split into two spectral bands at Al=2, chroma AC at Al=1, a
# luma 2->1 refinement, the DC refinement, then all 1->0 AC refinements
_PROG_SCRIPT_COLOR = [
    ("dc", [0, 1, 2], 0, 0, 0, 1),
    ("ac", 0, 1, 5, 0, 2),
    ("ac", 2, 1, 63, 0, 1),
    ("ac", 1, 1, 63, 0, 1),
    ("ac", 0, 6, 63, 0, 2),
    ("ac", 0, 1, 63, 2, 1),
    ("dc", [0, 1, 2], 0, 0, 1, 0),
    ("ac", 2, 1, 63, 1, 0),
    ("ac", 1, 1, 63, 1, 0),
    ("ac", 0, 1, 63, 1, 0),
]
_PROG_SCRIPT_GRAY = [
    ("dc", [0], 0, 0, 0, 1),
    ("ac", 0, 1, 5, 0, 2),
    ("ac", 0, 6, 63, 0, 2),
    ("ac", 0, 1, 63, 2, 1),
    ("dc", [0], 0, 0, 1, 0),
    ("ac", 0, 1, 63, 1, 0),
]


def encode_jpeg_progressive(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) grey or (h, w, 3) RGB -> PROGRESSIVE (SOF2) JFIF
    bytes: spectral selection + successive approximation per the
    libjpeg-shaped default scan script (DC-first at reduced precision,
    banded AC first passes, then refinement scans down to full
    precision). Quantized coefficients are IDENTICAL to the sequential
    encoder's, so `decode_jpeg` must reproduce the sequential stream's
    pixels exactly (the property tests rely on this). DC scans use the
    Annex K DC tables; AC scans use a flat 256-symbol table because the
    sequential AC tables lack the EOBn symbols EOB runs need.
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    data units in every scan (EOB runs and predictors flush/reset at
    each boundary, the T.81 interaction worth testing)."""
    qgrids, samp, ncomp, hmax, vmax, mcux, mcuy, qt, h, w = _prepare_encode(
        arr, quality, subsampling
    )
    out = bytearray(b"\xff\xd8")
    _emit_frame_headers(out, qt, ncomp, samp, h, w, 0xFFC2)
    tables = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, FLAT_AC_BITS, FLAT_AC_VALS)]
    if ncomp == 3:
        tables.append((0x01, DC_CHROMA_BITS, DC_CHROMA_VALS))
    for tc, bits, vals in tables:
        out += _seg(0xFFC4, bytes([tc]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    dc_codes = [
        _build_codes(DC_LUMA_BITS, DC_LUMA_VALS),
        _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    ac_codes = _build_codes(FLAT_AC_BITS, FLAT_AC_VALS)
    script = _PROG_SCRIPT_COLOR if ncomp == 3 else _PROG_SCRIPT_GRAY
    for kind, who, ss, se, ah, al in script:
        writer = _BitWriter()
        if kind == "dc":
            comp_ids = list(who)
            spec = b"".join(
                bytes([ci + 1, 0x00 if ci == 0 else 0x10]) for ci in comp_ids
            )
            out += _seg(
                0xFFDA,
                bytes([len(comp_ids)]) + spec + bytes([ss, se, (ah << 4) | al]),
            )
            pred = {ci: 0 for ci in comp_ids}
            rst = 0
            for mcu in range(mcux * mcuy):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    writer.emit_restart(rst)
                    rst += 1
                    pred = {ci: 0 for ci in comp_ids}
                my, mx = divmod(mcu, mcux)
                for ci in comp_ids:
                    hi, vi = samp[ci]
                    codes = dc_codes[0] if ci == 0 else dc_codes[1]
                    for by in range(vi):
                        for bx in range(hi):
                            v = int(qgrids[ci][my * vi + by, mx * hi + bx, 0])
                            if ah == 0:
                                sh = v >> al  # arithmetic shift, matches decode
                                diff = sh - pred[ci]
                                pred[ci] = sh
                                cat = _category(diff)
                                code, ln = codes[cat]
                                writer.write(code, ln)
                                if cat:
                                    writer.write(_mag_bits(diff, cat), cat)
                            else:
                                writer.write((v >> al) & 1, 1)
        else:
            ci = who
            hi, vi = samp[ci]
            cw, ch = -(-w * hi // hmax), -(-h * vi // vmax)
            bw_n, bh_n = -(-cw // 8), -(-ch // 8)
            out += _seg(
                0xFFDA,
                bytes([1, ci + 1, 0x00]) + bytes([ss, se, (ah << 4) | al]),
            )
            st = _ProgScanState()
            enc = _encode_ac_first_block if ah == 0 else _encode_ac_refine_block
            rst = 0
            for bi in range(bw_n * bh_n):
                if restart_interval and bi and bi % restart_interval == 0:
                    # pending EOB run + owed correction bits cannot cross
                    # a restart boundary — flush, then mark
                    _emit_eobrun(writer, ac_codes, st)
                    writer.emit_restart(rst)
                    rst += 1
                by, bx = divmod(bi, bw_n)
                enc(writer, ac_codes, qgrids[ci][by, bx], ss, se, al, st)
            _emit_eobrun(writer, ac_codes, st)
        out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)


# flat 256-symbol Huffman table for progressive AC scans: 255 symbols at
# 8 bits + one at 9. The Annex K sequential AC tables lack the EOBn
# symbols (r<<4 | 0 for r=1..14) progressive EOB runs need; compression
# optimality is irrelevant here (fixtures/tests), validity is not.
FLAT_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0]
FLAT_AC_VALS = list(range(256))


class _ProgScanState:
    """Encoder-side EOB-run state for one progressive AC scan: the
    accumulated end-of-band run plus the correction bits owed after the
    next flushed symbol (T.81 G.1.2.2 / libjpeg BE buffer)."""

    def __init__(self) -> None:
        self.eobrun = 0
        self.pending: list[int] = []


def _emit_eobrun(writer: _BitWriter, ac_codes: dict, st: _ProgScanState) -> None:
    if st.eobrun:
        r = st.eobrun.bit_length() - 1
        code, ln = ac_codes[r << 4]
        writer.write(code, ln)
        if r:
            writer.write(st.eobrun - (1 << r), r)
        st.eobrun = 0
    for b in st.pending:
        writer.write(b, 1)
    st.pending = []


def _encode_ac_first_block(
    writer: _BitWriter, ac_codes: dict, blk, ss: int, se: int, al: int, st: _ProgScanState
) -> None:
    r = 0
    for k in range(ss, se + 1):
        t = int(blk[k])
        t2 = abs(t) >> al
        if t2 == 0:
            r += 1
            continue
        _emit_eobrun(writer, ac_codes, st)
        while r > 15:
            code, ln = ac_codes[0xF0]
            writer.write(code, ln)
            r -= 16
        cat = t2.bit_length()
        code, ln = ac_codes[(r << 4) | cat]
        writer.write(code, ln)
        v = t2 if t > 0 else -t2
        writer.write(_mag_bits(v, cat), cat)
        r = 0
    if r > 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            _emit_eobrun(writer, ac_codes, st)


def _encode_ac_refine_block(
    writer: _BitWriter, ac_codes: dict, blk, ss: int, se: int, al: int, st: _ProgScanState
) -> None:
    # index of the LAST newly-significant coefficient: zero runs beyond
    # it fold into the EOB run instead of costing ZRLs (libjpeg's EOB)
    eobpos = ss - 1
    for k in range(ss, se + 1):
        if (abs(int(blk[k])) >> al) == 1:
            eobpos = k
    r = 0
    br: list[int] = []
    for k in range(ss, se + 1):
        t = int(blk[k])
        t2 = abs(t) >> al
        if t2 == 0:
            r += 1
            continue
        while r > 15 and k <= eobpos:
            _emit_eobrun(writer, ac_codes, st)
            code, ln = ac_codes[0xF0]
            writer.write(code, ln)
            r -= 16
            for b in br:
                writer.write(b, 1)
            br = []
        if t2 > 1:
            br.append(t2 & 1)  # correction bit of an already-significant coef
            continue
        _emit_eobrun(writer, ac_codes, st)
        code, ln = ac_codes[(r << 4) | 1]
        writer.write(code, ln)
        writer.write(1 if t > 0 else 0, 1)
        for b in br:
            writer.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        st.eobrun += 1
        st.pending.extend(br)
        if st.eobrun == 0x7FFF:
            _emit_eobrun(writer, ac_codes, st)


class _HuffTable:
    """Canonical Huffman decoder state (T.81 F.2.2.3: MINCODE/MAXCODE/
    VALPTR per code length) — O(length) per symbol, no bit-tree walk."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        vi = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = vi
                self.mincode[length] = code
                code += bits[length - 1]
                vi += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self._acc = 0
        self._nbits = 0

    def read_bit(self) -> int:
        if self._nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG: entropy data exhausted")
            self._acc = self.data[self.pos]
            self.pos += 1
            self._nbits = 8
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        self._nbits = 0

    def decode_symbol(self, t: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if t.maxcode[length] >= 0 and code <= t.maxcode[length]:
                return t.vals[t.valptr[length] + code - t.mincode[length]]
        raise ValueError("corrupt JPEG: invalid Huffman code")


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _collect_entropy(data: bytes, start: int) -> tuple[bytes, int]:
    """Entropy-coded bytes from ``start`` to the next real marker:
    un-stuffs FF00, keeps RSTn inline for the reader, returns (entropy,
    position of the terminating marker)."""
    entropy = bytearray()
    p = start
    while p < len(data):
        b = data[p]
        if b == 0xFF:
            nxt = data[p + 1] if p + 1 < len(data) else None
            if nxt == 0x00:
                entropy.append(0xFF)
                p += 2
                continue
            if nxt is not None and 0xD0 <= nxt <= 0xD7:
                entropy.append(0xFF)  # keep RST marker inline for the reader
                entropy.append(nxt)
                p += 2
                continue
            break  # EOI or another marker ends the scan
        entropy.append(b)
        p += 1
    return bytes(entropy), p


def _decode_block(reader: _BitReader, dc_t: _HuffTable, ac_t: _HuffTable, blk, pred: int) -> int:
    """One 8x8 data unit into a 64-length zigzag buffer; returns the
    updated DC predictor."""
    cat = reader.decode_symbol(dc_t)
    diff = _extend(reader.read_bits(cat), cat) if cat else 0
    pred += diff
    blk[0] = pred
    k = 1
    while k < 64:
        rs = reader.decode_symbol(ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("corrupt JPEG: AC index past 63")
        blk[k] = _extend(reader.read_bits(s), s)
        k += 1
    return pred


def _prog_ac_first_block(
    reader: _BitReader, ac_t: _HuffTable, blk, ss: int, se: int, al: int, eobrun: int
) -> int:
    """Progressive AC first pass (Ah=0) for one block; returns the
    updated end-of-band run (blocks wholly inside the run are skipped)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_symbol(ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                eb = (1 << r) - 1
                if r:
                    eb += reader.read_bits(r)
                return eb
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("corrupt JPEG: AC index past band end")
            blk[k] = _extend(reader.read_bits(s), s) << al
            k += 1
    return 0


def _prog_ac_refine_block(
    reader: _BitReader, ac_t: _HuffTable, blk, ss: int, se: int, al: int, eobrun: int
) -> int:
    """Progressive AC refinement (Ah>0) for one block (T.81 G.1.2.3 /
    libjpeg decode_mcu_AC_refine): newly-significant coefficients arrive
    as (run, 1) symbols with a sign bit; every already-significant
    coefficient passed — including those in blocks wholly inside an EOB
    run — consumes one correction bit."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(ac_t)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("corrupt JPEG: refinement size != 1")
                val = p1 if reader.read_bit() else -p1
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if reader.read_bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s:
                if k > se:
                    raise ValueError("corrupt JPEG: refinement run past band end")
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(blk[k])
            if c != 0:
                if reader.read_bit() and (c & p1) == 0:
                    blk[k] = c + (p1 if c >= 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


def _maybe_restart(reader: _BitReader, unit: int, interval: int) -> bool:
    """Handle a restart boundary before decoding unit ``unit``; True if
    the DC predictors must reset."""
    if interval and unit and unit % interval == 0:
        reader.byte_align()
        if (
            reader.pos + 1 < len(reader.data)
            and reader.data[reader.pos] == 0xFF
            and 0xD0 <= reader.data[reader.pos + 1] <= 0xD7
        ):
            reader.pos += 2
        return True
    return False


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline or progressive JPEG bytes -> uint8 (h, w) grey or
    (h, w, 3) RGB.

    Parses DQT/SOF0|SOF2/DHT/SOS/DRI and Huffman-decodes EVERY scan:
    sequential interleaved (per MCU each component contributes its
    v_i x h_i data units), sequential non-interleaved single-component
    scans, and the full progressive family — DC first/refinement scans
    (interleaved or per-component) and AC spectral-band first/refinement
    scans with EOB runs (T.81 G.1.2, libjpeg-compatible bit order); then
    dequantizes, batched IDCT, replication chroma upsample, JFIF color
    conversion. Raises ValueError on hierarchical/arithmetic streams,
    bit depths != 8, scans that do not cover every component, or
    corrupt entropy data."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise ValueError("decode_jpeg wants bytes")
    data = bytes(data)
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, _HuffTable] = {}
    restart_interval = 0
    h = w = None
    hmax = vmax = mcux = mcuy = 0
    progressive = False
    comps: list[tuple[int, int, tuple[int, int]]] = []  # (id, qtable, (hi, vi))
    grids = None  # per-component zigzag coefficient grids (bh_i, bw_i, 64)
    covered: set[int] = set()  # component indexes some scan has decoded
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at {pos}")
        if data[pos + 1] == 0xFF:  # legal fill byte before a marker (B.1.1.2)
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI / RSTn: no payload
            pos += 2
            continue
        if marker == 0xD9:
            break  # EOI; coverage validated below
        (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + seg_len]
        if len(payload) != seg_len - 2:
            raise ValueError("truncated JPEG: segment body")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise ValueError("unsupported JPEG: 16-bit quant table")
                zz = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8)
                if zz.size != 64:
                    raise ValueError("corrupt JPEG: short quant table")
                t = np.zeros(64, dtype=np.int32)
                t[ZIGZAG] = zz
                qtables[tq] = t.reshape(8, 8)
                p += 65
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise ValueError(f"unsupported JPEG: precision {prec}")
            if nc not in (1, 3):
                raise ValueError(f"unsupported JPEG: {nc} components")
            for ci in range(nc):
                cid, samp, tq = payload[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = samp >> 4, samp & 0x0F
                if hi not in (1, 2, 4) or vi not in (1, 2, 4):
                    raise ValueError(
                        f"unsupported JPEG: sampling factors {hi}x{vi}"
                    )
                comps.append((cid, tq, (hi, vi)))
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"unsupported JPEG: SOF{marker - 0xC0} (SOF0/SOF2 only)"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc_th = payload[p]
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                htables[tc_th] = _HuffTable(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS
            if h is None:
                raise ValueError("corrupt JPEG: SOS before SOF0")
            if grids is None:
                hmax = max(s[0] for (_, _, s) in comps)
                vmax = max(s[1] for (_, _, s) in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                grids = [
                    np.zeros((mcuy * s[1], mcux * s[0], 64), dtype=np.float64)
                    for (_, _, s) in comps
                ]
            ns = payload[0]
            if len(payload) < 4 + 2 * ns:
                raise ValueError("corrupt JPEG: short SOS header")
            sc: list[tuple[int, int, int]] = []  # (comp_idx, dc_tid, ac_tid)
            for si in range(ns):
                cs, tids = payload[1 + 2 * si], payload[2 + 2 * si]
                idx = next(
                    (i for i, (cid, _, _) in enumerate(comps) if cid == cs), None
                )
                if idx is None:
                    raise ValueError("corrupt JPEG: scan references unknown component")
                sc.append((idx, tids >> 4, tids & 0x0F))
            ss_b, se_b = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ah, al = payload[3 + 2 * ns] >> 4, payload[3 + 2 * ns] & 0x0F
            entropy, pos = _collect_entropy(data, pos + 2 + seg_len)
            reader = _BitReader(entropy)

            def _need(tc: int, tid: int) -> _HuffTable:
                t = htables.get(tc | tid)
                if t is None:
                    raise ValueError("corrupt JPEG: scan uses undefined Huffman table")
                return t

            def _own_grid(ci: int) -> tuple[int, int]:
                hi, vi = comps[ci][2]
                cw, ch = -(-w * hi // hmax), -(-h * vi // vmax)
                return -(-cw // 8), -(-ch // 8)

            if progressive:
                if ss_b == 0:  # DC scan (full precision split across passes)
                    if se_b != 0:
                        raise ValueError("corrupt JPEG: DC scan with Se != 0")
                    if ns == 1:
                        ci, dc_tid, _ = sc[0]
                        bw_n, bh_n = _own_grid(ci)
                        dc_t = _need(0x00, dc_tid) if ah == 0 else None
                        pred = 0
                        for bi in range(bw_n * bh_n):
                            if _maybe_restart(reader, bi, restart_interval):
                                pred = 0
                            by, bx = divmod(bi, bw_n)
                            blk = grids[ci][by, bx]
                            if ah == 0:
                                cat = reader.decode_symbol(dc_t)
                                pred += (
                                    _extend(reader.read_bits(cat), cat) if cat else 0
                                )
                                blk[0] = pred << al
                            else:
                                blk[0] = int(blk[0]) | (reader.read_bit() << al)
                    elif ns == len(comps):
                        dc_ts = [
                            _need(0x00, dc_tid) if ah == 0 else None
                            for (_, dc_tid, _) in sc
                        ]
                        prev_dc = [0] * len(comps)
                        for mcu in range(mcux * mcuy):
                            if _maybe_restart(reader, mcu, restart_interval):
                                prev_dc = [0] * len(comps)
                            my, mx = divmod(mcu, mcux)
                            for si, (ci, _, _) in enumerate(sc):
                                hi, vi = comps[ci][2]
                                for by in range(vi):
                                    for bx in range(hi):
                                        blk = grids[ci][my * vi + by, mx * hi + bx]
                                        if ah == 0:
                                            cat = reader.decode_symbol(dc_ts[si])
                                            prev_dc[ci] += (
                                                _extend(reader.read_bits(cat), cat)
                                                if cat
                                                else 0
                                            )
                                            blk[0] = prev_dc[ci] << al
                                        else:
                                            blk[0] = int(blk[0]) | (
                                                reader.read_bit() << al
                                            )
                    else:
                        raise ValueError(
                            "unsupported JPEG: progressive DC scan over a "
                            "component subset"
                        )
                else:  # AC scan: per T.81 always single-component
                    if ns != 1:
                        raise ValueError(
                            "corrupt JPEG: interleaved progressive AC scan"
                        )
                    if se_b > 63 or ss_b > se_b:
                        raise ValueError("corrupt JPEG: bad spectral band")
                    ci, _, ac_tid = sc[0]
                    ac_t = _need(0x10, ac_tid)
                    bw_n, bh_n = _own_grid(ci)
                    block_fn = (
                        _prog_ac_first_block if ah == 0 else _prog_ac_refine_block
                    )
                    eobrun = 0
                    for bi in range(bw_n * bh_n):
                        if _maybe_restart(reader, bi, restart_interval):
                            eobrun = 0
                        by, bx = divmod(bi, bw_n)
                        eobrun = block_fn(
                            reader, ac_t, grids[ci][by, bx], ss_b, se_b, al, eobrun
                        )
            # ns == 1 MUST be tested first: per T.81 A.2.2 EVERY
            # single-component scan is non-interleaved (one data unit
            # per MCU over the component's own grid) — including a
            # grayscale frame whose SOF declares sampling factors > 1,
            # where the MCU formulation would mis-shape the grid
            elif ns == 1:
                # non-interleaved: one data unit per "MCU" over the
                # component's OWN block grid (A.2.2) — the multi-scan
                # layout some baseline encoders emit
                ci, dc_tid, ac_tid = sc[0]
                dc_t, ac_t = _need(0x00, dc_tid), _need(0x10, ac_tid)
                bw_n, bh_n = _own_grid(ci)
                pred = 0
                for bi in range(bw_n * bh_n):
                    if _maybe_restart(reader, bi, restart_interval):
                        pred = 0
                    by, bx = divmod(bi, bw_n)
                    pred = _decode_block(
                        reader, dc_t, ac_t, grids[ci][by, bx], pred
                    )
            elif ns == len(comps):
                # interleaved: per MCU each component contributes its
                # v_i x h_i data units in raster order (A.2.3)
                tabs = [
                    (ci, _need(0x00, dc_tid), _need(0x10, ac_tid))
                    for (ci, dc_tid, ac_tid) in sc
                ]
                prev_dc = [0] * len(comps)
                for mcu in range(mcux * mcuy):
                    if _maybe_restart(reader, mcu, restart_interval):
                        prev_dc = [0] * len(comps)
                    my, mx = divmod(mcu, mcux)
                    for ci, dc_t, ac_t in tabs:
                        hi, vi = comps[ci][2]
                        for by in range(vi):
                            for bx in range(hi):
                                prev_dc[ci] = _decode_block(
                                    reader,
                                    dc_t,
                                    ac_t,
                                    grids[ci][my * vi + by, mx * hi + bx],
                                    prev_dc[ci],
                                )
            else:
                raise ValueError(
                    f"unsupported JPEG: scan interleaves {ns} of "
                    f"{len(comps)} components"
                )
            covered.update(ci for ci, _, _ in sc)
            continue  # pos already sits at the scan-terminating marker
        # APPn/COM/anything else: skip
        pos += 2 + seg_len
    if h is None or len(covered) != len(comps):
        raise ValueError(
            "truncated JPEG: missing SOF0 or scans do not cover every component"
        )
    planes = []
    for ci, (cid, tq, (hi, vi)) in enumerate(comps):
        if tq not in qtables:
            raise ValueError("corrupt JPEG: component uses undefined quant table")
        bh, bw = grids[ci].shape[:2]
        dez = np.zeros((bh * bw, 64), dtype=np.float64)
        dez[:, ZIGZAG] = grids[ci].reshape(-1, 64)
        blocks = idct2_blocks(dez.reshape(-1, 8, 8) * qtables[tq][None, :, :]) + 128.0
        plane = (
            blocks.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # crop to the component's own dims, then replicate up to full res
        ch, cw = -(-h * vi // vmax), -(-w * hi // hmax)
        plane = plane[:ch, :cw]
        if vi != vmax or hi != hmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1
            )
        planes.append(plane[:h, :w])
    if nc == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
