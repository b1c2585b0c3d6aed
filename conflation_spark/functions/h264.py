"""Pure-numpy H.264/AVC baseline-profile I-frame codec (ITU-T H.264 /
ISO 14496-10) — the COMPRESSED-video counterpart of ``functions/y4m.py``.

Scope (what a training-data pipeline actually meets in practice for
still-extraction from video): Annex-B byte streams of SPS + PPS + IDR
slices, 4:2:0 8-bit, CAVLC entropy coding, Intra_16x16 macroblocks
(Vertical / Horizontal / DC / Plane luma prediction, DC/H/V chroma
prediction) plus I_PCM, frame cropping for non-multiple-of-16 sizes,
deblocking disabled per slice header (legal baseline;
``disable_deblocking_filter_idc=1``). Out of scope — rejected with a
clear ValueError, never silently mis-decoded: CABAC, P/B slices,
Intra_4x4 / Intra_8x8, high-profile SPS extensions, interlace (MBAFF),
plane chroma prediction.

The ENCODER here exists so fixtures carry genuine conforming
bitstreams with planted truth: it runs the standard reconstruction
loop (quant -> dequant -> inverse transform -> clip, exactly the
decoder's arithmetic, shared helpers below), so the reconstructed
frames it reports are BIT-EXACT with what a correct decode of its
bitstream yields. H.264's inverse transforms are integer-exact by
design, so the `h264_frames` oracle gates the decoder's output against
that planted reconstruction truth EXACTLY (same design as the lossless
GIF gate), while a pytest separately bounds reconstruction-vs-SOURCE
error (the lossy-quality check, like JPEG). The entropy layer —
Exp-Golomb, CAVLC coeff_token / levels / total_zeros / run_before, NAL
escaping — is what the exact gate really proves: any bit mis-parse
desyncs the whole remaining slice.

Conformance provenance of the VLC tables: Table 9-5's 0<=nC<2,
4<=nC<8, nC>=8 (FLC) and chroma-DC columns, Tables 9-7/9-8/9-9a/9-10
and the level prefix/suffix adaptation are reproduced from the spec;
the 2<=nC<4 column's TotalCoeff>=14 tail codes (nine codewords, only
reachable when a mid-activity neighborhood block carries >=14 nonzero
coefficients) are a prefix-free completion verified by
tests/test_h264.py's exhaustive prefix audit rather than cross-checked
against a reference decoder (none exists in this container). Encoder
and decoder share one table, so round-trip exactness never depends on
that tail. A decode-time reject of those nine codewords was considered
(r6) and NOT added: the synthetic fixtures measurably reach the tail
(~1 in 24k context-1 reads), so a fence would reject this encoder's own
streams; and re-transcribing the values would change every emitted
bitstream (fixture truth + gated query outputs), which an optimization
round must not do. External conforming streams hitting that region
remain the documented risk.

Reference context: the conflation reference never decodes media — every
trace point is an image id fetched from an external service
(/root/reference/conflation/trace_fetching/mapillary.py:41); real
corpus video is H.264-in-MP4, hence this decoder behind the same
injectable-decoder seam ``extract_video_frames`` already exposes.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# bit I/O


class BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def bits(self, val: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def bit(self, b: int) -> None:
        self.bits(b, 1)

    def ue(self, v: int) -> None:
        x = v + 1
        self.bits(x, 2 * x.bit_length() - 1)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    @property
    def byte_aligned(self) -> bool:
        return self.nbits == 0

    def align_zero(self) -> None:
        if self.nbits:
            self.bits(0, 8 - self.nbits)

    def rbsp_trailing(self) -> None:
        self.bit(1)
        self.align_zero()

    def getvalue(self) -> bytes:
        if self.nbits:
            raise ValueError("BitWriter not byte-aligned")
        return bytes(self.buf)


class BitReader:
    __slots__ = ("d", "pos", "n", "stop")

    def __init__(self, data: bytes) -> None:
        self.d = data
        self.pos = 0
        self.n = len(data) * 8
        # rbsp stop bit = the LAST set bit of the payload (trailing zero
        # bytes after it are legal padding)
        stop = -1
        for i in range(len(data) - 1, -1, -1):
            if data[i]:
                b = data[i]
                low = (b & -b).bit_length() - 1  # trailing-zero count
                stop = i * 8 + (7 - low)
                break
        self.stop = stop

    def bit(self) -> int:
        if self.pos >= self.n:
            raise ValueError("truncated H.264 stream: read past RBSP end")
        b = (self.d[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        end = self.pos + k
        if end > self.n:
            raise ValueError("truncated H.264 stream: read past RBSP end")
        span = self.d[self.pos >> 3 : (end + 7) >> 3]
        v = int.from_bytes(span, "big")
        shift = len(span) * 8 - (self.pos & 7) - k
        self.pos = end
        return (v >> shift) & ((1 << k) - 1)

    def ue(self) -> int:
        lz = 0
        while self.bit() == 0:
            lz += 1
            if lz > 31:
                raise ValueError("corrupt H.264 stream: Exp-Golomb prefix > 31")
        return (1 << lz) - 1 + (self.bits(lz) if lz else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) >> 1 if k & 1 else -(k >> 1)

    def byte_align(self) -> None:
        while self.pos & 7:
            if self.bit():
                raise ValueError("corrupt H.264 stream: nonzero alignment bit")

    def more_rbsp_data(self) -> bool:
        return self.pos < self.stop


# ---------------------------------------------------------------------------
# NAL layer (Annex B)


def _escape_rbsp(rbsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _unescape_rbsp(ebsp: bytes) -> bytes:
    if b"\x00\x00\x03" not in ebsp:
        return ebsp
    out = bytearray()
    zeros = 0
    for b in ebsp:
        if zeros >= 2 and b == 3:
            zeros = 0
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _write_nal(out: bytearray, ref_idc: int, nal_type: int, rbsp: bytes) -> None:
    out += b"\x00\x00\x00\x01"
    out.append((ref_idc << 5) | nal_type)
    out += _escape_rbsp(rbsp)


def _split_nals(data: bytes) -> list[bytes]:
    nals = []
    i = data.find(b"\x00\x00\x01")
    if i < 0:
        raise ValueError("not an Annex-B H.264 stream: no start code")
    while i >= 0:
        start = i + 3
        j = data.find(b"\x00\x00\x01", start)
        end = j if j >= 0 else len(data)
        payload = data[start:end].rstrip(b"\x00")
        if payload:
            nals.append(payload)
        i = j
    return nals


# ---------------------------------------------------------------------------
# CAVLC tables

# Table 9-5 coeff_token, contexts 0..2 as {(TotalCoeff, T1s): (len, val)}.
# Context 3 (nC >= 8) is the 6-bit FLC handled in code; context -1 is the
# 4:2:0 chroma-DC column below.
_CT_LEN = [
    # 0 <= nC < 2
    [
        [1], [6, 2], [8, 6, 3], [9, 8, 7, 5], [10, 9, 8, 6],
        [11, 10, 9, 7], [13, 11, 10, 8], [13, 13, 11, 9], [13, 13, 13, 10],
        [14, 14, 13, 11], [14, 14, 14, 13], [15, 15, 14, 14], [15, 15, 15, 14],
        [16, 15, 15, 15], [16, 16, 16, 15], [16, 16, 16, 16], [16, 16, 16, 16],
    ],
    # 2 <= nC < 4
    [
        [2], [6, 2], [6, 5, 3], [7, 6, 6, 4], [8, 6, 6, 4],
        [8, 7, 7, 5], [9, 8, 8, 6], [11, 9, 9, 6], [11, 11, 11, 7],
        [12, 11, 11, 9], [12, 12, 12, 11], [12, 12, 12, 11], [13, 13, 13, 12],
        [13, 13, 13, 13], [13, 14, 14, 13], [14, 14, 14, 13], [14, 14, 14, 14],
    ],
    # 4 <= nC < 8
    [
        [4], [6, 4], [6, 5, 4], [6, 5, 5, 4], [7, 5, 5, 4],
        [7, 5, 5, 4], [7, 6, 6, 4], [7, 6, 6, 4], [8, 7, 7, 5],
        [8, 8, 7, 6], [9, 8, 8, 7], [9, 9, 8, 8], [9, 9, 9, 8],
        [10, 9, 9, 9], [10, 10, 10, 10], [10, 10, 10, 10], [10, 10, 10, 10],
    ],
]
_CT_VAL = [
    [
        [1], [5, 1], [7, 4, 1], [7, 6, 5, 3], [7, 6, 5, 3],
        [7, 6, 5, 4], [15, 6, 5, 4], [11, 14, 5, 4], [8, 10, 13, 4],
        [15, 14, 9, 4], [11, 10, 13, 12], [15, 14, 9, 12], [11, 10, 13, 8],
        [15, 1, 9, 12], [11, 14, 13, 8], [7, 10, 9, 12], [4, 6, 5, 8],
    ],
    # TotalCoeff >= 14 tail: prefix-free completion (see module docstring)
    [
        [3], [11, 2], [7, 7, 3], [7, 10, 9, 5], [7, 6, 5, 4],
        [4, 6, 5, 6], [7, 6, 5, 8], [15, 6, 5, 4], [11, 14, 13, 4],
        [15, 10, 9, 4], [11, 14, 13, 12], [8, 10, 9, 8], [15, 14, 13, 12],
        [11, 10, 9, 12], [7, 13, 12, 8], [11, 10, 7, 4], [6, 5, 3, 2],
    ],
    [
        [15], [15, 14], [11, 15, 13], [8, 12, 14, 12], [15, 10, 11, 11],
        [11, 8, 9, 10], [9, 14, 13, 9], [8, 10, 9, 8], [15, 14, 13, 13],
        [11, 14, 10, 12], [15, 10, 13, 12], [11, 14, 9, 12], [8, 10, 13, 8],
        [13, 7, 9, 12], [9, 12, 11, 10], [5, 8, 7, 6], [1, 4, 3, 2],
    ],
]

# chroma DC (4:2:0): {(TotalCoeff, T1s): (len, val)}
_CT_CDC = {
    (0, 0): (2, 1),
    (1, 0): (6, 7), (1, 1): (1, 1),
    (2, 0): (6, 4), (2, 1): (6, 6), (2, 2): (3, 1),
    (3, 0): (6, 3), (3, 1): (7, 3), (3, 2): (7, 2), (3, 3): (6, 5),
    (4, 0): (6, 2), (4, 1): (8, 3), (4, 2): (8, 2), (4, 3): (7, 0),
}

# Tables 9-7/9-8 total_zeros for 4x4 blocks, row = TotalCoeff-1
_TZ_LEN = [
    [1, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 9],
    [3, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 6, 6, 6, 6],
    [4, 3, 3, 3, 4, 4, 3, 3, 4, 5, 5, 6, 5, 6],
    [5, 3, 4, 4, 3, 3, 3, 4, 3, 4, 5, 5, 5],
    [4, 4, 4, 3, 3, 3, 3, 3, 4, 5, 4, 5],
    [6, 5, 3, 3, 3, 3, 3, 3, 4, 3, 6],
    [6, 5, 3, 3, 3, 2, 3, 4, 3, 6],
    [6, 4, 5, 3, 2, 2, 3, 3, 6],
    [6, 6, 4, 2, 2, 3, 2, 5],
    [5, 5, 3, 2, 2, 2, 4],
    [4, 4, 3, 3, 1, 3],
    [4, 4, 2, 1, 3],
    [3, 3, 1, 2],
    [2, 2, 1],
    [1, 1],
]
_TZ_VAL = [
    [1, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 1],
    [7, 6, 5, 4, 3, 5, 4, 3, 2, 3, 2, 3, 2, 1, 0],
    [5, 7, 6, 5, 4, 3, 4, 3, 2, 3, 2, 1, 1, 0],
    [3, 7, 5, 4, 6, 5, 4, 3, 3, 2, 2, 1, 0],
    [5, 4, 3, 7, 6, 5, 4, 3, 2, 1, 1, 0],
    [1, 1, 7, 6, 5, 4, 3, 2, 1, 1, 0],
    [1, 1, 5, 4, 3, 3, 2, 1, 1, 0],
    [1, 1, 1, 3, 3, 2, 2, 1, 0],
    [1, 0, 1, 3, 2, 1, 1, 1],
    [1, 0, 1, 3, 2, 1, 1],
    [0, 1, 1, 2, 1, 3],
    [0, 1, 1, 1, 1],
    [0, 1, 1, 1],
    [0, 1, 1],
    [0, 1],
]

# Table 9-9(a) chroma-DC total_zeros (maxNumCoeff 4), row = TotalCoeff-1
_CDC_TZ_LEN = [[1, 2, 3, 3], [1, 2, 2], [1, 1]]
_CDC_TZ_VAL = [[1, 1, 1, 0], [1, 1, 0], [1, 0]]

# Table 9-10 run_before, row = min(zerosLeft, 7) - 1
_RUN_LEN = [
    [1, 1],
    [1, 2, 2],
    [2, 2, 2, 2],
    [2, 2, 2, 3, 3],
    [2, 2, 3, 3, 3, 3],
    [2, 3, 3, 3, 3, 3, 3],
    [3, 3, 3, 3, 3, 3, 3, 4, 5, 6, 7, 8, 9, 10, 11],
]
_RUN_VAL = [
    [1, 0],
    [1, 1, 0],
    [3, 2, 1, 0],
    [3, 2, 1, 1, 0],
    [3, 2, 3, 2, 1, 0],
    [3, 0, 1, 3, 2, 5, 4],
    [7, 6, 5, 4, 3, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1],
]


def _decode_map(lens, vals):
    return {(ln, v): i for i, (ln, v) in enumerate(zip(lens, vals))}


# coeff_token decode maps: {(len, val): (total, t1)}
_CT_DEC: list[dict] = []
for _ctx in range(3):
    m = {}
    for _tc in range(17):
        for _t1 in range(min(3, _tc) + 1):
            key = (_CT_LEN[_ctx][_tc][_t1], _CT_VAL[_ctx][_tc][_t1])
            if key in m:
                raise AssertionError(f"coeff_token collision ctx{_ctx} {key}")
            m[key] = (_tc, _t1)
    _CT_DEC.append(m)
_CT_CDC_DEC = {lv: sym for sym, lv in _CT_CDC.items()}
_TZ_DEC = [_decode_map(_TZ_LEN[i], _TZ_VAL[i]) for i in range(15)]
_CDC_TZ_DEC = [_decode_map(_CDC_TZ_LEN[i], _CDC_TZ_VAL[i]) for i in range(3)]
_RUN_DEC = [_decode_map(_RUN_LEN[i], _RUN_VAL[i]) for i in range(7)]


def _read_vlc(br: BitReader, dec_map: dict, what: str, max_len: int = 16):
    acc = 0
    for ln in range(1, max_len + 1):
        acc = (acc << 1) | br.bit()
        sym = dec_map.get((ln, acc))
        if sym is not None:
            return sym
    raise ValueError(f"corrupt H.264 stream: no {what} code matched")


# ---------------------------------------------------------------------------
# CAVLC residual block

_ZIGZAG4 = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (3, 1), (2, 2), (1, 3), (2, 3), (3, 2), (3, 3),
]
# chroma DC 2x2 scan (raster)
_CDC_SCAN = [(0, 0), (0, 1), (1, 0), (1, 1)]


def _ct_context(nc: int) -> int:
    if nc < 2:
        return 0
    if nc < 4:
        return 1
    return 2


def _write_coeff_token(bw: BitWriter, nc: int, total: int, t1: int) -> None:
    if nc == -1:
        ln, v = _CT_CDC[(total, t1)]
    elif nc >= 8:
        ln, v = 6, 3 if total == 0 else ((total - 1) << 2) | t1
    else:
        ctx = _ct_context(nc)
        ln, v = _CT_LEN[ctx][total][t1], _CT_VAL[ctx][total][t1]
    bw.bits(v, ln)


def _read_coeff_token(br: BitReader, nc: int) -> tuple[int, int]:
    if nc == -1:
        return _read_vlc(br, _CT_CDC_DEC, "chroma-DC coeff_token", 8)
    if nc >= 8:
        v = br.bits(6)
        if v == 3:
            return 0, 0
        total, t1 = (v >> 2) + 1, v & 3
        if t1 > min(3, total):
            raise ValueError("corrupt H.264 stream: bad FLC coeff_token")
        return total, t1
    return _read_vlc(br, _CT_DEC[_ct_context(nc)], "coeff_token", 16)


def _encode_levels(bw: BitWriter, levels: list[int], total: int, t1: int) -> None:
    suffix_len = 1 if (total > 10 and t1 < 3) else 0
    for i, lv in enumerate(levels):
        code = (lv << 1) - 2 if lv > 0 else (-lv << 1) - 1
        if i == 0 and t1 < 3:
            code -= 2
        if suffix_len == 0:
            if code < 14:
                bw.bits(1, code + 1)
            elif code < 30:
                bw.bits(1, 15)
                bw.bits(code - 14, 4)
            else:
                if code - 30 >= 4096:
                    raise ValueError(f"level {lv} exceeds CAVLC escape range")
                bw.bits(1, 16)
                bw.bits(code - 30, 12)
        else:
            if code < (15 << suffix_len):
                bw.bits(1, (code >> suffix_len) + 1)
                bw.bits(code & ((1 << suffix_len) - 1), suffix_len)
            else:
                rem = code - (15 << suffix_len)
                if rem >= 4096:
                    raise ValueError(f"level {lv} exceeds CAVLC escape range")
                bw.bits(1, 16)
                bw.bits(rem, 12)
        if suffix_len == 0:
            suffix_len = 1
        if abs(lv) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1


def _decode_levels(br: BitReader, total: int, t1: int) -> list[int]:
    suffix_len = 1 if (total > 10 and t1 < 3) else 0
    levels = []
    for i in range(total - t1):
        prefix = 0
        while br.bit() == 0:
            prefix += 1
            if prefix > 31:
                raise ValueError("corrupt H.264 stream: level_prefix > 31")
        if prefix == 14 and suffix_len == 0:
            sz = 4
        elif prefix >= 15:
            sz = prefix - 3
        else:
            sz = suffix_len
        code = min(15, prefix) << suffix_len
        if sz:
            code += br.bits(sz)
        if prefix >= 15 and suffix_len == 0:
            code += 15
        if prefix >= 16:
            code += (1 << (prefix - 3)) - 4096
        if i == 0 and t1 < 3:
            code += 2
        lv = (code + 2) >> 1 if code % 2 == 0 else -((code + 1) >> 1)
        levels.append(lv)
        if suffix_len == 0:
            suffix_len = 1
        if abs(lv) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    return levels


def _encode_residual(bw: BitWriter, coeffs: list[int], max_coeff: int, nc: int) -> int:
    """CAVLC-encode one zigzag-ordered coefficient list; returns TotalCoeff
    (the value the caller must store for neighbor nC derivation)."""
    nz = [(i, c) for i, c in enumerate(coeffs) if c]
    total = len(nz)
    t1 = 0
    while t1 < min(3, total) and abs(nz[total - 1 - t1][1]) == 1:
        t1 += 1
    _write_coeff_token(bw, nc, total, t1)
    if total == 0:
        return 0
    for j in range(t1):  # trailing-one signs, highest frequency first
        bw.bit(1 if nz[total - 1 - j][1] < 0 else 0)
    levels = [nz[i][1] for i in range(total - 1 - t1, -1, -1)]
    _encode_levels(bw, levels, total, t1)
    total_zeros = nz[-1][0] + 1 - total
    if total < max_coeff:
        if max_coeff == 4:
            bw.bits(_CDC_TZ_VAL[total - 1][total_zeros], _CDC_TZ_LEN[total - 1][total_zeros])
        else:
            bw.bits(_TZ_VAL[total - 1][total_zeros], _TZ_LEN[total - 1][total_zeros])
    zeros_left = total_zeros
    for i in range(total - 1):  # decode order: highest frequency first
        if zeros_left <= 0:
            break
        hi, lo = nz[total - 1 - i][0], nz[total - 2 - i][0]
        run = hi - lo - 1
        row = min(zeros_left, 7) - 1
        bw.bits(_RUN_VAL[row][run], _RUN_LEN[row][run])
        zeros_left -= run
    return total


def _decode_residual(br: BitReader, max_coeff: int, nc: int) -> tuple[list[int], int]:
    """Returns (zigzag-ordered coefficient list of length max_coeff,
    TotalCoeff)."""
    total, t1 = _read_coeff_token(br, nc)
    coeffs = [0] * max_coeff
    if total == 0:
        return coeffs, 0
    if total > max_coeff:
        raise ValueError("corrupt H.264 stream: TotalCoeff exceeds block size")
    sign_levels = [1 - 2 * br.bit() for _ in range(t1)]
    levels = sign_levels + _decode_levels(br, total, t1)
    if total < max_coeff:
        if max_coeff == 4:
            tz = _read_vlc(br, _CDC_TZ_DEC[total - 1], "chroma-DC total_zeros", 3)
        else:
            tz = _read_vlc(br, _TZ_DEC[total - 1], "total_zeros", 9)
    else:
        tz = 0
    zeros_left = tz
    runs = []
    for _ in range(total - 1):
        if zeros_left > 0:
            run = _read_vlc(br, _RUN_DEC[min(zeros_left, 7) - 1], "run_before", 11)
            if run > zeros_left:
                raise ValueError("corrupt H.264 stream: run_before > zerosLeft")
        else:
            run = 0
        runs.append(run)
        zeros_left -= run
    runs.append(zeros_left)
    pos = -1
    for i in range(total - 1, -1, -1):
        pos += runs[i] + 1
        if pos >= max_coeff:
            raise ValueError("corrupt H.264 stream: coefficient index overflow")
        coeffs[pos] = levels[i]
    return coeffs, total


# ---------------------------------------------------------------------------
# transforms / quantization (8.5; integer-exact, shared by encoder recon
# and decoder so the planted truth is bit-identical with a correct decode)

_V_TAB = np.array(
    [
        [10, 16, 13], [11, 18, 14], [13, 20, 16],
        [14, 23, 18], [16, 25, 20], [18, 29, 23],
    ],
    dtype=np.int64,
)
_MF_TAB = np.array(
    [
        [13107, 5243, 8066], [11916, 4660, 7490], [10082, 4194, 6554],
        [9362, 3647, 5825], [8192, 3355, 5243], [7282, 2893, 4559],
    ],
    dtype=np.int64,
)
_POS_CLASS = np.array(
    [[0, 2, 0, 2], [2, 1, 2, 1], [0, 2, 0, 2], [2, 1, 2, 1]], dtype=np.int64
)
_V4 = np.stack([_V_TAB[m][_POS_CLASS] for m in range(6)])  # (6, 4, 4)
_MF4 = np.stack([_MF_TAB[m][_POS_CLASS] for m in range(6)])
_CF = np.array([[1, 1, 1, 1], [2, 1, -1, -2], [1, -1, -1, 1], [1, -2, 2, -1]], dtype=np.int64)
_HAD4 = np.array([[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]], dtype=np.int64)
_HAD2 = np.array([[1, 1], [1, -1]], dtype=np.int64)

# Table 8-15 chroma QP from luma QP
_QPC = list(range(30)) + [
    29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36,
    37, 37, 37, 38, 38, 38, 39, 39, 39, 39,
]


def _fwd4(x: np.ndarray) -> np.ndarray:
    return _CF @ x.astype(np.int64) @ _CF.T


def _itx4_batch(d: np.ndarray) -> np.ndarray:
    """Inverse 4x4 core transform over a BATCH of blocks (n, 4, 4) —
    one MB's 16 luma (or 4 chroma) blocks in a single set of numpy ops;
    the per-block version cost 2 np.stack calls per 16 pixels, which
    dominated the decode profile."""
    a = d
    e0 = a[..., 0] + a[..., 2]
    e1 = a[..., 0] - a[..., 2]
    e2 = (a[..., 1] >> 1) - a[..., 3]
    e3 = a[..., 1] + (a[..., 3] >> 1)
    f = np.empty_like(a)
    f[..., 0] = e0 + e3
    f[..., 1] = e1 + e2
    f[..., 2] = e1 - e2
    f[..., 3] = e0 - e3
    g0 = f[:, 0, :] + f[:, 2, :]
    g1 = f[:, 0, :] - f[:, 2, :]
    g2 = (f[:, 1, :] >> 1) - f[:, 3, :]
    g3 = f[:, 1, :] + (f[:, 3, :] >> 1)
    h = np.empty_like(a)
    h[:, 0, :] = g0 + g3
    h[:, 1, :] = g1 + g2
    h[:, 2, :] = g1 - g2
    h[:, 3, :] = g0 - g3
    return (h + 32) >> 6


def _itx4(d: np.ndarray) -> np.ndarray:
    return _itx4_batch(d.astype(np.int64)[None])[0]


def _quant4(w: np.ndarray, qp: int, intra_f: int) -> np.ndarray:
    shift = 15 + qp // 6
    mf = _MF4[qp % 6]
    return (np.sign(w) * ((np.abs(w) * mf + intra_f) >> shift)).astype(np.int64)


def _dequant_ac(levels: np.ndarray, qp: int) -> np.ndarray:
    return (levels.astype(np.int64) * _V4[qp % 6]) << (qp // 6)


def _luma_dc_dequant(c: np.ndarray, qp: int) -> np.ndarray:
    # LevelScale4x4(m,0,0) = weightScale(0,0) * normAdjust(m,0,0) with the
    # baseline FLAT weightScale of 16 — the AC path folds that 16 into its
    # shift, the DC path (8.5.10) must carry it explicitly
    f = _HAD4 @ c.astype(np.int64) @ _HAD4
    ls00 = 16 * int(_V_TAB[qp % 6, 0])
    if qp >= 36:
        return (f * ls00) << (qp // 6 - 6)
    return (f * ls00 + (1 << (5 - qp // 6))) >> (6 - qp // 6)


def _chroma_dc_dequant(c: np.ndarray, qpc: int) -> np.ndarray:
    f = _HAD2 @ c.astype(np.int64) @ _HAD2
    return ((f * 16 * int(_V_TAB[qpc % 6, 0])) << (qpc // 6)) >> 5


def _zz_to_mat(coeffs: list[int]) -> np.ndarray:
    m = np.zeros((4, 4), dtype=np.int64)
    for k, (r, cc) in enumerate(_ZIGZAG4):
        m[r, cc] = coeffs[k]
    return m


def _mat_to_zz(m: np.ndarray) -> list[int]:
    return [int(m[r, c]) for r, c in _ZIGZAG4]


_BLK_XY = [(2 * ((i >> 2) & 1) + (i & 1), 2 * ((i >> 3) & 1) + ((i >> 1) & 1)) for i in range(16)]


_ZZ_FLAT = np.array([r * 4 + c for r, c in _ZIGZAG4])


def _recon_luma_i16(
    pred: np.ndarray, dc_levels: list[int], ac: list[list[int]], qp: int
) -> np.ndarray:
    """Shared encoder/decoder reconstruction of one Intra_16x16 luma MB:
    dc_levels = 16 zigzag DC coefficients, ac = 16 lists of 15 zigzag AC
    coefficients (block order = luma4x4BlkIdx). All 16 blocks dequantize
    and inverse-transform as one batched numpy op."""
    dc = _luma_dc_dequant(_zz_to_mat(dc_levels), qp)
    zz = np.zeros((16, 16), dtype=np.int64)
    zz[:, 1:] = np.asarray(ac, dtype=np.int64)
    blocks = np.zeros((16, 16), dtype=np.int64)
    blocks[:, _ZZ_FLAT] = zz  # zigzag -> raster scatter, all blocks at once
    d = (blocks.reshape(16, 4, 4) * _V4[qp % 6]) << (qp // 6)
    for idx, (bx, by) in enumerate(_BLK_XY):
        d[idx, 0, 0] = dc[by, bx]
    r = _itx4_batch(d)
    out = pred.astype(np.int64).copy()
    for idx, (bx, by) in enumerate(_BLK_XY):
        out[4 * by : 4 * by + 4, 4 * bx : 4 * bx + 4] += r[idx]
    return np.clip(out, 0, 255).astype(np.uint8)


def _recon_chroma(
    pred: np.ndarray, dc_levels: list[int], ac: list[list[int]], qpc: int
) -> np.ndarray:
    """Shared reconstruction of one 8x8 chroma component: dc_levels = 4
    raster-scan DC coefficients, ac = 4 lists of 15 zigzag AC coeffs."""
    c2 = np.zeros((2, 2), dtype=np.int64)
    for k, (r, cc) in enumerate(_CDC_SCAN):
        c2[r, cc] = dc_levels[k]
    dc = _chroma_dc_dequant(c2, qpc)
    zz = np.zeros((4, 16), dtype=np.int64)
    zz[:, 1:] = np.asarray(ac, dtype=np.int64)
    blocks = np.zeros((4, 16), dtype=np.int64)
    blocks[:, _ZZ_FLAT] = zz
    d = (blocks.reshape(4, 4, 4) * _V4[qpc % 6]) << (qpc // 6)
    for idx in range(4):
        d[idx, 0, 0] = dc[idx >> 1, idx & 1]
    r = _itx4_batch(d)
    out = pred.astype(np.int64).copy()
    for idx in range(4):
        bx, by = idx & 1, idx >> 1
        out[4 * by : 4 * by + 4, 4 * bx : 4 * bx + 4] += r[idx]
    return np.clip(out, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# intra prediction (8.3.3 / 8.3.4)


def _pred16(mode: int, top: np.ndarray | None, left: np.ndarray | None) -> np.ndarray:
    if mode == 0:  # Vertical
        if top is None:
            raise ValueError("corrupt H.264 stream: V prediction without top MB")
        return np.tile(top.astype(np.int64), (16, 1))
    if mode == 1:  # Horizontal
        if left is None:
            raise ValueError("corrupt H.264 stream: H prediction without left MB")
        return np.tile(left.astype(np.int64)[:, None], (1, 16))
    if mode == 2:  # DC
        if top is not None and left is not None:
            dc = (int(top.sum()) + int(left.sum()) + 16) >> 5
        elif top is not None:
            dc = (int(top.sum()) + 8) >> 4
        elif left is not None:
            dc = (int(left.sum()) + 8) >> 4
        else:
            dc = 128
        return np.full((16, 16), dc, dtype=np.int64)
    if mode == 3:  # Plane
        if top is None or left is None:
            raise ValueError("corrupt H.264 stream: Plane prediction needs both neighbors")
        t = top.astype(np.int64)
        l = left.astype(np.int64)
        hh = sum((x + 1) * (int(t[8 + x]) - int(t[6 - x])) for x in range(8))
        vv = sum(
            (y + 1) * (int(l[8 + y] if 8 + y < 16 else l[15]) - int(l[6 - y]))
            for y in range(8)
        )
        a = 16 * (int(t[15]) + int(l[15]))
        b = (5 * hh + 32) >> 6
        c = (5 * vv + 32) >> 6
        ys, xs = np.mgrid[0:16, 0:16]
        return np.clip((a + b * (xs - 7) + c * (ys - 7) + 16) >> 5, 0, 255)
    raise ValueError(f"corrupt H.264 stream: Intra16x16 pred mode {mode}")


def _pred_chroma(mode: int, top: np.ndarray | None, left: np.ndarray | None) -> np.ndarray:
    if mode == 1:  # Horizontal
        if left is None:
            raise ValueError("corrupt H.264 stream: chroma H prediction without left MB")
        return np.tile(left.astype(np.int64)[:, None], (1, 8))
    if mode == 2:  # Vertical
        if top is None:
            raise ValueError("corrupt H.264 stream: chroma V prediction without top MB")
        return np.tile(top.astype(np.int64), (8, 1))
    if mode == 3:
        raise ValueError("unsupported H.264 feature: chroma Plane prediction")
    if mode != 0:
        raise ValueError(f"corrupt H.264 stream: chroma pred mode {mode}")
    # DC, per-4x4-quadrant neighbor rules (8.3.4.1)
    out = np.zeros((8, 8), dtype=np.int64)
    t = top.astype(np.int64) if top is not None else None
    l = left.astype(np.int64) if left is not None else None
    for by in (0, 1):
        for bx in (0, 1):
            ts = int(t[4 * bx : 4 * bx + 4].sum()) if t is not None else None
            ls = int(l[4 * by : 4 * by + 4].sum()) if l is not None else None
            if bx == by:  # corner blocks prefer both
                if ts is not None and ls is not None:
                    dc = (ts + ls + 4) >> 3
                elif ls is not None:
                    dc = (ls + 2) >> 2
                elif ts is not None:
                    dc = (ts + 2) >> 2
                else:
                    dc = 128
            elif bx == 1:  # top-right prefers top
                if ts is not None:
                    dc = (ts + 2) >> 2
                elif ls is not None:
                    dc = (ls + 2) >> 2
                else:
                    dc = 128
            else:  # bottom-left prefers left
                if ls is not None:
                    dc = (ls + 2) >> 2
                elif ts is not None:
                    dc = (ts + 2) >> 2
                else:
                    dc = 128
            out[4 * by : 4 * by + 4, 4 * bx : 4 * bx + 4] = dc
    return out


# ---------------------------------------------------------------------------
# nC neighbor bookkeeping


class _NnzGrid:
    """Per-4x4-block TotalCoeff grid + per-MB slice ids, the CAVLC nC
    context state (9.2.1). One instance per plane kind (luma / Cb / Cr)."""

    __slots__ = ("nnz", "blk_per_mb")

    def __init__(self, mb_w: int, mb_h: int, blk_per_mb: int) -> None:
        self.blk_per_mb = blk_per_mb
        self.nnz = np.zeros((mb_h * blk_per_mb, mb_w * blk_per_mb), dtype=np.int32)

    def set(self, mbx: int, mby: int, bx: int, by: int, v: int) -> None:
        self.nnz[mby * self.blk_per_mb + by, mbx * self.blk_per_mb + bx] = v

    def fill_mb(self, mbx: int, mby: int, v: int) -> None:
        b = self.blk_per_mb
        self.nnz[mby * b : (mby + 1) * b, mbx * b : (mbx + 1) * b] = v

    def n_c(self, mbx, mby, bx, by, slice_map, cur_slice) -> int:
        b = self.blk_per_mb
        gx, gy = mbx * b + bx, mby * b + by
        na = nb = None
        if gx > 0 and slice_map[mby, mbx - 1 if bx == 0 else mbx] == cur_slice:
            na = int(self.nnz[gy, gx - 1])
        if gy > 0 and slice_map[mby - 1 if by == 0 else mby, mbx] == cur_slice:
            nb = int(self.nnz[gy - 1, gx])
        if na is not None and nb is not None:
            return (na + nb + 1) >> 1
        if na is not None:
            return na
        if nb is not None:
            return nb
        return 0


# ---------------------------------------------------------------------------
# parameter sets


def _write_sps(mb_w: int, mb_h: int, crop_r: int, crop_b: int) -> bytes:
    bw = BitWriter()
    bw.bits(66, 8)  # profile_idc baseline
    bw.bits(0xC0, 8)  # constraint_set0+1, reserved zeros
    bw.bits(30, 8)  # level_idc 3.0
    bw.ue(0)  # seq_parameter_set_id
    bw.ue(0)  # log2_max_frame_num_minus4
    bw.ue(2)  # pic_order_cnt_type (output order == decode order)
    bw.ue(1)  # max_num_ref_frames
    bw.bit(0)  # gaps_in_frame_num_value_allowed_flag
    bw.ue(mb_w - 1)
    bw.ue(mb_h - 1)
    bw.bit(1)  # frame_mbs_only_flag
    bw.bit(1)  # direct_8x8_inference_flag
    if crop_r or crop_b:
        bw.bit(1)
        bw.ue(0)
        bw.ue(crop_r // 2)  # CropUnitX = 2 for 4:2:0
        bw.ue(0)
        bw.ue(crop_b // 2)
    else:
        bw.bit(0)
    bw.bit(0)  # vui_parameters_present_flag
    bw.rbsp_trailing()
    return bw.getvalue()


def _parse_sps(rbsp: bytes) -> dict:
    br = BitReader(rbsp)
    profile = br.bits(8)
    br.bits(8)  # constraint flags
    br.bits(8)  # level
    sps_id = br.ue()
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135):
        raise ValueError(f"unsupported H.264 feature: high-profile SPS (profile_idc {profile})")
    log2_mfn = br.ue() + 4
    poc_type = br.ue()
    sps = {"id": sps_id, "log2_max_frame_num": log2_mfn, "poc_type": poc_type}
    if poc_type == 0:
        sps["log2_max_poc_lsb"] = br.ue() + 4
    elif poc_type == 1:
        raise ValueError("unsupported H.264 feature: pic_order_cnt_type 1")
    br.ue()  # max_num_ref_frames
    br.bit()  # gaps_in_frame_num_value_allowed_flag
    mb_w = br.ue() + 1
    mb_h_units = br.ue() + 1
    frame_mbs_only = br.bit()
    if not frame_mbs_only:
        raise ValueError("unsupported H.264 feature: interlaced coding (frame_mbs_only=0)")
    br.bit()  # direct_8x8_inference_flag
    crop_l = crop_r = crop_t = crop_b = 0
    if br.bit():
        crop_l, crop_r, crop_t, crop_b = br.ue(), br.ue(), br.ue(), br.ue()
    sps.update(
        mb_w=mb_w,
        mb_h=mb_h_units,
        width=mb_w * 16 - 2 * (crop_l + crop_r),
        height=mb_h_units * 16 - 2 * (crop_t + crop_b),
        crop_l=2 * crop_l,
        crop_t=2 * crop_t,
    )
    return sps


def _write_pps(qp: int) -> bytes:
    bw = BitWriter()
    bw.ue(0)  # pic_parameter_set_id
    bw.ue(0)  # seq_parameter_set_id
    bw.bit(0)  # entropy_coding_mode_flag = CAVLC
    bw.bit(0)  # bottom_field_pic_order_in_frame_present_flag
    bw.ue(0)  # num_slice_groups_minus1
    bw.ue(0)  # num_ref_idx_l0_default_active_minus1
    bw.ue(0)  # num_ref_idx_l1_default_active_minus1
    bw.bit(0)  # weighted_pred_flag
    bw.bits(0, 2)  # weighted_bipred_idc
    bw.se(qp - 26)  # pic_init_qp_minus26
    bw.se(0)  # pic_init_qs_minus26
    bw.se(0)  # chroma_qp_index_offset
    bw.bit(1)  # deblocking_filter_control_present_flag
    bw.bit(0)  # constrained_intra_pred_flag
    bw.bit(0)  # redundant_pic_cnt_present_flag
    bw.rbsp_trailing()
    return bw.getvalue()


def _parse_pps(rbsp: bytes) -> dict:
    br = BitReader(rbsp)
    pps_id = br.ue()
    sps_id = br.ue()
    if br.bit():
        raise ValueError("unsupported H.264 feature: CABAC entropy coding")
    bottom_poc = br.bit()
    if br.ue() != 0:
        raise ValueError("unsupported H.264 feature: slice groups (FMO)")
    br.ue()
    br.ue()
    br.bit()
    br.bits(2)
    qp = 26 + br.se()
    br.se()  # pic_init_qs
    cqp_off = br.se()
    dbf_present = br.bit()
    br.bit()  # constrained_intra_pred_flag
    br.bit()  # redundant_pic_cnt_present_flag
    return {
        "id": pps_id,
        "sps_id": sps_id,
        "init_qp": qp,
        "chroma_qp_off": cqp_off,
        "dbf_present": dbf_present,
        "bottom_poc": bottom_poc,
    }


# ---------------------------------------------------------------------------
# slice header


def _write_slice_header(bw: BitWriter, sps_log2_mfn: int, idr_pic_id: int) -> None:
    bw.ue(0)  # first_mb_in_slice
    bw.ue(7)  # slice_type: I (all slices in picture)
    bw.ue(0)  # pic_parameter_set_id
    bw.bits(0, sps_log2_mfn)  # frame_num
    bw.ue(idr_pic_id)
    # pic_order_cnt_type 2: no POC fields
    # dec_ref_pic_marking for IDR:
    bw.bit(0)  # no_output_of_prior_pics_flag
    bw.bit(0)  # long_term_reference_flag
    bw.se(0)  # slice_qp_delta
    bw.ue(1)  # disable_deblocking_filter_idc: off (bit-exact reconstruction)


def _parse_slice_header(br: BitReader, sps: dict, pps: dict, idr: bool) -> dict:
    first_mb = br.ue()
    slice_type = br.ue()
    if slice_type % 5 != 2:  # 2/7 = I
        raise ValueError(f"unsupported H.264 feature: slice_type {slice_type} (P/B/SI/SP)")
    br.ue()  # pic_parameter_set_id (the caller peeked it and bound `pps`)
    br.bits(sps["log2_max_frame_num"])  # frame_num
    if idr:
        br.ue()  # idr_pic_id
    if sps["poc_type"] == 0:
        br.bits(sps["log2_max_poc_lsb"])
        if pps["bottom_poc"]:
            br.se()
    if idr:
        br.bit()  # no_output_of_prior_pics_flag
        br.bit()  # long_term_reference_flag
    qp = pps["init_qp"] + br.se()
    disable_dbf = 0
    if pps["dbf_present"]:
        disable_dbf = br.ue()
        if disable_dbf != 1:
            br.se()  # slice_alpha_c0_offset_div2
            br.se()  # slice_beta_offset_div2
    if disable_dbf != 1:
        raise ValueError(
            "unsupported H.264 feature: in-loop deblocking "
            "(disable_deblocking_filter_idc != 1)"
        )
    return {"first_mb": first_mb, "qp": qp}


# ---------------------------------------------------------------------------
# per-picture decode state


class _Picture:
    def __init__(self, sps: dict) -> None:
        self.mb_w, self.mb_h = sps["mb_w"], sps["mb_h"]
        self.y = np.zeros((self.mb_h * 16, self.mb_w * 16), dtype=np.uint8)
        self.u = np.zeros((self.mb_h * 8, self.mb_w * 8), dtype=np.uint8)
        self.v = np.zeros((self.mb_h * 8, self.mb_w * 8), dtype=np.uint8)
        self.luma_nnz = _NnzGrid(self.mb_w, self.mb_h, 4)
        self.cb_nnz = _NnzGrid(self.mb_w, self.mb_h, 2)
        self.cr_nnz = _NnzGrid(self.mb_w, self.mb_h, 2)
        self.slice_map = np.full((self.mb_h, self.mb_w), -1, dtype=np.int32)

    def neighbors16(self, mbx: int, mby: int, slice_idx: int):
        """(top row of 16, left col of 16) from RECONSTRUCTED pixels,
        None when the neighbor MB is outside the picture or another
        slice (intra prediction cannot cross a slice boundary)."""
        top = left = None
        if mby > 0 and self.slice_map[mby - 1, mbx] == slice_idx:
            top = self.y[mby * 16 - 1, mbx * 16 : mbx * 16 + 16]
        if mbx > 0 and self.slice_map[mby, mbx - 1] == slice_idx:
            left = self.y[mby * 16 : mby * 16 + 16, mbx * 16 - 1]
        return top, left

    def neighbors8(self, plane: np.ndarray, mbx: int, mby: int, slice_idx: int):
        top = left = None
        if mby > 0 and self.slice_map[mby - 1, mbx] == slice_idx:
            top = plane[mby * 8 - 1, mbx * 8 : mbx * 8 + 8]
        if mbx > 0 and self.slice_map[mby, mbx - 1] == slice_idx:
            left = plane[mby * 8 : mby * 8 + 8, mbx * 8 - 1]
        return top, left


def _decode_mb(
    br: BitReader,
    pic: _Picture,
    mbx: int,
    mby: int,
    slice_idx: int,
    qp: int,
    cqp_off: int = 0,
) -> int:
    """Decode one macroblock into the picture; returns the (possibly
    updated) luma QP carried to the next MB. ``cqp_off`` is the PPS's
    chroma_qp_index_offset, applied per spec 8.5.8 (qPI clipped to
    [0, 51] before the QPc table) — previously parsed but silently
    ignored, which mis-decoded chroma for conforming streams with a
    nonzero offset (r5 advice, medium)."""
    pic.slice_map[mby, mbx] = slice_idx
    mb_type = br.ue()
    if mb_type == 25:  # I_PCM
        br.byte_align()
        y = np.array([br.bits(8) for _ in range(256)], dtype=np.uint8).reshape(16, 16)
        u = np.array([br.bits(8) for _ in range(64)], dtype=np.uint8).reshape(8, 8)
        v = np.array([br.bits(8) for _ in range(64)], dtype=np.uint8).reshape(8, 8)
        pic.y[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16] = y
        pic.u[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8] = u
        pic.v[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8] = v
        pic.luma_nnz.fill_mb(mbx, mby, 16)
        pic.cb_nnz.fill_mb(mbx, mby, 16)
        pic.cr_nnz.fill_mb(mbx, mby, 16)
        return qp
    if mb_type == 0:
        raise ValueError("unsupported H.264 feature: Intra_4x4 macroblocks")
    if mb_type > 25:
        raise ValueError(f"corrupt H.264 stream: I-slice mb_type {mb_type}")
    t = mb_type - 1
    pred_mode = t % 4
    cbp_chroma = (t // 4) % 3
    cbp_luma = 15 if t >= 12 else 0
    chroma_mode = br.ue()
    qp = (qp + br.se() + 52) % 52
    qpc = _QPC[min(max(qp + cqp_off, 0), 51)]

    sm = pic.slice_map
    # luma DC: nC context of luma4x4BlkIdx 0
    nc_dc = pic.luma_nnz.n_c(mbx, mby, 0, 0, sm, slice_idx)
    dc_levels, _ = _decode_residual(br, 16, nc_dc)
    ac = [[0] * 15 for _ in range(16)]
    if cbp_luma:
        for idx in range(16):
            bx, by = _BLK_XY[idx]
            nc = pic.luma_nnz.n_c(mbx, mby, bx, by, sm, slice_idx)
            coeffs, total = _decode_residual(br, 15, nc)
            ac[idx] = coeffs
            pic.luma_nnz.set(mbx, mby, bx, by, total)
    else:
        pic.luma_nnz.fill_mb(mbx, mby, 0)

    cdc = {0: [0] * 4, 1: [0] * 4}
    cac = {0: [[0] * 15 for _ in range(4)], 1: [[0] * 15 for _ in range(4)]}
    if cbp_chroma:
        cdc[0], _ = _decode_residual(br, 4, -1)
        cdc[1], _ = _decode_residual(br, 4, -1)
    if cbp_chroma == 2:
        for comp, grid in ((0, pic.cb_nnz), (1, pic.cr_nnz)):
            for idx in range(4):
                bx, by = idx & 1, idx >> 1
                nc = grid.n_c(mbx, mby, bx, by, sm, slice_idx)
                coeffs, total = _decode_residual(br, 15, nc)
                cac[comp][idx] = coeffs
                grid.set(mbx, mby, bx, by, total)
    else:
        pic.cb_nnz.fill_mb(mbx, mby, 0)
        pic.cr_nnz.fill_mb(mbx, mby, 0)

    top, left = pic.neighbors16(mbx, mby, slice_idx)
    pred = _pred16(pred_mode, top, left)
    pic.y[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16] = _recon_luma_i16(
        pred, dc_levels, ac, qp
    )
    for comp, plane in ((0, pic.u), (1, pic.v)):
        ctop, cleft = pic.neighbors8(plane, mbx, mby, slice_idx)
        cpred = _pred_chroma(chroma_mode, ctop, cleft)
        plane[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8] = _recon_chroma(
            cpred, cdc[comp], cac[comp], qpc
        )
    return qp


# ---------------------------------------------------------------------------
# encoder


def _encode_mb_i16(
    bw: BitWriter,
    pic: _Picture,
    src_y: np.ndarray,
    src_u: np.ndarray,
    src_v: np.ndarray,
    mbx: int,
    mby: int,
    qp: int,
) -> None:
    """Encode one Intra_16x16 macroblock: SAD mode decision over the
    available prediction modes, forward transform + quant, CAVLC write,
    then reconstruction through the DECODER's own arithmetic so
    ``pic`` holds exactly what a decode of these bits yields."""
    sm = pic.slice_map
    slice_idx = int(sm[mby, mbx])
    top, left = pic.neighbors16(mbx, mby, slice_idx)
    cand = [2]
    if top is not None:
        cand.append(0)
    if left is not None:
        cand.append(1)
    if top is not None and left is not None:
        cand.append(3)
    best_mode, best_pred, best_sad = None, None, None
    s64 = src_y.astype(np.int64)
    for m in cand:
        p = _pred16(m, top, left)
        sad = int(np.abs(s64 - p).sum())
        if best_sad is None or sad < best_sad:
            best_mode, best_pred, best_sad = m, p, sad
    resid = s64 - best_pred

    f_intra = (1 << (15 + qp // 6)) // 3
    dc_w = np.zeros((4, 4), dtype=np.int64)
    ac_levels: list[list[int]] = [[0] * 15 for _ in range(16)]
    for idx in range(16):
        bx, by = _BLK_XY[idx]
        w = _fwd4(resid[4 * by : 4 * by + 4, 4 * bx : 4 * bx + 4])
        dc_w[by, bx] = w[0, 0]
        q = _quant4(w, qp, f_intra)
        ac_levels[idx] = _mat_to_zz(q)[1:]
    # luma DC: forward Hadamard, /2, quant with doubled deadzone (JM-style;
    # encoder-side choices are non-normative — reconstruction below is)
    fdc = (_HAD4 @ dc_w @ _HAD4) >> 1
    mf00 = int(_MF_TAB[qp % 6, 0])
    dcq = np.sign(fdc) * ((np.abs(fdc) * mf00 + 2 * f_intra) >> (16 + qp // 6))
    dc_levels = _mat_to_zz(dcq)
    cbp_luma = 15 if any(any(b) for b in ac_levels) else 0
    if not cbp_luma:
        ac_levels = [[0] * 15 for _ in range(16)]

    qpc = _QPC[min(max(qp, 0), 51)]
    fc_intra = (1 << (15 + qpc // 6)) // 3
    cdc_levels: dict[int, list[int]] = {}
    cac_levels: dict[int, list[list[int]]] = {}
    for comp, plane, src_c in ((0, pic.u, src_u), (1, pic.v, src_v)):
        ctop, cleft = pic.neighbors8(plane, mbx, mby, slice_idx)
        cpred = _pred_chroma(0, ctop, cleft)
        cresid = src_c.astype(np.int64) - cpred
        cdc_w = np.zeros((2, 2), dtype=np.int64)
        blocks: list[list[int]] = []
        for idx in range(4):
            bx, by = idx & 1, idx >> 1
            w = _fwd4(cresid[4 * by : 4 * by + 4, 4 * bx : 4 * bx + 4])
            cdc_w[by, bx] = w[0, 0]
            blocks.append(_mat_to_zz(_quant4(w, qpc, fc_intra))[1:])
        fcdc = _HAD2 @ cdc_w @ _HAD2
        mf00c = int(_MF_TAB[qpc % 6, 0])
        cdcq = np.sign(fcdc) * ((np.abs(fcdc) * mf00c + 2 * fc_intra) >> (16 + qpc // 6))
        cdc_levels[comp] = [int(cdcq[r, c]) for r, c in _CDC_SCAN]
        cac_levels[comp] = blocks
    any_cac = any(any(b) for comp in (0, 1) for b in cac_levels[comp])
    any_cdc = any(v for comp in (0, 1) for v in cdc_levels[comp])
    cbp_chroma = 2 if any_cac else (1 if any_cdc else 0)
    if cbp_chroma < 2:
        cac_levels = {0: [[0] * 15 for _ in range(4)], 1: [[0] * 15 for _ in range(4)]}

    # ---- write the bitstream
    bw.ue(1 + best_mode + 4 * cbp_chroma + (12 if cbp_luma else 0))
    bw.ue(0)  # intra_chroma_pred_mode: DC
    bw.se(0)  # mb_qp_delta
    nc_dc = pic.luma_nnz.n_c(mbx, mby, 0, 0, sm, slice_idx)
    _encode_residual(bw, dc_levels, 16, nc_dc)
    if cbp_luma:
        for idx in range(16):
            bx, by = _BLK_XY[idx]
            nc = pic.luma_nnz.n_c(mbx, mby, bx, by, sm, slice_idx)
            total = _encode_residual(bw, ac_levels[idx], 15, nc)
            pic.luma_nnz.set(mbx, mby, bx, by, total)
    else:
        pic.luma_nnz.fill_mb(mbx, mby, 0)
    if cbp_chroma:
        _encode_residual(bw, cdc_levels[0], 4, -1)
        _encode_residual(bw, cdc_levels[1], 4, -1)
    if cbp_chroma == 2:
        for comp, grid in ((0, pic.cb_nnz), (1, pic.cr_nnz)):
            for idx in range(4):
                bx, by = idx & 1, idx >> 1
                nc = grid.n_c(mbx, mby, bx, by, sm, slice_idx)
                total = _encode_residual(bw, cac_levels[comp][idx], 15, nc)
                grid.set(mbx, mby, bx, by, total)
    else:
        pic.cb_nnz.fill_mb(mbx, mby, 0)
        pic.cr_nnz.fill_mb(mbx, mby, 0)

    # ---- reconstruct exactly as the decoder will
    pic.y[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16] = _recon_luma_i16(
        best_pred, dc_levels, ac_levels, qp
    )
    for comp, plane in ((0, pic.u), (1, pic.v)):
        ctop, cleft = pic.neighbors8(plane, mbx, mby, slice_idx)
        cpred = _pred_chroma(0, ctop, cleft)
        plane[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8] = _recon_chroma(
            cpred, cdc_levels[comp], cac_levels[comp], qpc
        )


def _derive_chroma(y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic chroma planes from luma (the fixture convention
    functions/y4m.py uses): 2x2-mean downsample shifted into chroma
    range — real plane data exercising the chroma path end to end."""
    h, w = y.shape
    ds = (y.reshape(h // 2, 2, w // 2, 2).astype(np.uint16).sum(axis=(1, 3)) // 4).astype(
        np.uint8
    )
    return (ds // 2 + 64).astype(np.uint8), (255 - ds // 2 - 64).astype(np.uint8)


def encode_h264_with_recon(
    frames_y: np.ndarray, qp: int = 24, pcm_every: int = 0
) -> tuple[bytes, np.ndarray, np.ndarray, np.ndarray]:
    """uint8 luma frames (n, h, w), even h/w -> (Annex-B H.264 bytes,
    reconstructed Y/U/V planes). Every frame is an IDR picture (the
    still-extraction layout); chroma is derived from luma as in
    ``encode_y4m``. ``pcm_every`` > 0 makes every k-th macroblock
    I_PCM (lossless raw samples), exercising the PCM path alongside
    transform-coded MBs. The returned reconstruction is BIT-EXACT with
    what ``decode_h264`` yields on the returned bytes: both run the
    same integer reconstruction helpers."""
    f = np.ascontiguousarray(frames_y, dtype=np.uint8)
    if f.ndim != 3 or f.shape[0] < 1:
        raise ValueError(f"want (n, h, w) luma frames, got shape {frames_y.shape}")
    if not 0 <= qp <= 51:
        raise ValueError(f"qp must be in [0, 51], got {qp}")
    n, h, w = f.shape
    if h % 2 or w % 2:
        raise ValueError("4:2:0 needs even frame dimensions")
    pad_r = (-w) % 16
    pad_b = (-h) % 16
    mb_w, mb_h = (w + pad_r) // 16, (h + pad_b) // 16
    out = bytearray()
    _write_nal(out, 3, 7, _write_sps(mb_w, mb_h, pad_r, pad_b))
    _write_nal(out, 3, 8, _write_pps(qp))
    rec_y = np.zeros((n, h, w), dtype=np.uint8)
    rec_u = np.zeros((n, h // 2, w // 2), dtype=np.uint8)
    rec_v = np.zeros((n, h // 2, w // 2), dtype=np.uint8)
    sps = {"mb_w": mb_w, "mb_h": mb_h}
    mb_counter = 0
    for t in range(n):
        y_pad = np.pad(f[t], ((0, pad_b), (0, pad_r)), mode="edge")
        u_pad, v_pad = _derive_chroma(y_pad)
        pic = _Picture(sps)
        bw = BitWriter()
        _write_slice_header(bw, 4, t & 1)  # idr_pic_id alternates
        for mby in range(mb_h):
            for mbx in range(mb_w):
                pic.slice_map[mby, mbx] = 0
                sy = y_pad[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16]
                su = u_pad[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8]
                sv = v_pad[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8]
                if pcm_every > 0 and mb_counter % pcm_every == 0:
                    bw.ue(25)
                    bw.align_zero()
                    for px in sy.flatten():
                        bw.bits(int(px), 8)
                    for px in su.flatten():
                        bw.bits(int(px), 8)
                    for px in sv.flatten():
                        bw.bits(int(px), 8)
                    pic.y[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16] = sy
                    pic.u[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8] = su
                    pic.v[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8] = sv
                    pic.luma_nnz.fill_mb(mbx, mby, 16)
                    pic.cb_nnz.fill_mb(mbx, mby, 16)
                    pic.cr_nnz.fill_mb(mbx, mby, 16)
                else:
                    _encode_mb_i16(bw, pic, sy, su, sv, mbx, mby, qp)
                mb_counter += 1
        bw.rbsp_trailing()
        _write_nal(out, 3, 5, bw.getvalue())
        rec_y[t] = pic.y[:h, :w]
        rec_u[t] = pic.u[: h // 2, : w // 2]
        rec_v[t] = pic.v[: h // 2, : w // 2]
    return bytes(out), rec_y, rec_u, rec_v


def encode_h264(frames_y: np.ndarray, qp: int = 24, pcm_every: int = 0) -> bytes:
    return encode_h264_with_recon(frames_y, qp, pcm_every)[0]


def decode_h264(data: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray, int, int]:
    """Annex-B H.264 bytes -> (Y frames (n,h,w), U, V frames
    (n,h/2,w/2) uint8, width, height). Decodes baseline I-frame streams
    (see module docstring for the exact envelope); raises ValueError
    with an explicit message on anything outside it or on corruption."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise ValueError("decode_h264 wants bytes")
    nals = _split_nals(bytes(data))
    sps_by_id: dict[int, dict] = {}
    pps_by_id: dict[int, dict] = {}
    frames: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    slice_counter = 0
    for nal in nals:
        hdr = nal[0]
        if hdr & 0x80:
            raise ValueError("corrupt H.264 stream: forbidden_zero_bit set")
        nal_type = hdr & 0x1F
        rbsp = _unescape_rbsp(nal[1:])
        if nal_type == 7:
            s = _parse_sps(rbsp)
            sps_by_id[s["id"]] = s
        elif nal_type == 8:
            p = _parse_pps(rbsp)
            pps_by_id[p["id"]] = p
        elif nal_type in (1, 5):
            if not sps_by_id or not pps_by_id:
                raise ValueError("corrupt H.264 stream: slice before SPS/PPS")
            # bind to the PPS the slice header actually references (r5
            # advice: binding to id 0 silently mis-decoded multi-PPS
            # streams): peek first_mb / slice_type / pic_parameter_set_id
            # — the full header parse below re-reads and validates them
            peek = BitReader(rbsp)
            peek.ue()
            peek.ue()
            pps = pps_by_id.get(peek.ue())
            if pps is None:
                raise ValueError(
                    "corrupt H.264 stream: slice references an undefined PPS"
                )
            sps = sps_by_id.get(pps["sps_id"])
            if sps is None:
                raise ValueError(
                    "corrupt H.264 stream: PPS references an undefined SPS"
                )
            br = BitReader(rbsp)
            sh = _parse_slice_header(br, sps, pps, nal_type == 5)
            if sh["first_mb"] != 0:
                raise ValueError(
                    "unsupported H.264 feature: multi-slice pictures "
                    "(first_mb_in_slice != 0)"
                )
            pic = _Picture(sps)
            qp = sh["qp"]
            n_mbs = sps["mb_w"] * sps["mb_h"]
            for mb_idx in range(n_mbs):
                if not br.more_rbsp_data():
                    raise ValueError(
                        f"truncated H.264 stream: slice ended at MB {mb_idx}/{n_mbs}"
                    )
                qp = _decode_mb(
                    br,
                    pic,
                    mb_idx % sps["mb_w"],
                    mb_idx // sps["mb_w"],
                    slice_counter,
                    qp,
                    pps["chroma_qp_off"],
                )
            if br.more_rbsp_data():
                raise ValueError("corrupt H.264 stream: trailing data after last MB")
            slice_counter += 1
            t, l = sps["crop_t"], sps["crop_l"]
            h, w = sps["height"], sps["width"]
            frames.append(
                (
                    pic.y[t : t + h, l : l + w].copy(),
                    pic.u[t // 2 : (t + h) // 2, l // 2 : (l + w) // 2].copy(),
                    pic.v[t // 2 : (t + h) // 2, l // 2 : (l + w) // 2].copy(),
                )
            )
        # other NAL types (SEI, AUD, filler) carry no pixels: skip
    if not frames:
        raise ValueError("truncated H.264 stream: no decodable pictures")
    y = np.stack([fr[0] for fr in frames])
    u = np.stack([fr[1] for fr in frames])
    v = np.stack([fr[2] for fr in frames])
    return y, u, v, y.shape[2], y.shape[1]
