"""Pure-numpy FLAC codec — the COMPRESSED-audio analog of
`functions/gif.py` (lossless, so the oracle gate is exact-hash).

The decoder parses the real bitstream (RFC 9639): STREAMINFO metadata,
frame headers (sync, coded/explicit block sizes, coded/end-of-header
sample rates, UTF-8-coded frame numbers, CRC-8), all four channel
assignments (independent, left/side, right/side, mid/side), wasted-bits
shifting, CONSTANT / VERBATIM / FIXED(0-4) / LPC subframes, both rice
residual methods (4- and 5-bit parameters) with escaped raw partitions,
frame CRC-16, and the STREAMINFO MD5 of the decoded PCM as an end-to-end
self-check. FLAC is lossless: the decoded samples are bit-equal to the
source, so the fixture plants truth from the SOURCE samples and a Spark
kernel reproducing it proves the decoder (same gate design as PNG/WAV).

The encoder exists for fixture generation only (deterministic, seeded by
the caller): stereo-mode selection by residual cost, fixed-predictor
order search, genuine quantized-LPC subframes via Levinson-Durbin, rice
parameter estimation per partition, and explicit knobs so tests can
force every decode path (escape partitions, rice2, verbatim, wasted
bits, explicit block-size/sample-rate header fields).

Decode hot paths are numpy-vectorized: rice partitions scan a
precomputed ones-index (one searchsorted walk for the unary
terminators, then one gather-matmul for all remainder bits), fixed
predictors restore by repeated integer cumsum (the order-o predictor is
exactly the o-th difference operator), and warmup/verbatim samples read
as one bit-matrix product. Only LPC prediction is a per-sample loop —
inherent to arbitrary-coefficient IIR reconstruction.

Reference scope note: the reference pipeline carries media blobs
opaquely (SURVEY §2 multimodal columns); real decode is part of the
added training-data suite.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_SR_CODES = {
    88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
    24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11,
}
_SR_DECODE = {v: k for k, v in _SR_CODES.items()}

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc_table(poly: int, width: int):
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tbl = np.zeros(256, dtype=np.int64)
    for b in range(256):
        c = b << (width - 8)
        for _ in range(8):
            c = ((c << 1) ^ poly) & mask if c & top else (c << 1) & mask
        tbl[b] = c
    return tbl


_CRC8_TBL = _crc_table(0x07, 8)
_CRC16_TBL = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_TBL[c ^ b])
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC16_TBL[((c >> 8) ^ b) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style variable-length frame/sample number."""
    if n < 0x80:
        return bytes([n])
    # payload thresholds: 11, 16, 21, 26, 31, 36 bits
    for extra, lead, limit in (
        (1, 0xC0, 1 << 11), (2, 0xE0, 1 << 16), (3, 0xF0, 1 << 21),
        (4, 0xF8, 1 << 26), (5, 0xFC, 1 << 31), (6, 0xFE, 1 << 36),
    ):
        if n < limit:
            out = [lead | (n >> (6 * extra)) if extra < 6 else lead]
            for k in range(extra - 1, -1, -1):
                out.append(0x80 | ((n >> (6 * k)) & 0x3F))
            return bytes(out)
    raise ValueError(f"frame number too large: {n}")


class _BitWriter:
    def __init__(self, prefix: bytes = b""):
        self.buf = bytearray(prefix)
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, n: int) -> None:
        if n == 0:
            return
        if val < 0 or val >> n:
            raise ValueError(f"value {val} does not fit {n} bits")
        self.acc = (self.acc << n) | val
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, val: int, n: int) -> None:
        self.write(val & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        if self.nbits:
            raise ValueError("unaligned bit writer")
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos_bytes: int = 0):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.ones = np.flatnonzero(self.bits)
        self.pos = pos_bytes * 8

    def _take(self, n: int) -> np.ndarray:
        if self.pos + n > self.bits.size:
            raise ValueError("truncated FLAC: bitstream ended mid-field")
        c = self.bits[self.pos : self.pos + n]
        self.pos += n
        return c

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        c = self._take(n)
        if n > 56:  # split to stay inside exact int64 dot products
            hi = int(c[: n - 32].dot(1 << np.arange(n - 33, -1, -1, dtype=np.int64)))
            lo = int(c[n - 32 :].dot(1 << np.arange(31, -1, -1, dtype=np.int64)))
            return (hi << 32) | lo
        return int(c.dot(1 << np.arange(n - 1, -1, -1, dtype=np.int64)))

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= 1 << (n - 1) else v

    def read_signed_array(self, count: int, n: int) -> np.ndarray:
        """count n-bit two's-complement values as one bit-matrix product."""
        if count == 0 or n == 0:
            return np.zeros(count, dtype=np.int64)
        c = self._take(count * n).reshape(count, n)
        v = c @ (1 << np.arange(n - 1, -1, -1, dtype=np.int64))
        return np.where(v >= 1 << (n - 1), v - (1 << n), v)

    def read_unary(self) -> int:
        j = np.searchsorted(self.ones, self.pos)
        if j >= self.ones.size:
            raise ValueError("truncated FLAC: unary run past end")
        t = int(self.ones[j])
        q = t - self.pos
        self.pos = t + 1
        return q

    def read_rice_array(self, count: int, k: int) -> np.ndarray:
        """count rice(k) codes: walk the precomputed ones-index for the
        unary terminators (each index entry visited at most once), then
        gather all remainder bits in one fancy-index matmul."""
        if count == 0:
            return np.zeros(0, dtype=np.int64)
        ones = self.ones
        j = int(np.searchsorted(ones, self.pos))
        t = np.empty(count, dtype=np.int64)
        pos = self.pos
        n_ones = ones.size
        for i in range(count):
            while True:
                if j >= n_ones:
                    raise ValueError("truncated FLAC: rice run past end")
                ti = ones[j]
                j += 1
                if ti >= pos:
                    break
            t[i] = ti
            pos = ti + 1 + k
        if pos > self.bits.size:
            raise ValueError("truncated FLAC: rice remainder past end")
        starts = np.empty(count, dtype=np.int64)
        starts[0] = self.pos
        if count > 1:
            starts[1:] = t[:-1] + 1 + k
        q = t - starts
        if k:
            rem = self.bits[(t[:, None] + 1) + np.arange(k)] @ (
                1 << np.arange(k - 1, -1, -1, dtype=np.int64)
            )
        else:
            rem = np.zeros(count, dtype=np.int64)
        self.pos = pos
        u = (q << k) | rem
        return (u >> 1) ^ -(u & 1)

    def align(self) -> None:
        if self.pos % 8:
            pad = self._take(8 - self.pos % 8)
            if pad.any():
                raise ValueError("corrupt FLAC: nonzero frame padding")

    @property
    def byte_pos(self) -> int:
        if self.pos % 8:
            raise ValueError("bit reader not byte aligned")
        return self.pos // 8


# ---------------------------------------------------------------- encode

def _zigzag(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    return np.where(v >= 0, v << 1, (-v << 1) - 1)


def _signed_bits(v: np.ndarray) -> int:
    """Minimum two's-complement width holding every value (0 if empty/zero)."""
    if v.size == 0:
        return 0
    lo, hi = int(v.min()), int(v.max())
    n = 0
    for x in (lo, hi):
        need = x.bit_length() + 1 if x >= 0 else (~x).bit_length() + 1
        n = max(n, need)
    return 0 if (lo == 0 and hi == 0) else n


def _best_rice_k(u: np.ndarray, max_k: int) -> int:
    if u.size == 0:
        return 0
    total = int(u.sum())
    k = 0
    while k < max_k and (u.size << (k + 1)) < total:
        k += 1
    return k


def _write_residual(
    bw: _BitWriter,
    res: np.ndarray,
    order: int,
    block_size: int,
    partition_order: int,
    rice2: bool,
    force_escape: bool,
) -> None:
    method = 1 if rice2 else 0
    pbits = 5 if rice2 else 4
    escape = (1 << pbits) - 1
    bw.write(method, 2)
    bw.write(partition_order, 4)
    nparts = 1 << partition_order
    idx = 0
    for p in range(nparts):
        cnt = block_size // nparts - (order if p == 0 else 0)
        part = res[idx : idx + cnt]
        idx += cnt
        if force_escape and p == 0:
            nb = _signed_bits(part)
            bw.write(escape, pbits)
            bw.write(nb, 5)
            for v in part:
                bw.write_signed(int(v), nb) if nb else None
        else:
            u = _zigzag(part)
            k = _best_rice_k(u, escape - 1)
            bw.write(k, pbits)
            for v in u:
                v = int(v)
                bw.write_unary(v >> k)
                if k:
                    bw.write(v & ((1 << k) - 1), k)


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    return np.diff(x.astype(np.int64), n=order)


def _levinson(x: np.ndarray, order: int):
    xf = x.astype(np.float64)
    n = xf.size
    if n <= order + 1:
        return None
    ac = np.array([float(np.dot(xf[: n - l], xf[l:])) for l in range(order + 1)])
    if ac[0] <= 0:
        return None
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - sum(a[j] * ac[i - j] for j in range(i))
        if err == 0:
            return None
        k = acc / err
        new_a = a.copy()
        new_a[i] = k
        for j in range(i):
            new_a[j] = a[j] - k * a[i - 1 - j]
        a = new_a
        err *= 1 - k * k
        if err <= 0:
            return None
    return a


def _quantize_lpc(a: np.ndarray, precision: int):
    cmax = float(np.max(np.abs(a)))
    if cmax <= 0:
        return None
    shift = precision - 1 - int(np.floor(np.log2(cmax))) - 1
    shift = max(0, min(15, shift))
    lim = 1 << (precision - 1)
    q = np.clip(np.round(a * (1 << shift)), -lim, lim - 1).astype(np.int64)
    if not q.any():
        return None
    return q, shift


def _lpc_residual(x: np.ndarray, coefs: np.ndarray, shift: int) -> np.ndarray:
    """e[i] = x[i] - ((sum_j c[j] * x[i-1-j]) >> shift) — the spec's exact
    integer arithmetic, vectorized as a strided matmul (object-free int64:
    16-bit samples x 15-bit coefs x order fits comfortably)."""
    order = coefs.size
    xi = x.astype(np.int64)
    n = xi.size
    # window matrix: row i holds x[i-1], x[i-2], ..., x[i-order]
    w = np.lib.stride_tricks.sliding_window_view(xi, order)[:-1][:, ::-1]
    pred = (w @ coefs) >> shift
    return xi[order:] - pred


def _encode_subframe(
    bw: _BitWriter,
    x: np.ndarray,
    bps: int,
    *,
    force_type: str | None,
    lpc_order: int,
    rice2: bool,
    partition_order: int,
    force_escape: bool,
) -> None:
    x = x.astype(np.int64)
    # wasted bits: shift out trailing zero bits common to every sample
    wasted = 0
    if x.any():
        tz = int(np.min([(int(v) & -int(v)).bit_length() - 1 for v in x if v]))
        wasted = min(tz, bps - 1)
    if force_type == "verbatim":
        wasted = 0
    d = x >> wasted
    ebps = bps - wasted

    def header(type_bits: int) -> None:
        bw.write(0, 1)
        bw.write(type_bits, 6)
        if wasted:
            bw.write(1, 1)
            bw.write_unary(wasted - 1)
        else:
            bw.write(0, 1)

    if force_type == "constant" or (force_type is None and np.all(d == d[0])):
        header(0b000000)
        bw.write_signed(int(d[0]), ebps)
        return
    if force_type == "verbatim":
        header(0b000001)
        for v in d:
            bw.write_signed(int(v), ebps)
        return
    if force_type == "lpc" or (force_type is None and lpc_order > 0):
        a = _levinson(d, lpc_order)
        q = _quantize_lpc(a, 12) if a is not None else None
        if q is not None:
            coefs, shift = q
            res = _lpc_residual(d, coefs, shift)
            header(0b100000 | (lpc_order - 1))
            for v in d[:lpc_order]:
                bw.write_signed(int(v), ebps)
            bw.write(12 - 1, 4)
            bw.write(shift, 5)  # shift is >= 0; field is 5-bit signed
            for c in coefs:
                bw.write_signed(int(c), 12)
            po = partition_order
            while (d.size % (1 << po)) or (d.size >> po) <= lpc_order:
                po -= 1
            _write_residual(bw, res, lpc_order, d.size, po, rice2, force_escape)
            return
        # degenerate signal: fall through to fixed
    best, best_cost = 0, None
    for o in range(5):
        if d.size <= o:
            break
        cost = int(np.abs(_fixed_residual(d, o)).sum()) if d.size > o else 0
        if best_cost is None or cost < best_cost:
            best, best_cost = o, cost
    res = _fixed_residual(d, best)
    header(0b001000 | best)
    for v in d[:best]:
        bw.write_signed(int(v), ebps)
    po = partition_order
    while (d.size % (1 << po)) or (d.size >> po) <= best:
        po -= 1
    _write_residual(bw, res, best, d.size, po, rice2, force_escape)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 16000,
    block_size: int = 256,
    *,
    stereo_mode: str = "auto",
    force_type: str | None = None,
    lpc_order: int = 0,
    rice2: bool = False,
    partition_order: int = 0,
    force_escape: bool = False,
    bps: int = 16,
) -> bytes:
    """int16-range samples, shape (n,) or (n, ch up to 8) -> FLAC bytes.

    Fixture-generation encoder: the knobs force specific decode paths so
    tests and fixtures cover the whole decoder. Output is a genuine,
    spec-conforming stream (STREAMINFO with MD5, CRC-8/CRC-16 framing)."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[0] < 1 or not 1 <= s.shape[1] <= 8:
        raise ValueError(f"want (n,) or (n, ch<=8) samples, got {samples.shape}")
    lim = 1 << (bps - 1)
    if s.min() < -lim or s.max() >= lim:
        raise ValueError(f"samples exceed {bps}-bit range")
    n, ch = s.shape
    if stereo_mode != "auto" and stereo_mode != "independent" and ch != 2:
        raise ValueError(f"stereo_mode={stereo_mode} needs 2 channels")

    # STREAMINFO MD5 is the packed-sample digest; for widths numpy cannot
    # pack natively (e.g. 24-bit) write the spec's "unset" all-zeros value
    # instead of a wrong digest a conforming decoder would reject
    if bps in (8, 16, 32):
        md5 = hashlib.md5(s.astype(f"<i{bps // 8}").tobytes()).digest()
    else:
        md5 = b"\x00" * 16
    # STREAMINFO
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    info = si.getvalue() + md5
    out = bytearray(b"fLaC")
    out.append(0x80)  # last-metadata-block, type 0 (STREAMINFO)
    out += struct.pack(">I", len(info))[1:]
    out += info

    sr_code = _SR_CODES.get(sample_rate, 13 if sample_rate < 1 << 16 else 0)
    for fi, start in enumerate(range(0, n, block_size)):
        blk = s[start : start + block_size]
        bs = blk.shape[0]
        if bs == 192:
            bs_code, bs_tail = 1, b""
        elif bs in (576, 1152, 2304, 4608):
            bs_code, bs_tail = 2 + (bs // 576).bit_length() - 1, b""
        elif bs in (256, 512, 1024, 2048, 4096, 8192, 16384, 32768):
            bs_code, bs_tail = 8 + (bs // 256).bit_length() - 1, b""
        elif bs <= 256:
            bs_code, bs_tail = 6, bytes([bs - 1])
        else:
            bs_code, bs_tail = 7, struct.pack(">H", bs - 1)
        sr_tail = struct.pack(">H", sample_rate) if sr_code == 13 else b""

        mode = stereo_mode
        if ch == 2 and mode == "auto":
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            mid = (left + right) >> 1
            costs = {
                "independent": _cost(left) + _cost(right),
                "left_side": _cost(left) + _cost(side),
                "right_side": _cost(right) + _cost(side),
                "mid_side": _cost(mid) + _cost(side),
            }
            mode = min(costs, key=lambda m: (costs[m], m))
        if ch == 2 and mode != "independent":
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if mode == "left_side":
                chans, assign = [(left, bps), (side, bps + 1)], 0b1000
            elif mode == "right_side":
                chans, assign = [(side, bps + 1), (right, bps)], 0b1001
            else:
                chans, assign = [((left + right) >> 1, bps), (side, bps + 1)], 0b1010
        else:
            chans = [(blk[:, c], bps) for c in range(ch)]
            assign = ch - 1

        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocking strategy
        hdr.write(bs_code, 4)
        hdr.write(sr_code, 4)
        hdr.write(assign, 4)
        hdr.write(0b100 if bps == 16 else 0, 3)
        hdr.write(0, 1)  # reserved
        header = hdr.getvalue() + _utf8_number(fi) + bs_tail + sr_tail
        header += bytes([_crc8(header)])

        fw = _BitWriter(header)
        for data, cbps in chans:
            _encode_subframe(
                fw, data, cbps,
                force_type=force_type, lpc_order=lpc_order, rice2=rice2,
                partition_order=partition_order, force_escape=force_escape,
            )
        fw.align()
        frame = fw.getvalue()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def _cost(x: np.ndarray) -> int:
    return int(np.abs(np.diff(x.astype(np.int64), n=2)).sum()) if x.size > 2 else 0


# ---------------------------------------------------------------- decode

def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    extra = 0
    mask = 0x40
    while b0 & mask:
        extra += 1
        mask >>= 1
    if extra < 1 or extra > 6:
        raise ValueError("corrupt FLAC: bad UTF-8 frame number lead byte")
    n = b0 & (mask - 1)
    for _ in range(extra):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("corrupt FLAC: bad UTF-8 continuation byte")
        n = (n << 6) | (c & 0x3F)
    return n


def _read_residual(br: _BitReader, order: int, block_size: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"corrupt FLAC: reserved residual method {method}")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    po = br.read(4)
    if block_size % (1 << po):
        raise ValueError("corrupt FLAC: partition order does not divide block")
    parts = []
    for p in range(1 << po):
        cnt = (block_size >> po) - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("corrupt FLAC: predictor order exceeds partition")
        k = br.read(pbits)
        if k == escape:
            nb = br.read(5)
            parts.append(br.read_signed_array(cnt, nb))
        else:
            parts.append(br.read_rice_array(cnt, k))
    return np.concatenate(parts) if parts else np.zeros(0, dtype=np.int64)


def _restore_fixed(warmup: np.ndarray, res: np.ndarray, order: int) -> np.ndarray:
    """The order-o fixed predictor is the o-th difference operator, so
    reconstruction is o seeded integer cumsums — no per-sample loop."""
    if order == 0:
        return res.copy()
    w = warmup.astype(np.int64)
    diffs = [w]
    for _ in range(order - 1):
        diffs.append(np.diff(diffs[-1]))
    cur = res.astype(np.int64)
    for l in range(order, 0, -1):
        cur = diffs[l - 1][-1] + np.cumsum(cur)
    return np.concatenate([w, cur])


def _restore_lpc(
    warmup: np.ndarray, res: np.ndarray, coefs: list[int], shift: int
) -> np.ndarray:
    order = len(coefs)
    x = [int(v) for v in warmup]
    for e in res:
        pred = 0
        for j, c in enumerate(coefs):
            pred += c * x[-1 - j]
        x.append(int(e) + (pred >> shift))
    return np.asarray(x, dtype=np.int64)


def _decode_subframe(br: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("corrupt FLAC: subframe padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    ebps = bps - wasted
    if ebps < 1:
        raise ValueError("corrupt FLAC: wasted bits exceed sample size")
    if t == 0b000000:
        out = np.full(block_size, br.read_signed(ebps), dtype=np.int64)
    elif t == 0b000001:
        out = br.read_signed_array(block_size, ebps)
    elif 0b001000 <= t <= 0b001100:
        order = t & 0b111
        warmup = br.read_signed_array(order, ebps)
        res = _read_residual(br, order, block_size)
        out = _restore_fixed(warmup, res, order)
    elif t & 0b100000:
        order = (t & 0b11111) + 1
        warmup = br.read_signed_array(order, ebps)
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("corrupt FLAC: invalid LPC precision code")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("corrupt FLAC: negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, order, block_size)
        out = _restore_lpc(warmup, res, coefs, shift)
    else:
        raise ValueError(f"corrupt FLAC: reserved subframe type {t:06b}")
    if out.size != block_size:
        raise ValueError("corrupt FLAC: subframe sample count mismatch")
    return out << wasted


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> (int32 samples shape (n, ch), sample_rate).

    Validates magic, STREAMINFO, frame sync, header CRC-8, frame CRC-16,
    frame numbering, and (when present) the STREAMINFO MD5 of the decoded
    PCM; raises ValueError on any inconsistency."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise ValueError("decode_flac wants bytes")
    data = bytes(data)
    if len(data) < 42 or data[:4] != b"fLaC":
        raise ValueError("not a FLAC: bad magic")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC: metadata header past end")
        last = data[pos] & 0x80
        btype = data[pos] & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + ln]
        if len(body) < ln:
            raise ValueError("truncated FLAC: metadata block past end")
        if btype == 0:
            if ln < 34:
                raise ValueError("corrupt FLAC: short STREAMINFO")
            info = body
        elif btype == 127:
            raise ValueError("corrupt FLAC: invalid metadata block type 127")
        pos += 4 + ln
        if last:
            break
    if info is None:
        raise ValueError("corrupt FLAC: missing STREAMINFO")
    ib = _BitReader(info)
    ib.read(16)  # min block size
    ib.read(16)  # max block size
    ib.read(24)
    ib.read(24)
    sr_info = ib.read(20)
    n_ch = ib.read(3) + 1
    bps_info = ib.read(5) + 1
    total = ib.read(36)
    md5_info = info[18:34]

    br = _BitReader(data, pos_bytes=pos)
    chans_out = [[] for _ in range(n_ch)]
    got = 0
    frame_idx = 0
    # total_samples == 0 means UNKNOWN (RFC 9639): decode frames to EOF
    while (got < total) if total else (br.pos < br.bits.size):
        frame_start = br.byte_pos
        if br.read(14) != 0b11111111111110:
            raise ValueError("corrupt FLAC: lost frame sync")
        if br.read(1):
            raise ValueError("corrupt FLAC: reserved frame header bit set")
        variable = br.read(1)
        bs_code = br.read(4)
        sr_code = br.read(4)
        assign = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("corrupt FLAC: reserved frame header bit set")
        num = _read_utf8_number(br)
        if not variable and num != frame_idx:
            raise ValueError(
                f"corrupt FLAC: frame number {num}, expected {frame_idx}"
            )
        if bs_code == 0:
            raise ValueError("corrupt FLAC: reserved block size code")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = br.read(8) + 1
        elif bs_code == 7:
            bs = br.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 0:
            sr = sr_info
        elif sr_code in _SR_DECODE:
            sr = _SR_DECODE[sr_code]
        elif sr_code == 12:
            sr = br.read(8) * 1000
        elif sr_code == 13:
            sr = br.read(16)
        elif sr_code == 14:
            sr = br.read(16) * 10
        else:
            raise ValueError("corrupt FLAC: invalid sample rate code")
        if sr != sr_info:
            raise ValueError("corrupt FLAC: frame sample rate != STREAMINFO")
        if ss_code == 0:
            bps = bps_info
        else:
            bps = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(ss_code)
            if bps is None:
                raise ValueError("corrupt FLAC: reserved sample size code")
        if _crc8(data[frame_start : br.byte_pos]) != br.read(8):
            raise ValueError("corrupt FLAC: frame header CRC-8 mismatch")

        if assign <= 7:
            n_sub = assign + 1
            sub_bps = [bps] * n_sub
        elif assign in (8, 9, 10):
            n_sub = 2
            side_idx = 1 if assign in (8, 10) else 0
            sub_bps = [bps, bps]
            sub_bps[side_idx] += 1
        else:
            raise ValueError(f"corrupt FLAC: reserved channel assignment {assign}")
        if n_sub != n_ch:
            raise ValueError("corrupt FLAC: frame channel count != STREAMINFO")
        subs = [_decode_subframe(br, bs, sub_bps[c]) for c in range(n_sub)]
        br.align()
        crc = _crc16(data[frame_start : br.byte_pos])
        if crc != br.read(16):
            raise ValueError("corrupt FLAC: frame CRC-16 mismatch")

        if assign == 8:  # left/side
            left, side = subs
            subs = [left, left - side]
        elif assign == 9:  # right/side
            side, right = subs
            subs = [right + side, right]
        elif assign == 10:  # mid/side
            mid, side = subs
            mid = (mid << 1) | (side & 1)
            subs = [(mid + side) >> 1, (mid - side) >> 1]
        for c in range(n_ch):
            chans_out[c].append(subs[c])
        got += bs
        frame_idx += 1
    if total and got != total:
        raise ValueError("corrupt FLAC: decoded sample count != STREAMINFO total")
    if got == 0:
        raise ValueError("corrupt FLAC: stream contains no audio frames")
    out = np.stack(
        [np.concatenate(c) for c in chans_out], axis=1
    ).astype(np.int32)
    if md5_info != b"\x00" * 16 and bps_info in (8, 16, 32):
        calc = hashlib.md5(
            out.astype(f"<i{bps_info // 8}").tobytes()
        ).digest()
        if calc != md5_info:
            raise ValueError("corrupt FLAC: decoded PCM MD5 != STREAMINFO MD5")
    return out, sr_info
