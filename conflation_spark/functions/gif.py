"""Pure-stdlib GIF codec (GIF87a/89a, LZW) — the palette-indexed
counterpart of ``functions/png.py``.

Implements the parts of GIF that carry pixels end-to-end:

- logical screen descriptor + global color table
- image descriptor + optional local color table (overrides global)
- LZW decompression with variable code width, CLEAR/EOI codes and the
  deferred-clear sequence (dictionary frozen at 4096 until CLEAR)
- row interlacing (the 8/8/4/2 four-pass layout)
- extension blocks (graphic control / comment / application / plain
  text) are length-framed and skipped — none of them alter pixel bytes

GIF is LOSSLESS for palette-indexed content: ``decode_gif(encode_gif(
palette, idx))`` returns ``palette[idx]`` exactly, so fixture truth
planted from the source pixels gates the decoder bit-for-bit (same
design as PNG, unlike the tolerance-gated lossy JPEG path).

Only the first image block is decoded (the still-image contract the
image-feature pipeline needs); animation frames after the first are
ignored. The encoder writes a single-frame GIF89a.

Reference context: the conflation reference treats every trace point as
an image id fetched from an external service
(/root/reference/conflation/trace_fetching/mapillary.py:41) and never
decodes pixels; real-corpus image payloads are PNG/JPEG/GIF, hence the
three real decoders here.
"""

from __future__ import annotations

import struct

import numpy as np

_TRAILER = 0x3B
_IMAGE_SEPARATOR = 0x2C
_EXTENSION = 0x21


# ---------------------------------------------------------------------------
# LZW


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    """GIF-flavour LZW: variable-width codes starting at min_code_size+1,
    little-endian bit packing, CLEAR resets the table, EOI terminates.
    Returns exactly ``expected`` palette indices (uint8); raises
    ValueError on malformed streams or early truncation."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(expected, dtype=np.uint8)
    n_out = 0

    # table as (prefix_code, last_byte, first_byte, length) — reconstruct
    # strings only on emit by walking prefixes (bounded by string length)
    prefix = np.full(4096, -1, dtype=np.int32)
    last = np.zeros(4096, dtype=np.uint8)
    first = np.zeros(4096, dtype=np.uint8)
    length = np.zeros(4096, dtype=np.int32)
    for c in range(clear):
        last[c] = first[c] = c
        length[c] = 1
    next_code = eoi + 1
    width = min_code_size + 1

    buf = 0
    nbits = 0
    pos = 0
    prev = -1
    data_len = len(data)

    def emit(code: int) -> None:
        nonlocal n_out
        ln = length[code]
        if n_out + ln > expected:
            raise ValueError("LZW output exceeds the image's pixel count")
        i = n_out + ln - 1
        c = code
        while c >= 0:
            out[i] = last[c]
            c = prefix[c]
            i -= 1
        n_out += ln

    while True:
        while nbits < width:
            if pos >= data_len:
                raise ValueError("LZW stream truncated before EOI")
            buf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = buf & ((1 << width) - 1)
        buf >>= width
        nbits -= width

        if code == clear:
            next_code = eoi + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            break

        if prev == -1:
            if code >= clear:
                raise ValueError("first LZW code after CLEAR must be a root")
            emit(code)
        elif code < next_code:
            # normal case: new entry = string(prev) + first(string(code))
            if next_code < 4096:
                prefix[next_code] = prev
                first[next_code] = first[prev]
                last[next_code] = first[code]
                length[next_code] = length[prev] + 1
                next_code += 1
                if next_code < 4096 and next_code == (1 << width):
                    width += 1
            emit(code)
        elif code == next_code and next_code < 4096:
            # KwKwK: entry = string(prev) + first(string(prev))
            prefix[next_code] = prev
            first[next_code] = first[prev]
            last[next_code] = first[prev]
            length[next_code] = length[prev] + 1
            next_code += 1
            if next_code < 4096 and next_code == (1 << width):
                width += 1
            emit(code)
        else:
            raise ValueError(f"LZW code {code} out of range (next={next_code})")
        prev = code
        if n_out == expected:
            # done; a trailing EOI may follow but its absence is tolerated
            return out
    if n_out != expected:
        raise ValueError(f"LZW produced {n_out} of {expected} pixels")
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Standard GIF LZW encoder: emits CLEAR, string codes with table
    growth to 4096 then CLEAR-reset, EOI at end."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([c]): c for c in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1

    out = bytearray()
    buf = 0
    nbits = 0

    def put(code: int) -> None:
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    put(clear)
    cur = b""
    for px in indices.tobytes():
        nxt = cur + bytes([px])
        if nxt in table:
            cur = nxt
            continue
        put(table[cur])
        if next_code < 4096:
            table[nxt] = next_code
            # width grows when next_code EXCEEDS the current range —
            # after assigning, codes up to next_code-1 are emittable
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            put(clear)
            table = {bytes([c]): c for c in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes([px])
    if cur:
        put(table[cur])
    put(eoi)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[np.asarray(order)] = rows
    return out


def _interlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return rows[np.asarray(order)]


def _read_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a length-framed sub-block sequence starting at pos;
    returns (payload, position after the 0 terminator)."""
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated sub-block sequence")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(data):
            raise ValueError("truncated sub-block payload")
        chunks.append(data[pos : pos + n])
        pos += n


def decode_gif(content: bytes) -> np.ndarray:
    """GIF bytes -> (h, w, 3) uint8 RGB of the FIRST image block.

    Handles global/local color tables, interlacing, and all four
    extension label types (skipped via their length framing). Raises
    ValueError on anything malformed."""
    if len(content) < 13 or content[:4] != b"GIF8" or content[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF87a/GIF89a stream")
    sw, sh, flags, _bg, _aspect = struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(content):
            raise ValueError("truncated global color table")
        gct = np.frombuffer(content, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n

    while pos < len(content):
        block = content[pos]
        pos += 1
        if block == _TRAILER:
            break
        if block == _EXTENSION:
            if pos >= len(content):
                raise ValueError("truncated extension block")
            pos += 1  # label byte — all labels are sub-block framed
            _, pos = _read_blocks(content, pos)
            continue
        if block != _IMAGE_SEPARATOR:
            raise ValueError(f"unknown block introducer 0x{block:02x}")

        left, top, w, h, iflags = struct.unpack_from("<HHHHB", content, pos)
        pos += 9
        if w == 0 or h == 0 or left + w > sw or top + h > sh:
            raise ValueError("image descriptor outside the logical screen")
        table = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            if pos + 3 * n > len(content):
                raise ValueError("truncated local color table")
            table = np.frombuffer(content, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("image has neither local nor global color table")
        if pos >= len(content):
            raise ValueError("truncated before LZW minimum code size")
        min_code = content[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"LZW minimum code size {min_code} out of range")
        lzw, pos = _read_blocks(content, pos)
        idx = _lzw_decode(lzw, min_code, w * h).reshape(h, w)
        if idx.max(initial=0) >= table.shape[0]:
            raise ValueError("pixel index outside the color table")
        if iflags & 0x40:
            idx = _deinterlace(idx)
        return table[idx]
    raise ValueError("no image block before the GIF trailer")


def encode_gif(
    palette: np.ndarray,
    indices: np.ndarray,
    interlace: bool = False,
    local_table: bool = False,
    extensions: bool = True,
) -> bytes:
    """(palette (n<=256,3) uint8, indices (h,w) uint8) -> single-frame
    GIF89a bytes. ``local_table`` moves the palette into the image
    block's local color table (no global one); ``extensions`` plants a
    graphic-control + comment extension so decoders must skip them."""
    pal = np.asarray(palette, dtype=np.uint8)
    idx = np.asarray(indices, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or not 2 <= pal.shape[0] <= 256:
        raise ValueError("palette must be (n, 3) with 2 <= n <= 256")
    if idx.ndim != 2:
        raise ValueError("indices must be (h, w)")
    if int(idx.max(initial=0)) >= pal.shape[0]:
        raise ValueError("index outside palette")
    h, w = idx.shape
    bits = max(1, int(pal.shape[0] - 1).bit_length())
    size_field = max(bits, 1) - 1
    n_slots = 2 << size_field
    pal_bytes = pal.tobytes() + b"\x00" * (3 * (n_slots - pal.shape[0]))

    out = bytearray(b"GIF89a")
    gflags = (0x80 | size_field) if not local_table else 0x00
    out += struct.pack("<HHBBB", w, h, gflags, 0, 0)
    if not local_table:
        out += pal_bytes
    if extensions:
        # graphic control (no transparency) + a comment block
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        out += b"\x21\xfe\x0bsynthetic!!\x00"
    iflags = (0x40 if interlace else 0x00) | ((0x80 | size_field) if local_table else 0)
    out += struct.pack("<BHHHHB", _IMAGE_SEPARATOR, 0, 0, w, h, iflags)
    if local_table:
        out += pal_bytes
    min_code = max(2, bits)
    out.append(min_code)
    rows = _interlace(idx) if interlace else idx
    lzw = _lzw_encode(rows.reshape(-1), min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00"
    out.append(_TRAILER)
    return bytes(out)
