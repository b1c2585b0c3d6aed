"""Pure-stdlib Y4M (YUV4MPEG2) video codec — uncompressed video frames.

Completes the modality set: images (PNG, functions/png.py) and audio
(PCM WAV, functions/wav.py) already decode for real; this parser does
the same for VIDEO in its uncompressed interchange form — the YUV4MPEG2
container (plain-text stream header, per-frame ``FRAME`` markers, raw
4:2:0 planes). Compressed codecs (H.264 & co.) genuinely have no
decoder in this environment and stay behind the injectable-decoder
seam; Y4M is what an upstream transcode step would hand a feature
pipeline anyway.

The fixture generator writes genuine Y4M blobs with per-sampled-frame
luma truth computed from the SOURCE planes; the container is lossless,
so the Spark kernel reproducing the truth proves the parser (same gate
design as PNG/WAV: the ``video_frames`` oracle row).
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def encode_y4m(frames_y: np.ndarray, fps: int = 25) -> bytes:
    """uint8 luma frames (n, h, w), even h/w -> Y4M bytes (C420, U/V
    planes derived deterministically from the luma: 2x2-mean downsample
    shifted into chroma range — real plane data, not constants)."""
    f = np.ascontiguousarray(frames_y, dtype=np.uint8)
    if f.ndim != 3 or f.shape[0] < 1:
        raise ValueError(f"want (n, h, w) luma frames, got shape {frames_y.shape}")
    n, h, w = f.shape
    if h % 2 or w % 2:
        raise ValueError("C420 needs even frame dimensions")
    header = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420jpeg\n".encode()
    out = [header]
    for i in range(n):
        y = f[i]
        # 2x2 mean downsample -> chroma planes (deterministic uint8 math)
        ds = (
            y.reshape(h // 2, 2, w // 2, 2).astype(np.uint16).sum(axis=(1, 3)) // 4
        ).astype(np.uint8)
        u = (ds // 2 + 64).astype(np.uint8)
        v = (255 - ds // 2 - 64).astype(np.uint8)
        out.append(b"FRAME\n")
        out.append(y.tobytes())
        out.append(u.tobytes())
        out.append(v.tobytes())
    return b"".join(out)


def decode_y4m(data: bytes) -> tuple[np.ndarray, int, int]:
    """Y4M bytes -> (luma frames uint8 (n, h, w), width, height).

    Validates the stream header (C420 family only) and every FRAME
    marker; raises ValueError on truncation or unsupported colorspace."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise ValueError("decode_y4m wants bytes")
    data = bytes(data)
    if not data.startswith(_MAGIC + b" "):
        raise ValueError("not a Y4M stream: bad signature")
    nl = data.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M: no header terminator")
    w = h = None
    colorspace = "C420jpeg"
    for tok in data[len(_MAGIC) + 1 : nl].split(b" "):
        if tok.startswith(b"W"):
            w = int(tok[1:])
        elif tok.startswith(b"H"):
            h = int(tok[1:])
        elif tok.startswith(b"C"):
            colorspace = tok.decode()
    if not w or not h:
        raise ValueError("corrupt Y4M: header missing W/H")
    # 8-bit 4:2:0 layouts only: the bit-depth variants (C420p10/p12/p16)
    # use 2 bytes per sample and would silently misread with this
    # 1-byte-per-sample frame math
    if colorspace not in ("C420", "C420jpeg", "C420mpeg2", "C420paldv"):
        raise ValueError(
            f"unsupported Y4M colorspace {colorspace}: need 8-bit C420 family"
        )
    frame_bytes = h * w + 2 * (h // 2) * (w // 2)
    pos = nl + 1
    frames = []
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError("corrupt Y4M: missing FRAME marker")
        body = data[fnl + 1 : fnl + 1 + frame_bytes]
        if len(body) < frame_bytes:
            raise ValueError("truncated Y4M: short frame")
        frames.append(
            np.frombuffer(body[: h * w], dtype=np.uint8).reshape(h, w)
        )
        pos = fnl + 1 + frame_bytes
    if not frames:
        raise ValueError("truncated Y4M: no frames")
    return np.stack(frames), w, h


def frame_luma_mean(frame_y: np.ndarray) -> float:
    """Mean luma (0..1) of a frame, float64 — the per-frame truth/feature
    (same reduction at fixture-gen time and in the Spark kernel)."""
    return float(np.asarray(frame_y, dtype=np.float64).mean() / 255.0)


def quantize(x: float) -> int:
    """floor(x*1e6 + 0.5) — the repo's oracle-parity integerization."""
    return int(np.floor(x * 1e6 + 0.5))
