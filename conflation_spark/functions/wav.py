"""Pure-stdlib WAV (RIFF/PCM) codec — the audio analog of functions/png.py.

16-bit PCM WAV is a trivial container (RIFF framing + fmt/data chunks),
so unlike video there is no excuse for a stub: the decoder here parses
the real thing — RIFF/WAVE signature, fmt chunk validation (PCM,
16-bit), data chunk extraction — with numpy doing the sample reshape.
The fixture generator encodes genuine WAV blobs with per-blob ground
truth computed from the SOURCE samples; PCM is lossless, so the Spark
kernel reproducing the truth proves the decoder (same gate design as
the PNG path: the `audio_features` oracle row).
"""

from __future__ import annotations

import struct

import numpy as np

AUDIO_FEATURE_SEGMENTS = 16


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 samples, shape (n,) mono or (n, ch) -> RIFF/WAVE PCM bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[0] < 1:
        raise ValueError(f"want (n,) or (n, ch) samples, got shape {samples.shape}")
    n, ch = s.shape
    data = s.reshape(-1).tobytes()  # interleaved frames
    byte_rate = sample_rate * ch * 2
    block_align = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, block_align, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 samples shape (n, ch), sample_rate).

    Validates RIFF/WAVE framing and requires PCM 16-bit; raises
    ValueError on anything else (truncation, float WAV, ADPCM, ...)."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise ValueError("decode_wav wants bytes")
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE signature")
    (riff_len,) = struct.unpack("<I", data[4:8])
    if riff_len + 8 > len(data):
        raise ValueError("truncated WAV: RIFF length exceeds payload")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) < ln:
            raise ValueError(f"truncated WAV: {tag!r} chunk")
        if tag == b"fmt ":
            if ln < 16:
                raise ValueError("corrupt WAV: short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data" and pcm is None:
            # first-chunk-wins like real readers (the old last-wins scan
            # silently decoded only a trailing duplicate data chunk)
            pcm = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if fmt is not None and pcm is not None:
            break
    if fmt is None or pcm is None:
        raise ValueError("truncated WAV: missing fmt or data chunk")
    audio_format, ch, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV: need 16-bit PCM, got format={audio_format} bits={bits}"
        )
    if ch < 1 or len(pcm) % (2 * ch):
        raise ValueError("corrupt WAV: data length not a whole number of frames")
    s = np.frombuffer(pcm, dtype="<i2").reshape(-1, ch)
    return s, sample_rate


def audio_feature_segments(samples: np.ndarray) -> np.ndarray:
    """16-dim feature: mean ABSOLUTE amplitude (normalized /32768,
    channels pooled) over 16 equal time segments — float64, same
    reduction on source and decoded samples (PCM lossless => identical
    bits, same gate trick as png.image_feature_grid)."""
    a = np.abs(np.asarray(samples, dtype=np.float64)) / 32768.0
    if a.ndim == 1:
        a = a[:, None]
    feats = []
    for seg in np.array_split(a, AUDIO_FEATURE_SEGMENTS, axis=0):
        feats.append(seg.mean() if seg.size else 0.0)
    return np.asarray(feats, dtype=np.float64)


def quantize_feature(feat: np.ndarray) -> np.ndarray:
    """floor(x*1e6 + 0.5) — the repo's oracle-parity integerization."""
    return np.floor(np.asarray(feat, dtype=np.float64) * 1e6 + 0.5).astype(np.int64)


AUDIO_SPECTRUM_BANDS = 8
AUDIO_SPECTRUM_NFFT = 256


def spectral_band_energies(
    samples: np.ndarray,
    n_bands: int = AUDIO_SPECTRUM_BANDS,
    n_fft: int = AUDIO_SPECTRUM_NFFT,
) -> np.ndarray:
    """Relative spectral band energies: channel-pooled signal framed at
    ``n_fft`` (rectangular window, hop == frame), power spectrum per
    frame, DC dropped, the first ``(n_fft/2 // n_bands) * n_bands`` bins
    split into ``n_bands`` equal groups, mean energy per band over all
    frames, normalized to sum 1 (scale-invariant). Deterministic given
    the samples (one numpy rfft); planted-truth gates compare the same
    reduction on source and decoded samples — lossless codecs make the
    match exact."""
    a = np.asarray(samples, dtype=np.float64) / 32768.0
    if a.ndim == 2:
        a = a.mean(axis=1)
    n = (a.size // n_fft) * n_fft
    if n == 0:
        frames = np.zeros((1, n_fft))
        frames[0, : a.size] = a
    else:
        frames = a[:n].reshape(-1, n_fft)
    p = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    per_band = (n_fft // 2) // n_bands
    bins = p[:, 1 : 1 + per_band * n_bands]
    e = bins.mean(axis=0).reshape(n_bands, per_band).mean(axis=1)
    tot = float(e.sum())
    return e / tot if tot > 0 else e
