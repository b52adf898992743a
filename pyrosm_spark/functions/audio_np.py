"""Audio payload kernels (numpy-only, no audio libs in this container).

Modality contract mirrors the image path (``image_np``): audio rides as
an opaque ``binary`` column with typed metadata (sample_rate,
n_channels, fmt, duration_ms). Raw PCM is genuinely decodable with
numpy — ``pcm16`` (interleaved little-endian int16) is the REAL path;
compressed codecs (mp3/ogg/flac) raise ``NotImplementedError`` behind
the same signature, so swapping in a real decoder on a cluster changes
one function, not the Spark plumbing.
"""

from __future__ import annotations

import numpy as np


def encode_pcm16(waveform: np.ndarray) -> bytes:
    """float waveform in [-1, 1], shape (n_samples, n_channels) ->
    interleaved little-endian int16 bytes."""
    w = np.clip(np.asarray(waveform, dtype=np.float64), -1.0, 1.0)
    return (w * 32767.0).astype("<i2").tobytes()


def decode_audio(buf: bytes, fmt: str, n_channels: int = 1) -> np.ndarray:
    """bytes -> float64 waveform (n_samples, n_channels) in [-1, 1].

    ``pcm16`` decodes for real; compressed formats are stubbed (the
    container has no codec libs) — callers surface the error per row,
    never fail the job.
    """
    if fmt == "pcm16":
        # null metadata arrives from pandas as None or NaN — int()
        # raises on both; NaN > 1 is False, so without this guard a
        # multi-channel payload would silently decode as mono
        try:
            nch = int(n_channels)
        except (TypeError, ValueError):
            raise ValueError(f"invalid n_channels {n_channels!r}")
        if nch < 1:
            raise ValueError(f"invalid n_channels {n_channels!r}")
        flat = np.frombuffer(buf, dtype="<i2").astype(np.float64) / 32767.0
        return flat.reshape(-1, nch)  # nch >= 1 guaranteed above
    raise NotImplementedError(
        f"audio format {fmt!r} requires a codec library absent from this "
        "container; only raw 'pcm16' decodes here")


def rms_energy(wave: np.ndarray) -> float:
    return float(np.sqrt(np.mean(wave.astype(np.float64) ** 2)))


def zero_crossing_rate(wave: np.ndarray) -> float:
    """Fraction of adjacent mono-mix sample pairs with a sign change."""
    mono = wave.mean(axis=1)
    if len(mono) < 2:
        return 0.0
    signs = np.signbit(mono)
    return float(np.count_nonzero(signs[1:] != signs[:-1]) / (len(mono) - 1))


def peak_amplitude(wave: np.ndarray) -> float:
    return float(np.abs(wave).max()) if wave.size else 0.0
