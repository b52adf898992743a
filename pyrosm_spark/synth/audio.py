"""Deterministic synthetic audio table (seed-fixed).

Schema mirrors the multimodal contract: (audio_id string, bytes binary,
sample_rate int32, n_channels int32, fmt string, duration_ms int32,
caption string). Most rows are raw ``pcm16`` (sine + seeded noise —
really decodable by ``functions.audio_np``); a slice carries an
undecodable ``mp3`` marker payload to exercise the per-row stub path.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pyrosm_spark.functions.audio_np import encode_pcm16


def generate_audio_table(out_path: str, n_rows: int = 500,
                         seed: int = 42) -> str:
    rng = np.random.default_rng(seed)
    ids, bufs, rates, chans, fmts, durs, caps = [], [], [], [], [], [], []
    for i in range(n_rows):
        rate = int(rng.choice([8000, 16000]))
        n_ch = int(rng.choice([1, 2]))
        dur_ms = int(rng.integers(50, 400))
        n_samples = int(round(dur_ms * rate / 1000.0))
        if i % 10 == 9:  # stub path: compressed payload, no codec here
            buf = b"ID3" + rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
            fmt = "mp3"
        else:
            t = np.arange(n_samples) / rate
            freq = float(rng.uniform(100, 2000))
            wave = 0.6 * np.sin(2 * np.pi * freq * t)
            wave = wave[:, None] + rng.normal(0, 0.05, (n_samples, n_ch))
            buf = encode_pcm16(wave)
            fmt = "pcm16"
        ids.append(f"aud{i:06d}")
        bufs.append(buf)
        rates.append(rate)
        chans.append(n_ch)
        fmts.append(fmt)
        durs.append(dur_ms)
        caps.append(f"synthetic clip {i} at {rate} Hz")
    table = pa.table({
        "audio_id": pa.array(ids, pa.string()),
        "bytes": pa.array(bufs, pa.binary()),
        "sample_rate": pa.array(rates, pa.int32()),
        "n_channels": pa.array(chans, pa.int32()),
        "fmt": pa.array(fmts, pa.string()),
        "duration_ms": pa.array(durs, pa.int32()),
        "caption": pa.array(caps, pa.string()),
    })
    d = os.path.dirname(out_path)
    if d:
        os.makedirs(d, exist_ok=True)
    pq.write_table(table, out_path)
    return out_path


def ensure_audio_table(out_path: str, n_rows: int = 500, **kw) -> str:
    if os.path.exists(out_path):
        return out_path
    return generate_audio_table(out_path, n_rows=n_rows, **kw)
