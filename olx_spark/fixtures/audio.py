"""Deterministic PCM/WAV audio fixtures + stdlib codec + features.

The sandbox ships no ffmpeg/soundfile, but RIFF/WAVE PCM needs neither:
the stdlib ``wave`` module frames the container and numpy handles the
samples — the same playbook as the pure-numpy JPEG codec
(``fixtures/jpeg.py``) applied to the remaining multimodal stub
(VERDICT r4 #4). The reference repo has no audio operators (its payload
is image+caption, ``readme.md``); this backs the engine's
training-pipeline multimodal brief: binary column in, typed features
out, garbage flagged, never a crash.

``audio_feature_row`` is the single source of truth for the per-clip
features: the distributed scanner (``operators/multimodal.py``) and the
driver-side DuckDB oracle both call it on their own decode of the same
bytes, so the oracle certifies the Spark plumbing (schema, Arrow
transport, batch boundaries) end to end — the jpeg-oracle pattern.
"""

from __future__ import annotations

import io
import wave

import numpy as np


# ------------------------------------------------------------- synth
def make_audio_array(
    rng: np.random.Generator, n_samples: int, channels: int = 1
) -> np.ndarray:
    """Deterministic test clip: a few random sinusoids + noise,
    int16 PCM, shape (n_samples, channels)."""
    t = np.arange(n_samples, dtype=np.float64)
    out = np.zeros((n_samples, channels), dtype=np.float64)
    for c in range(channels):
        for _ in range(3):
            freq = rng.uniform(0.002, 0.2)  # cycles/sample
            amp = rng.uniform(0.1, 0.3)
            phase = rng.uniform(0, 2 * np.pi)
            out[:, c] += amp * np.sin(2 * np.pi * freq * t + phase)
        out[:, c] += rng.normal(0, 0.02, n_samples)
    return np.clip(out * 32767.0, -32768, 32767).astype(np.int16)


# ------------------------------------------------------------- codec
def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 PCM (n, channels) -> RIFF/WAVE bytes (stdlib wave)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        raise ValueError("wav_encode expects int16 samples")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> (int16 samples (n, channels), sample_rate).
    Raises on anything but 16-bit PCM — callers flag, never crash."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(
                f"only 16-bit PCM supported (sampwidth={w.getsampwidth()})"
            )
        n, ch, sr = w.getnframes(), w.getnchannels(), w.getframerate()
        raw = w.readframes(n)
    samples = np.frombuffer(raw, dtype="<i2").reshape(-1, ch)
    return samples, sr


# ----------------------------------------------------------- features
def audio_feature_row(samples: np.ndarray, sample_rate: int, frame_ms: int = 25) -> dict:
    """Per-clip features as mean-of-frame aggregates over ``frame_ms``
    windows of the channel-mean signal (float64, [-1, 1] normalized):

    - ``rms``: root-mean-square energy per frame, averaged;
    - ``zcr``: zero-crossing rate per frame (fraction of adjacent
      sample pairs changing sign), averaged;
    - ``spectral_centroid``: magnitude-weighted mean frequency (Hz) of
      the frame rfft, averaged (silent frames contribute 0).

    Pure numpy, deterministic — shared by the distributed scanner and
    the driver-side oracle."""
    if samples.ndim == 1:
        samples = samples[:, None]
    mono = samples.astype(np.float64).mean(axis=1) / 32768.0
    n = len(mono)
    frame = max(1, int(sample_rate * frame_ms) // 1000)
    n_frames = max(1, n // frame)
    x = mono[: n_frames * frame].reshape(n_frames, frame)
    rms = float(np.sqrt((x**2).mean(axis=1)).mean())
    if frame > 1:
        signs = np.signbit(x)
        zcr = float((signs[:, 1:] != signs[:, :-1]).mean(axis=1).mean())
    else:
        zcr = 0.0
    mag = np.abs(np.fft.rfft(x, axis=1))
    freqs = np.fft.rfftfreq(frame, d=1.0 / sample_rate)
    denom = mag.sum(axis=1)
    cent = np.where(denom > 0, (mag * freqs[None, :]).sum(axis=1) / np.maximum(denom, 1e-300), 0.0)
    return {
        "sr": int(sample_rate),
        "channels": int(samples.shape[1]),
        "n_samples": int(n),
        "duration_s": float(n / sample_rate),
        "rms": rms,
        "zcr": zcr,
        "spectral_centroid": float(cent.mean()),
    }


# ------------------------------------------------------------- corpus
def make_audio_corpus(n: int, seed: int = 0) -> list[dict]:
    """Deterministic WAV corpus: varied lengths/rates/channel counts,
    every clip decodable. ``(audio_id, bytes, fmt)`` rows."""
    out = []
    for i in range(n):
        rng = np.random.default_rng(np.random.PCG64(np.random.SeedSequence([seed, i])))
        sr = int(rng.choice([8000, 16000, 22050]))
        ch = int(rng.choice([1, 2]))
        n_samples = int(rng.integers(sr // 10, sr // 2))  # 0.1-0.5 s
        arr = make_audio_array(rng, n_samples, ch)
        out.append(
            {"audio_id": f"wav-{i:05d}", "bytes": wav_encode(arr, sr), "fmt": "wav"}
        )
    return out
