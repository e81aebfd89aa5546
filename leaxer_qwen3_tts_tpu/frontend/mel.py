"""Log-mel spectrogram frontend, XLA-compiled.

Reproduces the reference MelExtractor's exact semantics (src/io/mel.cpp):
  * symmetric Hann window 0.5*(1-cos(2*pi*i/(N-1)))          (mel.cpp:13-22)
  * NO center padding; frames = (len - win)/hop + 1, min 1   (mel.cpp:182-191)
  * rFFT of the zero-padded window, power spectrum
  * HTK mel scale 2595*log10(1+hz/700), fmin 0 / fmax 12000  (mel.cpp:24-30)
  * integer-bin triangular filters via floor((n_fft+1)*hz/sr) (mel.cpp:50-79)
  * log(mel_energy + 1e-10)                                   (mel.cpp:231)

The whole thing is one jittable function: framing is a gather, the rFFT and
the [n_bins, n_mels] filterbank matmul batch over frames — MXU/VPU shaped, no
host loops (the reference runs a scalar C++ FFT per frame, mel.cpp:200-233).
Output layout is [num_frames, num_mels] (the speaker encoder's input layout;
the reference stores [num_mels, num_frames] and transposes at the call site,
tts_onnx.cpp:374-379).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MelConfig


def hann_window_symmetric(win_size: int) -> np.ndarray:
    i = np.arange(win_size, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / (win_size - 1)))).astype(np.float32)


def hz_to_mel(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz, np.float64) / 700.0)


def mel_to_hz(mel):
    return 700.0 * (np.power(10.0, np.asarray(mel, np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(cfg: MelConfig) -> np.ndarray:
    """[n_fft//2+1, num_mels] triangular filterbank (integer-bin, HTK scale)."""
    n_bins = cfg.n_fft // 2 + 1
    mel_lo, mel_hi = hz_to_mel(cfg.fmin), hz_to_mel(cfg.fmax)
    mels = mel_lo + (mel_hi - mel_lo) * np.arange(cfg.num_mels + 2) / (cfg.num_mels + 1)
    hz = mel_to_hz(mels)
    bins = np.floor((cfg.n_fft + 1) * hz / cfg.sample_rate).astype(np.int64)
    bins = np.minimum(bins, n_bins - 1)

    fb = np.zeros((n_bins, cfg.num_mels), np.float32)
    for m in range(cfg.num_mels):
        left, center, right = bins[m], bins[m + 1], bins[m + 2]
        if center > left:
            k = np.arange(left, center)
            fb[k, m] = (k - left) / (center - left)
        if right > center:
            k = np.arange(center, right)
            fb[k, m] = (right - k) / (right - center)
    return fb


def num_frames(audio_len: int, cfg: MelConfig) -> int:
    if audio_len < cfg.win_size:
        return 1
    return (audio_len - cfg.win_size) // cfg.hop_size + 1


@functools.partial(jax.jit, static_argnames=("cfg",))
def _log_mel_jit(audio: jax.Array, cfg: MelConfig) -> jax.Array:
    n = audio.shape[-1]
    frames = num_frames(n, cfg)
    window = jnp.asarray(hann_window_symmetric(cfg.win_size))
    fb = jnp.asarray(mel_filterbank(cfg))

    # Frame gather: [frames, win]; out-of-range taps read zero (short audio).
    starts = jnp.arange(frames) * cfg.hop_size
    idx = starts[:, None] + jnp.arange(cfg.win_size)[None, :]
    valid = idx < n
    framed = jnp.where(valid, audio[jnp.clip(idx, 0, n - 1)], 0.0) * window[None, :]

    if cfg.n_fft > cfg.win_size:
        framed = jnp.pad(framed, ((0, 0), (0, cfg.n_fft - cfg.win_size)))
    spec = jnp.fft.rfft(framed.astype(jnp.float32), n=cfg.n_fft, axis=-1)
    power = jnp.square(spec.real) + jnp.square(spec.imag)  # [frames, n_bins]
    mel = power @ fb  # [frames, num_mels]
    return jnp.log(mel + 1e-10)


def log_mel(audio, cfg: MelConfig) -> jax.Array:
    """audio [T] float32 -> log-mel [num_frames, num_mels]."""
    audio = jnp.asarray(audio, jnp.float32)
    if audio.size == 0:
        return jnp.zeros((0, cfg.num_mels), jnp.float32)
    return _log_mel_jit(audio, cfg)


def log_mel_reference_np(audio: np.ndarray, cfg: MelConfig) -> np.ndarray:
    """Plain-numpy oracle with identical semantics (test comparison target)."""
    audio = np.asarray(audio, np.float32)
    frames = num_frames(len(audio), cfg)
    window = hann_window_symmetric(cfg.win_size)
    fb = mel_filterbank(cfg)
    out = np.zeros((frames, cfg.num_mels), np.float32)
    for t in range(frames):
        start = t * cfg.hop_size
        frame = np.zeros(cfg.n_fft, np.float32)
        seg = audio[start : start + cfg.win_size]
        frame[: len(seg)] = seg * window[: len(seg)]
        spec = np.fft.rfft(frame)
        power = (spec.real**2 + spec.imag**2).astype(np.float32)
        out[t] = np.log(power @ fb + 1e-10)
    return out
