"""WAV I/O + resampler + mel frontend tests (reference test strategy:
tests/test_wav_reader.cpp round-trips, tests/test_mel.cpp properties)."""

import os
import struct

import numpy as np
import pytest

from leaxer_qwen3_tts_tpu.config import MelConfig
from leaxer_qwen3_tts_tpu.frontend import (
    log_mel,
    log_mel_reference_np,
    num_frames,
    read_wav,
    resample,
    write_wav,
)
from leaxer_qwen3_tts_tpu.frontend.wav import _read_wav_py, _write_wav_py


def sine(freq=440.0, sr=24000, dur=0.25, amp=0.5):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def test_wav_roundtrip_16bit(tmp_path):
    path = str(tmp_path / "t.wav")
    audio = sine()
    write_wav(path, audio, 24000)
    back, sr = read_wav(path)
    assert sr == 24000
    assert back.shape == audio.shape
    # 16-bit quantization error bound (reference test_wav_reader.cpp:83-113)
    assert np.max(np.abs(back - audio)) < 2.0 / 32768.0


def test_wav_native_and_python_agree(tmp_path):
    path = str(tmp_path / "t.wav")
    audio = sine(freq=1000.0)
    write_wav(path, audio, 24000)
    nat, sr1 = read_wav(path)
    py, sr2 = _read_wav_py(path)
    assert sr1 == sr2
    np.testing.assert_allclose(nat, py, atol=1e-7)

    path2 = str(tmp_path / "t2.wav")
    _write_wav_py(path2, audio, 24000, 0.0)
    with open(path, "rb") as f1, open(path2, "rb") as f2:
        assert f1.read() == f2.read(), "native and python writers not bit-identical"


def test_wav_normalization(tmp_path):
    path = str(tmp_path / "n.wav")
    audio = sine(amp=0.1)
    write_wav(path, audio, 24000, normalize_peak=0.95)
    back, _ = read_wav(path)
    assert abs(np.max(np.abs(back)) - 0.95) < 1e-3
    # non-normalizing CLI path preserves amplitude
    write_wav(path, audio, 24000, normalize_peak=0.0)
    back, _ = read_wav(path)
    assert abs(np.max(np.abs(back)) - 0.1) < 1e-3


def _write_raw_wav(path, fmt_tag, bits, channels, sr, payload):
    with open(path, "wb") as f:
        data_size = len(payload)
        f.write(b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE")
        f.write(b"fmt " + struct.pack(
            "<IHHIIHH", 16, fmt_tag, channels, sr,
            sr * channels * bits // 8, channels * bits // 8, bits,
        ))
        f.write(b"data" + struct.pack("<I", data_size) + payload)


def test_wav_stereo_mixdown(tmp_path):
    path = str(tmp_path / "st.wav")
    left = np.full(100, 0.5, np.float32)
    right = np.full(100, -0.1, np.float32)
    inter = np.empty(200, np.float32)
    inter[0::2] = left
    inter[1::2] = right
    _write_raw_wav(path, 3, 32, 2, 16000, inter.astype("<f4").tobytes())
    mono, sr = read_wav(path)
    assert sr == 16000
    np.testing.assert_allclose(mono, np.full(100, 0.2, np.float32), atol=1e-6)


def test_wav_24bit(tmp_path):
    path = str(tmp_path / "b24.wav")
    vals = np.array([0, 8388607, -8388608, 4194304], np.int64)
    payload = b"".join(struct.pack("<i", int(v) << 8)[1:] for v in vals)
    _write_raw_wav(path, 1, 24, 1, 8000, payload)
    mono, _ = read_wav(path)
    np.testing.assert_allclose(
        mono, vals.astype(np.float64) / 8388608.0, atol=1e-6
    )


def test_wav_garbage_and_missing(tmp_path):
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"this is not a wav file at all")
    with pytest.raises(ValueError):
        read_wav(bad)
    with pytest.raises(ValueError):
        read_wav(str(tmp_path / "missing.wav"))


def test_resample():
    audio = sine(sr=16000, dur=0.1)
    up = resample(audio, 16000, 24000)
    assert len(up) == int(len(audio) * 1.5)
    down = resample(audio, 16000, 8000)
    assert len(down) == len(audio) // 2
    same = resample(audio, 16000, 16000)
    np.testing.assert_array_equal(same, audio)
    assert resample(np.array([], np.float32), 16000, 24000).size == 0
    # tone survives resampling (loose spectral sanity)
    assert np.max(np.abs(up)) > 0.3


def test_resample_native_matches_numpy():
    from leaxer_qwen3_tts_tpu.frontend import native as qn
    import ctypes

    lib = qn.load_native()
    if lib is None:
        pytest.skip("native lib unavailable")
    audio = sine(sr=16000, dur=0.05)
    ref = resample(audio, 16000, 24000)
    out = np.empty(len(ref) + 8, np.float32)
    n = lib.qtts_resample(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(audio),
        16000, 24000,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(out),
    )
    assert n == len(ref)
    np.testing.assert_allclose(out[:n], ref, atol=1e-6)


# ---------------------------------------------------------------------------
# Mel
# ---------------------------------------------------------------------------

MEL = MelConfig()


def test_mel_shape_formula():
    # (len - win)/hop + 1 (reference mel.cpp:190, test_mel.cpp:57-91)
    for n in (1024, 1025, 1280, 24000, 5000):
        m = log_mel(sine(dur=n / 24000.0), MEL)
        assert m.shape == (num_frames(n, MEL), MEL.num_mels)
        assert m.shape[0] == (n - MEL.win_size) // MEL.hop_size + 1


def test_mel_short_audio_one_frame():
    m = log_mel(np.ones(100, np.float32) * 0.1, MEL)
    assert m.shape == (1, MEL.num_mels)
    assert np.isfinite(np.asarray(m)).all()


def test_mel_empty():
    assert log_mel(np.array([], np.float32), MEL).shape == (0, MEL.num_mels)


def test_mel_matches_numpy_oracle():
    for freq in (200.0, 1000.0, 4000.0):
        audio = sine(freq=freq, dur=0.2)
        got = np.asarray(log_mel(audio, MEL))
        ref = log_mel_reference_np(audio, MEL)
        assert got.shape == ref.shape
        # compare energies, not logs: near the 1e-10 silence floor the log of
        # float32-FFT rounding noise diverges harmlessly
        np.testing.assert_allclose(
            np.exp(got), np.exp(ref), rtol=5e-3, atol=1e-8
        )
        loud = ref > -15.0
        np.testing.assert_allclose(got[loud], ref[loud], rtol=1e-3, atol=1e-3)


def test_mel_frequency_sensitivity():
    # different tones excite different mel bands (reference test_mel.cpp:157-184)
    m_low = np.asarray(log_mel(sine(freq=200.0), MEL))
    m_high = np.asarray(log_mel(sine(freq=4000.0), MEL))
    assert int(np.argmax(m_low.mean(axis=0))) < int(np.argmax(m_high.mean(axis=0)))


def test_mel_no_nan_inf_and_deterministic():
    audio = sine(freq=997.0)
    a = np.asarray(log_mel(audio, MEL))
    b = np.asarray(log_mel(audio, MEL))
    assert np.isfinite(a).all()
    np.testing.assert_array_equal(a, b)
