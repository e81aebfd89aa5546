"""Vocoder tests: shape contract, causality, and chunked-streaming exactness
(the property that makes sub-utterance TTFA possible; the reference vocodes
once at the end, tts_onnx.cpp:430)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaxer_qwen3_tts_tpu.models.codec12hz import (
    init_vocoder_params,
    vocode_chunk,
    vocoder_forward,
)


@pytest.fixture(scope="module")
def voc(tiny_model):
    cfg, params = tiny_model
    return cfg.vocoder, params["vocoder"]


def codes_for(rng, B, F):
    return jnp.asarray(rng.integers(0, 2048, (B, F, 16)), jnp.int32)


def test_shape_contract(voc):
    cfg, params = voc
    rng = np.random.default_rng(0)
    codes = codes_for(rng, 2, 5)
    audio = vocoder_forward(cfg, params, codes)
    assert audio.shape == (2, 5 * cfg.samples_per_frame)  # 2000 samples/frame
    assert np.isfinite(np.asarray(audio)).all()
    assert np.abs(np.asarray(audio)).max() <= 1.0  # tanh output


def test_causality(voc):
    """Changing a future frame must not change past audio (all convs causal)."""
    cfg, params = voc
    rng = np.random.default_rng(1)
    codes = codes_for(rng, 1, 6)
    a1 = np.asarray(vocoder_forward(cfg, params, codes))
    codes2 = codes.at[0, 5, :].set((codes[0, 5, :] + 7) % 2048)
    a2 = np.asarray(vocoder_forward(cfg, params, codes2))
    spf = cfg.samples_per_frame
    np.testing.assert_array_equal(a1[:, : 5 * spf], a2[:, : 5 * spf])
    assert not np.array_equal(a1[:, 5 * spf :], a2[:, 5 * spf :])


def test_chunked_streaming_is_exact(voc):
    """Chunked decode with >= left_context_frames of context reproduces the
    one-shot waveform exactly."""
    cfg, params = voc
    ctx = cfg.left_context_frames
    rng = np.random.default_rng(2)
    F, chunk = 3 * ctx + 10, 7
    codes = codes_for(rng, 1, F)
    full = np.asarray(vocoder_forward(cfg, params, codes))

    spf = cfg.samples_per_frame
    pieces = []
    done = 0
    while done < F:
        n = min(chunk, F - done)
        n_ctx = min(ctx, done)
        window = codes[:, done - n_ctx : done + n]
        audio = vocode_chunk(cfg, params, window, n_ctx)
        pieces.append(np.asarray(audio))
        done += n
    streamed = np.concatenate(pieces, axis=1)
    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, atol=2e-6)


def test_insufficient_context_differs(voc):
    """Sanity that the exactness above is not vacuous: with zero context the
    later chunks DO deviate (the causal receptive field matters)."""
    cfg, params = voc
    rng = np.random.default_rng(3)
    F = cfg.left_context_frames + 8
    codes = codes_for(rng, 1, F)
    full = np.asarray(vocoder_forward(cfg, params, codes))
    half = F // 2
    naive = np.concatenate(
        [
            np.asarray(vocode_chunk(cfg, params, codes[:, :half], 0)),
            np.asarray(vocode_chunk(cfg, params, codes[:, half:], 0)),
        ],
        axis=1,
    )
    assert not np.allclose(naive, full, atol=2e-6)
