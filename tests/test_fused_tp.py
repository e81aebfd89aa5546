"""TP fused decode (ops/fused_tp.py): shard_map + per-layer half-kernels
match the XLA transformer path on the 8-virtual-CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaxer_qwen3_tts_tpu.config import TransformerConfig
from leaxer_qwen3_tts_tpu.models.layers import (
    KVCache,
    init_transformer_params,
    rms_norm,
    transformer_forward,
)
from leaxer_qwen3_tts_tpu.ops.fused_tp import (
    fused_decode_step_tp,
    pack_fused_tp,
    supports_tp,
)
from leaxer_qwen3_tts_tpu.ops.quant import quantize_params
from leaxer_qwen3_tts_tpu.parallel import make_mesh


def _tr(H, heads, kv, I):
    return TransformerConfig(
        hidden_size=H, num_layers=2, num_heads=heads, num_kv_heads=kv,
        head_dim=128, intermediate_size=I, dtype="float32",
    )


CFG_06B = _tr(1024, 16, 8, 3072)   # 0.6B dims
CFG_17B = _tr(2048, 16, 8, 6144)   # 1.7B dims (2 layers for test speed)


def test_supports_tp_matrix():
    # the round-2 blocker: per-shard intermediates indivisible by H
    assert supports_tp(CFG_17B, 2) and supports_tp(CFG_17B, 4)
    assert supports_tp(CFG_06B, 2) and supports_tp(CFG_06B, 4)
    assert not supports_tp(CFG_06B, 3)  # heads not divisible


@pytest.mark.parametrize("cfg,tp", [
    (CFG_06B, 2), (CFG_06B, 4), (CFG_17B, 2), (CFG_17B, 4),
])
def test_tp_fused_matches_xla(cfg, tp):
    """fused_decode_step_tp == the XLA path with the same int8 grid (the
    XLA reference quantizes per-shard like the pack, so they share values)."""
    params = init_transformer_params(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(8 // tp, tp)
    fw = pack_fused_tp(cfg, params["layers"], tp, mesh=mesh)

    rng = np.random.default_rng(3)
    L, nk, d, T = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim, 64
    pos_i = 13
    x = jnp.asarray(rng.standard_normal((1, cfg.hidden_size)) * 0.3,
                    jnp.float32)
    kc = rng.standard_normal((L, 1, nk, T, d)).astype(np.float32) * 0.2
    vc = rng.standard_normal((L, 1, nk, T, d)).astype(np.float32) * 0.2
    kc[:, :, :, pos_i:] = 0.0
    vc[:, :, :, pos_i:] = 0.0

    with jax.set_mesh(mesh):
        x_tp, kc_tp, vc_tp = fused_decode_step_tp(
            cfg, fw, x, jnp.asarray(pos_i, jnp.int32),
            jnp.asarray(kc), jnp.asarray(vc), mesh,
            interpret=jax.default_backend() != "tpu",
        )
        x_tp = np.asarray(jax.device_get(x_tp))
        kc_tp = np.asarray(jax.device_get(kc_tp))

    # XLA reference on UNQUANTIZED weights (the pack is int8: tolerance)
    cache = KVCache(k=jnp.asarray(kc), v=jnp.asarray(vc),
                    length=jnp.full((1,), pos_i, jnp.int32))
    valid = jnp.asarray((np.arange(T) < pos_i)[None, :])
    h_x, cache_x, _ = transformer_forward(
        cfg, params, x[:, None, :], jnp.asarray([[pos_i]], jnp.int32),
        cache, valid,
    )
    h_ref = np.asarray(h_x)[:, 0]
    h_tp = np.asarray(rms_norm(jnp.asarray(x_tp), params["final_norm"],
                               cfg.rms_norm_eps))
    corr = np.corrcoef(h_tp.ravel(), h_ref.ravel())[0, 1]
    assert corr > 0.999, (tp, corr)
    np.testing.assert_allclose(h_tp, h_ref, atol=0.12, rtol=0.12)

    # cache write landed at pos on every (sharded) head
    assert not np.allclose(kc_tp[:, 0, :, pos_i], kc[:, 0, :, pos_i])
    np.testing.assert_array_equal(kc_tp[:, 0, :, pos_i + 1],
                                  kc[:, 0, :, pos_i + 1])


def test_engine_uses_tp_fused_decode(tiny_vocab_files):
    """A fused-eligible talker under a TP mesh attaches the per-shard packs
    and synthesizes through the shard_map'd kernels end-to-end."""
    from leaxer_qwen3_tts_tpu.api.engine import TTSEngine
    from leaxer_qwen3_tts_tpu.config import (
        CodePredictorConfig, TalkerConfig, TTSModelConfig, VocoderConfig,
    )
    from leaxer_qwen3_tts_tpu.frontend import Tokenizer
    from leaxer_qwen3_tts_tpu.runtime.weights import init_params

    cfg = TTSModelConfig(
        name="tp-fused-test",
        talker=TalkerConfig(
            transformer=CFG_06B, codec_vocab_size=3072,
            text_vocab_size=152000, text_embed_dim=256, decode_impl="fused",
        ),
        code_predictor=CodePredictorConfig(
            transformer=_tr(1024, 8, 8, 3072), num_steps=15,
            subcode_vocab_size=2048,
        ),
        vocoder=VocoderConfig(d_model=32, num_prenet_blocks=1,
                              upsample_channels=(8, 8, 8, 8), dtype="float32"),
        speaker_encoder=None,
    )
    params = init_params(cfg, jax.random.PRNGKey(0), with_speaker_encoder=False)
    vocab_path, merges_path, _ = tiny_vocab_files
    tok = Tokenizer(vocab_path, merges_path)

    mesh = make_mesh(2, 4)
    with jax.set_mesh(mesh):
        eng = TTSEngine(config=cfg, params=params, tokenizer=tok,
                        max_frames=4, chunk_len=2, mesh=mesh)
        assert eng.is_ready(), eng.get_error()
        assert "fused_tp" in eng.params["talker"]
        r = eng.synthesize("hello", temperature=0.0, seed=1)
    assert r.metrics.frames > 0
    assert np.isfinite(np.asarray(r.audio)).all()


def test_tp_manual_matches_auto(monkeypatch):
    """The manual double-buffered halves (grid (1,), each unit fetched once)
    == the (U,)-grid clamped-map pipeline: same int8 grid and unit math."""
    cfg, tp = CFG_06B, 2
    params = init_transformer_params(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(8 // tp, tp)
    fw = pack_fused_tp(cfg, params["layers"], tp, mesh=mesh)

    rng = np.random.default_rng(5)
    L, nk, d, T = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim, 64
    pos_i = 13
    x = jnp.asarray(rng.standard_normal((1, cfg.hidden_size)) * 0.3,
                    jnp.float32)
    kc = rng.standard_normal((L, 1, nk, T, d)).astype(np.float32) * 0.2
    vc = rng.standard_normal((L, 1, nk, T, d)).astype(np.float32) * 0.2
    kc[:, :, :, pos_i:] = 0.0
    vc[:, :, :, pos_i:] = 0.0
    interp = jax.default_backend() != "tpu"

    outs = {}
    with jax.set_mesh(mesh):
        for arm in ("0", "1"):
            monkeypatch.setenv("QTTS_FUSED_TP_MANUAL", arm)
            outs[arm] = [
                np.asarray(jax.device_get(o)) for o in fused_decode_step_tp(
                    cfg, fw, x, jnp.asarray(pos_i, jnp.int32),
                    jnp.asarray(kc), jnp.asarray(vc), mesh, interpret=interp,
                )
            ]
    np.testing.assert_allclose(outs["1"][0], outs["0"][0], atol=2e-2)
    corr = np.corrcoef(outs["1"][0].ravel(), outs["0"][0].ravel())[0, 1]
    assert corr > 0.99999, corr
    mask = np.ones(T, bool)
    mask[pos_i] = False
    for j in (1, 2):
        np.testing.assert_array_equal(
            outs["1"][j][:, :, :, mask], outs["0"][j][:, :, :, mask]
        )
        np.testing.assert_allclose(
            outs["1"][j][:, 0, :, pos_i], outs["0"][j][:, 0, :, pos_i],
            atol=2e-2,
        )
