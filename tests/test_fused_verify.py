"""Fused S=K verify kernel (ops/fused_verify.py): interpret-mode parity vs
the XLA transformer_forward on identical int8 weights and caches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaxer_qwen3_tts_tpu.config import TransformerConfig
from leaxer_qwen3_tts_tpu.models.layers import (
    KVCache,
    init_transformer_params,
    quantize_kv,
    rms_norm,
    transformer_forward,
)
from leaxer_qwen3_tts_tpu.ops.fused_step import pack_fused_weights
from leaxer_qwen3_tts_tpu.ops.fused_verify import (
    fused_verify_step,
    verify_supported,
)
from leaxer_qwen3_tts_tpu.ops.quant import quantize_params


def _tr(kvq: bool):
    return TransformerConfig(
        hidden_size=1024, num_layers=2, num_heads=8, num_kv_heads=4,
        head_dim=128, intermediate_size=3072, dtype="float32",
        kv_cache_quant=kvq,
    )


def _qlayers(params):
    q = quantize_params(
        {"m": {"transformer": {"layers": params["layers"]}}}, modules=("m",)
    )["m"]["transformer"]["layers"]
    return {"layers": q, "final_norm": params["final_norm"]}


@pytest.mark.parametrize("kvq,T,pos_i", [
    (False, 512, 137),   # vmem
    (False, 1024, 509),  # win, writes straddle a window boundary
    (True, 512, 137),    # vmem + int8 KV
    (True, 1024, 509),   # win + int8 KV
])
def test_fused_verify_matches_xla(kvq, T, pos_i):
    t = _tr(kvq)
    S = 4
    assert verify_supported(t, T, S, kvq)
    params = init_transformer_params(t, jax.random.PRNGKey(0))
    fw = pack_fused_weights(t, params["layers"])
    qparams = _qlayers(params)

    rng = np.random.default_rng(9)
    L, nk, d = t.num_layers, t.num_kv_heads, t.head_dim
    x = jnp.asarray(rng.standard_normal((S, 1024)) * 0.3, jnp.float32)
    kc_f = rng.standard_normal((L, 1, nk, T, d)).astype(np.float32) * 0.2
    vc_f = rng.standard_normal((L, 1, nk, T, d)).astype(np.float32) * 0.2
    kc_f[:, :, :, pos_i:] = 0.0
    vc_f[:, :, :, pos_i:] = 0.0
    if kvq:
        qk, sk = quantize_kv(jnp.asarray(kc_f))
        qv, sv = quantize_kv(jnp.asarray(vc_f))
        cache = KVCache(k=qk, v=qv, length=jnp.full((1,), pos_i, jnp.int32),
                        k_scale=sk, v_scale=sv)
        outs = fused_verify_step(t, fw, x, jnp.asarray(pos_i, jnp.int32),
                                 qk, qv, sk, sv, interpret=True)
        x_f, kq_out = outs[0], outs[1]
    else:
        kc = jnp.asarray(kc_f)
        vc = jnp.asarray(vc_f)
        cache = KVCache(k=kc, v=vc, length=jnp.full((1,), pos_i, jnp.int32))
        x_f, kq_out, _ = fused_verify_step(
            t, fw, x, jnp.asarray(pos_i, jnp.int32), kc, vc, interpret=True
        )

    valid = jnp.asarray((np.arange(T) < pos_i)[None, :])
    positions = jnp.asarray([[pos_i + s for s in range(S)]], jnp.int32)
    h_x, cache_x, _ = transformer_forward(
        t, qparams, x[None], positions, cache, valid
    )
    h_ref = np.asarray(h_x)[0]  # [S, H]
    h_fused = np.asarray(rms_norm(x_f, params["final_norm"], t.rms_norm_eps))

    corr = np.corrcoef(h_fused.ravel(), h_ref.ravel())[0, 1]
    assert corr > 0.999, corr
    np.testing.assert_allclose(h_fused, h_ref, atol=0.05, rtol=0.05)

    # all S written slots landed (within bf16-vs-f32 pre-quantization noise)
    for s in range(S):
        a = np.asarray(kq_out[:, 0, :, pos_i + s], np.float64)
        b = np.asarray(cache_x.k[:, 0, :, pos_i + s], np.float64)
        if kvq:
            assert np.abs(a - b).max() <= 2, (s, np.abs(a - b).max())
        else:
            np.testing.assert_allclose(a, b, atol=2e-2)
    # neighbor beyond the writes untouched
    np.testing.assert_array_equal(
        np.asarray(kq_out[:, 0, :, pos_i + S]),
        np.asarray(cache.k[:, 0, :, pos_i + S]),
    )


def test_spec_iteration_fused_matches_xla_greedy():
    """decode_frames_spec with fused verify == the XLA verify path, greedy,
    same int8 weights (end-to-end through the acceptance machinery)."""
    from leaxer_qwen3_tts_tpu.config import (
        CodePredictorConfig, TalkerConfig, TTSModelConfig, VocoderConfig,
    )
    from leaxer_qwen3_tts_tpu.models.talker import (
        init_talker_params, prepare_fused_talker,
    )
    from leaxer_qwen3_tts_tpu.runtime.sampling import SamplingParams
    from leaxer_qwen3_tts_tpu.runtime.speculative import make_spec_generate_fns
    from leaxer_qwen3_tts_tpu.runtime.weights import init_params
    from leaxer_qwen3_tts_tpu.ops.quant import fuse_params, quantize_params

    t = _tr(False)
    cfg = TTSModelConfig(
        name="verify-test",
        talker=TalkerConfig(transformer=t, codec_vocab_size=3072,
                            text_vocab_size=152000, text_embed_dim=1024,
                            decode_impl="fused"),
        code_predictor=CodePredictorConfig(
            transformer=TransformerConfig(
                hidden_size=1024, num_layers=1, num_heads=8, num_kv_heads=4,
                head_dim=128, intermediate_size=3072, dtype="float32",
            ),
            num_steps=15, subcode_vocab_size=2048,
        ),
        vocoder=VocoderConfig(d_model=32, num_prenet_blocks=1,
                              upsample_channels=(8, 8, 8, 8), dtype="float32"),
        speaker_encoder=None,
    )
    params = init_params(cfg, jax.random.PRNGKey(1), with_speaker_encoder=False)
    qparams = quantize_params(fuse_params(params))
    fparams = dict(qparams)
    fparams["talker"] = prepare_fused_talker(cfg.talker, qparams["talker"])

    ids = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    lens = jnp.asarray([4], jnp.int32)
    sp = SamplingParams.create(temperature=0.0, forbid_eos=True)
    key = jax.random.PRNGKey(3)

    fns = make_spec_generate_fns(cfg, max_len=512, k=3, num_iters=2,
                                 donate=False)
    # XLA verify: same params WITHOUT the fused_step pack
    st_x, bd_x, f0_x, v0_x = fns.prefill(qparams, ids, lens, key, sp)
    st_x, fr_x, vd_x = fns.decode(qparams, st_x, bd_x.trailing,
                                  bd_x.trailing_len, bd_x.tts_pad_embed, sp)
    # fused verify: identical weights + the pack
    st_f, bd_f, f0_f, v0_f = fns.prefill(fparams, ids, lens, key, sp)
    st_f, fr_f, vd_f = fns.decode(fparams, st_f, bd_f.trailing,
                                  bd_f.trailing_len, bd_f.tts_pad_embed, sp)

    np.testing.assert_array_equal(np.asarray(f0_x), np.asarray(f0_f))
    np.testing.assert_array_equal(np.asarray(vd_x), np.asarray(vd_f))
    np.testing.assert_array_equal(np.asarray(fr_x), np.asarray(fr_f))
