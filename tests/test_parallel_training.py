"""SPMD tests on the 8-virtual-CPU-device mesh (conftest): TP/DP sharded
training step and sharded inference parity vs single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaxer_qwen3_tts_tpu.parallel import (
    auto_mesh,
    make_mesh,
    param_pspec,
    shard_params,
)
from leaxer_qwen3_tts_tpu.training import (
    batch_sharding,
    init_train_state,
    make_optimizer,
    make_train_step,
    shard_train_state,
    tts_loss,
)


def make_batch(rng, B=2, T=8, F=4):
    return {
        "text_ids": jnp.asarray(rng.integers(0, 1000, (B, T)), jnp.int32),
        "text_len": jnp.asarray(rng.integers(2, T + 1, (B,)), jnp.int32),
        "codes": jnp.asarray(rng.integers(0, 2048, (B, F, 16)), jnp.int32),
        # keep num_frames < F so the EOS target position exists inside the
        # static frame axis (at num_frames == F it would be truncated away,
        # which is correct but breaks pad-invariance comparisons)
        "num_frames": jnp.asarray(rng.integers(1, F, (B,)), jnp.int32),
    }


def test_mesh_construction():
    m = make_mesh(2, 4)
    assert m.shape == {"data": 2, "model": 4}
    m2 = auto_mesh(8, model_parallel=2)
    assert m2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(4, 4)


def test_param_pspec_rules():
    from jax.sharding import PartitionSpec as P

    assert param_pspec("talker/transformer/layers/wq") == P(None, None, "model")
    assert param_pspec("talker/transformer/layers/wo") == P(None, "model", None)
    assert param_pspec("talker/lm_head") == P(None, "model")
    assert param_pspec("embeddings/text_embed") == P(None, "model")
    assert param_pspec("talker/transformer/final_norm") == P()
    assert param_pspec("vocoder/final_w") == P()


def test_loss_finite_and_masked(tiny_model):
    cfg, params = tiny_model
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    m = tts_loss(
        cfg, params, batch["text_ids"], batch["text_len"], batch["codes"],
        batch["num_frames"],
    )
    assert np.isfinite(float(m.loss))
    assert float(m.talker_loss) > 0 and float(m.mtp_loss) > 0
    # random-init CE must sit near ln(vocab) (ln 3072 = 8.03, ln 2048 = 7.62);
    # regression guard for mask-normalization bugs (a [B,F,1] mask denominator
    # once inflated the MTP mean by 15x)
    assert float(m.talker_loss) < 16.0
    assert float(m.mtp_loss) < 16.0
    assert int(m.frames) == int(batch["num_frames"].sum())

    # padding invariance: growing F with pad frames must not change the loss
    batch2 = dict(batch)
    batch2["codes"] = jnp.concatenate(
        [batch["codes"], jnp.zeros((2, 3, 16), jnp.int32)], axis=1
    )
    m2 = tts_loss(
        cfg, params, batch2["text_ids"], batch2["text_len"], batch2["codes"],
        batch2["num_frames"],
    )
    np.testing.assert_allclose(float(m2.loss), float(m.loss), rtol=2e-4)


def test_train_step_learns(tiny_model):
    cfg, params = tiny_model
    tx = make_optimizer(learning_rate=3e-3)
    state = init_train_state(params, tx)
    step = make_train_step(cfg, tx, donate=False)
    rng = np.random.default_rng(1)
    batch = make_batch(rng)
    losses = []
    for _ in range(5):
        state, m = step(state, batch)
        losses.append(float(m.loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5


def test_sharded_train_step_matches_single(tiny_model):
    cfg, params = tiny_model
    tx = make_optimizer(learning_rate=1e-3)
    rng = np.random.default_rng(2)
    batch = make_batch(rng, B=4)

    # single-device
    state = init_train_state(params, tx)
    step = make_train_step(cfg, tx, donate=False)
    _, m_single = step(state, batch)

    # 2x4 mesh: dp over batch, tp over heads/mlp/vocab
    mesh = make_mesh(2, 4)
    with jax.set_mesh(mesh):
        sstate = shard_train_state(mesh, init_train_state(params, tx), tx)
        sbatch = jax.device_put(batch, batch_sharding(mesh))
        sstep = make_train_step(cfg, tx, donate=False)
        sstate, m_sharded = sstep(sstate, sbatch)

    np.testing.assert_allclose(
        float(m_sharded.loss), float(m_single.loss), rtol=2e-3
    )
    # a TP-sharded and a replicated param leaf both updated identically
    wq_s = np.asarray(jax.device_get(sstate.params["talker"]["transformer"]["layers"]["wq"]))
    state2, _ = step(init_train_state(params, tx), batch)
    wq_1 = np.asarray(state2.params["talker"]["transformer"]["layers"]["wq"])
    np.testing.assert_allclose(wq_s, wq_1, atol=5e-3)


def test_sharded_inference_parity(tiny_model):
    """Greedy codes from TP+DP-sharded params == single-device codes."""
    from leaxer_qwen3_tts_tpu.runtime.generate import make_generate_fns
    from leaxer_qwen3_tts_tpu.runtime.sampling import SamplingParams

    cfg, params = tiny_model
    B, T, MAXLEN, CHUNK = 2, 8, 32, 4
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 1000, (B, T)), jnp.int32)
    lens = jnp.asarray([T, 5], jnp.int32)
    key = jax.random.PRNGKey(0)
    sp = SamplingParams.create(temperature=0.0)

    def run(p):
        fns = make_generate_fns(cfg, batch=B, max_len=MAXLEN, chunk_len=CHUNK, donate=False)
        state, bundle = fns.prefill(p, ids, lens, key)
        state, frames, valid = fns.decode(
            p, state, bundle.trailing, bundle.trailing_len, bundle.tts_pad_embed, sp
        )
        return np.asarray(frames), np.asarray(valid)

    f1, v1 = run(params)
    mesh = make_mesh(2, 4)
    with jax.set_mesh(mesh):
        sp_params = shard_params(mesh, params)
        f2, v2 = run(sp_params)

    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(v1, v2)
