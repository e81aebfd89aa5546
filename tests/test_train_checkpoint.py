"""Training checkpoint/resume: save -> restore -> identical continued steps."""

import numpy as np
import jax.numpy as jnp

from leaxer_qwen3_tts_tpu.training import (
    init_train_state,
    make_optimizer,
    make_train_step,
)
from leaxer_qwen3_tts_tpu.training.checkpoint import (
    latest_step_dir,
    restore_train_state,
    save_train_state,
)


def make_batch(rng, B=2, T=8, F=4):
    return {
        "text_ids": jnp.asarray(rng.integers(0, 1000, (B, T)), jnp.int32),
        "text_len": jnp.asarray(rng.integers(2, T + 1, (B,)), jnp.int32),
        "codes": jnp.asarray(rng.integers(0, 2048, (B, F, 16)), jnp.int32),
        "num_frames": jnp.asarray(rng.integers(1, F, (B,)), jnp.int32),
    }


def test_save_restore_resume(tiny_model, tmp_path):
    cfg, params = tiny_model
    tx = make_optimizer(learning_rate=1e-3)
    step = make_train_step(cfg, tx, donate=False)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)

    state = init_train_state(params, tx)
    for _ in range(2):
        state, _ = step(state, batch)

    ckpt = str(tmp_path / "ckpts" / "step_2")
    save_train_state(ckpt, state)

    # continue directly vs restore-then-continue: identical trajectories
    cont, m_direct = step(state, batch)
    restored = restore_train_state(ckpt, init_train_state(params, tx))
    assert int(restored.step) == 2
    resumed, m_resumed = step(restored, batch)

    np.testing.assert_allclose(
        float(m_direct.loss), float(m_resumed.loss), rtol=1e-6
    )
    a = cont.params["talker"]["lm_head"]
    b = resumed.params["talker"]["lm_head"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_latest_step_dir(tmp_path):
    base = tmp_path / "runs"
    assert latest_step_dir(str(base)) is None
    for n in (1, 10, 2):
        (base / f"step_{n}").mkdir(parents=True)
    (base / "not_a_step").mkdir()
    assert latest_step_dir(str(base)).endswith("step_10")
