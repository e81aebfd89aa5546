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


def test_restore_onto_different_mesh_topology(tiny_model, tmp_path):
    """A sharded train state saved on a (2,4) mesh restores onto (4,2) and
    (8,1) meshes: orbax re-shards on load, and a continued step matches the
    original trajectory."""
    import jax

    from leaxer_qwen3_tts_tpu.parallel import make_mesh
    from leaxer_qwen3_tts_tpu.training import batch_sharding, shard_train_state

    cfg, params = tiny_model
    tx = make_optimizer(learning_rate=1e-3)
    step = make_train_step(cfg, tx, donate=False)
    rng = np.random.default_rng(1)
    batch = make_batch(rng, B=8)  # divisible by every data-axis size tried

    mesh_a = make_mesh(2, 4)
    with jax.set_mesh(mesh_a):
        state = shard_train_state(mesh_a, init_train_state(params, tx), tx)
        b_a = jax.device_put(batch, batch_sharding(mesh_a))
        state, _ = step(state, b_a)
        ckpt = str(tmp_path / "xt" / "step_1")
        save_train_state(ckpt, state)
        ref, m_ref = step(state, b_a)
        ref_lm = np.asarray(jax.device_get(ref.params["talker"]["lm_head"]))

    for shape in ((4, 2), (8, 1)):
        mesh_b = make_mesh(*shape)
        with jax.set_mesh(mesh_b):
            target = shard_train_state(mesh_b, init_train_state(params, tx), tx)
            restored = restore_train_state(ckpt, target)
            assert int(restored.step) == 1
            b_b = jax.device_put(batch, batch_sharding(mesh_b))
            resumed, m_res = step(restored, b_b)
        np.testing.assert_allclose(
            float(m_res.loss), float(m_ref.loss), rtol=1e-5, err_msg=str(shape)
        )
        np.testing.assert_allclose(
            np.asarray(jax.device_get(resumed.params["talker"]["lm_head"])),
            ref_lm, rtol=1e-5, atol=1e-6, err_msg=str(shape),
        )
