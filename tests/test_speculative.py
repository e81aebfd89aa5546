"""Speculative frame decoding: greedy bit-parity with the sequential loop
(zero- and full-acceptance paths), commit bookkeeping, EOS latching."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaxer_qwen3_tts_tpu.config import CODEC_EOS
from leaxer_qwen3_tts_tpu.runtime.generate import make_generate_fns
from leaxer_qwen3_tts_tpu.runtime.sampling import SamplingParams
from leaxer_qwen3_tts_tpu.runtime.speculative import (
    make_spec_generate_fns,
    repeat_draft,
)

GREEDY = SamplingParams.create(temperature=0.0)
TEXT_IDS = jnp.array([[5, 6, 7, 0]], jnp.int32)
TEXT_LEN = jnp.array([3], jnp.int32)


def _sequential_frames(cfg, params, key, n_chunks=3, chunk=8):
    fns = make_generate_fns(cfg, batch=1, max_len=64, chunk_len=chunk,
                            lang_id=None, donate=False)
    state, bundle = fns.prefill(params, TEXT_IDS, TEXT_LEN, key)
    frames_all, valid_all = [], []
    for _ in range(n_chunks):
        state, frames, valid = fns.decode(
            params, state, bundle.trailing, bundle.trailing_len,
            bundle.tts_pad_embed, GREEDY,
        )
        frames_all.append(frames)
        valid_all.append(valid)
    return (
        np.asarray(jnp.concatenate(frames_all, 1))[0],  # [F, 16]
        np.asarray(jnp.concatenate(valid_all, 1))[0],
    )


def _spec_frames(cfg, params, key, k=4, num_iters=4, n_dispatch=3,
                 draft_fn=repeat_draft, sp=GREEDY):
    fns = make_spec_generate_fns(cfg, max_len=64, k=k, num_iters=num_iters,
                                 lang_id=None, donate=False, draft_fn=draft_fn)
    state, bundle, frame0, valid0 = fns.prefill(
        params, TEXT_IDS, TEXT_LEN, key, sp
    )
    frames = [np.asarray(frame0)]
    valid = [np.asarray(valid0)]
    for _ in range(n_dispatch):
        state, f, v = fns.decode(
            params, state, bundle.trailing, bundle.trailing_len,
            bundle.tts_pad_embed, sp,
        )
        frames.append(np.asarray(f)[0])
        valid.append(np.asarray(v)[0])
    frames = np.concatenate(frames, axis=0)  # [1 + n*iters*k, 16]
    valid = np.concatenate(valid, axis=0)
    return frames[valid], state  # compacted committed frames, in order


def test_spec_greedy_matches_sequential_zero_acceptance(tiny_model):
    """Random tiny weights: the repeat draft essentially never accepts, so
    every iteration exercises the worst path (1 bonus frame) — output must
    still be IDENTICAL to the sequential loop."""
    cfg, params = tiny_model
    key = jax.random.PRNGKey(3)
    seq_frames, seq_valid = _sequential_frames(cfg, params, key)
    spec_frames, state = _spec_frames(cfg, params, key)

    n_seq = int(seq_valid.sum())
    n = min(n_seq, len(spec_frames))
    assert n >= 8, (n_seq, len(spec_frames))
    np.testing.assert_array_equal(spec_frames[:n], seq_frames[:n])


def test_spec_greedy_oracle_draft_full_acceptance(tiny_model):
    """An oracle draft (the sequential frames themselves) must accept k-1
    drafts every iteration — validates the acceptance/commit bookkeeping —
    and still produce the identical sequence."""
    cfg, params = tiny_model
    key = jax.random.PRNGKey(3)
    seq_frames, seq_valid = _sequential_frames(cfg, params, key, n_chunks=4)
    seq_dev = jnp.asarray(seq_frames)  # [F, 16]

    k, num_iters = 4, 3

    def oracle_draft(state, kk):
        # candidate slot j (1..k-1) is frame index state.step + j - 1
        start = jnp.minimum(state.step[0], seq_dev.shape[0] - (kk - 1))
        codes = jax.lax.dynamic_slice(
            seq_dev, (start, 0), (kk - 1, 16)
        )
        return codes[None], None

    spec_frames, state = _spec_frames(
        cfg, params, key, k=k, num_iters=num_iters, n_dispatch=2,
        draft_fn=oracle_draft,
    )
    # full acceptance: every iteration commits k frames
    # total = 1 (bootstrap) + 2 dispatches * 3 iters * k
    assert int(np.asarray(state.step)[0]) == 1 + 2 * num_iters * k
    n = min(int(seq_valid.sum()), len(spec_frames))
    assert n >= 12
    np.testing.assert_array_equal(spec_frames[:n], seq_frames[:n])


def test_make_replay_draft_full_acceptance(tiny_model):
    """The library replay-oracle (bench's structural ceiling probe) forces
    full acceptance by construction — every iteration commits k frames —
    and reproduces the sequential greedy trajectory bit-exactly."""
    from leaxer_qwen3_tts_tpu.runtime.speculative import make_replay_draft

    cfg, params = tiny_model
    key = jax.random.PRNGKey(3)
    seq_frames, seq_valid = _sequential_frames(cfg, params, key, n_chunks=4)
    k, num_iters = 4, 3
    spec_frames, state = _spec_frames(
        cfg, params, key, k=k, num_iters=num_iters, n_dispatch=2,
        draft_fn=make_replay_draft(seq_frames),
    )
    assert int(np.asarray(state.step)[0]) == 1 + 2 * num_iters * k
    n = min(int(seq_valid.sum()), len(spec_frames))
    assert n >= 12
    np.testing.assert_array_equal(spec_frames[:n], seq_frames[:n])


def test_make_replay_draft_batched(tiny_model):
    """The replay oracle indexes per-stream steps independently: B identical
    prompts under greedy all stay pinned to the shared trajectory with full
    acceptance (the bench serving_spec_ceil shape)."""
    from leaxer_qwen3_tts_tpu.runtime.speculative import make_replay_draft

    cfg, params = tiny_model
    key = jax.random.PRNGKey(5)
    seq_frames, seq_valid = _sequential_frames(cfg, params, key, n_chunks=4)
    B, k, iters = 2, 3, 2
    fns = make_spec_generate_fns(
        cfg, max_len=64, k=k, num_iters=iters, batch=B, lang_id=None,
        donate=False, draft_fn=make_replay_draft(seq_frames),
    )
    ids = jnp.tile(TEXT_IDS, (B, 1))
    lens = jnp.tile(TEXT_LEN, (B,))
    state, bundle, frame0, valid0 = fns.prefill(params, ids, lens, key, GREEDY)
    bufs = [[] for _ in range(B)]
    f0, v0 = np.asarray(frame0), np.asarray(valid0)
    for b in range(B):
        if v0[b]:
            bufs[b].append(f0[b])
    n_dispatch = 2
    for _ in range(n_dispatch):
        state, fr, vd = fns.decode(
            params, state, bundle.trailing, bundle.trailing_len,
            bundle.tts_pad_embed, GREEDY,
        )
        fr, vd = np.asarray(fr), np.asarray(vd)
        for b in range(B):
            bufs[b].extend(fr[b][vd[b]])
    steps = np.asarray(state.step)
    np.testing.assert_array_equal(steps, 1 + n_dispatch * iters * k)
    for b in range(B):
        arr = np.stack(bufs[b])
        n = min(int(seq_valid.sum()), len(arr))
        assert n >= 8
        np.testing.assert_array_equal(arr[:n], seq_frames[:n], err_msg=f"stream {b}")


def test_force_accept_structural_ceiling(tiny_model):
    """bench.py's ceiling probe: force_accept=True commits k frames per
    iteration (acceptance 1.0 by construction) even with an always-WRONG
    draft — weight-independent, unlike any replay/repeat-draft bet."""
    cfg, params = tiny_model

    def wrong_draft(state, k):
        import jax.numpy as jnp

        B = state.pending.shape[0]
        return (
            jnp.broadcast_to(
                (state.pending[:, None, :] + 1) % 2048, (B, k - 1, 16)
            ),
            None,
        )

    k, iters = 4, 2
    fns = make_spec_generate_fns(
        cfg, max_len=64, k=k, num_iters=iters, donate=False,
        draft_fn=wrong_draft, force_accept=True,
    )
    state, bundle, frame0, valid0 = fns.prefill(
        params, TEXT_IDS, TEXT_LEN, jax.random.PRNGKey(0), GREEDY
    )
    n_disp = 2
    for _ in range(n_disp):
        state, fr, vd = fns.decode(
            params, state, bundle.trailing, bundle.trailing_len,
            bundle.tts_pad_embed, GREEDY,
        )
        assert int(np.asarray(vd).sum()) == iters * k  # full acceptance
    assert int(np.asarray(state.step)[0]) == 1 + n_disp * iters * k


def test_spec_batched_matches_sequential_per_stream(tiny_model):
    """B=3 streams (different prompt lengths): per-stream compacted spec
    output == the sequential batched loop's, with per-stream commit counts
    free to diverge (per-sequence cache fills)."""
    cfg, params = tiny_model
    B = 3
    text_ids = jnp.array(
        [[5, 6, 7, 0], [9, 10, 0, 0], [11, 3, 2, 8]], jnp.int32
    )
    text_len = jnp.array([3, 2, 4], jnp.int32)
    key = jax.random.PRNGKey(7)

    fns = make_generate_fns(cfg, batch=B, max_len=64, chunk_len=8,
                            lang_id=None, donate=False)
    state, bundle = fns.prefill(params, text_ids, text_len, key)
    seq_frames, seq_valid = [], []
    for _ in range(3):
        state, fr, vd = fns.decode(
            params, state, bundle.trailing, bundle.trailing_len,
            bundle.tts_pad_embed, GREEDY,
        )
        seq_frames.append(np.asarray(fr))
        seq_valid.append(np.asarray(vd))
    seq_frames = np.concatenate(seq_frames, axis=1)  # [B, F, 16]
    seq_valid = np.concatenate(seq_valid, axis=1)

    sfns = make_spec_generate_fns(cfg, max_len=64, k=4, num_iters=3, batch=B,
                                  lang_id=None, donate=False)
    st, bd, f0, v0 = sfns.prefill(params, text_ids, text_len, key, GREEDY)
    frames = [np.asarray(f0)[:, None, :]]  # [B, 1, 16]
    valid = [np.asarray(v0)[:, None]]
    for _ in range(3):
        st, fr, vd = sfns.decode(
            params, st, bd.trailing, bd.trailing_len, bd.tts_pad_embed, GREEDY
        )
        frames.append(np.asarray(fr))
        valid.append(np.asarray(vd))
    frames = np.concatenate(frames, axis=1)  # [B, 1+3*iters*k, 16]
    valid = np.concatenate(valid, axis=1)

    # streams commit at independent rates
    commits = np.asarray(st.step)
    assert commits.shape == (B,)
    for b in range(B):
        spec_b = frames[b][valid[b]]  # compacted, in order
        n = min(int(seq_valid[b].sum()), len(spec_b))
        assert n >= 6, (b, n)
        np.testing.assert_array_equal(
            spec_b[:n], seq_frames[b][:n], err_msg=f"stream {b}"
        )


def test_spec_done_stream_frozen(tiny_model):
    """A stream that enters an iteration done must NOT advance its KV fill /
    step / position: at up to k slots per iteration its repeat draft
    self-accepts the repetitive post-EOS output, races ahead of live
    batch-mates, and exhausts the shared bucket (review finding)."""
    cfg, params = tiny_model
    B = 2
    text_ids = jnp.array([[5, 6, 7, 0], [9, 10, 0, 0]], jnp.int32)
    text_len = jnp.array([3, 2], jnp.int32)
    fns = make_spec_generate_fns(cfg, max_len=64, k=4, num_iters=3, batch=B,
                                 lang_id=None, donate=False)
    state, bundle, f0, v0 = fns.prefill(
        params, text_ids, text_len, jax.random.PRNGKey(0), GREEDY
    )
    state = state._replace(done=jnp.array([True, False]))
    step0 = np.asarray(state.step).copy()
    len0 = np.asarray(state.cache.length).copy()
    state, frames, valid = fns.decode(
        params, state, bundle.trailing, bundle.trailing_len,
        bundle.tts_pad_embed, GREEDY,
    )
    step1 = np.asarray(state.step)
    len1 = np.asarray(state.cache.length)
    assert step1[0] == step0[0] and len1[0] == len0[0]  # frozen
    assert step1[1] > step0[1] and len1[1] > len0[1]  # live stream advanced
    assert not np.asarray(valid)[0].any()  # no phantom commits


def test_spec_eos_latches(tiny_model):
    """Boosted-EOS lm_head: frame 0 is EOS at bootstrap -> no valid frames,
    done latched, later dispatches emit nothing."""
    cfg, params = tiny_model
    lm = params["talker"]["lm_head"]
    boosted = jax.tree_util.tree_map(lambda x: x, params)
    boosted["talker"] = dict(params["talker"])
    boosted["talker"]["lm_head"] = lm.at[:, CODEC_EOS].add(100.0)

    fns = make_spec_generate_fns(cfg, max_len=64, k=4, num_iters=2,
                                 lang_id=None, donate=False)
    state, bundle, frame0, valid0 = fns.prefill(
        boosted, TEXT_IDS, TEXT_LEN, jax.random.PRNGKey(0), GREEDY
    )
    assert not bool(np.asarray(valid0)[0])
    assert bool(np.asarray(state.done))
    state, f, v = fns.decode(
        boosted, state, bundle.trailing, bundle.trailing_len,
        bundle.tts_pad_embed, GREEDY,
    )
    assert not np.asarray(v).any()
    assert bool(np.asarray(state.done))


def test_engine_spec_matches_sequential_greedy(tiny_model, tiny_vocab_files):
    """TTSEngine(spec_k=4) greedy output (codes AND audio) == the sequential
    engine for the same seed."""
    from leaxer_qwen3_tts_tpu.api.engine import TTSEngine
    from leaxer_qwen3_tts_tpu.frontend import Tokenizer

    cfg, params = tiny_model
    vocab_path, merges_path, _ = tiny_vocab_files
    tok = Tokenizer(vocab_path, merges_path)
    kw = dict(config=cfg, params=params, tokenizer=tok, max_frames=12,
              chunk_len=4, first_chunk_len=2)
    seq_eng = TTSEngine(**kw)
    spec_eng = TTSEngine(**kw, spec_k=3, spec_iters=2)
    assert seq_eng.is_ready() and spec_eng.is_ready(), (
        seq_eng.get_error(), spec_eng.get_error(),
    )
    a = seq_eng.synthesize("hello world", temperature=0.0, seed=5)
    b = spec_eng.synthesize("hello world", temperature=0.0, seed=5)
    np.testing.assert_array_equal(np.asarray(b.codes), np.asarray(a.codes))
    np.testing.assert_allclose(
        np.asarray(b.audio), np.asarray(a.audio), atol=1e-5
    )
    assert b.metrics.frames == a.metrics.frames


def test_engine_spec_respects_max_tokens(tiny_model, tiny_vocab_files):
    from leaxer_qwen3_tts_tpu.api.engine import TTSEngine
    from leaxer_qwen3_tts_tpu.frontend import Tokenizer

    cfg, params = tiny_model
    vocab_path, merges_path, _ = tiny_vocab_files
    eng = TTSEngine(config=cfg, params=params,
                    tokenizer=Tokenizer(vocab_path, merges_path),
                    max_frames=16, chunk_len=4, spec_k=4, spec_iters=2)
    assert eng.is_ready(), eng.get_error()
    res = eng.synthesize("hello world", temperature=0.0, max_tokens=5)
    assert len(res.codes) <= 5
    assert res.audio.size == len(res.codes) * 2000  # tiny spf


def test_engine_spec_batch_matches_sequential(tiny_model, tiny_vocab_files):
    """synthesize_batch with spec_k: per-stream greedy codes and audio equal
    the sequential batched engine's."""
    from leaxer_qwen3_tts_tpu.api.engine import TTSEngine
    from leaxer_qwen3_tts_tpu.frontend import Tokenizer

    cfg, params = tiny_model
    vocab_path, merges_path, _ = tiny_vocab_files
    tok = Tokenizer(vocab_path, merges_path)
    kw = dict(config=cfg, params=params, tokenizer=tok, max_frames=8,
              chunk_len=4)
    texts = ["hello world", "hello", "world hello world"]
    seq = TTSEngine(**kw).synthesize_batch(texts, temperature=0.0, seed=4)
    spec = TTSEngine(**kw, spec_k=3, spec_iters=2).synthesize_batch(
        texts, temperature=0.0, seed=4
    )
    for b, (a, s) in enumerate(zip(seq, spec)):
        na, ns = len(a.codes), len(s.codes)
        n = min(na, ns)
        assert n >= 4, (b, na, ns)
        np.testing.assert_array_equal(
            np.asarray(s.codes)[:n], np.asarray(a.codes)[:n], err_msg=str(b)
        )
        np.testing.assert_allclose(
            np.asarray(s.audio)[: n * 2000], np.asarray(a.audio)[: n * 2000],
            atol=1e-5, err_msg=str(b),
        )
        assert s.metrics.spec_iterations > 0


def test_engine_spec_clone_and_instruct_match(tiny_model, tiny_vocab_files,
                                              tmp_path):
    """Spec decode composes with voice-clone and instruct conditioning:
    greedy codes equal the sequential engine's for the same inputs."""
    from leaxer_qwen3_tts_tpu.api.engine import TTSEngine
    from leaxer_qwen3_tts_tpu.frontend import Tokenizer, write_wav

    cfg, params = tiny_model
    vocab_path, merges_path, _ = tiny_vocab_files
    tok = Tokenizer(vocab_path, merges_path)
    kw = dict(config=cfg, params=params, tokenizer=tok, max_frames=8,
              chunk_len=4)
    seq_eng = TTSEngine(**kw)
    spec_eng = TTSEngine(**kw, spec_k=3, spec_iters=2)

    sr = 16000
    t = np.arange(sr) / sr
    ref = str(tmp_path / "ref.wav")
    write_wav(ref, (0.3 * np.sin(2 * np.pi * 330 * t)).astype(np.float32), sr)

    a = seq_eng.synthesize_clone("hello", ref, temperature=0.0,
                                 instruct="calm")
    b = spec_eng.synthesize_clone("hello", ref, temperature=0.0,
                                  instruct="calm")
    np.testing.assert_array_equal(np.asarray(b.codes), np.asarray(a.codes))


def test_engine_spec_under_mesh_matches(tiny_model, tiny_vocab_files):
    """spec_k + TP×DP mesh: the sharded verify pass (GSPMD over the TP
    rules) produces the same greedy codes as the unsharded spec engine."""
    from leaxer_qwen3_tts_tpu.api.engine import TTSEngine
    from leaxer_qwen3_tts_tpu.frontend import Tokenizer
    from leaxer_qwen3_tts_tpu.parallel import make_mesh

    cfg, params = tiny_model
    vocab_path, merges_path, _ = tiny_vocab_files
    tok = Tokenizer(vocab_path, merges_path)
    kw = dict(config=cfg, params=params, tokenizer=tok, max_frames=8,
              chunk_len=4, spec_k=3, spec_iters=2)

    plain = TTSEngine(**kw)
    a = plain.synthesize("hello world", temperature=0.0, seed=5)

    mesh = make_mesh(2, 4)
    with jax.set_mesh(mesh):
        sharded = TTSEngine(**kw, mesh=mesh)
        assert sharded.is_ready(), sharded.get_error()
        b = sharded.synthesize("hello world", temperature=0.0, seed=5)
    np.testing.assert_array_equal(np.asarray(b.codes), np.asarray(a.codes))


def test_spec_sampling_valid_and_deterministic(tiny_model):
    """temperature > 0: same seed -> same committed trajectory (spec decode
    is deterministic given the seed); codes lie in the codec range."""
    cfg, params = tiny_model
    sp = SamplingParams.create(0.8, 50, 0.95)
    key = jax.random.PRNGKey(11)
    f1, _ = _spec_frames(cfg, params, key, n_dispatch=2, sp=sp)
    f2, _ = _spec_frames(cfg, params, key, n_dispatch=2, sp=sp)
    np.testing.assert_array_equal(f1, f2)
    assert len(f1) >= 6
    assert (f1 >= 0).all()
    v = cfg.talker.codec_vocab_size
    assert (f1[:, 0] < v).all()


def test_spec_kv_bucket_growth_matches_single_bucket(tiny_model):
    """Growing a SpecState into a bigger KV bucket mid-request (the engine's
    ladder migration: zero-pad the cache + validity, rebuild fns at the new
    bucket) produces the same greedy codes as running in the big bucket from
    the start.  EOS is suppressed via forbid_eos so decode spans the
    boundary."""
    from leaxer_qwen3_tts_tpu.api.engine import TTSEngine

    cfg, params = tiny_model
    sp = SamplingParams.create(temperature=0.0, forbid_eos=True)
    key = jax.random.PRNGKey(2)
    k, iters = 3, 2  # 6 slots per dispatch

    # reference: one big bucket from the start
    big = make_spec_generate_fns(cfg, max_len=64, k=k, num_iters=iters,
                                 lang_id=None, donate=False)
    st, bd, f0, v0 = big.prefill(params, TEXT_IDS, TEXT_LEN, key, sp)
    ref = [np.asarray(f0)]
    for _ in range(12):
        st, fr, vd = big.decode(params, st, bd.trailing, bd.trailing_len,
                                bd.tts_pad_embed, sp)
        ref.append(np.asarray(fr)[0][np.asarray(vd)[0]])
    ref = np.concatenate(ref, axis=0)

    # small bucket, grow to 64 when the next dispatch could overflow
    small = make_spec_generate_fns(cfg, max_len=32, k=k, num_iters=iters,
                                   lang_id=None, donate=False)
    st, bd, f0, v0 = small.prefill(params, TEXT_IDS, TEXT_LEN, key, sp)
    got = [np.asarray(f0)]
    fns, bucket = small, 32
    grew = False
    for _ in range(12):
        fill = int(np.asarray(st.cache.length)[0])
        if fill + k * iters > bucket and bucket < 64:
            st = TTSEngine._grow_state(st, 64)
            fns, bucket, grew = big, 64, True
        st, fr, vd = fns.decode(params, st, bd.trailing, bd.trailing_len,
                                bd.tts_pad_embed, sp)
        got.append(np.asarray(fr)[0][np.asarray(vd)[0]])
    got = np.concatenate(got, axis=0)

    assert grew  # the migration actually happened
    n = min(len(ref), len(got))
    assert n >= 12
    np.testing.assert_array_equal(got[:n], ref[:n])


def test_spec_to_seq_continuation_matches_sequential(tiny_model):
    """Run spec iterations, convert with spec_to_seq, continue sequentially:
    greedy codes equal a pure sequential decode of the same request."""
    from leaxer_qwen3_tts_tpu.runtime.generate import make_generate_fns
    from leaxer_qwen3_tts_tpu.runtime.speculative import (
        make_spec_generate_fns,
        spec_to_seq,
    )

    cfg, params = tiny_model
    sp = SamplingParams.create(temperature=0.0, forbid_eos=True)
    key = jax.random.PRNGKey(2)
    ids = jnp.asarray([[5, 6, 7]], jnp.int32)
    lens = jnp.asarray([3], jnp.int32)

    # pure sequential reference: 2 + 4 frames
    fns = make_generate_fns(cfg, batch=1, max_len=64, chunk_len=6)
    st0, bd = fns.prefill(params, ids, lens, key)
    st0, fr_ref, vd_ref = fns.decode(
        params, st0, bd.trailing, bd.trailing_len, bd.tts_pad_embed, sp
    )
    ref = np.asarray(fr_ref)[0][np.asarray(vd_ref)[0]]

    # spec for 1 dispatch (k=3 x 1 iter), then convert + sequential continue
    sfns = make_spec_generate_fns(cfg, max_len=64, k=3, num_iters=1,
                                  donate=False)
    st, bd2, f0, v0 = sfns.prefill(params, ids, lens, key, sp)
    committed = [np.asarray(f0)[0]] if bool(np.asarray(v0)[0]) else []
    st, fr, vd = sfns.decode(params, st, bd2.trailing, bd2.trailing_len,
                             bd2.tts_pad_embed, sp)
    committed.extend(np.asarray(fr)[0][np.asarray(vd)[0]])

    seq_state = jax.jit(
        lambda p, s, tr, tl, pad: spec_to_seq(cfg, p, s, tr, tl, pad)
    )(params, st, bd2.trailing, bd2.trailing_len, bd2.tts_pad_embed)
    n_more = 6 - len(committed)
    fns2 = make_generate_fns(cfg, batch=1, max_len=64, chunk_len=n_more,
                             donate=False)
    seq_state, fr2, vd2 = fns2.decode(
        params, seq_state, bd2.trailing, bd2.trailing_len, bd2.tts_pad_embed,
        sp,
    )
    committed.extend(np.asarray(fr2)[0][np.asarray(vd2)[0]])

    n = min(len(ref), len(committed))
    assert n >= 4
    np.testing.assert_array_equal(np.stack(committed[:n]), ref[:n])


def test_engine_spec_fallback_matches_sequential(tiny_model, tiny_vocab_files):
    """spec_accept_floor > 1 forces the adaptive fallback; greedy output
    still equals the sequential engine and the metrics record the revert."""
    from leaxer_qwen3_tts_tpu.api.engine import TTSEngine
    from leaxer_qwen3_tts_tpu.frontend import Tokenizer

    cfg, params = tiny_model
    vocab_path, merges_path, _ = tiny_vocab_files
    tok = Tokenizer(vocab_path, merges_path)
    kw = dict(config=cfg, params=params, tokenizer=tok, max_frames=12,
              chunk_len=4, first_chunk_len=2)
    seq = TTSEngine(**kw)
    spec = TTSEngine(**kw, spec_k=3, spec_iters=1, spec_accept_floor=1.01,
                     spec_adapt_window=1)
    a = seq.synthesize("hello world", temperature=0.0, seed=5)
    b = spec.synthesize("hello world", temperature=0.0, seed=5)
    np.testing.assert_array_equal(np.asarray(b.codes), np.asarray(a.codes))
    np.testing.assert_allclose(np.asarray(b.audio), np.asarray(a.audio),
                               atol=1e-5)
    assert b.metrics.spec_fallback
    # default floor keeps spec active on accepting streams
    ok = TTSEngine(**kw, spec_k=3, spec_iters=1)
    c = ok.synthesize("hello world", temperature=0.0, seed=5)
    np.testing.assert_array_equal(np.asarray(c.codes), np.asarray(a.codes))
