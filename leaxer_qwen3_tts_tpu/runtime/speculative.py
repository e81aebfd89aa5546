"""Frame-level speculative decoding: break the per-frame weight-read chain.

Sequential decode (runtime/generate.py) reads the full talker (431 MB int8)
plus the MTP trunk 15x per 12 Hz frame — the ~2.3 ms/frame HBM floor
documented in docs/KERNEL_PLAN.md.  This module verifies K drafted frames
with ONE S=K talker pass and ONE MTP chain batched over the K frames, so the
weight bytes amortize over every accepted frame (arXiv 2410.21951 /
2410.13839 apply the idea to AR-codec TTS; the reference
(/root/reference/src/tts_onnx.cpp:801-846) has no analog — its inner loop is
strictly one-frame-at-a-time).

EXACTNESS.  Unlike classic speculative sampling, the committed codes are
ALWAYS produced by the exact model: the draft only chooses which inputs get
prefetched into the verify pass.  A talker input embed is a pure function of
the frame's 16 codes (codec_embed(code0) + sum_j table_j[subcode_j] — see
models/code_predictor.py), so when the draft's codes match the exact codes,
the verify pass's hidden states ARE the sequential hidden states, and the
next candidate is valid.  Greedy (temperature=0) output is therefore
bit-identical to the sequential loop (the per-frame PRNG-split chain is
replicated, and committed embeds reuse the exact predict_subcodes sums).
With temperature > 0 the committed trajectory is a sample from the SAME
per-frame conditional distributions; the MTP sub-code key stream differs
from the sequential loop's (predict_subcodes shares one key across the
batched frames), so sampled trajectories are distribution-equal rather than
bit-equal.

One iteration (batch 1, K inputs):

  inputs   = [embed(pending)] + [embed(draft_1) ... embed(draft_{K-1})]
  verify   = talker forward S=K              (weights read ONCE)
  cand[i]  = sample(logits[i]), MTP(hidden[i], cand0[i])   for i = 0..K-1
             (MTP batched over all K candidates: trunk read ONCE)
  n        = longest prefix with cand[i] == draft_{i+1}
  commit   = cand[0..n]                      (n matched drafts + 1 bonus)

Worst case commits 1 frame for ~1 sequential frame's bytes; best case
commits K.  The shipped draft is "repeat" (draft_j = pending frame): free,
and accepts on sustained/silent stretches.  `draft_fn` is pluggable for a
trained draft model.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import CODEC_EOS, TTSModelConfig
from ..models.code_predictor import predict_subcodes
from ..models.embeddings import codec_embed
from ..models.layers import KVCache, transformer_forward
from ..ops.quant import dense
from .prompt import PromptBundle, build_prompt
from .sampling import SamplingParams, make_codec_suppress_mask, sample_token


class SpecState(NamedTuple):
    """Loop state for speculative decode (batch 1).

    The invariant between iterations: `pending` is the last committed frame,
    whose talker input embed (pending_nodrip + its text drip) has NOT been
    consumed yet; the KV cache holds exactly the prompt plus the inputs of
    all earlier committed frames (cache.length is the next write slot).
    """

    cache: KVCache
    valid_mask: jax.Array  # [1, T] bool
    pending: jax.Array  # [1, 16] int32 — last committed frame's codes
    pending_nodrip: jax.Array  # [1, H] — its code0_embed + sub_sum (exact)
    pending_hidden: jax.Array  # [1, H] — talker hidden that produced it
    # (the EAGLE-style draft conditions on (hidden, embed); repeat_draft
    # ignores it)
    rope_pos: jax.Array  # [] int32 — RoPE position of the pending input
    step: jax.Array  # [] int32 — frames committed so far (incl. pending)
    done: jax.Array  # [] bool — EOS latched
    key: jax.Array


def _drip_at(trailing, trailing_len, tts_pad_embed, idx):
    """Text-drip embed for absolute frame index `idx` (mirrors generate.py)."""
    T = trailing.shape[1]
    d = trailing[0, jnp.minimum(idx, T - 1)]  # [H]
    use_text = idx < trailing_len[0]
    return jnp.where(use_text, d, tts_pad_embed.astype(d.dtype))


def init_spec_state(
    cfg: TTSModelConfig,
    params: dict,
    bundle: PromptBundle,
    cache: KVCache,
    key: jax.Array,
    sp: SamplingParams,
) -> Tuple[SpecState, jax.Array, jax.Array]:
    """Prefill + the first frame (code0 from prefill logits + its MTP run,
    exactly the non-talker half of generate._frame_step).

    Returns (state, frame0 [1, 16], valid0 [1]).
    """
    from ..models.talker import talker_prefill

    emb = params["embeddings"]
    suppress = make_codec_suppress_mask(cfg.talker.codec_vocab_size)
    last_logits, last_hidden, cache, valid_mask = talker_prefill(
        cfg.talker, params["talker"], bundle.prompt_embeds, bundle.prompt_len,
        cache,
    )
    key, k_code0, k_pred = jax.random.split(key, 3)
    logits = last_logits + suppress[None, :]
    logits = logits.at[:, CODEC_EOS].add(jnp.where(sp.forbid_eos, -1e30, 0.0))
    code0 = sample_token(k_code0, logits, sp)  # [1]
    is_eos = code0 == CODEC_EOS

    code0_embed = codec_embed(emb, code0)
    sample_fn = lambda k, lg: sample_token(k, lg, sp)
    subcodes, sub_sum = predict_subcodes(
        cfg.code_predictor, params["code_predictor"], emb["pred_embed"],
        last_hidden, code0_embed, k_pred, sample_fn,
    )
    frame = jnp.concatenate([code0[:, None], subcodes], axis=1)  # [1, 16]
    valid = ~is_eos
    state = SpecState(
        cache=cache,
        valid_mask=valid_mask,
        pending=frame,
        pending_nodrip=code0_embed + sub_sum,
        pending_hidden=last_hidden,
        rope_pos=bundle.prompt_len[0],
        step=jnp.asarray(1, jnp.int32),
        done=is_eos[0],
        key=key,
    )
    return state, jnp.where(valid[:, None], frame, 0), valid


def repeat_draft(
    state: SpecState, k: int
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """The zero-cost draft: every drafted frame repeats the pending frame.

    Returns (codes [k-1, 16], nodrip [k-1, H]): reusing the pending frame's
    exact embed sum keeps accepted verify inputs BIT-identical to the
    sequential loop's (a recompute could differ in reduction order from the
    fused MTP's sum and flip knife-edge greedy ties)."""
    return (
        jnp.broadcast_to(state.pending, (k - 1, 16)),
        jnp.broadcast_to(
            state.pending_nodrip, (k - 1, state.pending_nodrip.shape[-1])
        ),
    )


def _spec_iteration(
    cfg: TTSModelConfig,
    params: dict,
    suppress: jax.Array,
    trailing: jax.Array,
    trailing_len: jax.Array,
    tts_pad_embed: jax.Array,
    sp: SamplingParams,
    k: int,
    draft_fn: Callable[[SpecState, int], jax.Array],
    state: SpecState,
) -> Tuple[SpecState, Tuple[jax.Array, jax.Array]]:
    """One verify iteration.  Returns (state', (frames [k, 16], valid [k]))
    where entries [m:] (uncommitted candidates) are zeroed/invalid."""
    emb = params["embeddings"]
    t = cfg.talker.transformer
    H = t.hidden_size

    # --- the per-frame PRNG chain, pre-split k frames ahead --------------
    keys_code0, keys_pred, keys_after = [], [], []
    key = state.key
    for _ in range(k):
        key, kc, kp = jax.random.split(key, 3)
        keys_code0.append(kc)
        keys_pred.append(kp)
        keys_after.append(key)
    keys_after = jnp.stack(keys_after)  # [k, 2]

    # --- build the K talker inputs ---------------------------------------
    drafts, d_nodrip = draft_fn(state, k)  # [k-1, 16], [k-1, H] or None
    if d_nodrip is None:
        # model-based drafts: reconstruct the embed sum from the codes with
        # the same gather + reduction shape predict_subcodes uses (sum of
        # the first 14 step-embeds + the last)
        d_code0_embed = codec_embed(emb, drafts[:, 0])  # [k-1, H]
        tables = emb["pred_embed"]  # [15, Vs, H]
        d_embs = jax.vmap(
            lambda tab, c: jnp.take(tab, c, axis=0), in_axes=(0, 1)
        )(tables, drafts[:, 1:])  # [15, k-1, H]
        d_sub_sum = jnp.sum(d_embs[:-1], axis=0) + d_embs[-1]
        d_nodrip = d_code0_embed + d_sub_sum  # [k-1, H]
    nodrip = jnp.concatenate([state.pending_nodrip, d_nodrip], axis=0)  # [k, H]

    base_idx = state.step - 1  # pending frame's index
    drip_idx = base_idx + jnp.arange(k, dtype=jnp.int32)  # [k]
    drips = jax.vmap(
        lambda i: _drip_at(trailing, trailing_len, tts_pad_embed, i)
    )(drip_idx)  # [k, H]
    inputs = (nodrip + drips).astype(t.jnp_dtype)[None]  # [1, k, H]

    # --- ONE talker pass over all K inputs (weights read once) -----------
    positions = (state.rope_pos + jnp.arange(k, dtype=jnp.int32))[None]  # [1, k]
    hidden, cache, valid_mask = transformer_forward(
        t, params["talker"]["transformer"], inputs, positions,
        state.cache, state.valid_mask,
    )  # hidden [1, k, H]
    logits_all = dense(hidden, params["talker"]["lm_head"])  # [1, k, V]

    # --- exact candidate code0 per slot (each with its own chain key) -----
    # one vmapped call: per-row keys keep the sequential loop's exact draws
    # while the top-k/top-p sort runs ONCE batched [k, V] instead of k times
    li_all = logits_all[0] + suppress[None, :]  # [k, V]
    li_all = li_all.at[:, CODEC_EOS].add(jnp.where(sp.forbid_eos, -1e30, 0.0))
    cand0 = jax.vmap(
        lambda kk, lg: sample_token(kk, lg[None], sp)[0]
    )(jnp.stack(keys_code0), li_all)  # [k]

    # --- ONE MTP chain batched over all K candidates (trunk read once) ---
    c0e = codec_embed(emb, cand0)  # [k, H]
    sample_fn = lambda kk, lg: sample_token(kk, lg, sp)
    subcodes, sub_sums = predict_subcodes(
        cfg.code_predictor, params["code_predictor"], emb["pred_embed"],
        hidden[0], c0e, keys_pred[0], sample_fn,
    )  # [k, 15], [k, H]
    cand = jnp.concatenate([cand0[:, None], subcodes], axis=1)  # [k, 16]

    # --- acceptance: longest prefix where cand[i] == draft input i+1 -----
    match = jnp.all(cand[: k - 1] == drafts, axis=1)  # [k-1]
    n_match = jnp.sum(jnp.cumprod(match.astype(jnp.int32)))  # leading run
    m = n_match + 1  # committed candidates: cand[0..m-1]

    # --- EOS / validity (mirrors generate._frame_step latching) ----------
    is_eos = cand0 == CODEC_EOS  # [k]
    idx = jnp.arange(k, dtype=jnp.int32)
    committed = idx < m
    eos_before = jnp.cumsum(is_eos.astype(jnp.int32)) - is_eos.astype(jnp.int32)
    valid = committed & ~state.done & (eos_before == 0) & ~is_eos
    done = state.done | jnp.any(is_eos & committed)
    frames_out = jnp.where(valid[:, None], cand, 0)  # [k, 16]

    # --- roll the state to the bonus frame -------------------------------
    last = m - 1
    new_pending = lax.dynamic_index_in_dim(cand, last, keepdims=True)  # [1,16]
    new_nodrip = lax.dynamic_index_in_dim(
        c0e, last, keepdims=True
    ) + lax.dynamic_index_in_dim(sub_sums, last, keepdims=True)
    # rewind the cache fill past the committed inputs only: slots beyond
    # length' hold mismatched-draft K/V and are masked out until overwritten
    new_len = state.cache.length + m  # committed inputs consumed: pending..cand[m-2]
    cache = cache._replace(length=new_len)
    slot_ids = jnp.arange(cache.max_len, dtype=jnp.int32)
    valid_mask = valid_mask & (slot_ids[None, :] < new_len[:, None])

    new_state = SpecState(
        cache=cache,
        valid_mask=valid_mask,
        pending=new_pending,
        pending_nodrip=new_nodrip,
        pending_hidden=lax.dynamic_index_in_dim(hidden[0], last, keepdims=True),
        rope_pos=state.rope_pos + m,
        step=state.step + m,
        done=done,
        key=keys_after[last],
    )
    return new_state, (frames_out, valid)


def decode_frames_spec(
    cfg: TTSModelConfig,
    params: dict,
    state: SpecState,
    trailing: jax.Array,
    trailing_len: jax.Array,
    tts_pad_embed: jax.Array,
    sp: SamplingParams,
    k: int,
    num_iters: int,
    draft_fn: Callable[[SpecState, int], jax.Array] = repeat_draft,
) -> Tuple[SpecState, jax.Array, jax.Array]:
    """Run `num_iters` verify iterations via lax.scan.

    Returns (state', frames [num_iters * k, 16], valid [num_iters * k]):
    committed frames appear in order with valid=True; uncommitted candidate
    slots and post-EOS frames are zeroed with valid=False — callers compact
    on the valid mask (commit counts are data-dependent).
    """
    suppress = make_codec_suppress_mask(cfg.talker.codec_vocab_size)
    step = functools.partial(
        _spec_iteration, cfg, params, suppress, trailing, trailing_len,
        tts_pad_embed, sp, k, draft_fn,
    )
    state, (frames, valid) = lax.scan(
        lambda s, _: step(s), state, None, length=num_iters
    )
    return state, frames.reshape(num_iters * k, 16), valid.reshape(num_iters * k)


class SpecGenerateFns(NamedTuple):
    prefill: callable  # (params, ids, lens, key, ...) -> (state, bundle, frame0, valid0)
    decode: callable  # (params, state, trailing, trailing_len, pad, sp) -> (state, frames, valid)


def make_spec_generate_fns(
    cfg: TTSModelConfig,
    max_len: int,
    k: int = 4,
    num_iters: int = 8,
    lang_id: Optional[int] = None,
    has_speaker: bool = False,
    has_instruct: bool = False,
    donate: bool = True,
    draft_fn: Callable[[SpecState, int], jax.Array] = repeat_draft,
) -> SpecGenerateFns:
    """Jitted speculative prefill / decode for batch 1.

    A decode dispatch runs `num_iters` iterations and commits between
    `num_iters` and `num_iters * k` frames.
    """
    from ..models.talker import talker_init_cache

    def prefill_impl(params, text_ids, text_len, key, sp, speaker_embed=None,
                     instruct_ids=None, instruct_len=None):
        bundle = build_prompt(
            params["embeddings"], text_ids, text_len, lang_id,
            speaker_embed if has_speaker else None,
            instruct_ids if has_instruct else None,
            instruct_len if has_instruct else None,
        )
        cache = talker_init_cache(cfg.talker, 1, max_len)
        state, frame0, valid0 = init_spec_state(
            cfg, params, bundle, cache, key, sp
        )
        return state, bundle, frame0, valid0

    def decode_impl(params, state, trailing, trailing_len, tts_pad_embed, sp):
        return decode_frames_spec(
            cfg, params, state, trailing, trailing_len, tts_pad_embed, sp,
            k, num_iters, draft_fn,
        )

    return SpecGenerateFns(
        prefill=jax.jit(prefill_impl),
        decode=jax.jit(decode_impl, donate_argnums=(1,) if donate else ()),
    )
