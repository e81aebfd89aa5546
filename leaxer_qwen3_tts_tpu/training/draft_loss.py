"""Training loss + step for the speculative-decoding draft head.

The draft (models/draft.py) learns next-frame code prediction from exactly
the quantities the spec decoder will feed it at inference: the talker hidden
that produced frame f and frame f's embed sum.  Both are harvested from the
same teacher-forced talker pass the main TTS loss uses
(training/loss.teacher_forward); the MAIN model's parameters are frozen —
gradients flow only into the draft head.

Two transitions train together (teacher forced):
  step-1: x = in(hidden_f, embed_f)        -> codes_{f+1}
  step-2: x' = rec(x, embed_{f+1})         -> codes_{f+2}
so both the entry and the unrolled-continuation paths of draft_predict see
ground-truth inputs during training.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import DraftConfig, TTSModelConfig
from ..models.draft import draft_forward_teacher
from .loss import _cross_entropy, teacher_forward


class DraftLossMetrics(NamedTuple):
    loss: jax.Array
    step1_loss: jax.Array
    step2_loss: jax.Array
    step1_code0_acc: jax.Array  # greedy top-1 accuracy (acceptance proxy)
    frames: jax.Array


def draft_loss(
    cfg: TTSModelConfig,
    dcfg: DraftConfig,
    params: dict,  # main model params (FROZEN)
    draft_params: dict,
    text_ids: jax.Array,
    text_len: jax.Array,
    codes: jax.Array,  # [B, F, 16]
    num_frames: jax.Array,
    lang_id: Optional[int] = None,
) -> DraftLossMetrics:
    B, F, _ = codes.shape
    tf = teacher_forward(
        cfg, params, text_ids, text_len, codes, num_frames, lang_id
    )
    # the spec decoder conditions on (hidden, nodrip-embed); stop gradients
    # into the frozen main model for cheap backward
    hiddens = jax.lax.stop_gradient(tf.pred_hidden)
    embeds = jax.lax.stop_gradient(tf.c0e + tf.sub_sum)

    (l0_s1, ls_s1), (l0_s2, ls_s2) = draft_forward_teacher(
        dcfg, draft_params, params["embeddings"], hiddens, embeds
    )

    def masked_ce(l0, ls, offset):
        # logits at index f predict frame f + offset
        Fv = F - offset
        t0 = codes[:, offset:, 0]  # [B, Fv]
        tsub = codes[:, offset:, 1:]  # [B, Fv, 15]
        mask = (tf.frame_valid[:, : F - offset] & tf.frame_valid[:, offset:]).astype(
            jnp.float32
        )  # source AND target frames real
        ce0 = _cross_entropy(l0[:, :Fv], t0) * mask
        ces = _cross_entropy(ls[:, :Fv], tsub) * mask[..., None]
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        loss = (jnp.sum(ce0) + jnp.sum(ces) / 15.0) / denom / 2.0
        acc = jnp.sum(
            (jnp.argmax(l0[:, :Fv], -1) == t0).astype(jnp.float32) * mask
        ) / denom
        return loss, acc

    s1, acc1 = masked_ce(l0_s1, ls_s1, 1)
    s2, _ = masked_ce(l0_s2[:, :], ls_s2[:, :], 2)
    loss = s1 + s2
    return DraftLossMetrics(
        loss=loss, step1_loss=s1, step2_loss=s2, step1_code0_acc=acc1,
        frames=jnp.sum(tf.frame_valid),
    )


def make_draft_train_step(
    cfg: TTSModelConfig,
    dcfg: DraftConfig,
    tx: optax.GradientTransformation,
    lang_id: Optional[int] = None,
):
    """Jitted draft-only train step: (draft_params, opt_state, batch) ->
    (draft_params, opt_state, DraftLossMetrics).  Main params are captured
    as a frozen argument (donated nothing)."""

    @jax.jit
    def step(draft_params, opt_state, params, batch):
        def loss_fn(dp):
            m = draft_loss(
                cfg, dcfg, params, dp, batch["text_ids"], batch["text_len"],
                batch["codes"], batch["num_frames"], lang_id,
            )
            return m.loss, m

        grads, metrics = jax.grad(loss_fn, has_aux=True)(draft_params)
        updates, opt_state = tx.update(grads, opt_state, draft_params)
        draft_params = optax.apply_updates(draft_params, updates)
        return draft_params, opt_state, metrics

    return step
