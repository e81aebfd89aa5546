"""Prompt-embedding assembly with the Qwen3-TTS "text-drip" schedule.

Faithful re-derivation of the reference's build_prompt_embeddings
(tts_onnx.cpp:442-539), vectorized over a batch:

  prompt = role(3) ⊕ [pad-block + TTS_BOS  added elementwise to  codec-prefill
  embeds](pad_count+1) ⊕ [first-text-token + CODEC_BOS embed](1)

and the *remaining* text does NOT sit in the prompt — it drips in additively,
one token per decode step, via the trailing-text buffer (+ TTS_EOS terminator),
falling back to the TTS_PAD embedding once exhausted (tts_onnx.cpp:529-537,
:833-842).

The codec prefill encodes language control (tts_onnx.cpp:466-477):
  auto        -> [NOTHINK, THINK_BOS, THINK_EOS, CODEC_PAD, CODEC_BOS]
  explicit L  -> [THINK, THINK_BOS, L, THINK_EOS, CODEC_PAD, CODEC_BOS]
A voice-clone speaker embedding is spliced immediately before CODEC_BOS
(tts_onnx.cpp:481-490) and widens the pad block by one (:498).

Everything here is jit-traceable; ``lang_id`` changes the prompt length so it is
a static (compile-time) argument.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import (
    ASSISTANT,
    CODEC_BOS,
    CODEC_NOTHINK,
    CODEC_PAD,
    CODEC_THINK,
    CODEC_THINK_BOS,
    CODEC_THINK_EOS,
    IM_END,
    IM_START,
    TTS_BOS,
    TTS_EOS,
    TTS_PAD,
)
from ..models.embeddings import codec_embed, text_project


class PromptBundle(NamedTuple):
    """Everything the decode loop needs for one request batch."""

    prompt_embeds: jax.Array  # [B, P, H]
    prompt_len: jax.Array  # [B] int32 (P for every element; P is static)
    trailing: jax.Array  # [B, T, H] — text-drip buffer (token i+1 at row i, EOS at len-1)
    trailing_len: jax.Array  # [B] int32 — rows of `trailing` that are real
    tts_pad_embed: jax.Array  # [H] — drip fallback after the text runs out


def codec_prefill_ids(lang_id: Optional[int]) -> list:
    if lang_id is None:
        ids = [CODEC_NOTHINK, CODEC_THINK_BOS, CODEC_THINK_EOS]
    else:
        ids = [CODEC_THINK, CODEC_THINK_BOS, int(lang_id), CODEC_THINK_EOS]
    return ids + [CODEC_PAD, CODEC_BOS]


def prompt_length(
    lang_id: Optional[int], has_speaker: bool, instruct_bucket: int = 0
) -> int:
    """Static prompt length: 3 role + instruct segment + (pad_count + 1)
    talker + 1 first-text."""
    n = len(codec_prefill_ids(lang_id))
    pad_count = n - 2 + (1 if has_speaker else 0)
    return 3 + instruct_bucket + pad_count + 2


def wrap_text_ids(text_tokens: list) -> list:
    """Full chat wrapping (reference tts_onnx.cpp:243-259):
    [IM_START, ASSISTANT, TTS_BOS, *text, TTS_EOS, IM_END]."""
    return [IM_START, ASSISTANT, TTS_BOS, *text_tokens, TTS_EOS, IM_END]


def build_prompt(
    emb_params: dict,
    text_ids: jax.Array,  # [B, T] int32 — BPE text tokens only, right-padded
    text_len: jax.Array,  # [B] int32 — true token counts (>= 1)
    lang_id: Optional[int],  # static: codec language token or None for auto
    speaker_embed: Optional[jax.Array] = None,  # [B, H] or None (static presence)
    instruct_ids: Optional[jax.Array] = None,  # [B, I] int32 (static presence)
    instruct_len: Optional[jax.Array] = None,  # [B] int32
) -> PromptBundle:
    """instruct_ids: optional voice-instruction segment (VoiceDesign-style;
    the reference lists `--instruct` as planned, README.md:118-126).  The
    instruction embeds sit between the role block and the codec prefill;
    slots past instruct_len carry the TTS_PAD embedding (attended — keeps the
    prompt layout static across a batch)."""
    B, T = text_ids.shape
    has_speaker = speaker_embed is not None

    # TTS special embeddings via text_project (reference :459-463)
    tts = text_project(emb_params, jnp.array([TTS_BOS, TTS_EOS, TTS_PAD], jnp.int32))
    tts_bos, tts_eos, tts_pad = tts[0], tts[1], tts[2]
    H = tts_bos.shape[-1]

    # Codec prefill block (+ optional speaker splice before CODEC_BOS)
    ids = codec_prefill_ids(lang_id)
    ce = codec_embed(emb_params, jnp.array(ids, jnp.int32))  # [n, H]
    ce = jnp.broadcast_to(ce[None], (B, len(ids), H))
    if has_speaker:
        ce = jnp.concatenate(
            [ce[:, :-1], speaker_embed[:, None, :].astype(ce.dtype), ce[:, -1:]], axis=1
        )
    n_codec = ce.shape[1]
    pad_count = n_codec - 2

    # Role embeddings (reference :492-494)
    role = text_project(emb_params, jnp.array([IM_START, ASSISTANT, TTS_BOS], jnp.int32))
    role = jnp.broadcast_to(role[None], (B, 3, H))

    # Optional voice-instruction segment (padded slots -> TTS_PAD embedding)
    if instruct_ids is not None:
        I = instruct_ids.shape[1]
        if instruct_len is None:
            instruct_len = jnp.full((B,), I, jnp.int32)
        ie = text_project(emb_params, instruct_ids)  # [B, I, H]
        pad_slot = jnp.arange(I)[None, :] >= instruct_len[:, None]
        ie = jnp.where(pad_slot[..., None], tts_pad[None, None, :], ie)
        role = jnp.concatenate([role, ie], axis=1)

    # pad-block ⊕ TTS_BOS, elementwise-added to the codec prefill (reference :496-512)
    text_part = jnp.concatenate(
        [jnp.broadcast_to(tts_pad[None], (pad_count, H)), tts_bos[None]], axis=0
    )
    talker_part = text_part[None] + ce[:, : pad_count + 1]

    # first text token + CODEC_BOS embedding (reference :514-520)
    first_text = text_project(emb_params, text_ids[:, 0])  # [B, H]
    first_combined = (first_text + ce[:, pad_count + 1])[:, None, :]

    prompt = jnp.concatenate([role, talker_part, first_combined], axis=1)  # [B, P, H]
    P = prompt.shape[1]

    # trailing text-drip buffer: row i = text token i+1; row (text_len-1) = TTS_EOS
    all_text = text_project(emb_params, text_ids)  # [B, T, H]
    shifted = jnp.concatenate([all_text[:, 1:], jnp.zeros((B, 1, H), all_text.dtype)], axis=1)
    eos_pos = text_len - 1
    is_eos_row = jnp.arange(T)[None, :] == eos_pos[:, None]
    trailing = jnp.where(is_eos_row[..., None], tts_eos[None, None, :], shifted)

    return PromptBundle(
        prompt_embeds=prompt,
        prompt_len=jnp.full((B,), P, jnp.int32),
        trailing=trailing,
        trailing_len=text_len,
        tts_pad_embed=tts_pad,
    )
