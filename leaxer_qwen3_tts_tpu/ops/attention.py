"""Attention dispatch: XLA path (always available) and Pallas flash kernel.

K/V are HEAD-MAJOR ([B, Nk, T, D]) to match the KV-cache layout
(models/layers.py KVCache): the decode-step scores/output contractions are
then clean batched GEMMs over (B, Nk) with NO physical transposes of the
cache — the time-major layout cost ~50 us/layer of relayout copies on v5e.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-but-finite: keeps fully-masked rows NaN-free after softmax


def attend_xla(
    q: jax.Array,  # [B, S, Nq, D]
    k: jax.Array,  # [B, Nk, T, D] head-major
    v: jax.Array,  # [B, Nk, T, D]
    mask: jax.Array,  # [B, S, T] bool (True = attend)
) -> jax.Array:
    """Grouped-query attention; returns [B, S, Nq, D] in q.dtype."""
    B, S, nq, d = q.shape
    nk, T = k.shape[1], k.shape[2]
    g = nq // nk

    # group q by kv head: [B, S, Nq, D] -> [B, Nk, g*S, D]
    qh = q.reshape(B, S, nk, g, d)
    qh = jnp.transpose(qh, (0, 2, 3, 1, 4)).reshape(B, nk, g * S, d)

    scores = jax.lax.dot_general(
        qh, k, (((3,), (3,)), ((0, 1), (0, 1))), preferred_element_type=jnp.float32
    )  # [B, Nk, g*S, T]
    scores = scores * (1.0 / jnp.sqrt(d).astype(jnp.float32))
    m = jnp.broadcast_to(mask[:, None, None, :, :], (B, nk, g, S, T)).reshape(
        B, nk, g * S, T
    )
    scores = jnp.where(m, scores, NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)

    out = jax.lax.dot_general(
        weights.astype(v.dtype), v, (((3,), (2,)), ((0, 1), (0, 1)))
    )  # [B, Nk, g*S, D]
    out = out.reshape(B, nk, g, S, d)
    return jnp.transpose(out, (0, 3, 1, 2, 4)).reshape(B, S, nq, d)


def attend(q, k, v, mask, impl: str = "xla") -> jax.Array:
    if impl == "xla":
        return attend_xla(q, k, v, mask)
    if impl == "pallas":
        from .flash_attention import flash_attend

        interpret = jax.default_backend() != "tpu"
        return flash_attend(q, k, v, mask, interpret=interpret)
    raise ValueError(f"unknown attention impl {impl!r}")
