"""Attention dispatch: XLA einsum path (always available) and Pallas kernels (TPU).

The XLA path is fully fused by the TPU compiler for the shapes this model uses
(head_dim 128 = one MXU lane tile; softmax in f32).  The Pallas flash kernel in
``flash_attention.py`` is used for long-sequence prefill / training where the
S x T score matrix would otherwise be materialized in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-but-finite: keeps fully-masked rows NaN-free after softmax


def attend_xla(
    q: jax.Array,  # [B, S, Nq, D]
    k: jax.Array,  # [B, T, Nk, D]
    v: jax.Array,  # [B, T, Nk, D]
    mask: jax.Array,  # [B, S, T] bool (True = attend)
) -> jax.Array:
    """Grouped-query attention; returns [B, S, Nq, D] in q.dtype."""
    B, S, nq, d = q.shape
    T, nk = k.shape[1], k.shape[2]
    g = nq // nk
    qg = q.reshape(B, S, nk, g, d)

    scores = jnp.einsum("bsngd,btnd->bnsgt", qg, k, preferred_element_type=jnp.float32)
    scores = scores * (1.0 / jnp.sqrt(d).astype(jnp.float32))
    scores = jnp.where(mask[:, None, :, None, :], scores, NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bnsgt,btnd->bsngd", weights.astype(v.dtype), v)
    return out.reshape(B, S, nq, d)


def attend(q, k, v, mask, impl: str = "xla") -> jax.Array:
    if impl == "xla":
        return attend_xla(q, k, v, mask)
    if impl == "pallas":
        from .flash_attention import flash_attend

        interpret = jax.default_backend() != "tpu"
        return flash_attend(q, k, v, mask, interpret=interpret)
    raise ValueError(f"unknown attention impl {impl!r}")
