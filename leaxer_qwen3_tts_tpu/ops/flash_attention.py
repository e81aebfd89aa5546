"""Pallas flash attention for TPU (GQA-aware, mask-driven).

Online-softmax tiling: the S x T score matrix never touches HBM; K/V stream
through VMEM block by block.  Used for prefill / training sequences; the decode
step (S == 1) goes through the XLA path where the score row is tiny.

Grid: (batch, q_head, S_blocks).  K/V blocks for q-head h are taken from kv-head
h // group_size via the BlockSpec index map — GQA without materializing repeats.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too; kernels run via interpret there
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, block_t: int, sm_scale: float):
    # q_ref: [1,1,bs,D]; k_ref/v_ref: [1,1,T,D]; mask_ref: [1,bs,T] int8; o_ref: [1,1,bs,D]
    bs, d = q_ref.shape[2], q_ref.shape[3]
    T = k_ref.shape[2]
    nblocks = T // block_t

    q = q_ref[0, 0].astype(jnp.float32) * sm_scale

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, 0, pl.ds(i * block_t, block_t), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(i * block_t, block_t), :].astype(jnp.float32)
        mask_blk = mask_ref[0, :, pl.ds(i * block_t, block_t)]  # [bs, bt] int8

        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bs, bt]
        s = jnp.where(mask_blk != 0, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)  # [bs, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # [bs, bt]
        alpha = jnp.exp(m_prev - m_new)  # [bs, 1]
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((bs, d), jnp.float32)
    m0 = jnp.full((bs, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bs, 1), jnp.float32)
    acc, _, l_fin = jax.lax.fori_loop(0, nblocks, body, (acc0, m0, l0))

    # Fully-masked rows have l == 0; emit zeros (matches masked XLA path closely
    # enough: such rows are never read downstream).
    out = acc / jnp.maximum(l_fin, 1e-30)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _pad_to(x: jax.Array, axis: int, multiple: int, value=0):
    size = x.shape[axis]
    rem = (-size) % multiple
    if rem == 0:
        return x, size
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads, constant_values=value), size


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attend(
    q: jax.Array,  # [B, S, Nq, D]
    k: jax.Array,  # [B, Nk, T, D] head-major (KV-cache layout)
    v: jax.Array,  # [B, Nk, T, D]
    mask: jax.Array,  # [B, S, T] bool
    interpret: bool = False,
) -> jax.Array:
    B, S, nq, d = q.shape
    nk, T = k.shape[1], k.shape[2]
    g = nq // nk

    block_s = min(128, max(8, S))
    block_t = min(128, max(8, T))

    qh = jnp.swapaxes(q, 1, 2)  # [B, Nq, S, D]
    kh = k  # already head-major
    vh = v
    mask8 = mask.astype(jnp.int8)

    qh, s_orig = _pad_to(qh, 2, block_s)
    kh, t_orig = _pad_to(kh, 2, block_t)
    vh, _ = _pad_to(vh, 2, block_t)
    mask8, _ = _pad_to(mask8, 1, block_s)
    mask8, _ = _pad_to(mask8, 2, block_t)  # padded keys masked out

    Sp, Tp = qh.shape[2], kh.shape[2]
    grid = (B, nq, Sp // block_s)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_t=block_t, sm_scale=1.0 / (d**0.5)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_s, d), lambda b, h, i: (b, h, i, 0), memory_space=_VMEM),
            pl.BlockSpec((1, 1, Tp, d), lambda b, h, i: (b, h // g, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, 1, Tp, d), lambda b, h, i: (b, h // g, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, block_s, Tp), lambda b, h, i: (b, i, 0), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_s, d), lambda b, h, i: (b, h, i, 0), memory_space=_VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, nq, Sp, d), q.dtype),
        interpret=interpret,
    )(qh, kh, vh, mask8)

    out = out[:, :, :s_orig, :]
    return jnp.swapaxes(out, 1, 2)  # [B, S, Nq, D]
