"""Pallas int8-weight matmul kernel for the memory-bound decode path.

y[M, N] = (x[M, K] @ dequant(W_int8[K, N])) * scale[N], f32 accumulation.

The weight streams HBM -> VMEM as int8 (half the bytes of bf16), converts to
bf16 on-chip and feeds the MXU.  Grid over N blocks; the full K extent of
each weight block sits in VMEM (K <= ~8k, N_block 256 -> <= 2 MB/program).
XLA's own convert-into-dot lowering falls back to kLoop scalar fusions for
the [1..8, K] x [K, N] shapes this model decodes with (observed ~100x off
MXU speed on v5e), which is why this kernel exists.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def _kernel(x_ref, q_ref, s_ref, o_ref):
    # x_ref: [M, K] bf16; q_ref: [K, Nb] s8; s_ref: [1, Nb] f32; o_ref: [M, Nb] f32
    w = q_ref[:].astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        x_ref[:], w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[:] = acc * s_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def dense_int8_pallas(
    x: jax.Array,  # [..., K] (cast to bf16)
    q: jax.Array,  # [K, N] int8
    scale: jax.Array,  # [1, N] float32
    interpret: bool = False,
) -> jax.Array:
    *lead, K = x.shape
    N = q.shape[1]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K).astype(jnp.bfloat16)

    block_n = 256 if N % 256 == 0 else 128
    grid = (N // block_n,)

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((K, block_n), lambda i: (0, i), memory_space=_VMEM),
            pl.BlockSpec((1, block_n), lambda i: (0, i), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((M, block_n), lambda i: (0, i), memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        interpret=interpret,
    )(x2, q, scale.reshape(1, N).astype(jnp.float32))
    return out.reshape(*lead, N)
