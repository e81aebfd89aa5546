"""W8A8 decision probe: is the resident MTP chain convert-bound, and do
native int8 x int8 -> int32 MXU dots remove that cost?

Hypothesis (round 5, from the ring sweep): the resident chain kernel
(ops/fused_mtp.py) measures ~1.23-1.28 ms/frame against a ~0.13 ms DMA
floor because `_matmul_unit` converts every int8 weight unit to bf16 on
the VPU before the dot — 78 MB x 15 steps ~= 1.17 GB of converts
~= 1.2 ms at ~1 elem/lane/cycle.  If the MXU consumes int8 operands
directly (dynamic per-row activation quantization, int32 accumulation),
the convert disappears and the chain should approach compute/attention
cost.

Arms (identical resident-weight kernels, only the unit matmul differs):
  bf16   w.astype(bf16) then bf16 x bf16 dot  (the shipping path)
  w8a8   quantize lhs/row to int8, int8 x int8 dot, dequant the [1, N] out

Prints per-unit-matmul microseconds and the numeric agreement of the two
arms (relative L-inf of the accumulated output).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U, H, N, P = 16, 1024, 1024, 30  # 16 MB resident, P passes over all units


def make_fn(arm: str, interpret: bool):
    def kernel(w_ref, s_ref, x_ref, o_ref, acc_s):
        acc_s[:] = x_ref[:]

        def body(it, c):
            # STATIC unit indices (like the real kernels' unrolled walks);
            # a dynamic w_ref[u] measured ~50x slower — Mosaic materializes
            # the slice
            for u in range(U):
                xx = acc_s[:]
                if arm == "bf16":
                    w16 = w_ref[u].astype(jnp.bfloat16)
                    y = jax.lax.dot_general(
                        xx.astype(jnp.bfloat16), w16,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * s_ref[u]
                else:
                    amax = jnp.max(jnp.abs(xx), axis=-1, keepdims=True)
                    sa = amax * (1.0 / 127.0)
                    la = jnp.round(xx * (1.0 / sa)).astype(jnp.int8)
                    acc = jax.lax.dot_general(
                        la, w_ref[u],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    y = acc.astype(jnp.float32) * (sa * s_ref[u])
                # keep a serial dependency so the loop can't be elided
                acc_s[:] = y * 1e-3 + xx
            return c

        jax.lax.fori_loop(0, P, body, 0)
        o_ref[:] = acc_s[:]

    def vm(shape):
        return pl.BlockSpec(
            shape, lambda *_: (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    call = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[vm((U, H, N)), vm((U, 1, N)), vm((1, H))],
        out_specs=vm((1, H)),
        out_shape=jax.ShapeDtypeStruct((1, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, H), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )
    return jax.jit(call)


def main():
    interpret = jax.default_backend() not in ("tpu", "axon")
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(-127, 128, (U, H, N)), jnp.int8)
    s = jnp.asarray(rng.uniform(0.005, 0.02, (U, 1, N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, H)), jnp.float32)

    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(np.zeros(8, np.float32)))
    print(f"connect: {time.perf_counter() - t0:.1f}s", flush=True)

    outs = {}
    for arm in ("bf16", "w8a8"):
        fn = make_fn(arm, interpret)
        try:
            out = jax.block_until_ready(fn(w, s, x))
        except Exception as e:
            print(f"{arm}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        outs[arm] = np.asarray(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(w, s, x))
            best = min(best, time.perf_counter() - t0)
        per_unit_us = best / (P * U) * 1e6
        print(f"{arm}: {per_unit_us:.3f} us/unit-matmul "
              f"({best * 1e3:.2f} ms total)", flush=True)

    if len(outs) == 2:
        a, b = outs["bf16"], outs["w8a8"]
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        print(f"relative L-inf (accumulated outputs): {rel:.4f}", flush=True)


if __name__ == "__main__":
    main()
