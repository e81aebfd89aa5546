"""On-TPU micro-probe: is the resident MTP chain VPU-dequant-bound?

The resident chain kernel (ops/fused_mtp.py) keeps the int8 trunk in VMEM
and converts it to bf16 on the VPU EVERY step (15 x ~78 MB of converts per
frame).  This probe isolates that cost on the trunk's exact compute shape
— a serial chain of [1,1024] x [1024,1024] unit matvecs over a VMEM-
resident weight stack — and A/Bs three transports:

  conv   int8 resident, per-unit astype(bf16) + bf16 dot + column scale
         (the shipping scheme, _matmul_unit in ops/fused_step.py)
  a8     int8 resident, activation quantized to s8 per step-row, s8 x s8
         MXU dot -> s32, output scaled by (sx * column scale) — no weight
         converts at all (W8A8)
  bf16   bf16-resident control at HALF the units walked TWICE per step:
         identical dot count and VMEM bytes, zero converts — bounds the
         achievable win

Run: cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
     timeout 900 python tools/a8_probe.py
CPU correctness: QTTS_A8_INTERPRET=1 python tools/a8_probe.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

INTERPRET = os.environ.get("QTTS_A8_INTERPRET") == "1"
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

from jax.experimental.pallas import tpu as pltpu  # noqa: E402

H = 1024
U = int(os.environ.get("A8_UNITS", "72"))  # 72 x 1 MB = 72 MB resident
S = int(os.environ.get("A8_STEPS", "15"))  # MTP chain length
N_CALLS = int(os.environ.get("A8_CALLS", "64"))


def _norm(x):
    # cheap magnitude reset between units so 15*72-dot chains stay finite;
    # identical cost in every variant
    return x * jax.lax.rsqrt(jnp.mean(x * x) + 1e-6)


def _kernel(variant: str, U: int):
    # every variant walks the SAME total weight bytes per step (72 MB);
    # what differs is dot width/rows/dtype:
    #   conv    U x [H, H] int8, convert + bf16 dot       (shipping scheme)
    #   a8      U x [H, H] int8, s8 x s8 MXU dot          (W8A8)
    #   bf16    U/2 x [H, H] bf16, no converts            (convert cost bound)
    #   w2048   U/2 x [H, 2H] int8, HALF as many dots     (dot-issue overhead)
    #   m8      conv with x broadcast to [8, H]           (M-row latency)
    def kern(w_ref, s_ref, x_ref, o_ref):
        n_u = w_ref.shape[0]
        NW = w_ref.shape[2]

        def step(si, x):
            del si
            for u in range(n_u):
                if variant == "a8":
                    sx = jnp.maximum(jnp.max(jnp.abs(x)) / 127.0, 1e-8)
                    x8 = jnp.clip(
                        jnp.round(x * (1.0 / sx)), -127, 127
                    ).astype(jnp.int8)
                    acc = jax.lax.dot_general(
                        x8, w_ref[u], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    out = acc.astype(jnp.float32) * (sx * s_ref[u])
                else:
                    wu = w_ref[u]
                    if wu.dtype != jnp.bfloat16:
                        wu = wu.astype(jnp.bfloat16)
                    out = jax.lax.dot_general(
                        x.astype(jnp.bfloat16), wu,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * s_ref[u]
                if NW != H:  # fold wide output back to [., H]
                    out = out[:, :H] + out[:, H:]
                x = _norm(out)
            return x

        o_ref[:] = jax.lax.fori_loop(0, S, step, x_ref[:])

    return kern


def build(variant: str):
    rng = np.random.default_rng(0)
    if variant == "bf16":
        import ml_dtypes

        w = (rng.standard_normal((U // 2, H, H)) * 0.02).astype(
            ml_dtypes.bfloat16)
        s = np.ones((U // 2, 1, H), np.float32)
    elif variant == "w2048":
        w = rng.integers(-64, 64, (U // 2, H, 2 * H)).astype(np.int8)
        s = np.full((U // 2, 1, 2 * H), 0.002, np.float32)
    else:
        w = rng.integers(-64, 64, (U, H, H)).astype(np.int8)
        s = np.full((U, 1, H), 0.002, np.float32)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    opts = {"xla_tpu_scoped_vmem_limit_kib": "117760"}
    rows = 8 if variant == "m8" else 1
    call = pl.pallas_call(
        _kernel(variant, U),
        out_shape=jax.ShapeDtypeStruct((rows, H), jnp.float32),
        in_specs=[vmem, vmem, vmem],
        out_specs=vmem,
        interpret=INTERPRET,
    )

    @jax.jit
    def chained(w, s, x0):
        def body(x, _):
            return call(w, s, x), ()

        x, _ = jax.lax.scan(body, x0, None, length=N_CALLS)
        return x

    if not INTERPRET:
        chained = jax.jit(
            chained.__wrapped__, compiler_options=opts
        )
    return chained, jax.device_put([w, s]), variant


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


def main():
    if INTERPRET:
        # correctness: a8 chain must track the conv chain loosely (W8A8
        # quantization error only) and exactly match an XLA twin
        global U, S, N_CALLS
        U, S, N_CALLS = 4, 2, 1
        outs = {}
        for variant in ("conv", "a8"):
            fn, (w, s), _ = build(variant)
            x0 = jnp.ones((1, H), jnp.float32) * 0.1
            outs[variant] = np.asarray(fn(w, s, x0))
            assert np.isfinite(outs[variant]).all(), variant
        err = np.abs(outs["a8"] - outs["conv"]).max()
        cos = float(
            (outs["a8"] * outs["conv"]).sum()
            / (np.linalg.norm(outs["a8"]) * np.linalg.norm(outs["conv"]))
        )
        print(f"interpret: a8-vs-conv Linf {err:.4f} cosine {cos:.6f}")
        assert cos > 0.98, "a8 math diverged"
        print("interpret OK")
        return

    t0 = time.time()
    sync(jax.device_put(np.zeros(8, np.float32)))
    print(f"tunnel connect: {time.time() - t0:.1f}s", flush=True)

    variants = os.environ.get("A8_VARIANTS", "bf16,w2048,m8,conv").split(",")
    for variant in variants:
        try:
            fn, (w, s), _ = build(variant)
            rows = 8 if variant == "m8" else 1
            x0 = jax.device_put(np.full((rows, H), 0.1, np.float32))
            t0 = time.time()
            sync(fn(w, s, x0))
            compile_s = time.time() - t0
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                sync(fn(w, s, x0))
                best = min(best, time.time() - t0)
            n_u = w.shape[0]
            per_step = best / N_CALLS / S * 1e3
            per_unit = per_step / n_u * 1e3
            print(
                f"{variant}: {per_step:.4f} ms per {n_u}-unit step, "
                f"{per_unit:.3f} us/unit "
                f"({best / N_CALLS * 1e3:.3f} ms per {S}-step chain, "
                f"compile {compile_s:.1f}s, best of 3)",
                flush=True,
            )
        except Exception as e:
            print(f"{variant}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
