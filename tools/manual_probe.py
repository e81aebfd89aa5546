"""On-TPU A/B probe: manual double-buffered DMA kernel vs auto Pallas pipeline.

Measures the isolated fused decode step (talker shape and MTP shape, 0.6B)
with QTTS_FUSED_MANUAL=0 vs =1 in ONE process (one tunnel session), chained
dispatch through a jitted lax.scan with a single scalar sync — per the
tunnel measurement rules in docs/ROUND4_PLAN.md.

Run: cd /root/repo && timeout 900 python tools/manual_probe.py
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from leaxer_qwen3_tts_tpu.config import TransformerConfig
from leaxer_qwen3_tts_tpu.ops.fused_step import (
    FusedStepWeights,
    _unit_counts,
    fused_decode_step,
)

N_STEPS = 384


def sync(x) -> None:
    np.asarray(jax.device_get(jax.numpy.ravel(x)[0]))


def make_weights(t: TransformerConfig, rng, bf16: bool = False,
                 w4: bool = False) -> FusedStepWeights:
    import ml_dtypes

    L, H, d = t.num_layers, t.hidden_size, t.head_dim
    n1, n2, n3, n4 = _unit_counts(t)
    U = n1 + n2 + n3 + n4
    if bf16:
        w = (rng.standard_normal((L, U, H, 1024)) * 0.02).astype(
            ml_dtypes.bfloat16)
        sc = np.ones((L, U, 1, 1024), np.float32)
    elif w4:
        # int4 nibble-packed layout: units [L, U, H/2, N], group scales
        w = rng.integers(-8, 8, (L, U, H // 2, 1024), np.int8)
        sc = np.full((L, U, H // 128, 1024), 0.004, np.float32)
    else:
        w = rng.integers(-8, 8, (L, U, H, 1024), np.int8)
        sc = np.full((L, U, 1, 1024), 0.002, np.float32)
    host = [
        w,
        sc,
        np.ones((L, 1, H), np.float32),
        np.ones((L, 1, H), np.float32),
        np.ones((L, 1, d), np.float32),
        np.ones((L, 1, d), np.float32),
    ]
    return FusedStepWeights(*jax.device_put(host))


def bench_shape(name: str, t: TransformerConfig, T: int, kvq: bool,
                bf16: bool = False, w4: bool = False) -> dict:
    rng = np.random.default_rng(0)
    fw = make_weights(t, rng, bf16=bf16, w4=w4)
    L, nk, d = t.num_layers, t.num_kv_heads, t.head_dim
    cdt = jnp.int8 if kvq else jnp.float32
    # caches materialize ON DEVICE (zeros/full): at long-form T the host
    # transfer would cost minutes over the tunnel for all-zero bytes
    kc = jnp.zeros((L, 1, nk, T, d), cdt)
    vc = jnp.zeros((L, 1, nk, T, d), cdt)
    x = jax.device_put(
        rng.standard_normal((1, t.hidden_size)).astype(np.float32) * 0.1
    )
    scales = None
    if kvq:
        scales = (jnp.full((L, 1, nk, T), 1e-3, jnp.float32),
                  jnp.full((L, 1, nk, T), 1e-3, jnp.float32))

    out = {}
    for arm in ("auto", "manual"):
        os.environ["QTTS_FUSED_MANUAL"] = "1" if arm == "manual" else "0"

        @jax.jit
        def run(fw, x, kc, vc, ks=None, vs=None):
            def body(carry, _):
                x, kc, vc, ks, vs, pos = carry
                if kvq:
                    x2, kc2, vc2, ks2, vs2 = fused_decode_step(
                        t, fw, x, pos, kc, vc, ks, vs
                    )
                else:
                    x2, kc2, vc2 = fused_decode_step(t, fw, x, pos, kc, vc)
                    ks2 = vs2 = ks
                x2 = x2 * 0.1  # keep activations bounded over N steps
                pos = jax.lax.rem(pos + 1, T)
                return (x2, kc2, vc2, ks2, vs2, pos), ()

            init = (x, kc, vc, ks, vs, jnp.asarray(0, jnp.int32))
            (xf, *_), _ = jax.lax.scan(body, init, None, length=N_STEPS)
            return xf

        args = (fw, x, kc, vc) + (scales if kvq else ())
        t0 = time.perf_counter()
        sync(run(*args))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t1 = time.perf_counter()
            sync(run(*args))
            best = min(best, time.perf_counter() - t1)
        ms = best / N_STEPS * 1e3
        out[arm] = ms
        print(f"{name} kvq={kvq} bf16={bf16} w4={w4} {arm}: {ms:.3f} ms/step "
              f"(compile {compile_s:.1f}s, best of 3)", flush=True)
    return out


def bench_tp(t: TransformerConfig, T: int) -> dict:
    """Single-chip degenerate-mesh (tp=1) A/B of the TP half-kernels:
    manual double-buffered DMA vs the (U,)-grid clamped-map pipeline.
    At tp=1 both stream the same MODEL bytes, so the delta isolates the
    clamp maps' every-step double fetch + per-grid-step overhead."""
    from leaxer_qwen3_tts_tpu.ops.fused_tp import (
        FusedTPWeights,
        _dims,
        fused_decode_step_tp,
    )
    from leaxer_qwen3_tts_tpu.parallel import make_mesh

    mesh = make_mesh(1, 1)
    H, d, nq_s, nk_s, qd_s, kvd_s, A_s, I_s, NU, KCo, KCd = _dims(t, 1)
    L = t.num_layers
    n_qkv, n_wo = A_s // NU, (qd_s // KCo) * (H // NU)
    n_gu, n_wd = 2 * I_s // NU, (I_s // KCd) * (H // NU)
    rng = np.random.default_rng(0)

    def u8(n, K):
        return rng.integers(-8, 8, (1, L, n, K, NU), np.int8)

    def sc(n):
        return np.full((1, L, n, 1, NU), 0.002, np.float32)

    host = [u8(n_qkv, H), sc(n_qkv), u8(n_wo, KCo), sc(n_wo),
            u8(n_gu, H), sc(n_gu), u8(n_wd, KCd), sc(n_wd),
            np.ones((L, 1, H), np.float32), np.ones((L, 1, H), np.float32),
            np.ones((L, 1, d), np.float32), np.ones((L, 1, d), np.float32)]
    fw = FusedTPWeights(*jax.device_put(host))
    kc, vc, x = jax.device_put([
        np.zeros((L, 1, t.num_kv_heads, T, d), np.float32),
        np.zeros((L, 1, t.num_kv_heads, T, d), np.float32),
        rng.standard_normal((1, H)).astype(np.float32) * 0.1,
    ])

    out = {}
    n_steps = N_STEPS // 2
    for arm in ("auto", "manual"):
        os.environ["QTTS_FUSED_TP_MANUAL"] = "1" if arm == "manual" else "0"

        @jax.jit
        def run(fw, x, kc, vc):
            def body(carry, _):
                x, kc, vc, pos = carry
                x2, kc2, vc2 = fused_decode_step_tp(
                    t, fw, x, pos, kc, vc, mesh
                )
                return (x2 * 0.1, kc2, vc2, jax.lax.rem(pos + 1, T)), ()

            init = (x, kc, vc, jnp.asarray(0, jnp.int32))
            (xf, *_), _ = jax.lax.scan(body, init, None, length=n_steps)
            return xf

        with jax.set_mesh(mesh):
            t0 = time.perf_counter()
            sync(run(fw, x, kc, vc))
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for _ in range(3):
                t1 = time.perf_counter()
                sync(run(fw, x, kc, vc))
                best = min(best, time.perf_counter() - t1)
        ms = best / n_steps * 1e3
        out[arm] = ms
        print(f"tp=1 T={T} {arm}: {ms:.3f} ms/step "
              f"(compile {compile_s:.1f}s, best of 3)", flush=True)
    return out


def bench_resident() -> dict:
    """Isolated A/B of the WHOLE 15-step MTP chain on the real 0.6B shape:
    per-step fused kernels (predict_subcodes_fused, 2-token XLA prefix) vs
    the resident-trunk single-kernel chain (ops/fused_mtp.py, prefix
    in-kernel).  Also checks greedy agreement and sampled determinism on
    hardware."""


    from leaxer_qwen3_tts_tpu.config import CodePredictorConfig
    from leaxer_qwen3_tts_tpu.models.code_predictor import (
        init_code_predictor_params,
        predict_subcodes_fused,
        predict_subcodes_resident,
        prepare_fused_step,
    )
    from leaxer_qwen3_tts_tpu.ops.quant import fuse_params, quantize_params
    from leaxer_qwen3_tts_tpu.runtime.sampling import (
        SamplingParams,
        sample_token,
    )

    cfg = CodePredictorConfig(impl="fused")  # real 0.6B MTP: 6L x H=1024
    H, n, V = 1024, cfg.num_steps, cfg.subcode_vocab_size

    @jax.jit
    def build(key):
        k1, k2 = jax.random.split(key)
        params = init_code_predictor_params(cfg, k1)
        tables = (
            jax.random.normal(k2, (n, V, H), jnp.float32) * 0.02
        ).astype(jnp.bfloat16)
        return params, tables

    raw, tables = build(jax.random.PRNGKey(0))
    qp = jax.jit(lambda p: quantize_params(fuse_params({"m": p}))["m"])(raw)
    # no donation: qp is reused for the int4 pack below (donating here
    # deletes its buffers and the qp4 build dies on "Array has been
    # deleted")
    qp8 = jax.jit(lambda p: prepare_fused_step(cfg, p, bits=8))(dict(qp))
    rng = np.random.default_rng(0)
    hidden, c0e = jax.device_put([
        rng.standard_normal((1, H)).astype(np.float32) * 0.5,
        rng.standard_normal((1, H)).astype(np.float32) * 0.02,
    ])

    n_it = 96
    out = {}

    from leaxer_qwen3_tts_tpu.ops.fused_mtp import resident_compiler_options

    def chain_bench(name, fn, sp):
        sample_fn = lambda k, lg: sample_token(k, lg, sp)
        copts = (resident_compiler_options()
                 if fn is predict_subcodes_resident else None)

        @functools.partial(jax.jit, compiler_options=copts)
        def run(params, tables, hidden, c0e, key):
            def body(carry, _):
                h, key = carry
                key, kf = jax.random.split(key)
                if fn is predict_subcodes_resident:
                    subs, ssum = fn(cfg, params, tables, h, c0e, kf, sp)
                else:
                    subs, ssum = fn(cfg, params, tables, h, c0e, kf,
                                    sample_fn)
                # feed the sum back so iterations stay data-dependent
                h2 = (hidden + 0.01 * ssum.astype(hidden.dtype))
                return (h2, key), subs

            (_, _), subs = jax.lax.scan(
                body, (hidden, jax.random.PRNGKey(3)), None, length=n_it
            )
            return subs

        t0 = time.perf_counter()
        subs = run(qp8, tables, hidden, c0e, jax.random.PRNGKey(3))
        sync(subs)
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t1 = time.perf_counter()
            subs = run(qp8, tables, hidden, c0e, jax.random.PRNGKey(3))
            sync(subs)
            best = min(best, time.perf_counter() - t1)
        ms = best / n_it * 1e3
        out[name] = ms
        print(f"mtp chain {name}: {ms:.3f} ms/chain "
              f"(compile {compile_s:.1f}s, best of 3)", flush=True)
        return np.asarray(subs)

    sp_s = SamplingParams.create(temperature=0.8, top_k=50, top_p=0.95)
    sp_g = SamplingParams.create(temperature=0.0)
    chain_bench("per-step sampled", predict_subcodes_fused, sp_s)
    r1 = chain_bench("resident sampled", predict_subcodes_resident, sp_s)
    r2 = chain_bench("resident sampled", predict_subcodes_resident, sp_s)
    assert np.array_equal(r1, r2), "resident sampling nondeterministic on HW"
    g_f = chain_bench("per-step greedy", predict_subcodes_fused, sp_g)
    g_r = chain_bench("resident greedy", predict_subcodes_resident, sp_g)
    agree = float((g_f == g_r).mean())
    print(f"greedy agreement resident vs per-step: {agree:.4f}", flush=True)

    # --- batched serving arms (weights amortize across B; the resident
    # chain removes the 15x trunk re-read the amortization still pays) ---
    from leaxer_qwen3_tts_tpu.models.code_predictor import (
        predict_subcodes_fused_batched,
        predict_subcodes_resident_batched,
    )

    def chain_bench_b(name, fn, sp, B, params, n_iter=48):
        sample_fn = lambda k, lg: sample_token(k, lg, sp)
        hb = jnp.broadcast_to(hidden, (B, H))
        cb = jnp.broadcast_to(c0e, (B, H))
        keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B))
        copts = (resident_compiler_options()
                 if fn is predict_subcodes_resident_batched else None)

        @functools.partial(jax.jit, compiler_options=copts)
        def run(params, tables, hb, cb, keys):
            def body(carry, _):
                h, keys = carry
                keys = jax.vmap(
                    lambda kk: jax.random.split(kk, 2)[0]
                )(keys)
                if fn is predict_subcodes_resident_batched:
                    subs, ssum = fn(cfg, params, tables, h, cb, keys, sp)
                else:
                    subs, ssum = fn(cfg, params, tables, h, cb, keys[0],
                                    sample_fn)
                h2 = hb + 0.01 * ssum.astype(hb.dtype)
                return (h2, keys), subs

            (_, _), subs = jax.lax.scan(
                body, (hb, keys), None, length=n_iter
            )
            return subs

        t0 = time.perf_counter()
        subs = run(params, tables, hb, cb, keys)
        sync(subs)
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t1 = time.perf_counter()
            subs = run(params, tables, hb, cb, keys)
            sync(subs)
            best = min(best, time.perf_counter() - t1)
        ms = best / n_iter * 1e3
        out[f"{name} B={B}"] = ms
        print(f"mtp chain {name} B={B}: {ms:.3f} ms/chain "
              f"({ms / B:.3f}/stream, compile {compile_s:.1f}s)", flush=True)

    for B in (8, 16):
        chain_bench_b("per-step batched", predict_subcodes_fused_batched,
                      sp_s, B, qp8)
        chain_bench_b("resident batched", predict_subcodes_resident_batched,
                      sp_s, B, qp8)

    # int4 trunk fits the B=32 budget (39 MB resident)
    qp4 = jax.jit(lambda p: prepare_fused_step(cfg, p, bits=4))(dict(qp))
    from leaxer_qwen3_tts_tpu.ops.fused_mtp import supports_resident

    assert supports_resident(qp4["fused_step"], batch=32)
    chain_bench_b("per-step batched int8", predict_subcodes_fused_batched,
                  sp_s, 32, qp8)
    chain_bench_b("resident batched int4",
                  predict_subcodes_resident_batched, sp_s, 32, qp4)
    return out


def bench_stream() -> dict:
    """Isolated A/B of the 1.7B-shape MTP chain: per-step fused kernels
    (predict_subcodes_fused — 15 dispatches + XLA head/sample/gather glue)
    vs the STREAMED single-kernel chain (ops/fused_mtp_stream.py — same
    HBM traffic, glue deleted).  int8 and int4 trunks; greedy agreement
    streamed-vs-per-step asserted on hardware."""
    import dataclasses

    from leaxer_qwen3_tts_tpu.config import (
        CodePredictorConfig,
        TransformerConfig,
    )
    from leaxer_qwen3_tts_tpu.models.code_predictor import (
        init_code_predictor_params,
        predict_subcodes_fused,
        predict_subcodes_streamed,
        prepare_fused_step,
    )
    from leaxer_qwen3_tts_tpu.ops.fused_mtp_stream import supports_stream
    from leaxer_qwen3_tts_tpu.ops.quant import fuse_params, quantize_params
    from leaxer_qwen3_tts_tpu.runtime.sampling import (
        SamplingParams,
        sample_token,
    )

    t17 = TransformerConfig(
        hidden_size=2048, num_layers=6, num_heads=16, num_kv_heads=8,
        head_dim=128, intermediate_size=6144, dtype="bfloat16",
    )
    cfg = CodePredictorConfig(transformer=t17, impl="fused")
    H, n, V = 2048, cfg.num_steps, cfg.subcode_vocab_size

    @jax.jit
    def build(key):
        k1, k2 = jax.random.split(key)
        params = init_code_predictor_params(cfg, k1)
        tables = (
            jax.random.normal(k2, (n, V, H), jnp.float32) * 0.02
        ).astype(jnp.bfloat16)
        return params, tables

    raw, tables = build(jax.random.PRNGKey(0))
    qp = jax.jit(lambda p: quantize_params(fuse_params({"m": p}))["m"])(raw)
    qp8 = jax.jit(lambda p: prepare_fused_step(cfg, p, bits=8))(dict(qp))
    # int4 pack needs RAW trunk weights, engine-style mixed precision
    qp4 = jax.jit(lambda p: prepare_fused_step(cfg, p, bits=4))(
        dict(qp) | {"transformer": raw["transformer"]}
    )
    qp4 = dict(qp4) | {"transformer": qp["transformer"]}
    for name, p in (("int8", qp8), ("int4", qp4)):
        assert supports_stream(p["fused_step"], n, V), name
    rng = np.random.default_rng(0)
    hidden, c0e = jax.device_put([
        rng.standard_normal((1, H)).astype(np.float32) * 0.5,
        rng.standard_normal((1, H)).astype(np.float32) * 0.02,
    ])

    n_it = 48
    out = {}

    def chain_bench(name, fn, sp, params):
        sample_fn = lambda k, lg: sample_token(k, lg, sp)
        # the streamed kernel's VMEM blocks (ring + head double-buffer +
        # KV scratch, ~25 MB at 1.7B int8) exceed XLA's 16 MiB scoped-vmem
        # default — raise the cap ONLY for the streamed arm so the
        # per-step arm's XLA choices stay unperturbed
        from leaxer_qwen3_tts_tpu.ops.fused_mtp_stream import (
            stream_compiler_options,
        )

        copts = (stream_compiler_options()
                 if fn is predict_subcodes_streamed else None)

        @functools.partial(jax.jit, compiler_options=copts)
        def run(params, tables, hidden, c0e, key):
            def body(carry, _):
                h, key = carry
                key, kf = jax.random.split(key)
                if fn is predict_subcodes_streamed:
                    subs, ssum = fn(cfg, params, tables, h, c0e, kf, sp)
                else:
                    subs, ssum = fn(cfg, params, tables, h, c0e, kf,
                                    sample_fn)
                h2 = (hidden + 0.01 * ssum.astype(hidden.dtype))
                return (h2, key), subs

            (_, _), subs = jax.lax.scan(
                body, (hidden, jax.random.PRNGKey(3)), None, length=n_it
            )
            return subs

        t0 = time.perf_counter()
        subs = run(params, tables, hidden, c0e, jax.random.PRNGKey(3))
        sync(subs)
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t1 = time.perf_counter()
            subs = run(params, tables, hidden, c0e, jax.random.PRNGKey(3))
            sync(subs)
            best = min(best, time.perf_counter() - t1)
        ms = best / n_it * 1e3
        out[name] = ms
        print(f"mtp17 chain {name}: {ms:.3f} ms/chain "
              f"(compile {compile_s:.1f}s, best of 3)", flush=True)
        return np.asarray(subs)

    sp_s = SamplingParams.create(temperature=0.8, top_k=50, top_p=0.95)
    sp_g = SamplingParams.create(temperature=0.0)
    chain_bench("per-step int8 sampled", predict_subcodes_fused, sp_s, qp8)
    s1 = chain_bench("streamed int8 sampled", predict_subcodes_streamed,
                     sp_s, qp8)
    s2 = chain_bench("streamed int8 sampled", predict_subcodes_streamed,
                     sp_s, qp8)
    assert np.array_equal(s1, s2), "streamed sampling nondeterministic"
    chain_bench("per-step int4 sampled", predict_subcodes_fused, sp_s, qp4)
    chain_bench("streamed int4 sampled", predict_subcodes_streamed,
                sp_s, qp4)
    g_f = chain_bench("per-step int8 greedy", predict_subcodes_fused,
                      sp_g, qp8)
    g_s = chain_bench("streamed int8 greedy", predict_subcodes_streamed,
                      sp_g, qp8)
    agree = float((g_f == g_s).mean())
    print(f"greedy agreement streamed vs per-step: {agree:.4f}", flush=True)
    out["greedy_agreement"] = agree
    return out


def bench_streamdiag() -> dict:
    """Hardware correctness bisect for the streamed-trunk chain.

    The --stream arm measured greedy agreement 0.31 vs per-step on
    hardware while every interpret-mode test passes — a hardware-only
    divergence.  Gold standard: the RESIDENT chain (hardware-validated,
    greedy agreement 1.0 vs per-step).  Build a trunk at the 1.7B hidden
    size but few enough layers to fit residency (H=2048, L=2 -> 80 MB
    int8), then compare a SINGLE chain call: resident vs streamed at ring
    2/4/8 vs per-step, greedy and sampled.  streamed==resident everywhere
    -> the --stream disagreement was tie-breaks on random weights;
    streamed!=resident (or ring-dependent output) -> ring-protocol race.
    """
    import functools as _ft

    from leaxer_qwen3_tts_tpu.config import (
        CodePredictorConfig,
        TransformerConfig,
    )
    from leaxer_qwen3_tts_tpu.models.code_predictor import (
        init_code_predictor_params,
        predict_subcodes_fused,
        predict_subcodes_resident,
        prepare_fused_step,
    )
    from leaxer_qwen3_tts_tpu.ops.fused_mtp import (
        resident_compiler_options,
        supports_resident,
    )
    from leaxer_qwen3_tts_tpu.ops.fused_mtp_stream import (
        stream_compiler_options,
        supports_stream,
    )
    from leaxer_qwen3_tts_tpu.runtime.sampling import (
        SamplingParams,
        sample_token,
    )

    # H=2048 (the 1.7B hidden) but I=2048, so the L=2 int8 trunk (48 MB)
    # passes the RESIDENT kernel's 110 MB Mosaic cap (I=6144 was 96 MB of
    # units and hit 112.5M > 110M on hardware; I=3072 fails the fused
    # supports() gate, which needs I % H == 0); L=2 keeps the cross-layer
    # ring walk exercised.
    t = TransformerConfig(
        hidden_size=2048, num_layers=2, num_heads=16, num_kv_heads=8,
        head_dim=128, intermediate_size=2048, dtype="bfloat16",
    )
    cfg = CodePredictorConfig(transformer=t, impl="fused")
    H, n, V = 2048, cfg.num_steps, cfg.subcode_vocab_size

    @jax.jit
    def build(key):
        k1, k2 = jax.random.split(key)
        params = init_code_predictor_params(cfg, k1)
        tables = (
            jax.random.normal(k2, (n, V, H), jnp.float32) * 0.02
        ).astype(jnp.bfloat16)
        return params, tables

    raw, tables = build(jax.random.PRNGKey(0))
    from leaxer_qwen3_tts_tpu.ops.quant import fuse_params, quantize_params

    qp = jax.jit(lambda p: quantize_params(fuse_params({"m": p}))["m"])(raw)
    qp8 = jax.jit(lambda p: prepare_fused_step(cfg, p, bits=8))(dict(qp))
    assert supports_resident(qp8["fused_step"], batch=1)
    assert supports_stream(qp8["fused_step"], n, V)

    rng = np.random.default_rng(7)
    hidden, c0e = jax.device_put([
        rng.standard_normal((1, H)).astype(np.float32) * 0.5,
        rng.standard_normal((1, H)).astype(np.float32) * 0.02,
    ])
    key = jax.random.PRNGKey(11)

    results = {}
    for spname, sp in (
        ("greedy", SamplingParams.create(temperature=0.0)),
        ("sampled", SamplingParams.create(
            temperature=0.8, top_k=50, top_p=0.95)),
    ):
        res_fn = jax.jit(
            lambda p, tb, h, c, k, _sp=sp: predict_subcodes_resident(
                cfg, p, tb, h, c, k, _sp
            ),
            compiler_options=resident_compiler_options(),
        )
        subs_r = np.asarray(res_fn(qp8, tables, hidden, c0e, key)[0])
        print(f"[{spname}] resident: {subs_r[0].tolist()}", flush=True)
        results[f"resident_{spname}"] = subs_r

        sample_fn = lambda k, lg, _sp=sp: sample_token(k, lg, _sp)
        ps_fn = jax.jit(
            lambda p, tb, h, c, k: predict_subcodes_fused(
                cfg, p, tb, h, c, k, sample_fn
            )
        )
        subs_p = np.asarray(ps_fn(qp8, tables, hidden, c0e, key)[0])
        agree_rp = int((subs_p == subs_r).sum())
        print(f"[{spname}] per-step: {subs_p[0].tolist()} "
              f"(matches resident {agree_rp}/{n})", flush=True)

        for ring in (2, 4, 8):
            st_fn = jax.jit(
                _ft.partial(
                    _streamdiag_call, cfg=cfg, sp=sp, ring=ring
                ),
                compiler_options=stream_compiler_options(),
            )
            subs_s = np.asarray(st_fn(qp8, tables, hidden, c0e, key)[0])
            ok = np.array_equal(subs_s, subs_r)
            print(f"[{spname}] streamed ring={ring}: {subs_s[0].tolist()} "
                  f"{'== resident' if ok else '!= RESIDENT — DIVERGED'}",
                  flush=True)
            results[f"streamed_{spname}_r{ring}"] = subs_s
    return results


def _streamdiag_call(params, tables, hidden, c0e, key, *, cfg, sp, ring):
    from leaxer_qwen3_tts_tpu.models.code_predictor import (
        predict_subcodes_streamed,
    )

    return predict_subcodes_streamed(
        cfg, params, tables, hidden, c0e, key, sp, ring=ring
    )


def bench_streamdiag17() -> dict:
    """No-feedback greedy A/B at the FULL 1.7B MTP shape (L=6, I=6144).

    --streamdiag proved streamed == resident == per-step bit-for-bit at
    H=2048/L=2/I=2048, so the --stream arm's 0.31 greedy agreement is
    either (a) argmax tie-flips from the per-step path's different head
    matmul rounding, CASCADED by that arm's 48-frame feedback loop, or
    (b) a geometry bug that only appears at the full shape (the resident
    kernel can't run there, so the diag shape couldn't cover it).  Run 32
    INDEPENDENT single-frame greedy chains (fixed random inputs, no
    feedback) through per-step and streamed: ties -> a few chains diverge
    at random steps; geometry bug -> every chain diverges, early and
    patterned."""
    from leaxer_qwen3_tts_tpu.config import (
        CodePredictorConfig,
        TransformerConfig,
    )
    from leaxer_qwen3_tts_tpu.models.code_predictor import (
        init_code_predictor_params,
        predict_subcodes_fused,
        predict_subcodes_streamed,
        prepare_fused_step,
    )
    from leaxer_qwen3_tts_tpu.ops.fused_mtp_stream import (
        stream_compiler_options,
        supports_stream,
    )
    from leaxer_qwen3_tts_tpu.ops.quant import fuse_params, quantize_params
    from leaxer_qwen3_tts_tpu.runtime.sampling import (
        SamplingParams,
        sample_token,
    )

    t17 = TransformerConfig(
        hidden_size=2048, num_layers=6, num_heads=16, num_kv_heads=8,
        head_dim=128, intermediate_size=6144, dtype="bfloat16",
    )
    cfg = CodePredictorConfig(transformer=t17, impl="fused")
    H, n, V = 2048, cfg.num_steps, cfg.subcode_vocab_size

    @jax.jit
    def build(key):
        k1, k2 = jax.random.split(key)
        params = init_code_predictor_params(cfg, k1)
        tables = (
            jax.random.normal(k2, (n, V, H), jnp.float32) * 0.02
        ).astype(jnp.bfloat16)
        return params, tables

    raw, tables = build(jax.random.PRNGKey(0))
    qp = jax.jit(lambda p: quantize_params(fuse_params({"m": p}))["m"])(raw)
    qp8 = jax.jit(lambda p: prepare_fused_step(cfg, p, bits=8))(dict(qp))
    assert supports_stream(qp8["fused_step"], n, V)

    K = 32
    rng = np.random.default_rng(5)
    hiddens = jax.device_put(
        rng.standard_normal((K, 1, H)).astype(np.float32) * 0.5
    )
    c0es = jax.device_put(
        rng.standard_normal((K, 1, H)).astype(np.float32) * 0.02
    )
    sp = SamplingParams.create(temperature=0.0)
    sample_fn = lambda k, lg: sample_token(k, lg, sp)
    key = jax.random.PRNGKey(9)

    @jax.jit
    def run_perstep(params, tables, hiddens, c0es):
        def body(_, hc):
            h, c = hc
            subs, _ = predict_subcodes_fused(
                cfg, params, tables, h, c, key, sample_fn
            )
            return 0, subs

        _, subs = jax.lax.scan(body, 0, (hiddens, c0es))
        return subs

    @functools.partial(jax.jit, compiler_options=stream_compiler_options())
    def run_streamed(params, tables, hiddens, c0es):
        def body(_, hc):
            h, c = hc
            subs, _ = predict_subcodes_streamed(
                cfg, params, tables, h, c, key, sp
            )
            return 0, subs

        _, subs = jax.lax.scan(body, 0, (hiddens, c0es))
        return subs

    s_p = np.asarray(run_perstep(qp8, tables, hiddens, c0es)).reshape(K, n)
    s_s = np.asarray(run_streamed(qp8, tables, hiddens, c0es)).reshape(K, n)
    per_chain = (s_p == s_s).all(axis=1)
    agree = float((s_p == s_s).mean())
    print(f"streamdiag17: {int(per_chain.sum())}/{K} chains identical, "
          f"element agreement {agree:.4f}", flush=True)
    for k in range(K):
        if not per_chain[k]:
            j = int(np.argmax(s_p[k] != s_s[k]))
            print(f"  chain {k}: first divergence at step {j} "
                  f"(per-step {s_p[k, j]} vs streamed {s_s[k, j]})",
                  flush=True)
    return {"chains_identical": int(per_chain.sum()),
            "element_agreement": agree}


def bench_engine17() -> dict:
    """Localize the unexplained in-engine int8-KV penalty at 1.7B.

    The isolated talker step WINS with kvq (1.958 vs 2.456 ms at T=512,
    ring sweep) yet the like-for-like in-engine decode-only A/B LOSES
    (9.00 vs 8.75 ms/frame, BENCH_EVIDENCE_r5.md).  This arm rebuilds the
    engine's frame composition in controlled stages, f32-KV vs int8-KV
    each, so the ~0.75 ms discrepancy pins to a stage:

      glue   — talker step + final-norm + lm_head + suppress + sample +
               codec-embed gather + drip add (everything per-frame EXCEPT
               the MTP chain)
      frame  — glue + the 15-dispatch per-step MTP chain (the 1.7B path)

    If kvq still wins at `glue`, the penalty lives in the MTP interaction
    (scan carry/aliasing with the scale arrays); if kvq already loses at
    `glue`, it's the head/sample glue interplay with the quantized cache.
    """
    import dataclasses

    from leaxer_qwen3_tts_tpu.config import (
        CodePredictorConfig,
        TransformerConfig,
    )
    from leaxer_qwen3_tts_tpu.models.code_predictor import (
        init_code_predictor_params,
        predict_subcodes_fused,
        prepare_fused_step,
    )
    from leaxer_qwen3_tts_tpu.ops.quant import fuse_params, quantize_params
    from leaxer_qwen3_tts_tpu.runtime.sampling import (
        SamplingParams,
        sample_token,
    )

    talker17 = TransformerConfig(
        hidden_size=2048, num_layers=28, num_heads=16, num_kv_heads=8,
        head_dim=128, intermediate_size=6144, dtype="bfloat16",
    )
    t17 = TransformerConfig(
        hidden_size=2048, num_layers=6, num_heads=16, num_kv_heads=8,
        head_dim=128, intermediate_size=6144, dtype="bfloat16",
    )
    cfg = CodePredictorConfig(transformer=t17, impl="fused")
    H, n, V = 2048, cfg.num_steps, cfg.subcode_vocab_size
    Vc = 3072  # codec vocab (code0 head)
    T = 512
    L, nk, d = talker17.num_layers, talker17.num_kv_heads, talker17.head_dim

    rng = np.random.default_rng(0)
    fw = make_weights(talker17, rng)

    @jax.jit
    def build(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        params = init_code_predictor_params(cfg, k1)
        tables = (
            jax.random.normal(k2, (n, V, H), jnp.float32) * 0.02
        ).astype(jnp.bfloat16)
        lm_head = (
            jax.random.normal(k3, (H, Vc), jnp.float32) * 0.02
        ).astype(jnp.bfloat16)
        codec_embed = (
            jax.random.normal(k4, (Vc, H), jnp.float32) * 0.02
        ).astype(jnp.bfloat16)
        return params, tables, lm_head, codec_embed

    raw, tables, lm_head, codec_embed = build(jax.random.PRNGKey(0))
    qp = jax.jit(lambda p: quantize_params(fuse_params({"m": p}))["m"])(raw)
    qp8 = jax.jit(lambda p: prepare_fused_step(cfg, p, bits=8))(dict(qp))
    # suppression mask: codec specials 2048..3071 except EOS at -inf
    sup = np.zeros((1, Vc), np.float32)
    sup[:, 2048:] = -np.inf
    sup[:, 2150] = 0.0
    suppress = jax.device_put(sup)
    drip = jax.device_put(
        rng.standard_normal((1, H)).astype(np.float32) * 0.02
    )
    x0 = jax.device_put(
        rng.standard_normal((1, H)).astype(np.float32) * 0.1
    )
    sp = SamplingParams.create(temperature=0.8, top_k=50, top_p=0.95)
    sample_fn = lambda k, lg: sample_token(k, lg, sp)

    N = 96
    out = {}
    os.environ["QTTS_FUSED_MANUAL"] = "1"

    def arm(name, kvq, with_mtp):
        cdt = jnp.int8 if kvq else jnp.float32
        kc = jnp.zeros((L, 1, nk, T, d), cdt)
        vc = jnp.zeros((L, 1, nk, T, d), cdt)
        scales = (
            (jnp.full((L, 1, nk, T), 1e-3, jnp.float32),
             jnp.full((L, 1, nk, T), 1e-3, jnp.float32))
            if kvq else None
        )

        @jax.jit
        def run(fw, qp8, tables, lm_head, codec_embed, x, kc, vc, ks, vs,
                key):
            def body(carry, _):
                x, kc, vc, ks, vs, pos, key = carry
                if kvq:
                    x2, kc2, vc2, ks2, vs2 = fused_decode_step(
                        talker17, fw, x, pos, kc, vc, ks, vs
                    )
                else:
                    x2, kc2, vc2 = fused_decode_step(
                        talker17, fw, x, pos, kc, vc
                    )
                    ks2, vs2 = ks, vs
                # final norm (ones weight) + lm_head + suppress + sample
                h = x2 * jax.lax.rsqrt(
                    jnp.mean(x2 * x2, axis=-1, keepdims=True) + 1e-6
                )
                logits = jnp.dot(
                    h.astype(jnp.bfloat16), lm_head,
                    preferred_element_type=jnp.float32,
                ) + suppress
                key, k0, kp = jax.random.split(key, 3)
                code0 = sample_token(k0, logits, sp)
                oh = (
                    code0[:, None] == jnp.arange(Vc, dtype=jnp.int32)[None]
                ).astype(jnp.bfloat16)
                c0e = jnp.dot(
                    oh, codec_embed, preferred_element_type=jnp.float32
                )
                if with_mtp:
                    _, ssum = predict_subcodes_fused(
                        cfg, qp8, tables, h, c0e, kp, sample_fn
                    )
                    nxt = c0e + ssum.astype(c0e.dtype) + drip
                else:
                    nxt = c0e + drip
                pos = jax.lax.rem(pos + 1, T)
                return (nxt.astype(x.dtype) * 0.1, kc2, vc2, ks2, vs2,
                        pos, key), ()

            init = (x, kc, vc, ks, vs, jnp.asarray(0, jnp.int32), key)
            (xf, *_), _ = jax.lax.scan(body, init, None, length=N)
            return xf

        ks, vs = scales if kvq else (None, None)
        args = (fw, qp8, tables, lm_head, codec_embed, x0, kc, vc, ks, vs,
                jax.random.PRNGKey(3))
        t0 = time.perf_counter()
        sync(run(*args))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t1 = time.perf_counter()
            sync(run(*args))
            best = min(best, time.perf_counter() - t1)
        ms = best / N * 1e3
        out[name] = ms
        print(f"engine17 {name}: {ms:.3f} ms/frame "
              f"(compile {compile_s:.1f}s, best of 3)", flush=True)

    arm("glue f32-KV", kvq=False, with_mtp=False)
    arm("glue int8-KV", kvq=True, with_mtp=False)
    arm("frame f32-KV", kvq=False, with_mtp=True)
    arm("frame int8-KV", kvq=True, with_mtp=True)
    return out


def bench_frame() -> dict:
    """Whole-frame kernel A/B on the real 0.6B shapes: ONE pallas_call per
    frame (ops/fused_frame.py — code0 sample + resident MTP chain + talker
    step + lm_head) vs the composed multi-dispatch path (sample_token +
    resident chain + manual talker kernel + XLA lm_head).  Chained scan,
    single sync; determinism + greedy-agreement checks included."""
    from leaxer_qwen3_tts_tpu.config import (
        CodePredictorConfig,
        TransformerConfig,
    )
    from leaxer_qwen3_tts_tpu.models.code_predictor import (
        predict_subcodes_resident,
    )
    from leaxer_qwen3_tts_tpu.models.layers import rms_norm
    from leaxer_qwen3_tts_tpu.ops.fused_frame import fused_frame_step
    from leaxer_qwen3_tts_tpu.ops.quant import QuantizedLinear, dense
    from leaxer_qwen3_tts_tpu.runtime.sampling import (
        SamplingParams,
        make_codec_suppress_mask,
        sample_token,
        split_keys,
    )

    from leaxer_qwen3_tts_tpu.ops.fused_mtp import resident_compiler_options

    copts = resident_compiler_options()  # both arms embed resident kernels
    talker = TransformerConfig(dtype="bfloat16")  # 0.6B: 28L, H=1024
    mcfg = CodePredictorConfig(impl="fused")  # 6L, H=1024, V=2048
    mtp_t = mcfg.transformer
    T, Vc = 512, 3072
    H, n, V = 1024, mcfg.num_steps, mcfg.subcode_vocab_size
    rng = np.random.default_rng(0)
    tfw = make_weights(talker, rng)
    mfw = make_weights(mtp_t, rng)
    lm = QuantizedLinear(*jax.device_put([
        rng.integers(-64, 64, (H, Vc), np.int8),
        np.full((1, Vc), 0.002, np.float32),
    ]))
    heads = QuantizedLinear(*jax.device_put([
        rng.integers(-64, 64, (n, H, V), np.int8),
        np.full((n, 1, V), 0.002, np.float32),
    ]))
    import ml_dtypes

    codec, tables, fnorm_t, fnorm_m, lh0, ll0, drip = jax.device_put([
        (rng.standard_normal((Vc, H)) * 0.02).astype(ml_dtypes.bfloat16),
        (rng.standard_normal((n, V, H)) * 0.02).astype(ml_dtypes.bfloat16),
        np.ones(H, np.float32),
        np.ones(H, np.float32),
        (rng.standard_normal((1, H)) * 0.5).astype(np.float32),
        (rng.standard_normal((1, Vc)) * 2.0).astype(np.float32),
        np.zeros((1, H), np.float32),
    ])
    suppress = make_codec_suppress_mask(Vc)
    mtp_params = {
        "fused_step": mfw,
        "transformer": {"final_norm": fnorm_m},
        "heads": heads,
    }
    W = (tfw, mfw, lm, heads, codec, tables, fnorm_t, fnorm_m, suppress,
         drip)

    out = {}
    n_frames = 192

    def run_arms(kvq: bool):
        cdt = np.int8 if kvq else np.float32
        kc, vc = jax.device_put([
            np.zeros((talker.num_layers, 1, talker.num_kv_heads, T, 128),
                     cdt),
            np.zeros((talker.num_layers, 1, talker.num_kv_heads, T, 128),
                     cdt),
        ])
        scales = None
        if kvq:
            scales = tuple(jax.device_put([
                np.full((talker.num_layers, 1, talker.num_kv_heads, T),
                        1e-3, np.float32),
                np.full((talker.num_layers, 1, talker.num_kv_heads, T),
                        1e-3, np.float32),
            ]))
        sp = SamplingParams.create(temperature=0.8, top_k=50, top_p=0.95)

        # weights ride as ARGUMENTS, not closures: the axon remote compile
        # serializes closure constants into the request body — closing over
        # the ~160 MB of packed weights 413s the relay and bloats compile
        # times (args-passed: 17 s; closure chain kernels: 45-270 s)
        @functools.partial(jax.jit, compiler_options=copts)
        def run_frame(W, ll, lh, kc, vc, ks, vs, key):
            (tfw, mfw, lm, heads, codec, tables, fnorm_t, fnorm_m,
             suppress, drip) = W

            def body(carry, _):
                ll, lh, kc, vc, ks, vs, pos, key = carry
                key, k0, kp = split_keys(key, 3)
                g0 = jax.random.gumbel(k0, (1, Vc), jnp.float32)
                gm = jax.vmap(
                    lambda kk: jax.random.gumbel(kk, (1, V), jnp.float32)
                )(jax.random.split(kp, n))
                outs = fused_frame_step(
                    talker, mtp_t, tfw, fnorm_t, lm, codec, mfw, fnorm_m,
                    heads, tables, ll, lh, suppress, drip, pos, kc, vc,
                    g0, gm, sp.temperature, sp.top_k, sp.top_p,
                    jnp.bool_(True),
                    k_scale=ks, v_scale=vs,
                    mtp_cache_dtype=jnp.bfloat16,
                )
                code0, subs, ll2, lh2 = outs[:4]
                if kvq:
                    kc2, vc2, ks2, vs2 = outs[4:]
                else:
                    kc2, vc2 = outs[4:]
                    ks2 = vs2 = ks
                frame = jnp.concatenate([code0[:, None], subs], axis=1)
                pos = jax.lax.rem(pos + 1, T)
                return (ll2, lh2.astype(lh.dtype), kc2, vc2, ks2, vs2,
                        pos, key), frame

            init = (ll, lh, kc, vc,
                    scales[0] if kvq else None,
                    scales[1] if kvq else None,
                    jnp.asarray(0, jnp.int32), key)
            _, frames = jax.lax.scan(body, init, None, length=n_frames)
            return frames

        @functools.partial(jax.jit, compiler_options=copts)
        def run_composed(W, ll, lh, kc, vc, ks, vs, key):
            (tfw, mfw, lm, heads, codec, tables, fnorm_t, fnorm_m,
             suppress, drip) = W
            mtp_params = {
                "fused_step": mfw,
                "transformer": {"final_norm": fnorm_m},
                "heads": heads,
            }

            def body(carry, _):
                ll, lh, kc, vc, ks, vs, pos, key = carry
                key, k0, kp = split_keys(key, 3)
                logits0 = ll + suppress[None, :]
                code0 = sample_token(k0, logits0, sp)
                c0e = jnp.take(codec, code0, axis=0).astype(jnp.float32)
                subs, ssum = predict_subcodes_resident(
                    mcfg, mtp_params, tables, lh, c0e, kp, sp
                )
                x = c0e + ssum + drip
                if kvq:
                    xo, kc2, vc2, ks2, vs2 = fused_decode_step(
                        talker, tfw, x, pos, kc, vc, ks, vs
                    )
                else:
                    xo, kc2, vc2 = fused_decode_step(
                        talker, tfw, x, pos, kc, vc
                    )
                    ks2 = vs2 = ks
                hid = rms_norm(xo, fnorm_t, talker.rms_norm_eps)
                ll2 = dense(hid, lm)
                frame = jnp.concatenate([code0[:, None], subs], axis=1)
                pos = jax.lax.rem(pos + 1, T)
                return (ll2, hid.astype(lh.dtype), kc2, vc2, ks2, vs2,
                        pos, key), frame

            init = (ll, lh, kc, vc,
                    scales[0] if kvq else None,
                    scales[1] if kvq else None,
                    jnp.asarray(0, jnp.int32), key)
            _, frames = jax.lax.scan(body, init, None, length=n_frames)
            return frames

        tag = " kvq" if kvq else ""
        for name, fn in (("frame", run_frame), ("composed", run_composed)):
            args = (W, ll0, lh0, kc, vc,
                    scales[0] if kvq else None,
                    scales[1] if kvq else None,
                    jax.random.PRNGKey(5))
            t0 = time.perf_counter()
            frames = fn(*args)
            sync(frames)
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for _ in range(3):
                t1 = time.perf_counter()
                frames = fn(*args)
                sync(frames)
                best = min(best, time.perf_counter() - t1)
            ms = best / n_frames * 1e3
            out[f"{name}{tag}"] = ms
            print(f"frame{tag} {name}: {ms:.3f} ms/frame "
                  f"(compile {compile_s:.1f}s, best of 3)", flush=True)
            if name == "frame":
                f2 = fn(*args)
                sync(f2)
                assert np.array_equal(np.asarray(frames), np.asarray(f2)), \
                    "frame kernel nondeterministic on HW"
        return run_frame, run_composed

    run_arms(kvq=False)
    run_arms(kvq=True)

    # greedy frame agreement frame-fused vs composed (FALSIFIABILITY §5):
    # argmax is transport-invariant up to the documented bf16-lhs lm_head
    # difference — expect agreement ~1.0, deviations localize there
    nonlocal_sp = SamplingParams.create(temperature=0.0)

    def greedy_arms():
        kc, vc = jax.device_put([
            np.zeros((talker.num_layers, 1, talker.num_kv_heads, T, 128),
                     np.float32),
            np.zeros((talker.num_layers, 1, talker.num_kv_heads, T, 128),
                     np.float32),
        ])
        sp = nonlocal_sp

        @functools.partial(jax.jit, compiler_options=copts)
        def g_frame(W, ll, lh, kc, vc, key):
            (tfw, mfw, lm, heads, codec, tables, fnorm_t, fnorm_m,
             suppress, drip) = W

            def body(carry, _):
                ll, lh, kc, vc, pos, key = carry
                key, k0, kp = split_keys(key, 3)
                g0 = jax.random.gumbel(k0, (1, Vc), jnp.float32)
                gm = jax.vmap(
                    lambda kk: jax.random.gumbel(kk, (1, V), jnp.float32)
                )(jax.random.split(kp, n))
                outs = fused_frame_step(
                    talker, mtp_t, tfw, fnorm_t, lm, codec, mfw, fnorm_m,
                    heads, tables, ll, lh, suppress, drip, pos, kc, vc,
                    g0, gm, sp.temperature, sp.top_k, sp.top_p,
                    jnp.bool_(True), mtp_cache_dtype=jnp.bfloat16,
                )
                code0, subs, ll2, lh2, kc2, vc2 = outs
                frame = jnp.concatenate([code0[:, None], subs], axis=1)
                return (ll2, lh2.astype(lh.dtype), kc2, vc2,
                        jax.lax.rem(pos + 1, T), key), frame

            init = (ll, lh, kc, vc, jnp.asarray(0, jnp.int32), key)
            _, frames = jax.lax.scan(body, init, None, length=64)
            return frames

        @functools.partial(jax.jit, compiler_options=copts)
        def g_comp(W, ll, lh, kc, vc, key):
            (tfw, mfw, lm, heads, codec, tables, fnorm_t, fnorm_m,
             suppress, drip) = W
            mtp_params = {
                "fused_step": mfw,
                "transformer": {"final_norm": fnorm_m},
                "heads": heads,
            }

            def body(carry, _):
                ll, lh, kc, vc, pos, key = carry
                key, k0, kp = split_keys(key, 3)
                logits0 = ll + suppress[None, :]
                code0 = sample_token(k0, logits0, sp)
                c0e = jnp.take(codec, code0, axis=0).astype(jnp.float32)
                subs, ssum = predict_subcodes_resident(
                    mcfg, mtp_params, tables, lh, c0e, kp, sp
                )
                x = c0e + ssum + drip
                xo, kc2, vc2 = fused_decode_step(talker, tfw, x, pos, kc, vc)
                hid = rms_norm(xo, fnorm_t, talker.rms_norm_eps)
                ll2 = dense(hid, lm)
                frame = jnp.concatenate([code0[:, None], subs], axis=1)
                return (ll2, hid.astype(lh.dtype), kc2, vc2,
                        jax.lax.rem(pos + 1, T), key), frame

            init = (ll, lh, kc, vc, jnp.asarray(0, jnp.int32), key)
            _, frames = jax.lax.scan(body, init, None, length=64)
            return frames

        fa = g_frame(W, ll0, lh0, kc, vc, jax.random.PRNGKey(9))
        fb = g_comp(W, ll0, lh0, kc, vc, jax.random.PRNGKey(9))
        sync(fa)
        sync(fb)
        agree = float((np.asarray(fa) == np.asarray(fb)).mean())
        print(f"greedy frame agreement frame-fused vs composed: "
              f"{agree:.4f}", flush=True)

    greedy_arms()
    return out


def main():
    t0 = time.perf_counter()
    sync(jax.device_put(np.zeros(8, np.float32)))
    print(f"tunnel connect: {time.perf_counter() - t0:.1f}s", flush=True)

    if "--resident" in os.sys.argv:
        bench_resident()
        return

    if "--stream" in os.sys.argv:
        bench_stream()
        return

    if "--streamdiag" in os.sys.argv:
        bench_streamdiag()
        return

    # --streamdiag17 and --engine17 chain in one process (one tunnel
    # connect pays for both)
    ran = False
    if "--streamdiag17" in os.sys.argv:
        bench_streamdiag17()
        ran = True
    if "--engine17" in os.sys.argv:
        bench_engine17()
        ran = True
    if ran:
        return

    if "--frame" in os.sys.argv:
        bench_frame()
        return

    if "--win" in os.sys.argv:
        # long-form windowed kernel A/B: auto (L, U)-grid pipeline vs the
        # manual-schedule win kernel (QTTS_FUSED_WIN_MANUAL=1) at a 2560
        # bucket — the vmem manual kernel's ~12-19% should transfer if the
        # win path is also grid-overhead-bound
        talker = TransformerConfig(dtype="bfloat16")
        os.environ["QTTS_FUSED_MODE"] = "win"
        for wm in ("0", "1"):
            os.environ["QTTS_FUSED_WIN_MANUAL"] = wm
            name = "win-manual" if wm == "1" else "win-auto"
            print(f"--- {name} ---", flush=True)
            bench_shape(f"talker T=2560 {name}", talker, 2560, kvq=False)
            bench_shape(f"talker T=2560 {name}", talker, 2560, kvq=True)
        os.environ.pop("QTTS_FUSED_MODE", None)
        os.environ.pop("QTTS_FUSED_WIN_MANUAL", None)
        return

    if "--ring" in os.sys.argv:
        # DMA ring depth sweep on the manual kernel (transport-only —
        # deeper rings keep more unit transfers outstanding).  If the
        # 1.205-vs-0.53 floor gap is outstanding-transfer-bound this moves;
        # if it is compute/VPU-bound it will not.
        talker = TransformerConfig(dtype="bfloat16")
        for ring in ("2", "4", "8"):
            os.environ["QTTS_FUSED_RING"] = ring
            print(f"--- ring={ring} ---", flush=True)
            bench_shape(f"talker T=512 ring={ring}", talker, 512, kvq=False)
            bench_shape(f"talker T=512 ring={ring}", talker, 512, kvq=True)
        os.environ.pop("QTTS_FUSED_RING", None)
        return

    if "--ring17" in os.sys.argv:
        # 1.7B-shape ring sweep: H=2048 units are 4x the bytes of the 0.6B
        # sweep's, so the outstanding-transfer knee can sit elsewhere.  The
        # BENCH_MODEL=1.7b headline (8.77 ms f32-KV, 2026-08-19) is ~3%
        # over the round-4 <=8.5 target — a ring win here is the cheapest
        # closure.  Sweeps BOTH 1.7B components: talker (28L, T=512) and
        # the per-step MTP trunk shape (6L, T=32; not resident at 1.7B).
        talker17 = TransformerConfig(
            hidden_size=2048, num_layers=28, num_heads=16, num_kv_heads=8,
            head_dim=128, intermediate_size=6144, dtype="bfloat16",
        )
        mtp17 = TransformerConfig(
            hidden_size=2048, num_layers=6, num_heads=16, num_kv_heads=8,
            head_dim=128, intermediate_size=6144, dtype="bfloat16",
        )
        for ring in ("2", "4", "8", "12"):
            os.environ["QTTS_FUSED_RING"] = ring
            print(f"--- ring={ring} ---", flush=True)
            bench_shape(f"talker17 T=512 ring={ring}", talker17, 512,
                        kvq=False)
            bench_shape(f"talker17 T=512 ring={ring}", talker17, 512,
                        kvq=True)
            bench_shape(f"mtp17 T=32 ring={ring}", mtp17, 32, kvq=False)
        os.environ.pop("QTTS_FUSED_RING", None)
        return

    if "--tp" in os.sys.argv:
        bench_tp(TransformerConfig(dtype="bfloat16"), 512)
        return

    if "--int4" in os.sys.argv:
        talker = TransformerConfig(dtype="bfloat16")
        mtp = TransformerConfig(
            hidden_size=1024, num_layers=6, num_heads=8, num_kv_heads=8,
            head_dim=128, intermediate_size=3072, dtype="bfloat16",
        )
        mtp17 = TransformerConfig(
            hidden_size=2048, num_layers=6, num_heads=16, num_kv_heads=8,
            head_dim=128, intermediate_size=6144, dtype="bfloat16",
        )
        bench_shape("mtp T=32", mtp, 32, kvq=False, w4=True)
        bench_shape("mtp17 T=32", mtp17, 32, kvq=False, w4=True)
        bench_shape("mtp17 T=32", mtp17, 32, kvq=False)
        bench_shape("talker T=512", talker, 512, kvq=False, w4=True)
        return

    talker = TransformerConfig(dtype="bfloat16")
    mtp = TransformerConfig(
        hidden_size=1024, num_layers=6, num_heads=8, num_kv_heads=8,
        head_dim=128, intermediate_size=3072, dtype="bfloat16",
    )
    res = {}
    res["talker_T512"] = bench_shape("talker T=512", talker, 512, kvq=False)
    res["mtp_T32"] = bench_shape("mtp T=32", mtp, 32, kvq=False)
    res["talker_T512_kvq"] = bench_shape("talker T=512", talker, 512, kvq=True)
    res["talker_T512_bf16"] = bench_shape(
        "talker T=512", talker, 512, kvq=False, bf16=True)
    res["mtp_T32_bf16"] = bench_shape("mtp T=32", mtp, 32, kvq=False, bf16=True)
    frame_auto = res["talker_T512"]["auto"] + 15 * res["mtp_T32"]["auto"]
    frame_man = res["talker_T512"]["manual"] + 15 * res["mtp_T32"]["manual"]
    print(f"\nper-frame int8 (talker + 15xMTP): auto {frame_auto:.2f} ms, "
          f"manual {frame_man:.2f} ms", flush=True)
    fb_a = res["talker_T512_bf16"]["auto"] + 15 * res["mtp_T32_bf16"]["auto"]
    fb_m = res["talker_T512_bf16"]["manual"] + 15 * res["mtp_T32_bf16"]["manual"]
    print(f"per-frame bf16 (talker + 15xMTP): auto {fb_a:.2f} ms, "
          f"manual {fb_m:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
