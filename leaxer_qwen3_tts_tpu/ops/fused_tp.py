"""Tensor-parallel fused decode: per-layer Pallas half-kernels under shard_map.

The single-chip fused step (ops/fused_step.py) runs all layers as ONE kernel
— impossible under TP, where the residual stream needs a cross-chip
reduction after attention-out and after MLP-down (the Megatron 2-collective
schedule).  This module restructures the step for a ("data","model") mesh:

    lax.scan over layers:
        dx  = psum(attn_half_kernel(x, local qkv/wo shard, local KV heads))
        x  += dx
        x  += psum(mlp_half_kernel(x, local gate-up/down shard))

Each half is a per-layer Pallas kernel on the SHARD's weights, int8 per
output column, activations resident in VMEM.  The non-uniform pack schedule
this needs (round-2 blocker): per-shard contraction dims (q_dim/tp,
intermediate/tp) are not multiples of the hidden size, so K-split tiles use
KC = gcd(per-shard dim, H) rows and each unit GROUP lives in its own packed
tensor (vs 4x zero-padding waste with a uniform [H, 1024] schedule).
N-split tiles use NU = gcd(1024, per-shard widths) columns (0.6B TP=2's
qkv shard needs NU=512).

Weight streaming (default): MANUAL double-buffered DMA inside grid-(1,)
kernels — each group tensor streams through its own 2-slot VMEM scratch
with explicit semaphores, every unit fetched exactly once BY CONSTRUCTION
(_make_attn_half_manual / _make_mlp_half_manual, same scheme as
fused_step's manual kernel).  QTTS_FUSED_TP_MANUAL=0 selects the original
(U,)-grid pipeline whose two tensors ride CLAMPED block index maps; that
variant fetches BOTH tensors' blocks on EVERY grid step — Pallas has no
revolving-buffer skip for repeated block indices (round-3 measured negative
result; docs/KERNEL_PLAN.md "measured negative results") — i.e. ~2x the
weight traffic.  Measured single-chip at a degenerate tp=1 mesh (0.6B,
T=512, tools/manual_probe.py --tp): BOTH variants run 2.03 ms/step vs 1.2
for the single-kernel fused step on the same bytes — at 2 pallas calls per
layer the per-call overhead (~56 calls/step) dominates and the extra DMA
hides under it.  The manual halves are kept as the default because their
traffic bound is structural (it matters exactly when ICI+HBM contention
appears at tp>1, unmeasurable on this one-chip box), they measure no
slower, and they compile faster; the honest statement is that TP-fused
decode pays off only with real multi-chip bandwidth, not at tp=1.

The KV cache is head-sharded ([.., nk/tp, T, d] per chip): a whole per-layer
cache block fits VMEM at ANY bucket (nk_s <= 4), so attention is the simple
full-block form — no windowing needed under TP.

Quantization note: packs are int8 per column OVER THE SHARD (a column's
amax over qd/tp rows differs from the full-tensor column amax), so TP
output matches the single-chip fused step only to int8-grid tolerance; the
engine keeps prefill on the bf16 XLA path (documented asymmetry — the
reference's own decode graphs are fp16 while scoring is fp32).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

try:
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
    _SMEM = pltpu.SMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None
    _SMEM = None

from ..config import TransformerConfig
from .fused_step import _rms
from .quant import quantize_weight


class FusedTPWeights(NamedTuple):
    """Per-shard packed weights; every leaf has a leading [TP] axis that is
    device_put sharded over the mesh "model" axis (shard_map strips it).

    qkv_u [TP, L, Uq, H, NU] int8; qkv_s [TP, L, Uq, 1, NU] f32
    wo_u  [TP, L, Uo, KCo, NU];    wo_s  [TP, L, Uo, 1, NU]
    gu_u  [TP, L, Ug, H, NU];      gu_s  [TP, L, Ug, 1, NU]
    wd_u  [TP, L, Ud, KCd, NU];    wd_s  [TP, L, Ud, 1, NU]
    norms replicated: attn_norm/mlp_norm [L, 1, H], q_norm/k_norm [L, 1, d]
    """

    qkv_u: jax.Array
    qkv_s: jax.Array
    wo_u: jax.Array
    wo_s: jax.Array
    gu_u: jax.Array
    gu_s: jax.Array
    wd_u: jax.Array
    wd_s: jax.Array
    attn_norm: jax.Array
    mlp_norm: jax.Array
    q_norm: jax.Array
    k_norm: jax.Array


def _dims(cfg: TransformerConfig, tp: int):
    d = cfg.head_dim
    nq_s = cfg.num_heads // tp
    nk_s = cfg.num_kv_heads // tp
    qd_s, kvd_s = nq_s * d, nk_s * d
    A_s = qd_s + 2 * kvd_s
    I_s = cfg.intermediate_size // tp
    H = cfg.hidden_size
    NU = math.gcd(1024, math.gcd(A_s, math.gcd(2 * I_s, H)))
    KCo = math.gcd(qd_s, H)
    KCd = math.gcd(I_s, H)
    return H, d, nq_s, nk_s, qd_s, kvd_s, A_s, I_s, NU, KCo, KCd


def supports_tp(cfg: TransformerConfig, tp: int) -> bool:
    if cfg.num_heads % tp or cfg.num_kv_heads % tp:
        return False
    if cfg.intermediate_size % tp:
        return False
    H, d, nq_s, nk_s, qd_s, kvd_s, A_s, I_s, NU, KCo, KCd = _dims(cfg, tp)
    # tiles must be MXU/VPU-tileable: 256-row K chunks, 256-col N chunks min
    return NU >= 256 and KCo >= 256 and KCd >= 256 and H % NU == 0


def pack_fused_tp(cfg: TransformerConfig, layer_params: dict,
                  tp: int, mesh=None) -> FusedTPWeights:
    """Pack RAW (unquantized, unfused) stacked layer params into per-shard
    int8 unit tensors.  Per-output-column scales are computed on the SHARD's
    rows for the K-split groups."""
    assert supports_tp(cfg, tp)
    H, d, nq_s, nk_s, qd_s, kvd_s, A_s, I_s, NU, KCo, KCd = _dims(cfg, tp)
    p = layer_params
    L = p["wq"].shape[0]

    def units_n(w_s):  # [L, H, W] -> ([L, U, H, NU], [L, U, 1, NU])
        n = w_s.shape[-1] // NU
        qs = [quantize_weight(w_s[..., i * NU : (i + 1) * NU]) for i in range(n)]
        return (jnp.stack([q.q for q in qs], axis=1),
                jnp.stack([q.scale for q in qs], axis=1))

    def units_k(w_s, KC):  # [L, K, H] -> k-major tiles [L, U, KC, NU]
        ks = w_s.shape[-2] // KC
        ns = w_s.shape[-1] // NU
        us, ss = [], []
        full = quantize_weight(w_s)  # per-column scale over the FULL shard K
        for i in range(ks):
            for j in range(ns):
                us.append(full.q[:, i * KC : (i + 1) * KC,
                                 j * NU : (j + 1) * NU])
                ss.append(full.scale[..., j * NU : (j + 1) * NU])
        return jnp.stack(us, axis=1), jnp.stack(ss, axis=1)

    shards = {k: [] for k in ("qkv_u", "qkv_s", "wo_u", "wo_s",
                              "gu_u", "gu_s", "wd_u", "wd_s")}
    for s in range(tp):
        qkv = jnp.concatenate(
            [p["wq"][..., s * qd_s : (s + 1) * qd_s],
             p["wk"][..., s * kvd_s : (s + 1) * kvd_s],
             p["wv"][..., s * kvd_s : (s + 1) * kvd_s]], axis=-1)
        u, sc = units_n(qkv)
        shards["qkv_u"].append(u)
        shards["qkv_s"].append(sc)
        u, sc = units_k(p["wo"][:, s * qd_s : (s + 1) * qd_s, :], KCo)
        shards["wo_u"].append(u)
        shards["wo_s"].append(sc)
        gu = jnp.concatenate(
            [p["wg"][..., s * I_s : (s + 1) * I_s],
             p["wu"][..., s * I_s : (s + 1) * I_s]], axis=-1)
        u, sc = units_n(gu)
        shards["gu_u"].append(u)
        shards["gu_s"].append(sc)
        u, sc = units_k(p["wd"][:, s * I_s : (s + 1) * I_s, :], KCd)
        shards["wd_u"].append(u)
        shards["wd_s"].append(sc)

    stacked = {k: jnp.stack(v) for k, v in shards.items()}
    fw = FusedTPWeights(
        **{k: stacked[k] for k in shards},
        attn_norm=p["attn_norm"].astype(jnp.float32)[:, None, :],
        mlp_norm=p["mlp_norm"].astype(jnp.float32)[:, None, :],
        q_norm=p["q_norm"].astype(jnp.float32)[:, None, :],
        k_norm=p["k_norm"].astype(jnp.float32)[:, None, :],
    )
    if mesh is not None:
        def put(x, name):
            if name in ("attn_norm", "mlp_norm", "q_norm", "k_norm"):
                return jax.device_put(x, NamedSharding(mesh, P()))
            return jax.device_put(
                x, NamedSharding(mesh, P("model", *([None] * (x.ndim - 1))))
            )

        fw = FusedTPWeights(**{n: put(getattr(fw, n), n) for n in fw._fields})
    return fw


def _unit_matmul(w_ref, s_ref):
    w = w_ref[0].astype(jnp.bfloat16)  # [K, NU]
    sc = s_ref[0]  # [1, NU]

    def mm(lhs):  # [1, K] f32 -> [1, NU] f32
        return (
            lax.dot_general(lhs.astype(jnp.bfloat16), w,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
            * sc
        )

    return mm


def _make_attn_half(cfg: TransformerConfig, T: int, tp: int):
    H, d, nq_s, nk_s, qd_s, kvd_s, A_s, I_s, NU, KCo, KCd = _dims(cfg, tp)
    eps = cfg.rms_norm_eps
    g = nq_s // nk_s
    n_qkv = A_s // NU
    n_wo_k = qd_s // KCo
    n_wo_n = H // NU
    n_wo = n_wo_k * n_wo_n
    U = n_qkv + n_wo

    def kernel(pos_ref, x_ref, cos_ref, sin_ref, qkvw, qkvs, wow, wos,
               an_ref, qn_ref, kn_ref, kc_in, vc_in,
               dx_out, kc_out, vc_out, h_s, qkv_s, attn_s):
        u = pl.program_id(0)
        pos = pos_ref[0]

        @pl.when(u == 0)
        def _norm():
            h_s[:] = _rms(x_ref[:], an_ref[0], eps)

        @pl.when(u < n_qkv)
        def _qkv():
            off = pl.multiple_of(u * NU, NU)
            qkv_s[:, pl.ds(off, NU)] = _unit_matmul(qkvw, qkvs)(h_s[:])

        @pl.when(u == n_qkv)
        def _attention():
            qkv = qkv_s[:]
            cos = cos_ref[:]
            sin = sin_ref[:]
            q = qkv[0, :qd_s].reshape(nq_s, d)
            k = qkv[0, qd_s : qd_s + kvd_s].reshape(nk_s, d)
            v = qkv[0, qd_s + kvd_s :].reshape(nk_s, d)
            q = _rms(q, qn_ref[0, 0], eps)
            k = _rms(k, kn_ref[0, 0], eps)
            half = d // 2

            def rope(x):
                x1, x2 = x[:, :half], x[:, half:]
                return jnp.concatenate(
                    [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
                )

            q = rope(q)
            k = rope(k)
            slot = jax.lax.broadcasted_iota(jnp.int32, (1, nk_s, T, d), 2)
            K_new = jnp.where(
                slot == pos, k[None, :, None, :].astype(kc_in.dtype), kc_in[:]
            )
            V_new = jnp.where(
                slot == pos, v[None, :, None, :].astype(vc_in.dtype), vc_in[:]
            )
            kc_out[:] = K_new
            vc_out[:] = V_new
            K = K_new[0].astype(jnp.float32)
            V = V_new[0].astype(jnp.float32)
            qg = q.reshape(nk_s, g, d)
            sc = lax.dot_general(
                qg, K, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * (1.0 / (d**0.5))
            tslot = jax.lax.broadcasted_iota(jnp.int32, (nk_s, g, T), 2)
            sc = jnp.where(tslot <= pos, sc, -1e30)
            m = jnp.max(sc, axis=-1, keepdims=True)
            e = jnp.exp(sc - m)
            w = e / jnp.sum(e, axis=-1, keepdims=True)
            out = lax.dot_general(
                w, V, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            attn_s[:] = out.reshape(1, qd_s)

        @pl.when(u >= n_qkv)
        def _wo():
            i = u - n_qkv
            k_idx = i // n_wo_n
            n_off = pl.multiple_of((i % n_wo_n) * NU, NU)
            k_off = pl.multiple_of(k_idx * KCo, 128)
            part = _unit_matmul(wow, wos)(attn_s[:, pl.ds(k_off, KCo)])

            @pl.when(k_idx == 0)
            def _w():
                dx_out[:, pl.ds(n_off, NU)] = part

            @pl.when(k_idx > 0)
            def _acc():
                dx_out[:, pl.ds(n_off, NU)] = (
                    dx_out[:, pl.ds(n_off, NU)] + part
                )

    def clamp_q(u):
        return (jnp.minimum(u, n_qkv - 1), 0, 0)

    def clamp_o(u):
        return (jnp.clip(u - n_qkv, 0, n_wo - 1), 0, 0)

    return kernel, U, clamp_q, clamp_o, (n_qkv, n_wo, NU, KCo)


def _make_mlp_half(cfg: TransformerConfig, tp: int):
    H, d, nq_s, nk_s, qd_s, kvd_s, A_s, I_s, NU, KCo, KCd = _dims(cfg, tp)
    eps = cfg.rms_norm_eps
    n_gu = 2 * I_s // NU
    n_wd_k = I_s // KCd
    n_wd_n = H // NU
    n_wd = n_wd_k * n_wd_n
    U = n_gu + n_wd

    def kernel(x_ref, guw, gus, wdw, wds, mn_ref, dx_out, h_s, gu_s):
        u = pl.program_id(0)

        @pl.when(u == 0)
        def _norm():
            h_s[:] = _rms(x_ref[:], mn_ref[0], eps)

        @pl.when(u < n_gu)
        def _gu():
            off = pl.multiple_of(u * NU, NU)
            gu_s[:, pl.ds(off, NU)] = _unit_matmul(guw, gus)(h_s[:])

        @pl.when(u == n_gu)
        def _act():
            gu = gu_s[:]
            gate = gu[:, :I_s]
            up = gu[:, I_s:]
            gu_s[:, :I_s] = gate * (1.0 / (1.0 + jnp.exp(-gate))) * up

        @pl.when(u >= n_gu)
        def _wd():
            i = u - n_gu
            k_idx = i // n_wd_n
            n_off = pl.multiple_of((i % n_wd_n) * NU, NU)
            k_off = pl.multiple_of(k_idx * KCd, 128)
            part = _unit_matmul(wdw, wds)(gu_s[:, pl.ds(k_off, KCd)])

            @pl.when(k_idx == 0)
            def _w():
                dx_out[:, pl.ds(n_off, NU)] = part

            @pl.when(k_idx > 0)
            def _acc():
                dx_out[:, pl.ds(n_off, NU)] = (
                    dx_out[:, pl.ds(n_off, NU)] + part
                )

    def clamp_g(u):
        return (jnp.minimum(u, n_gu - 1), 0, 0)

    def clamp_d(u):
        return (jnp.clip(u - n_gu, 0, n_wd - 1), 0, 0)

    return kernel, U, clamp_g, clamp_d, (n_gu, n_wd, NU, KCd)


def _mm_value(w, sc):
    """Unit matmul from VALUES (manual-DMA halves): [1, K] f32 -> [1, NU]."""
    w16 = w.astype(jnp.bfloat16)

    def mm(lhs):
        return (
            lax.dot_general(lhs.astype(jnp.bfloat16), w16,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
            * sc
        )

    return mm


def _make_attn_half_manual(cfg: TransformerConfig, T: int, tp: int):
    """Manual double-buffered variant of _make_attn_half: grid (1,), the
    unit loop unrolled in-kernel, each group tensor streamed HBM->VMEM
    through its own 2-slot scratch with DMA semaphores.  Every unit is
    fetched EXACTLY ONCE — the auto (U,)-grid version's clamped index maps
    fetch BOTH tensors' blocks every grid step (Pallas has no revolving-
    buffer skip for repeated block indices, the round-3 negative result),
    ~2x the weight traffic."""
    H, d, nq_s, nk_s, qd_s, kvd_s, A_s, I_s, NU, KCo, KCd = _dims(cfg, tp)
    eps = cfg.rms_norm_eps
    g = nq_s // nk_s
    n_qkv = A_s // NU
    n_wo_k = qd_s // KCo
    n_wo_n = H // NU
    n_wo = n_wo_k * n_wo_n

    def kernel(pos_ref, x_ref, cos_ref, sin_ref, qkvw, qkvs, wow, wos,
               an_ref, qn_ref, kn_ref, kc_in, vc_in,
               dx_out, kc_out, vc_out,
               h_s, qkv_s, attn_s, qbuf, obuf, sem_q, sem_o):
        pos = pos_ref[0]

        def dma_q(u, sl):
            return pltpu.make_async_copy(qkvw.at[u], qbuf.at[sl], sem_q.at[sl])

        def dma_o(i, sl):
            return pltpu.make_async_copy(wow.at[i], obuf.at[sl], sem_o.at[sl])

        dma_q(0, 0).start()
        h_s[:] = _rms(x_ref[:], an_ref[0], eps)
        for u in range(n_qkv):
            sl = u % 2
            if u + 1 < n_qkv:
                dma_q(u + 1, (u + 1) % 2).start()
            else:
                dma_o(0, 0).start()
            dma_q(u, sl).wait()
            qkv_s[:, u * NU : (u + 1) * NU] = _mm_value(
                qbuf[sl], qkvs[u]
            )(h_s[:])

        # attention (identical math to _make_attn_half's u == n_qkv step)
        qkv = qkv_s[:]
        cos = cos_ref[:]
        sin = sin_ref[:]
        q = qkv[0, :qd_s].reshape(nq_s, d)
        k = qkv[0, qd_s : qd_s + kvd_s].reshape(nk_s, d)
        v = qkv[0, qd_s + kvd_s :].reshape(nk_s, d)
        q = _rms(q, qn_ref[0, 0], eps)
        k = _rms(k, kn_ref[0, 0], eps)
        half = d // 2

        def rope(x):
            x1, x2 = x[:, :half], x[:, half:]
            return jnp.concatenate(
                [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
            )

        q = rope(q)
        k = rope(k)
        slot = jax.lax.broadcasted_iota(jnp.int32, (1, nk_s, T, d), 2)
        K_new = jnp.where(
            slot == pos, k[None, :, None, :].astype(kc_in.dtype), kc_in[:]
        )
        V_new = jnp.where(
            slot == pos, v[None, :, None, :].astype(vc_in.dtype), vc_in[:]
        )
        kc_out[:] = K_new
        vc_out[:] = V_new
        K = K_new[0].astype(jnp.float32)
        V = V_new[0].astype(jnp.float32)
        qg = q.reshape(nk_s, g, d)
        sc = lax.dot_general(
            qg, K, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * (1.0 / (d**0.5))
        tslot = jax.lax.broadcasted_iota(jnp.int32, (nk_s, g, T), 2)
        sc = jnp.where(tslot <= pos, sc, -1e30)
        m = jnp.max(sc, axis=-1, keepdims=True)
        e = jnp.exp(sc - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)
        out = lax.dot_general(
            w, V, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        attn_s[:] = out.reshape(1, qd_s)

        for i in range(n_wo):
            sl = i % 2
            if i + 1 < n_wo:
                dma_o(i + 1, (i + 1) % 2).start()
            dma_o(i, sl).wait()
            k_idx = i // n_wo_n
            n_off = (i % n_wo_n) * NU
            part = _mm_value(obuf[sl], wos[i])(
                attn_s[:, k_idx * KCo : (k_idx + 1) * KCo]
            )
            if k_idx == 0:
                dx_out[:, n_off : n_off + NU] = part
            else:
                dx_out[:, n_off : n_off + NU] = (
                    dx_out[:, n_off : n_off + NU] + part
                )

    scratch = [
        pltpu.VMEM((1, H), jnp.float32),
        pltpu.VMEM((1, A_s), jnp.float32),
        pltpu.VMEM((1, qd_s), jnp.float32),
        pltpu.VMEM((2, H, NU), jnp.int8),
        pltpu.VMEM((2, KCo, NU), jnp.int8),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    return kernel, scratch, (n_qkv, n_wo, NU, KCo)


def _make_mlp_half_manual(cfg: TransformerConfig, tp: int):
    """Manual double-buffered variant of _make_mlp_half (see
    _make_attn_half_manual)."""
    H, d, nq_s, nk_s, qd_s, kvd_s, A_s, I_s, NU, KCo, KCd = _dims(cfg, tp)
    eps = cfg.rms_norm_eps
    n_gu = 2 * I_s // NU
    n_wd_k = I_s // KCd
    n_wd_n = H // NU
    n_wd = n_wd_k * n_wd_n

    def kernel(x_ref, guw, gus, wdw, wds, mn_ref, dx_out,
               h_s, gu_s, gbuf, dbuf, sem_g, sem_d):
        def dma_g(u, sl):
            return pltpu.make_async_copy(guw.at[u], gbuf.at[sl], sem_g.at[sl])

        def dma_d(i, sl):
            return pltpu.make_async_copy(wdw.at[i], dbuf.at[sl], sem_d.at[sl])

        dma_g(0, 0).start()
        h_s[:] = _rms(x_ref[:], mn_ref[0], eps)
        for u in range(n_gu):
            sl = u % 2
            if u + 1 < n_gu:
                dma_g(u + 1, (u + 1) % 2).start()
            else:
                dma_d(0, 0).start()
            dma_g(u, sl).wait()
            gu_s[:, u * NU : (u + 1) * NU] = _mm_value(
                gbuf[sl], gus[u]
            )(h_s[:])

        gu = gu_s[:]
        gate = gu[:, :I_s]
        up = gu[:, I_s:]
        gu_s[:, :I_s] = gate * (1.0 / (1.0 + jnp.exp(-gate))) * up

        for i in range(n_wd):
            sl = i % 2
            if i + 1 < n_wd:
                dma_d(i + 1, (i + 1) % 2).start()
            dma_d(i, sl).wait()
            k_idx = i // n_wd_n
            n_off = (i % n_wd_n) * NU
            part = _mm_value(dbuf[sl], wds[i])(
                gu_s[:, k_idx * KCd : (k_idx + 1) * KCd]
            )
            if k_idx == 0:
                dx_out[:, n_off : n_off + NU] = part
            else:
                dx_out[:, n_off : n_off + NU] = (
                    dx_out[:, n_off : n_off + NU] + part
                )

    scratch = [
        pltpu.VMEM((1, H), jnp.float32),
        pltpu.VMEM((1, 2 * I_s), jnp.float32),
        pltpu.VMEM((2, H, NU), jnp.int8),
        pltpu.VMEM((2, KCd, NU), jnp.int8),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    return kernel, scratch, (n_gu, n_wd, NU, KCd)


def _tp_manual_enabled() -> bool:
    """Manual double-buffered weight DMA in the TP half-kernels
    (QTTS_FUSED_TP_MANUAL=0 falls back to the (U,)-grid clamped-map
    pipeline for A/B benching)."""
    import os

    return os.environ.get("QTTS_FUSED_TP_MANUAL", "1") != "0"


def fused_decode_step_tp(
    cfg: TransformerConfig,
    fw: FusedTPWeights,
    x: jax.Array,  # [1, H] (replicated)
    pos: jax.Array,  # scalar int32
    k_cache: jax.Array,  # [L, 1, nk, T, d], heads sharded over "model"
    v_cache: jax.Array,
    mesh,
    interpret: bool = False,
):
    """One decode step over all layers under TP (pre-final-norm output).

    Returns (x_out [1, H] f32 replicated, k_cache, v_cache)."""
    tp = mesh.shape["model"]
    T = k_cache.shape[3]
    pos = jnp.minimum(jnp.asarray(pos, jnp.int32), T - 1)
    return _fused_decode_step_tp_jit(cfg, fw, x, pos, k_cache, v_cache,
                                     mesh, tp, T, interpret,
                                     _tp_manual_enabled())


@functools.partial(
    jax.jit, static_argnames=("cfg", "mesh", "tp", "T", "interpret", "manual")
)
def _fused_decode_step_tp_jit(cfg, fw, x, pos, k_cache, v_cache, mesh, tp,
                              T, interpret, manual=False):
    H, d, nq_s, nk_s, qd_s, kvd_s, A_s, I_s, NU, KCo, KCd = _dims(cfg, tp)
    L = fw.attn_norm.shape[0]
    eps = cfg.rms_norm_eps

    half = d // 2
    freqs = 1.0 / (
        cfg.rope_theta ** (jnp.arange(half, dtype=jnp.float32) / half)
    )
    angles = pos.astype(jnp.float32) * freqs
    cos = jnp.cos(angles)[None, :]
    sin = jnp.sin(angles)[None, :]

    attn_kernel, Ua, clamp_q, clamp_o, _ = _make_attn_half(cfg, T, tp)
    mlp_kernel, Um, clamp_g, clamp_d, _ = _make_mlp_half(cfg, tp)
    compiler_params = None
    if manual and not interpret and pltpu is not None:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        )

    def attn_half_manual(pos_a, xin, cos_, sin_, qkvw, qkvs, wow, wos, an,
                         qn, kn, kc, vc):
        kernel_m, scratch, (n_qkv, n_wo, _NU, _KCo) = _make_attn_half_manual(
            cfg, T, tp
        )
        return pl.pallas_call(
            kernel_m,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=_SMEM),
                pl.BlockSpec((1, H), lambda u: (0, 0), memory_space=_VMEM),
                pl.BlockSpec((1, half), lambda u: (0, 0), memory_space=_VMEM),
                pl.BlockSpec((1, half), lambda u: (0, 0), memory_space=_VMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # qkv units stay in HBM
                pl.BlockSpec((n_qkv, 1, NU), lambda u: (0, 0, 0),
                             memory_space=_VMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # wo units stay in HBM
                pl.BlockSpec((n_wo, 1, NU), lambda u: (0, 0, 0),
                             memory_space=_VMEM),
                pl.BlockSpec((1, H), lambda u: (0, 0), memory_space=_VMEM),
                pl.BlockSpec((1, d), lambda u: (0, 0), memory_space=_VMEM),
                pl.BlockSpec((1, d), lambda u: (0, 0), memory_space=_VMEM),
                pl.BlockSpec((1, nk_s, T, d), lambda u: (0, 0, 0, 0),
                             memory_space=_VMEM),
                pl.BlockSpec((1, nk_s, T, d), lambda u: (0, 0, 0, 0),
                             memory_space=_VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, H), lambda u: (0, 0), memory_space=_VMEM),
                pl.BlockSpec((1, nk_s, T, d), lambda u: (0, 0, 0, 0),
                             memory_space=_VMEM),
                pl.BlockSpec((1, nk_s, T, d), lambda u: (0, 0, 0, 0),
                             memory_space=_VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, H), jnp.float32),
                jax.ShapeDtypeStruct((1, nk_s, T, d), kc.dtype),
                jax.ShapeDtypeStruct((1, nk_s, T, d), vc.dtype),
            ],
            scratch_shapes=scratch,
            interpret=interpret,
            compiler_params=compiler_params,
        )(pos_a, xin, cos_, sin_, qkvw, qkvs, wow, wos, an, qn, kn, kc, vc)

    def mlp_half_manual(xin, guw, gus, wdw, wds, mn):
        kernel_m, scratch, (n_gu, n_wd, _NU, _KCd) = _make_mlp_half_manual(
            cfg, tp
        )
        return pl.pallas_call(
            kernel_m,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((1, H), lambda u: (0, 0), memory_space=_VMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # gu units stay in HBM
                pl.BlockSpec((n_gu, 1, NU), lambda u: (0, 0, 0),
                             memory_space=_VMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # wd units stay in HBM
                pl.BlockSpec((n_wd, 1, NU), lambda u: (0, 0, 0),
                             memory_space=_VMEM),
                pl.BlockSpec((1, H), lambda u: (0, 0), memory_space=_VMEM),
            ],
            out_specs=pl.BlockSpec((1, H), lambda u: (0, 0),
                                   memory_space=_VMEM),
            out_shape=jax.ShapeDtypeStruct((1, H), jnp.float32),
            scratch_shapes=scratch,
            interpret=interpret,
            compiler_params=compiler_params,
        )(xin, guw, gus, wdw, wds, mn)

    def attn_half(pos_a, xin, cos_, sin_, qkvw, qkvs, wow, wos, an, qn, kn,
                  kc, vc):
        if manual:
            return attn_half_manual(pos_a, xin, cos_, sin_, qkvw, qkvs,
                                    wow, wos, an, qn, kn, kc, vc)
        return pl.pallas_call(
            attn_kernel,
            grid=(Ua,),
            in_specs=[
                pl.BlockSpec(memory_space=_SMEM),
                pl.BlockSpec((1, H), lambda u: (0, 0), memory_space=_VMEM),
                pl.BlockSpec((1, half), lambda u: (0, 0), memory_space=_VMEM),
                pl.BlockSpec((1, half), lambda u: (0, 0), memory_space=_VMEM),
                pl.BlockSpec((1, H, NU), clamp_q, memory_space=_VMEM),
                pl.BlockSpec((1, 1, NU), clamp_q, memory_space=_VMEM),
                pl.BlockSpec((1, KCo, NU), clamp_o, memory_space=_VMEM),
                pl.BlockSpec((1, 1, NU), clamp_o, memory_space=_VMEM),
                pl.BlockSpec((1, H), lambda u: (0, 0), memory_space=_VMEM),
                pl.BlockSpec((1, d), lambda u: (0, 0), memory_space=_VMEM),
                pl.BlockSpec((1, d), lambda u: (0, 0), memory_space=_VMEM),
                pl.BlockSpec((1, nk_s, T, d), lambda u: (0, 0, 0, 0),
                             memory_space=_VMEM),
                pl.BlockSpec((1, nk_s, T, d), lambda u: (0, 0, 0, 0),
                             memory_space=_VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, H), lambda u: (0, 0), memory_space=_VMEM),
                pl.BlockSpec((1, nk_s, T, d), lambda u: (0, 0, 0, 0),
                             memory_space=_VMEM),
                pl.BlockSpec((1, nk_s, T, d), lambda u: (0, 0, 0, 0),
                             memory_space=_VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, H), jnp.float32),
                jax.ShapeDtypeStruct((1, nk_s, T, d), kc.dtype),
                jax.ShapeDtypeStruct((1, nk_s, T, d), vc.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((1, H), jnp.float32),
                pltpu.VMEM((1, A_s), jnp.float32),
                pltpu.VMEM((1, qd_s), jnp.float32),
            ],
            interpret=interpret,
        )(pos_a, xin, cos_, sin_, qkvw, qkvs, wow, wos, an, qn, kn, kc, vc)

    def mlp_half(xin, guw, gus, wdw, wds, mn):
        if manual:
            return mlp_half_manual(xin, guw, gus, wdw, wds, mn)
        return pl.pallas_call(
            mlp_kernel,
            grid=(Um,),
            in_specs=[
                pl.BlockSpec((1, H), lambda u: (0, 0), memory_space=_VMEM),
                pl.BlockSpec((1, H, NU), clamp_g, memory_space=_VMEM),
                pl.BlockSpec((1, 1, NU), clamp_g, memory_space=_VMEM),
                pl.BlockSpec((1, KCd, NU), clamp_d, memory_space=_VMEM),
                pl.BlockSpec((1, 1, NU), clamp_d, memory_space=_VMEM),
                pl.BlockSpec((1, H), lambda u: (0, 0), memory_space=_VMEM),
            ],
            out_specs=pl.BlockSpec((1, H), lambda u: (0, 0),
                                   memory_space=_VMEM),
            out_shape=jax.ShapeDtypeStruct((1, H), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((1, H), jnp.float32),
                pltpu.VMEM((1, 2 * I_s), jnp.float32),
            ],
            interpret=interpret,
        )(xin, guw, gus, wdw, wds, mn)

    def shard_body(fw_l, x_l, pos_l, kc_l, vc_l, cos_l, sin_l):
        # local leaves: fw_l.* [1, L, ...] (model shard), caches
        # [L, 1, nk_s, T, d]; x replicated [1, H]
        def sq(a):
            return a[0]

        pos_arr = jnp.reshape(pos_l, (1,)).astype(jnp.int32)

        def layer(carry, xs):
            x_c = carry
            (qkvw, qkvs, wow, wos, guw, gus, wdw, wds,
             an, mn, qn, kn, kc, vc) = xs
            dx, kc_new, vc_new = attn_half(
                pos_arr, x_c.astype(jnp.float32), cos_l, sin_l,
                qkvw, qkvs, wow, wos, an, qn, kn, kc[None], vc[None],
            )
            x_c = x_c + lax.psum(dx, "model")
            dm = mlp_half(x_c.astype(jnp.float32), guw, gus, wdw, wds, mn)
            x_c = x_c + lax.psum(dm, "model")
            return x_c, (kc_new, vc_new)

        xs = (
            sq(fw_l.qkv_u), sq(fw_l.qkv_s), sq(fw_l.wo_u), sq(fw_l.wo_s),
            sq(fw_l.gu_u), sq(fw_l.gu_s), sq(fw_l.wd_u), sq(fw_l.wd_s),
            fw_l.attn_norm, fw_l.mlp_norm, fw_l.q_norm, fw_l.k_norm,
            kc_l[:, 0], vc_l[:, 0],
        )
        x_out, (kc_new, vc_new) = lax.scan(layer, x_l.astype(jnp.float32), xs)
        # ys stacked over L: kernels emit [1, nk_s, T, d] -> [L, 1, nk_s, T, d]
        return x_out, kc_new, vc_new

    spec_fw = FusedTPWeights(
        qkv_u=P("model"), qkv_s=P("model"), wo_u=P("model"), wo_s=P("model"),
        gu_u=P("model"), gu_s=P("model"), wd_u=P("model"), wd_s=P("model"),
        attn_norm=P(), mlp_norm=P(), q_norm=P(), k_norm=P(),
    )
    step = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(spec_fw, P(), P(), P(None, None, "model"),
                  P(None, None, "model"), P(), P()),
        out_specs=(P(), P(None, None, "model"), P(None, None, "model")),
        check_vma=False,
    )
    x_out, kc_out, vc_out = step(fw, x, pos, k_cache, v_cache, cos, sin)
    return x_out, kc_out, vc_out
