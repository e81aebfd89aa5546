"""Fused single-token transformer step as ONE Pallas kernel per step.

Replaces ~20 XLA fusions per layer (docs/KERNEL_PLAN.md) for the S=1 decode
of a GQA layer stack: the activation vector lives in VMEM scratch across the
whole step while int8 weights stream through as uniform [H, 1024] units —
grid (layers, units), sequential on a TPU core, double-buffered by Pallas.

Unit schedule per layer (all matmuls pre-packed into one int8 mega-tensor by
:func:`pack_fused_weights`):

  u in [0, A/1024)              qkv N-blocks     qkv[:, off] = h @ W_u
  u in [A/1024, +qd/H)          wo K-blocks      x += attn[koff] @ W_u
                                (first one runs qk-norm/rope/cache/attention)
  u in [.., +2I/1024)           gate/up N-blocks gu[:, off] = h2 @ W_u
  u in [.., +I/H)               wd K-blocks      x += act[koff] @ W_u
                                (first one applies silu(gate)*up)

Restrictions (asserted): batch 1, S=1, hidden size a multiple of 1024,
q_dim a multiple of H, qkv/gate-up widths multiples of 1024.  Covers the
0.6B (H=1024) and 1.7B (H=2048) talkers and both MTP stacks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
    _SMEM = pltpu.SMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None
    _SMEM = None

from ..config import TransformerConfig
from .quant import QuantizedLinear

N_UNIT = 1024


class FusedStepWeights(NamedTuple):
    """Pre-packed per-layer weights for the fused step kernel.

    int8 (bits=8): units [L, U, H, N_UNIT] int8, scales [L, U, 1, N_UNIT]
        (per-output-column, applied AFTER the full-K dot).
    int4 (bits=4): units [L, U, H/2, N_UNIT] int8 — each byte packs weight
        rows k (low nibble) and k + H/2 (high nibble), ops.quant layout —
        and scales [L, U, G, N_UNIT] with G = H/INT4_GROUP group rows
        (applied per group dot).  The kernels detect int4 from the unit's
        K extent (H/2 instead of H).
    bf16 (bits=16): units [L, U, H, N_UNIT] bf16, scales all-ones — the
        unquantized config's kernel path (2x int8's weight bytes; the
        in-kernel astype and scale multiply become no-op/identity).
    """

    units: jax.Array  # int8 [L, U, H or H/2, N_UNIT]
    scales: jax.Array  # f32 [L, U, 1 or G, N_UNIT]
    attn_norm: jax.Array  # f32 [L, 1, H]
    mlp_norm: jax.Array  # f32 [L, 1, H]
    q_norm: jax.Array  # f32 [L, 1, d]
    k_norm: jax.Array  # f32 [L, 1, d]


def _unit_counts(cfg: TransformerConfig) -> Tuple[int, int, int, int]:
    """Unit counts per group.  Units are uniform [H, N_UNIT] slices:
    N-split groups (qkv, gate/up) tile the output dim; K-split groups
    (wo, wd) tile BOTH the contraction dim (by H) and the output dim
    (by N_UNIT), accumulating into output slices."""
    H = cfg.hidden_size
    n_qkv = (cfg.q_dim + 2 * cfg.kv_dim) // N_UNIT
    n_wo = (cfg.q_dim // H) * (H // N_UNIT)
    n_gu = 2 * cfg.intermediate_size // N_UNIT
    n_wd = (cfg.intermediate_size // H) * (H // N_UNIT)
    return n_qkv, n_wo, n_gu, n_wd


def supports(cfg: TransformerConfig) -> bool:
    H = cfg.hidden_size
    A = cfg.q_dim + 2 * cfg.kv_dim
    return (
        H % N_UNIT == 0
        and A % N_UNIT == 0
        and cfg.q_dim % H == 0
        and (2 * cfg.intermediate_size) % N_UNIT == 0
        and cfg.intermediate_size % H == 0
    )


def pack_fused_weights(
    cfg: TransformerConfig, layer_params: dict, bits: int = 8
) -> FusedStepWeights:
    """Pack (possibly fused/quantized) stacked layer params into unit form.

    bits=8 accepts the inference layout from ops.quant.fuse_params +
    quantize_params (wqkv/wgu as QuantizedLinear) or raw bf16 arrays
    (quantized here).  bits=4 requires RAW arrays: each [L, H, N_UNIT] unit
    slice is int4-quantized on the ops.quant group-128 grid — unit
    boundaries land on group/column boundaries, so the values match a
    whole-tensor quantize_weight_int4 (the XLA fallback) exactly.
    bits=16 keeps RAW weights as bf16 units with unit scales (no
    quantization): the unquantized engine config gets the same kernel
    treatment at 2x the weight bytes (round-3 verdict #6) — the kernels are
    dtype-driven (``units.dtype``), so only the pack differs.
    """
    from .quant import quantize_weight, quantize_weight_int4

    assert supports(cfg), "fused step kernel requires H==1024-aligned dims"
    assert bits in (4, 8, 16)
    H = cfg.hidden_size

    def as_quant(w) -> QuantizedLinear:
        if isinstance(w, QuantizedLinear):
            if bits != 8:
                raise ValueError(
                    f"bits={bits} packing needs raw weights (pack before "
                    "quantize_params in the engine)"
                )
            return w
        if bits == 4:
            return w
        if bits == 16:
            return QuantizedLinear(
                q=w.astype(jnp.bfloat16),
                scale=jnp.ones(w.shape[:-2] + (1, w.shape[-1]), jnp.float32),
            )
        return quantize_weight(w)

    p = layer_params
    wqkv = as_quant(
        p["wqkv"]
        if "wqkv" in p
        else jnp.concatenate([p["wq"], p["wk"], p["wv"]], axis=-1)
    )
    wgu = as_quant(
        p["wgu"] if "wgu" in p else jnp.concatenate([p["wg"], p["wu"]], axis=-1)
    )
    wo = as_quant(p["wo"])
    wd = as_quant(p["wd"])

    L = (wqkv.q if isinstance(wqkv, QuantizedLinear) else wqkv).shape[0]
    units = []
    scales = []

    if bits == 4:
        # raw [L, H, N_UNIT] slices, quantized per unit on the shared grid
        def add_unit(w_slice):
            q4 = quantize_weight_int4(w_slice)
            units.append(q4.q)  # [L, H/2, N_UNIT]
            scales.append(q4.scale)  # [L, G, N_UNIT]

        def n_split(w):
            n = w.shape[-1] // N_UNIT
            for i in range(n):
                add_unit(w[..., i * N_UNIT : (i + 1) * N_UNIT])

        def k_split(w):
            k = w.shape[-2] // H
            n = w.shape[-1] // N_UNIT
            for i in range(k):
                for j in range(n):
                    add_unit(
                        w[:, i * H : (i + 1) * H, j * N_UNIT : (j + 1) * N_UNIT]
                    )

        n_split(wqkv)
        k_split(wo)
        n_split(wgu)
        k_split(wd)
        packed_units = jnp.stack(units, axis=1)  # [L, U, H/2, N_UNIT]
        packed_scales = jnp.stack(scales, axis=1).astype(jnp.float32)
    else:

        def n_split(qw: QuantizedLinear):
            # [L, H, n*N_UNIT] -> n units [L, H, N_UNIT]
            n = qw.q.shape[-1] // N_UNIT
            for i in range(n):
                units.append(qw.q[..., i * N_UNIT : (i + 1) * N_UNIT])
                scales.append(qw.scale[..., i * N_UNIT : (i + 1) * N_UNIT])

        def k_split(qw: QuantizedLinear):
            # [L, k*H, n*N_UNIT] -> k*n units [L, H, N_UNIT] (k-major order);
            # the output scale column-slice repeats for every k chunk
            k = qw.q.shape[-2] // H
            n = qw.q.shape[-1] // N_UNIT
            for i in range(k):
                for j in range(n):
                    units.append(
                        qw.q[:, i * H : (i + 1) * H, j * N_UNIT : (j + 1) * N_UNIT]
                    )
                    scales.append(qw.scale[..., j * N_UNIT : (j + 1) * N_UNIT])

        n_split(wqkv)
        k_split(wo)
        n_split(wgu)
        k_split(wd)
        packed_units = jnp.stack(units, axis=1)  # [L, U, H, N_UNIT]
        packed_scales = jnp.stack(
            [jnp.broadcast_to(s, (L, 1, N_UNIT)) for s in scales], axis=1
        ).astype(jnp.float32)

    return FusedStepWeights(
        units=packed_units,
        scales=packed_scales,
        attn_norm=p["attn_norm"].astype(jnp.float32)[:, None, :],
        mlp_norm=p["mlp_norm"].astype(jnp.float32)[:, None, :],
        q_norm=p["q_norm"].astype(jnp.float32)[:, None, :],
        k_norm=p["k_norm"].astype(jnp.float32)[:, None, :],
    )


def _rms(x, w, eps):
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps) * w


def _rope(x, cos, sin):
    # x [heads, d]; cos/sin [1, d/2]; rotate-half convention
    d = x.shape[-1]
    x1, x2 = x[:, : d // 2], x[:, d // 2 :]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


WINDOW = 512  # K/V slots per streamed attention window (windowed mode)


def _make_matmul(w_ref, s_ref, H: int, w4: bool, n_groups: int):
    """Unit matmul closure: [B, H] f32 -> [B, N_UNIT] f32.

    int8: one [B, H] x [H, N_UNIT] bf16 dot, per-column f32 scale after.
    int4: unpack nibbles (low = rows [0, H/2), high = rows [H/2, H)), then
    one dot per INT4_GROUP-row group with its f32 scale applied post-dot —
    identical semantics to ops.quant._dense4, so fused and XLA paths agree.
    """
    if not w4:
        w_unit = w_ref[0, 0].astype(jnp.bfloat16)  # [H, N_UNIT]
        scale = s_ref[0, 0]  # [1, N_UNIT]

        def matmul(lhs):
            return (
                jax.lax.dot_general(
                    lhs.astype(jnp.bfloat16), w_unit,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )

        return matmul

    K2 = H // 2
    gh = n_groups // 2  # groups per nibble half
    gs = K2 // gh  # rows per group (INT4_GROUP)
    b = w_ref[0, 0].astype(jnp.int32)  # [K2, N_UNIT]
    lo = ((b << 28) >> 28).astype(jnp.bfloat16)  # rows [0, K2)
    hi = (b >> 4).astype(jnp.bfloat16)  # rows [K2, 2*K2)

    def matmul4(lhs):
        l16 = lhs.astype(jnp.bfloat16)
        acc = None
        for g in range(gh):
            r0 = g * gs
            p = jax.lax.dot_general(
                l16[:, r0 : r0 + gs], lo[r0 : r0 + gs],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * s_ref[0, 0, g][None, :]
            q = jax.lax.dot_general(
                l16[:, K2 + r0 : K2 + r0 + gs], hi[r0 : r0 + gs],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * s_ref[0, 0, gh + g][None, :]
            acc = p + q if acc is None else acc + p + q
        return acc

    return matmul4


def _make_kernel(cfg: TransformerConfig, T: int, mode: str = "vmem",
                 w4: bool = False, n_groups: int = 1, kvq: bool = False):
    """mode: "vmem"  — per-layer K/V cache blocks resident in VMEM (T <= 512)
             "hbm"   — cache in HBM, whole [nk, T, d] DMA'd through scratch
             "win"   — cache in HBM, streamed in WINDOW-slot chunks with
                       ONLINE-SOFTMAX accumulation (any T; the VMEM cost is
                       2 double-buffered windows, not the whole context)
    kvq: int8 KV cache — caches are int8 with f32 per-(head, slot) scale
         arrays [L, nk, T] (models/layers.py quantize_kv grid).  Scales apply
         in the SCORE/WEIGHT domain (exact w.r.t. the contraction); the new
         slot quantizes in-register and the diagonal term uses the
         DEQUANTIZED value so the kernel matches the XLA path.  int8 slot
         RMW windows widen to 32 (int8 sublane tile); scale windows are 128
         lanes at 128-aligned offsets.
    """
    H = cfg.hidden_size
    nq, nk, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    g = nq // nk
    qd, kvd = cfg.q_dim, cfg.kv_dim
    I = cfg.intermediate_size
    eps = cfg.rms_norm_eps
    n_qkv, n_wo, n_gu, n_wd = _unit_counts(cfg)
    NW = N_UNIT  # N-split tile width
    U = n_qkv + n_wo + n_gu + n_wd
    b1, b2, b3 = n_qkv, n_qkv + n_wo, n_qkv + n_wo + n_gu  # static boundaries
    hbm_cache = mode in ("hbm", "win")
    SLOT_W = 32 if kvq else 8  # slot RMW window width (int8 sublane tile: 32)

    def kernel(*refs):
        # --- positional unpack (inputs, outputs, scratch — flag-dependent) --
        (pos_ref,  # SMEM [1] int32 — write slot / current position
         x_ref,  # [1, H] f32 — step input
         cos_ref,  # [1, d//2] f32
         sin_ref) = refs[:4]  # [1, d//2] f32
        i = 4
        w_ref, s_ref = refs[i : i + 2]  # [1, 1, H|H/2, N_UNIT] int8, f32
        i += 2
        (an_ref,  # [1, 1, H] f32 attn_norm (layer block)
         mn_ref,  # [1, 1, H] f32 mlp_norm
         qn_ref,  # [1, 1, d] f32 q_norm
         kn_ref,  # [1, 1, d] f32 k_norm
         kc_in,  # VMEM variant: [1, nk, T, d] layer block; HBM variants: full [L, nk, T, d] in ANY
         vc_in) = refs[i : i + 6]
        i += 6
        ks_in = vs_in = None
        if kvq:
            ks_in, vs_in = refs[i : i + 2]  # [1, nk, T] block | [L, nk, T] ANY
            i += 2
        x_out = refs[i]  # [1, H] f32
        kc_out = refs[i + 1]  # VMEM: layer block; HBM: full array aliased
        vc_out = refs[i + 2]
        i += 3
        ks_out = vs_out = None
        if kvq:
            ks_out, vs_out = refs[i : i + 2]
            i += 2
        (x_s,  # scratch [1, H] f32 — residual stream
         h_s,  # scratch [1, H] f32 — normed input to the current matmul group
         qkv_s,  # scratch [1, qd + 2*kvd] f32
         attn_s,  # scratch [1, qd] f32
         gu_s) = refs[i : i + 5]  # scratch [1, 2I] f32
        i += 5
        k_vm = v_vm = slot_k = slot_v = sems = None
        ks_vm = vs_vm = slot_ks = slot_vs = None
        if hbm_cache:
            # "hbm": k_vm [nk, T, d]; "win": [2, nk, WINDOW, d] double-buffered
            k_vm, v_vm, slot_k, slot_v = refs[i : i + 4]
            i += 4
            if kvq:
                # "hbm": ks_vm [nk, T]; "win": [2, nk, WINDOW]; slot_ks [nk, 128]
                ks_vm, vs_vm, slot_ks, slot_vs = refs[i : i + 4]
                i += 4
            sems = refs[i]

        l = pl.program_id(0)
        u = pl.program_id(1)
        # unit schedule, computed from u against the static boundaries.
        # N-split units (qkv, gate/up) write one NW-wide output column slice;
        # K-split units (wo, wd) are k-major x n-minor over [H, N_UNIT] tiles
        # and accumulate into an output slice.
        nn = H // N_UNIT  # n-tiles per K-split row group (1 for H=1024)
        kind = jnp.where(u < b1, 0, jnp.where(u < b2, 1, jnp.where(u < b3, 2, 3)))
        off = jnp.where(u < b1, u * NW, (u - b2) * NW)  # N-split kinds
        i_ks = jnp.where(kind == 1, u - b1, u - b3)  # K-split unit index
        k_off = (i_ks // nn) * H
        n_off = (i_ks % nn) * N_UNIT
        # all offsets are multiples of the tile width; Mosaic needs the proof
        # for lane-aligned dynamic slices
        off = pl.multiple_of(off, NW)
        k_off = pl.multiple_of(k_off, N_UNIT)
        n_off = pl.multiple_of(n_off, N_UNIT)
        pos = pos_ref[0]

        @pl.when(jnp.logical_and(l == 0, u == 0))
        def _init():
            x_s[:] = x_ref[:]

        # the attention unit (u == n_qkv) writes the full cache block (carry +
        # new slot via masked select: Mosaic can't do dynamic sub-tile stores
        # on the sublane axis); other units must leave kc_out untouched

        if mode == "hbm":
            # start streaming this layer's K/V while the qkv matmuls run
            @pl.when(u == 0)
            def _cache_in():
                pltpu.make_async_copy(kc_in.at[l], k_vm, sems.at[0]).start()
                pltpu.make_async_copy(vc_in.at[l], v_vm, sems.at[1]).start()
                if kvq:
                    pltpu.make_async_copy(ks_in.at[l], ks_vm, sems.at[4]).start()
                    pltpu.make_async_copy(vs_in.at[l], vs_vm, sems.at[5]).start()

        if mode == "win":
            # start the RMW slot window + the first K/V attention window while
            # the qkv matmuls run
            @pl.when(u == 0)
            def _win_prefetch():
                pos_ = pos_ref[0]
                w0 = pl.multiple_of((pos_ // SLOT_W) * SLOT_W, SLOT_W)
                pltpu.make_async_copy(
                    kc_in.at[l, :, pl.ds(w0, SLOT_W), :], slot_k, sems.at[4]
                ).start()
                pltpu.make_async_copy(
                    vc_in.at[l, :, pl.ds(w0, SLOT_W), :], slot_v, sems.at[5]
                ).start()
                if kvq:
                    w0s = pl.multiple_of((pos_ // 128) * 128, 128)
                    pltpu.make_async_copy(
                        ks_in.at[l, :, pl.ds(w0s, 128)], slot_ks, sems.at[12]
                    ).start()
                    pltpu.make_async_copy(
                        vs_in.at[l, :, pl.ds(w0s, 128)], slot_vs, sems.at[13]
                    ).start()

                @pl.when(pos_ > 0)
                def _():
                    pltpu.make_async_copy(
                        kc_in.at[l, :, pl.ds(0, WINDOW), :], k_vm.at[0],
                        sems.at[0],
                    ).start()
                    pltpu.make_async_copy(
                        vc_in.at[l, :, pl.ds(0, WINDOW), :], v_vm.at[0],
                        sems.at[2],
                    ).start()
                    if kvq:
                        pltpu.make_async_copy(
                            ks_in.at[l, :, pl.ds(0, WINDOW)], ks_vm.at[0],
                            sems.at[8],
                        ).start()
                        pltpu.make_async_copy(
                            vs_in.at[l, :, pl.ds(0, WINDOW)], vs_vm.at[0],
                            sems.at[10],
                        ).start()

        @pl.when(u == 0)
        def _norm_attn():
            h_s[:] = _rms(x_s[:], an_ref[0], eps)

        @pl.when(u == n_qkv)  # first wo unit: run attention once
        def _attention():
            qkv = qkv_s[:]  # [1, qd+2kvd]
            cos = cos_ref[:]
            sin = sin_ref[:]
            q = qkv[0, :qd].reshape(nq, d)
            k = qkv[0, qd : qd + kvd].reshape(nk, d)
            v = qkv[0, qd + kvd :].reshape(nk, d)
            q = _rms(q, qn_ref[0, 0], eps)
            k = _rms(k, kn_ref[0, 0], eps)
            q = _rope(q, cos, sin)
            k = _rope(k, cos, sin)
            if kvq:
                # quantize the new slot in-register on the quantize_kv grid;
                # k/v below become the DEQUANTIZED values (diagonal term and
                # cache write read the same numbers the XLA path would)
                k_sc = jnp.maximum(
                    jnp.max(jnp.abs(k), axis=-1, keepdims=True) / 127.0, 1e-8
                )  # [nk, 1]
                v_sc = jnp.maximum(
                    jnp.max(jnp.abs(v), axis=-1, keepdims=True) / 127.0, 1e-8
                )
                k_qr = jnp.clip(jnp.round(k / k_sc), -127, 127)
                v_qr = jnp.clip(jnp.round(v / v_sc), -127, 127)
                k = k_qr * k_sc
                v = v_qr * v_sc
                k_store = k_qr  # integer-valued f32; .astype(int8) at write
                v_store = v_qr
            else:
                k_store, v_store = k, v
            if mode == "win":
                # --- streamed attention: online softmax over WINDOW chunks.
                # Slots [0, pos) stream from the HBM cache (double-buffered
                # DMA); the new slot's contribution comes straight from
                # registers, so the cache write-back below never races the
                # streamed reads (it only rewrites values < pos unchanged).
                w0 = pl.multiple_of((pos // SLOT_W) * SLOT_W, SLOT_W)
                pltpu.make_async_copy(
                    kc_in.at[l, :, pl.ds(w0, SLOT_W), :], slot_k, sems.at[4]
                ).wait()
                pltpu.make_async_copy(
                    vc_in.at[l, :, pl.ds(w0, SLOT_W), :], slot_v, sems.at[5]
                ).wait()
                wslot = (
                    jax.lax.broadcasted_iota(jnp.int32, (nk, SLOT_W, d), 1) + w0
                )
                slot_k[:] = jnp.where(
                    wslot == pos, k_store[:, None, :].astype(slot_k.dtype),
                    slot_k[:],
                )
                slot_v[:] = jnp.where(
                    wslot == pos, v_store[:, None, :].astype(slot_v.dtype),
                    slot_v[:],
                )
                kout = pltpu.make_async_copy(
                    slot_k, kc_out.at[l, :, pl.ds(w0, SLOT_W), :], sems.at[6]
                )
                vout = pltpu.make_async_copy(
                    slot_v, vc_out.at[l, :, pl.ds(w0, SLOT_W), :], sems.at[7]
                )
                kout.start()
                vout.start()
                souts = []
                if kvq:
                    w0s = pl.multiple_of((pos // 128) * 128, 128)
                    pltpu.make_async_copy(
                        ks_in.at[l, :, pl.ds(w0s, 128)], slot_ks, sems.at[12]
                    ).wait()
                    pltpu.make_async_copy(
                        vs_in.at[l, :, pl.ds(w0s, 128)], slot_vs, sems.at[13]
                    ).wait()
                    sslot = (
                        jax.lax.broadcasted_iota(jnp.int32, (nk, 128), 1) + w0s
                    )
                    slot_ks[:] = jnp.where(sslot == pos, k_sc, slot_ks[:])
                    slot_vs[:] = jnp.where(sslot == pos, v_sc, slot_vs[:])
                    kso = pltpu.make_async_copy(
                        slot_ks, ks_out.at[l, :, pl.ds(w0s, 128)], sems.at[14]
                    )
                    vso = pltpu.make_async_copy(
                        slot_vs, vs_out.at[l, :, pl.ds(w0s, 128)], sems.at[15]
                    )
                    kso.start()
                    vso.start()
                    souts = [kso, vso]

                qg = q.reshape(nk, g, d)
                inv_sqrt_d = 1.0 / (d**0.5)
                n_win = pl.cdiv(pos, WINDOW)  # windows covering [0, pos)

                def win_body(i, carry):
                    m, s, acc = carry
                    buf = jax.lax.rem(i, 2)
                    nxt = jax.lax.rem(i + 1, 2)
                    off_next = pl.multiple_of((i + 1) * WINDOW, WINDOW)

                    @pl.when(i + 1 < n_win)
                    def _():
                        pltpu.make_async_copy(
                            kc_in.at[l, :, pl.ds(off_next, WINDOW), :],
                            k_vm.at[nxt], sems.at[nxt],
                        ).start()
                        pltpu.make_async_copy(
                            vc_in.at[l, :, pl.ds(off_next, WINDOW), :],
                            v_vm.at[nxt], sems.at[2 + nxt],
                        ).start()
                        if kvq:
                            pltpu.make_async_copy(
                                ks_in.at[l, :, pl.ds(off_next, WINDOW)],
                                ks_vm.at[nxt], sems.at[8 + nxt],
                            ).start()
                            pltpu.make_async_copy(
                                vs_in.at[l, :, pl.ds(off_next, WINDOW)],
                                vs_vm.at[nxt], sems.at[10 + nxt],
                            ).start()

                    off_i = pl.multiple_of(i * WINDOW, WINDOW)
                    pltpu.make_async_copy(
                        kc_in.at[l, :, pl.ds(off_i, WINDOW), :], k_vm.at[buf],
                        sems.at[buf],
                    ).wait()
                    pltpu.make_async_copy(
                        vc_in.at[l, :, pl.ds(off_i, WINDOW), :], v_vm.at[buf],
                        sems.at[2 + buf],
                    ).wait()
                    K_w = k_vm[buf].astype(jnp.float32)  # [nk, W, d]
                    V_w = v_vm[buf].astype(jnp.float32)
                    sc = jax.lax.dot_general(
                        qg, K_w, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    ) * inv_sqrt_d  # [nk, g, W]
                    if kvq:
                        pltpu.make_async_copy(
                            ks_in.at[l, :, pl.ds(off_i, WINDOW)], ks_vm.at[buf],
                            sems.at[8 + buf],
                        ).wait()
                        pltpu.make_async_copy(
                            vs_in.at[l, :, pl.ds(off_i, WINDOW)], vs_vm.at[buf],
                            sems.at[10 + buf],
                        ).wait()
                        sc = sc * ks_vm[buf][:, None, :]
                    gslot = (
                        jax.lax.broadcasted_iota(jnp.int32, (nk, g, WINDOW), 2)
                        + i * WINDOW
                    )
                    sc = jnp.where(gslot < pos, sc, -1e30)
                    m_new = jnp.maximum(m, jnp.max(sc, axis=-1, keepdims=True))
                    alpha = jnp.exp(m - m_new)
                    e = jnp.exp(sc - m_new)
                    s_new = s * alpha + jnp.sum(e, axis=-1, keepdims=True)
                    ew = e * vs_vm[buf][:, None, :] if kvq else e
                    acc_new = acc * alpha + jax.lax.dot_general(
                        ew, V_w, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )
                    return m_new, s_new, acc_new

                m0 = jnp.full((nk, g, 1), -1e30, jnp.float32)
                s0 = jnp.zeros((nk, g, 1), jnp.float32)
                a0 = jnp.zeros((nk, g, d), jnp.float32)
                m, s, acc = jax.lax.fori_loop(0, n_win, win_body, (m0, s0, a0))

                # diagonal term: the new slot (k, v of THIS step, registers)
                sc_d = (
                    jnp.sum(qg * k[:, None, :], axis=-1, keepdims=True)
                    * inv_sqrt_d
                )  # [nk, g, 1]
                m2 = jnp.maximum(m, sc_d)
                alpha = jnp.exp(m - m2)
                e_d = jnp.exp(sc_d - m2)
                s = s * alpha + e_d
                acc = acc * alpha + e_d * v[:, None, :]
                attn_s[:] = (acc / s).reshape(1, qd)
                kout.wait()
                vout.wait()
                for so in souts:
                    so.wait()
                return
            if hbm_cache:
                # K/V live in VMEM scratch (DMA'd at u == 0); place the new
                # slot via an aligned read-modify-write window, then DMA
                # only that window back to the HBM cache (aliased in-place)
                pltpu.make_async_copy(kc_in.at[l], k_vm, sems.at[0]).wait()
                pltpu.make_async_copy(vc_in.at[l], v_vm, sems.at[1]).wait()
                w0 = pl.multiple_of((pos // SLOT_W) * SLOT_W, SLOT_W)
                wslot = (
                    jax.lax.broadcasted_iota(jnp.int32, (nk, SLOT_W, d), 1) + w0
                )
                k_win = jnp.where(
                    wslot == pos, k_store[:, None, :].astype(k_vm.dtype),
                    k_vm[:, pl.ds(w0, SLOT_W), :],
                )
                v_win = jnp.where(
                    wslot == pos, v_store[:, None, :].astype(v_vm.dtype),
                    v_vm[:, pl.ds(w0, SLOT_W), :],
                )
                k_vm[:, pl.ds(w0, SLOT_W), :] = k_win
                v_vm[:, pl.ds(w0, SLOT_W), :] = v_win
                kout = pltpu.make_async_copy(
                    k_vm.at[:, pl.ds(w0, SLOT_W), :],
                    kc_out.at[l, :, pl.ds(w0, SLOT_W), :],
                    sems.at[2],
                )
                vout = pltpu.make_async_copy(
                    v_vm.at[:, pl.ds(w0, SLOT_W), :],
                    vc_out.at[l, :, pl.ds(w0, SLOT_W), :],
                    sems.at[3],
                )
                kout.start()
                vout.start()
                K = k_vm[:].astype(jnp.float32)  # [nk, T, d]
                V = v_vm[:].astype(jnp.float32)
                if kvq:
                    pltpu.make_async_copy(ks_in.at[l], ks_vm, sems.at[4]).wait()
                    pltpu.make_async_copy(vs_in.at[l], vs_vm, sems.at[5]).wait()
                    sslot = jax.lax.broadcasted_iota(jnp.int32, (nk, T), 1)
                    ks_vm[:] = jnp.where(sslot == pos, k_sc, ks_vm[:])
                    vs_vm[:] = jnp.where(sslot == pos, v_sc, vs_vm[:])
                    w0s = pl.multiple_of((pos // 128) * 128, 128)
                    kso = pltpu.make_async_copy(
                        ks_vm.at[:, pl.ds(w0s, 128)],
                        ks_out.at[l, :, pl.ds(w0s, 128)], sems.at[6],
                    )
                    vso = pltpu.make_async_copy(
                        vs_vm.at[:, pl.ds(w0s, 128)],
                        vs_out.at[l, :, pl.ds(w0s, 128)], sems.at[7],
                    )
                    kso.start()
                    vso.start()
                    ks_row = ks_vm[:]  # [nk, T] — includes the new slot
                    vs_row = vs_vm[:]
                    kso.wait()
                    vso.wait()
                kout.wait()
                vout.wait()
            else:
                # cache write at pos as a masked full-block select
                slot = jax.lax.broadcasted_iota(jnp.int32, (1, nk, T, d), 2)
                K_new = jnp.where(
                    slot == pos,
                    k_store[None, :, None, :].astype(kc_in.dtype), kc_in[:],
                )
                V_new = jnp.where(
                    slot == pos,
                    v_store[None, :, None, :].astype(vc_in.dtype), vc_in[:],
                )
                kc_out[:] = K_new
                vc_out[:] = V_new
                K = K_new[0].astype(jnp.float32)  # [nk, T, d]
                V = V_new[0].astype(jnp.float32)
                if kvq:
                    sslot = jax.lax.broadcasted_iota(jnp.int32, (1, nk, T), 2)
                    ks_row = jnp.where(sslot == pos, k_sc[None], ks_in[:])
                    vs_row = jnp.where(sslot == pos, v_sc[None], vs_in[:])
                    ks_out[:] = ks_row
                    vs_out[:] = vs_row
                    ks_row = ks_row[0]  # [nk, T]
                    vs_row = vs_row[0]
            qg = q.reshape(nk, g, d)
            scores = jax.lax.dot_general(
                qg, K, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [nk, g, T]
            scores = scores * (1.0 / (d**0.5))
            if kvq:
                scores = scores * ks_row[:, None, :]
            slot = jax.lax.broadcasted_iota(jnp.int32, (nk, g, T), 2)
            scores = jnp.where(slot <= pos, scores, -1e30)
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            w = e / jnp.sum(e, axis=-1, keepdims=True)
            if kvq:
                w = w * vs_row[:, None, :]
            out = jax.lax.dot_general(
                w, V, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [nk, g, d]
            attn_s[:] = out.reshape(1, qd)

        @pl.when(u == n_qkv + n_wo)  # first gate/up unit: norm the residual
        def _norm_mlp():
            h_s[:] = _rms(x_s[:], mn_ref[0], eps)

        @pl.when(u == n_qkv + n_wo + n_gu)  # first wd unit: activation
        def _activation():
            gu = gu_s[:]
            gate = gu[:, :I]
            up = gu[:, I:]
            gu_s[:, :I] = gate * (1.0 / (1.0 + jnp.exp(-gate))) * up

        matmul_n = matmul_k = _make_matmul(w_ref, s_ref, H, w4, n_groups)

        @pl.when(kind == 0)  # qkv N-block
        def _qkv():
            qkv_s[:, pl.ds(off, NW)] = matmul_n(h_s[:])

        @pl.when(kind == 1)  # wo [H, N_UNIT] tile: x[noff] += attn[koff] @ W
        def _wo():
            x_s[:, pl.ds(n_off, N_UNIT)] = x_s[:, pl.ds(n_off, N_UNIT)] + matmul_k(
                attn_s[:, pl.ds(k_off, H)]
            )

        @pl.when(kind == 2)  # gate/up N-block
        def _gu():
            gu_s[:, pl.ds(off, NW)] = matmul_n(h_s[:])

        @pl.when(kind == 3)  # wd [H, N_UNIT] tile: x[noff] += act[koff] @ W
        def _wd():
            x_s[:, pl.ds(n_off, N_UNIT)] = x_s[:, pl.ds(n_off, N_UNIT)] + matmul_k(
                gu_s[:, pl.ds(k_off, H)]
            )

        # final-norm is applied OUTSIDE (caller), matching transformer_forward
        x_out[:] = x_s[:]

    return kernel, U


def _matmul_unit(w_unit, scale, w4: bool, n_groups: int):
    """Unit matmul from ARRAYS (manual-DMA kernel): [B, H] f32 -> [B, N].

    Same math as _make_matmul, but the int8 unit arrives as a value read
    from the double-buffered VMEM scratch instead of a pipelined ref."""
    if not w4:
        w16 = w_unit.astype(jnp.bfloat16)  # [H, N_UNIT]

        def matmul(lhs):
            # scale is [1, N_UNIT] (per-output-column), broadcasting over B
            return (
                jax.lax.dot_general(
                    lhs.astype(jnp.bfloat16), w16,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )

        return matmul

    K2 = w_unit.shape[0]
    gh = n_groups // 2
    gs = K2 // gh
    b = w_unit.astype(jnp.int32)
    lo = ((b << 28) >> 28).astype(jnp.bfloat16)
    hi = (b >> 4).astype(jnp.bfloat16)

    def matmul4(lhs):
        l16 = lhs.astype(jnp.bfloat16)
        acc = None
        for gi in range(gh):
            r0 = gi * gs
            p = jax.lax.dot_general(
                l16[:, r0 : r0 + gs], lo[r0 : r0 + gs],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale[gi][None, :]
            q = jax.lax.dot_general(
                l16[:, K2 + r0 : K2 + r0 + gs], hi[r0 : r0 + gs],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale[gh + gi][None, :]
            acc = p + q if acc is None else acc + p + q
        return acc

    return matmul4


def _make_kernel_manual(cfg: TransformerConfig, T: int, w4: bool = False,
                        n_groups: int = 1, kvq: bool = False,
                        ring: int = 2, mode: str = "vmem"):
    """MANUAL double-buffered weight streaming (round-3 verdict #5).

    The auto kernel's grid is (L, U): every weight unit is one Mosaic grid
    step, and the round-3 attribution measured ~1.2 us of per-grid-step
    overhead — ~0.5 ms/frame on the 0.6B talker (28 x 15 steps), the gap
    between 1.40 ms measured and the 0.53 ms DMA floor.  Here the grid is
    (L,): the unit loop is UNROLLED inside the kernel and the int8 units
    stream HBM->VMEM through an explicitly double-buffered ``ring``-slot
    scratch with DMA semaphores — the DMA for unit g+ring-1 issues before
    the wait for unit g, so up to ring-1 transfers overlap the unit-g
    matmul.  ring=2 is the classic double buffer; deeper rings keep more
    DMAs outstanding (QTTS_FUSED_RING — transport-only, bit-identical
    results).  Unit offsets and phase boundaries are STATIC (the auto
    kernel recomputes them from program_id with jnp.where chains every
    step).

    VMEM-cache mode only (T <= 512 — the headline decode shape); the hbm/
    win long-form modes keep the auto kernel.  Layer-block inputs (norms,
    scales, K/V cache) still ride the Pallas pipeline — at L grid steps
    their per-step overhead is negligible and the pipeline prefetches layer
    l+1's cache during layer l's compute."""
    run_layer, U = _manual_layer_core(cfg, T, w4=w4, n_groups=n_groups,
                                      kvq=kvq, ring=ring, mode=mode)

    def kernel(*refs):
        (pos_ref,  # SMEM [1] int32
         x_ref,  # [1, H] f32
         cos_ref,  # [1, d//2] f32
         sin_ref,  # [1, d//2] f32
         w_hbm,  # ANY [L, U, KU, N_UNIT] int8 — manually streamed
         s_ref,  # VMEM layer block [1, U, n_groups, N_UNIT] f32
         an_ref, mn_ref,  # [1, 1, H] f32
         qn_ref, kn_ref) = refs[:10]  # [1, 1, d] f32
        i = 10
        kc_in, vc_in = refs[i : i + 2]  # vmem: layer blocks; win: ANY full
        i += 2
        ks_in = vs_in = None
        if kvq:
            ks_in, vs_in = refs[i : i + 2]  # [1, nk, T] blocks | ANY full
            i += 2
        x_out = refs[i]
        kc_out, vc_out = refs[i + 1 : i + 3]
        i += 3
        ks_out = vs_out = None
        if kvq:
            ks_out, vs_out = refs[i : i + 2]
            i += 2
        (x_s, h_s, qkv_s, attn_s, gu_s, w_vm) = refs[i : i + 6]
        sems = refs[i + 6]
        i += 7
        win = None
        if mode == "win":
            n_w = 8 if kvq else 4
            win = tuple(refs[i : i + n_w])
            if not kvq:
                win = win + (None, None, None, None)
            win = win + (refs[i + n_w],)  # csems

        l = pl.program_id(0)
        L = pl.num_programs(0)

        @pl.when(l == 0)
        def _init():
            x_s[:] = x_ref[:]
            for gi in range(ring - 1):
                pltpu.make_async_copy(
                    w_hbm.at[0, gi], w_vm.at[gi], sems.at[gi]
                ).start()

        run_layer(
            l, L, pos_ref[0], cos_ref[:], sin_ref[:], w_hbm, s_ref,
            an_ref, mn_ref, qn_ref, kn_ref, kc_in, vc_in, ks_in, vs_in,
            kc_out, vc_out, ks_out, vs_out,
            x_s, h_s, qkv_s, attn_s, gu_s, w_vm, sems, win=win,
        )
        x_out[:] = x_s[:]

    return kernel, U


def _manual_layer_core(cfg: TransformerConfig, T: int, w4: bool = False,
                       n_groups: int = 1, kvq: bool = False, ring: int = 2,
                       mode: str = "vmem"):
    """The per-layer body of the manual-DMA unit schedule (see
    _make_kernel_manual), extracted so the whole-frame kernel
    (ops/fused_frame.py) can run the SAME op sequence per talker layer
    inside its own grid.  ``run_layer`` reads/writes the caller's refs:
    x_s carries the residual stream across layers; w_vm is the ring-slot
    unit scratch whose (l*U+u) mod-ring protocol requires units
    (0, 0..ring-2)'s DMAs to be started by the caller's l==0 init.

    mode="vmem": per-layer cache blocks ride the caller's Pallas pipeline
    (T <= 512).  mode="win": caches stay in HBM/ANY and attention streams
    WINDOW-slot chunks through ``win``-supplied double-buffered scratch
    with online softmax — the manual-schedule counterpart of the auto
    kernel's long-form path (same math, grid (L,) instead of (L, U))."""
    H = cfg.hidden_size
    nq, nk, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    g = nq // nk
    qd, kvd = cfg.q_dim, cfg.kv_dim
    I = cfg.intermediate_size
    eps = cfg.rms_norm_eps
    n_qkv, n_wo, n_gu, n_wd = _unit_counts(cfg)
    U = n_qkv + n_wo + n_gu + n_wd
    b2, b3 = n_qkv + n_wo, n_qkv + n_wo + n_gu
    nn = H // N_UNIT
    SLOT_W = 32 if kvq else 8
    assert 2 <= ring <= U + 1, f"ring {ring} outside [2, U+1={U + 1}]"
    assert mode in ("vmem", "win")

    def run_layer(l, L, pos, cos, sin, w_hbm, s_ref, an_ref, mn_ref,
                  qn_ref, kn_ref, kc_in, vc_in, ks_in, vs_in,
                  kc_out, vc_out, ks_out, vs_out,
                  x_s, h_s, qkv_s, attn_s, gu_s, w_vm, sems, win=None):
        def dma_unit(li, ui, sl):
            return pltpu.make_async_copy(
                w_hbm.at[li, ui], w_vm.at[sl], sems.at[sl]
            )

        if mode == "win":
            (k_vm, v_vm, slot_k, slot_v, ks_vm, vs_vm, slot_ks, slot_vs,
             csems) = win
            # start the RMW slot window + the first attention window NOW —
            # they stream while the qkv units run (the auto kernel issues
            # these at its u == 0 grid step)
            w0 = pl.multiple_of((pos // SLOT_W) * SLOT_W, SLOT_W)
            pltpu.make_async_copy(
                kc_in.at[l, :, pl.ds(w0, SLOT_W), :], slot_k, csems.at[4]
            ).start()
            pltpu.make_async_copy(
                vc_in.at[l, :, pl.ds(w0, SLOT_W), :], slot_v, csems.at[5]
            ).start()
            if kvq:
                w0s = pl.multiple_of((pos // 128) * 128, 128)
                pltpu.make_async_copy(
                    ks_in.at[l, :, pl.ds(w0s, 128)], slot_ks, csems.at[12]
                ).start()
                pltpu.make_async_copy(
                    vs_in.at[l, :, pl.ds(w0s, 128)], slot_vs, csems.at[13]
                ).start()

            @pl.when(pos > 0)
            def _first_window():
                pltpu.make_async_copy(
                    kc_in.at[l, :, pl.ds(0, WINDOW), :], k_vm.at[0],
                    csems.at[0],
                ).start()
                pltpu.make_async_copy(
                    vc_in.at[l, :, pl.ds(0, WINDOW), :], v_vm.at[0],
                    csems.at[2],
                ).start()
                if kvq:
                    pltpu.make_async_copy(
                        ks_in.at[l, :, pl.ds(0, WINDOW)], ks_vm.at[0],
                        csems.at[8],
                    ).start()
                    pltpu.make_async_copy(
                        vs_in.at[l, :, pl.ds(0, WINDOW)], vs_vm.at[0],
                        csems.at[10],
                    ).start()

        def attention():
            qkv = qkv_s[:]
            q = qkv[0, :qd].reshape(nq, d)
            k = qkv[0, qd : qd + kvd].reshape(nk, d)
            v = qkv[0, qd + kvd :].reshape(nk, d)
            q = _rms(q, qn_ref[0, 0], eps)
            k = _rms(k, kn_ref[0, 0], eps)
            q = _rope(q, cos, sin)
            k = _rope(k, cos, sin)
            if kvq:
                k_sc = jnp.maximum(
                    jnp.max(jnp.abs(k), axis=-1, keepdims=True) / 127.0, 1e-8
                )
                v_sc = jnp.maximum(
                    jnp.max(jnp.abs(v), axis=-1, keepdims=True) / 127.0, 1e-8
                )
                k_qr = jnp.clip(jnp.round(k / k_sc), -127, 127)
                v_qr = jnp.clip(jnp.round(v / v_sc), -127, 127)
                k = k_qr * k_sc
                v = v_qr * v_sc
                k_store, v_store = k_qr, v_qr
            else:
                k_store, v_store = k, v

            if mode == "win":
                _attention_win(l, pos, q, k, v, k_store, v_store,
                               k_sc if kvq else None, v_sc if kvq else None)
                return
            slot = jax.lax.broadcasted_iota(jnp.int32, (1, nk, T, d), 2)
            K_new = jnp.where(
                slot == pos,
                k_store[None, :, None, :].astype(kc_in.dtype), kc_in[:],
            )
            V_new = jnp.where(
                slot == pos,
                v_store[None, :, None, :].astype(vc_in.dtype), vc_in[:],
            )
            kc_out[:] = K_new
            vc_out[:] = V_new
            K = K_new[0].astype(jnp.float32)
            V = V_new[0].astype(jnp.float32)
            if kvq:
                sslot = jax.lax.broadcasted_iota(jnp.int32, (1, nk, T), 2)
                ks_row = jnp.where(sslot == pos, k_sc[None], ks_in[:])
                vs_row = jnp.where(sslot == pos, v_sc[None], vs_in[:])
                ks_out[:] = ks_row
                vs_out[:] = vs_row
                ks_row = ks_row[0]
                vs_row = vs_row[0]
            qg = q.reshape(nk, g, d)
            scores = jax.lax.dot_general(
                qg, K, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * (1.0 / (d**0.5))
            if kvq:
                scores = scores * ks_row[:, None, :]
            sl_i = jax.lax.broadcasted_iota(jnp.int32, (nk, g, T), 2)
            scores = jnp.where(sl_i <= pos, scores, -1e30)
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            w = e / jnp.sum(e, axis=-1, keepdims=True)
            if kvq:
                w = w * vs_row[:, None, :]
            out = jax.lax.dot_general(
                w, V, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            attn_s[:] = out.reshape(1, qd)

        def _attention_win(l, pos, q, k, v, k_store, v_store, k_sc, v_sc):
            """Streamed attention over [0, pos) + register diagonal — the
            auto win kernel's math verbatim (online softmax, WINDOW-chunk
            double buffering, RMW slot write-back)."""
            (k_vm, v_vm, slot_k, slot_v, ks_vm, vs_vm, slot_ks, slot_vs,
             csems) = win
            w0 = pl.multiple_of((pos // SLOT_W) * SLOT_W, SLOT_W)
            pltpu.make_async_copy(
                kc_in.at[l, :, pl.ds(w0, SLOT_W), :], slot_k, csems.at[4]
            ).wait()
            pltpu.make_async_copy(
                vc_in.at[l, :, pl.ds(w0, SLOT_W), :], slot_v, csems.at[5]
            ).wait()
            wslot = (
                jax.lax.broadcasted_iota(jnp.int32, (nk, SLOT_W, d), 1) + w0
            )
            slot_k[:] = jnp.where(
                wslot == pos, k_store[:, None, :].astype(slot_k.dtype),
                slot_k[:],
            )
            slot_v[:] = jnp.where(
                wslot == pos, v_store[:, None, :].astype(slot_v.dtype),
                slot_v[:],
            )
            kout = pltpu.make_async_copy(
                slot_k, kc_out.at[l, :, pl.ds(w0, SLOT_W), :], csems.at[6]
            )
            vout = pltpu.make_async_copy(
                slot_v, vc_out.at[l, :, pl.ds(w0, SLOT_W), :], csems.at[7]
            )
            kout.start()
            vout.start()
            souts = []
            if kvq:
                w0s = pl.multiple_of((pos // 128) * 128, 128)
                pltpu.make_async_copy(
                    ks_in.at[l, :, pl.ds(w0s, 128)], slot_ks, csems.at[12]
                ).wait()
                pltpu.make_async_copy(
                    vs_in.at[l, :, pl.ds(w0s, 128)], slot_vs, csems.at[13]
                ).wait()
                sslot = (
                    jax.lax.broadcasted_iota(jnp.int32, (nk, 128), 1) + w0s
                )
                slot_ks[:] = jnp.where(sslot == pos, k_sc, slot_ks[:])
                slot_vs[:] = jnp.where(sslot == pos, v_sc, slot_vs[:])
                kso = pltpu.make_async_copy(
                    slot_ks, ks_out.at[l, :, pl.ds(w0s, 128)], csems.at[14]
                )
                vso = pltpu.make_async_copy(
                    slot_vs, vs_out.at[l, :, pl.ds(w0s, 128)], csems.at[15]
                )
                kso.start()
                vso.start()
                souts = [kso, vso]

            qg = q.reshape(nk, g, d)
            inv_sqrt_d = 1.0 / (d**0.5)
            n_win = pl.cdiv(pos, WINDOW)

            def win_body(i, carry):
                m, s, acc = carry
                buf = jax.lax.rem(i, 2)
                nxt = jax.lax.rem(i + 1, 2)
                off_next = pl.multiple_of((i + 1) * WINDOW, WINDOW)

                @pl.when(i + 1 < n_win)
                def _():
                    pltpu.make_async_copy(
                        kc_in.at[l, :, pl.ds(off_next, WINDOW), :],
                        k_vm.at[nxt], csems.at[nxt],
                    ).start()
                    pltpu.make_async_copy(
                        vc_in.at[l, :, pl.ds(off_next, WINDOW), :],
                        v_vm.at[nxt], csems.at[2 + nxt],
                    ).start()
                    if kvq:
                        pltpu.make_async_copy(
                            ks_in.at[l, :, pl.ds(off_next, WINDOW)],
                            ks_vm.at[nxt], csems.at[8 + nxt],
                        ).start()
                        pltpu.make_async_copy(
                            vs_in.at[l, :, pl.ds(off_next, WINDOW)],
                            vs_vm.at[nxt], csems.at[10 + nxt],
                        ).start()

                off_i = pl.multiple_of(i * WINDOW, WINDOW)
                pltpu.make_async_copy(
                    kc_in.at[l, :, pl.ds(off_i, WINDOW), :], k_vm.at[buf],
                    csems.at[buf],
                ).wait()
                pltpu.make_async_copy(
                    vc_in.at[l, :, pl.ds(off_i, WINDOW), :], v_vm.at[buf],
                    csems.at[2 + buf],
                ).wait()
                K_w = k_vm[buf].astype(jnp.float32)
                V_w = v_vm[buf].astype(jnp.float32)
                sc = jax.lax.dot_general(
                    qg, K_w, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * inv_sqrt_d
                if kvq:
                    pltpu.make_async_copy(
                        ks_in.at[l, :, pl.ds(off_i, WINDOW)], ks_vm.at[buf],
                        csems.at[8 + buf],
                    ).wait()
                    pltpu.make_async_copy(
                        vs_in.at[l, :, pl.ds(off_i, WINDOW)], vs_vm.at[buf],
                        csems.at[10 + buf],
                    ).wait()
                    sc = sc * ks_vm[buf][:, None, :]
                gslot = (
                    jax.lax.broadcasted_iota(jnp.int32, (nk, g, WINDOW), 2)
                    + i * WINDOW
                )
                sc = jnp.where(gslot < pos, sc, -1e30)
                m_new = jnp.maximum(m, jnp.max(sc, axis=-1, keepdims=True))
                alpha = jnp.exp(m - m_new)
                e = jnp.exp(sc - m_new)
                s_new = s * alpha + jnp.sum(e, axis=-1, keepdims=True)
                ew = e * vs_vm[buf][:, None, :] if kvq else e
                acc_new = acc * alpha + jax.lax.dot_general(
                    ew, V_w, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                return m_new, s_new, acc_new

            m0 = jnp.full((nk, g, 1), -1e30, jnp.float32)
            s0 = jnp.zeros((nk, g, 1), jnp.float32)
            a0 = jnp.zeros((nk, g, d), jnp.float32)
            m, s, acc = jax.lax.fori_loop(0, n_win, win_body, (m0, s0, a0))

            # diagonal term: the new slot (this step's k, v from registers)
            sc_d = (
                jnp.sum(qg * k[:, None, :], axis=-1, keepdims=True)
                * inv_sqrt_d
            )
            m2 = jnp.maximum(m, sc_d)
            alpha = jnp.exp(m - m2)
            e_d = jnp.exp(sc_d - m2)
            s = s * alpha + e_d
            acc = acc * alpha + e_d * v[:, None, :]
            attn_s[:] = (acc / s).reshape(1, qd)
            kout.wait()
            vout.wait()
            for so in souts:
                so.wait()

        for u in range(U):
            sl = jax.lax.rem(l * U + u, ring)
            # issue unit g+ring-1's DMA before waiting on unit g: up to
            # ring-1 transfers stay outstanding behind this unit's matmul
            # (ring=2 is the classic double buffer)
            pre = u + ring - 1
            li, ui = divmod(pre, U)
            nsl = jax.lax.rem(l * U + pre, ring)
            if li == 0:
                dma_unit(l, ui, nsl).start()
            else:
                @pl.when(l + li < L)
                def _prefetch_next_layer(li=li, ui=ui, nsl=nsl):
                    dma_unit(l + li, ui, nsl).start()
            dma_unit(l, u, sl).wait()

            # static phase boundaries (the auto kernel re-derives these from
            # program_id every grid step)
            if u == 0:
                h_s[:] = _rms(x_s[:], an_ref[0], eps)
            if u == n_qkv:
                attention()
            if u == b2:
                h_s[:] = _rms(x_s[:], mn_ref[0], eps)
            if u == b3:
                gu = gu_s[:]
                gate = gu[:, :I]
                up = gu[:, I:]
                gu_s[:, :I] = gate * (1.0 / (1.0 + jnp.exp(-gate))) * up

            matmul = _matmul_unit(w_vm[sl], s_ref[0, u], w4, n_groups)
            if u < n_qkv:  # qkv N-block (static offsets)
                off = u * N_UNIT
                qkv_s[:, off : off + N_UNIT] = matmul(h_s[:])
            elif u < b2:  # wo K-split tile
                i_ks = u - n_qkv
                k_off = (i_ks // nn) * H
                n_off = (i_ks % nn) * N_UNIT
                x_s[:, n_off : n_off + N_UNIT] = x_s[
                    :, n_off : n_off + N_UNIT
                ] + matmul(attn_s[:, k_off : k_off + H])
            elif u < b3:  # gate/up N-block
                off = (u - b2) * N_UNIT
                gu_s[:, off : off + N_UNIT] = matmul(h_s[:])
            else:  # wd K-split tile
                i_ks = u - b3
                k_off = (i_ks // nn) * H
                n_off = (i_ks % nn) * N_UNIT
                x_s[:, n_off : n_off + N_UNIT] = x_s[
                    :, n_off : n_off + N_UNIT
                ] + matmul(gu_s[:, k_off : k_off + H])

    return run_layer, U


def _pick_mode(T: int) -> str:
    # beyond ~512 slots the per-layer cache blocks outgrow VMEM residency; the
    # "hbm" variant streams the whole layer cache through scratch, and beyond
    # 1024 even that scratch outgrows VMEM (measured 21.9 MB at T=2080), so
    # "win" streams WINDOW-slot chunks with online softmax — any T, bounded
    # VMEM.  QTTS_FUSED_MODE overrides for A/B benching.
    import os

    mode = "vmem" if T <= 512 else ("hbm" if T <= 1024 else "win")
    env_mode = os.environ.get("QTTS_FUSED_MODE")
    if env_mode in ("vmem", "hbm", "win"):
        mode = env_mode
    return mode


def _manual_enabled() -> bool:
    """Manual double-buffered weight DMA in vmem mode (QTTS_FUSED_MANUAL=0
    to fall back to the auto (L, U)-grid pipeline for A/B benching)."""
    import os

    return os.environ.get("QTTS_FUSED_MANUAL", "1") != "0"


def _ring() -> int:
    """DMA ring depth for the manual kernels (QTTS_FUSED_RING).  Deeper
    rings keep more unit transfers outstanding; transport-only, results
    are bit-identical.  Hardware sweep 2026-08-19 (manual_probe --ring,
    talker 28L T=512): f32-KV 1.186/1.176/1.176 ms/step and int8-KV
    0.697/0.674/0.670 at ring 2/4/8 — the knee is 4 (default; +2 unit
    slots ≈ 2 MB VMEM over the double buffer), 8 buys only ~0.5% more."""
    import os

    return max(2, min(8, int(os.environ.get("QTTS_FUSED_RING", "4"))))


def _win_manual_enabled() -> bool:
    """Manual-schedule WINDOWED kernel for long-form buckets
    (QTTS_FUSED_WIN_MANUAL=1).  Default OFF until hardware-validated
    (tools/manual_probe.py --win) — the resident chain's gating pattern;
    the auto (L, U) pipeline stays the long-form default meanwhile."""
    import os

    return os.environ.get("QTTS_FUSED_WIN_MANUAL", "0") == "1"


def fused_decode_step(
    cfg: TransformerConfig,
    fw: FusedStepWeights,
    x: jax.Array,  # [1, H]
    pos: jax.Array,  # scalar int32
    k_cache: jax.Array,  # [L, 1, nk, T, d]
    v_cache: jax.Array,
    k_scale: "jax.Array | None" = None,  # [L, 1, nk, T] f32 (int8 KV cache)
    v_scale: "jax.Array | None" = None,
    interpret: bool = False,
    mode: str = None,
):
    """One fused decode step over all layers (pre-final-norm output).

    Returns (x_out [1, H] f32, k_cache, v_cache[, k_scale, v_scale]) — the
    scale outputs only when a quantized cache was given.  ``mode``
    (vmem/hbm/win) defaults by cache size — resolved OUTSIDE jit so env
    overrides and explicit choices are never shadowed by a cached trace."""
    T = k_cache.shape[3]
    # clamp like dynamic_update_slice would: an overflowing position (idle
    # done stream in a serving pool) must not DMA outside the cache
    pos = jnp.minimum(jnp.asarray(pos, jnp.int32), T - 1)
    if mode is None:
        mode = _pick_mode(T)
    if mode == "win" and T % WINDOW != 0:
        raise ValueError(
            f"windowed fused decode needs the KV bucket ({T}) to be a "
            f"multiple of {WINDOW}; round the bucket up (engine does this)"
        )
    if mode == "vmem" and T > 512:
        raise ValueError(f"vmem mode caps at 512 cache slots, got {T}")
    if k_scale is not None and T % 128 != 0:
        raise ValueError(
            f"int8 KV fused decode needs the bucket ({T}) 128-aligned "
            f"(scale slot windows); round the bucket up (engine does this)"
        )
    manual = (mode == "vmem" and _manual_enabled()) or (
        mode == "win" and _win_manual_enabled()
    )
    return _fused_decode_step_jit(cfg, fw, x, pos, k_cache, v_cache,
                                  k_scale, v_scale, interpret, mode, manual,
                                  _ring() if manual else 2)


@functools.partial(
    jax.jit, static_argnames=("cfg", "interpret", "mode", "manual", "ring")
)
def _fused_decode_step_jit(
    cfg: TransformerConfig,
    fw: FusedStepWeights,
    x: jax.Array,
    pos: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    k_scale,
    v_scale,
    interpret: bool,
    mode: str,
    manual: bool = False,
    ring: int = 2,
):
    L = fw.attn_norm.shape[0]
    T = k_cache.shape[3]
    H = cfg.hidden_size
    nk, d = cfg.num_kv_heads, cfg.head_dim
    qd, kvd, I = cfg.q_dim, cfg.kv_dim, cfg.intermediate_size

    hbm_cache = mode in ("hbm", "win")
    kvq = k_scale is not None
    KU = fw.units.shape[2]  # H (int8) or H/2 (int4 nibble-packed)
    w4 = KU == H // 2
    n_groups = fw.scales.shape[2]
    if manual:
        return _fused_decode_step_manual(
            cfg, fw, x, pos, k_cache, v_cache, k_scale, v_scale, interpret,
            w4=w4, n_groups=n_groups, ring=ring, mode=mode,
        )
    kernel, U = _make_kernel(cfg, T, mode=mode, w4=w4, n_groups=n_groups,
                             kvq=kvq)
    SLOT_W = 32 if kvq else 8

    half = d // 2
    freqs = 1.0 / (cfg.rope_theta ** (jnp.arange(half, dtype=jnp.float32) / half))
    angles = pos.astype(jnp.float32) * freqs
    cos = jnp.cos(angles)[None, :]
    sin = jnp.sin(angles)[None, :]

    kc = k_cache.reshape(L, nk, T, d)
    vc = v_cache.reshape(L, nk, T, d)
    if kvq:
        ks = k_scale.reshape(L, nk, T)
        vs = v_scale.reshape(L, nk, T)

    norm_block = lambda l, u: (l, 0, 0)

    weight_specs = [
        pl.BlockSpec((1, 1, KU, N_UNIT), lambda l, u: (l, u, 0, 0),
                     memory_space=_VMEM),
        pl.BlockSpec((1, 1, n_groups, N_UNIT), lambda l, u: (l, u, 0, 0),
                     memory_space=_VMEM),
    ]
    in_specs = [
        pl.BlockSpec(memory_space=_SMEM),  # pos
        pl.BlockSpec((1, H), lambda l, u: (0, 0), memory_space=_VMEM),
        pl.BlockSpec((1, half), lambda l, u: (0, 0), memory_space=_VMEM),
        pl.BlockSpec((1, half), lambda l, u: (0, 0), memory_space=_VMEM),
        *weight_specs,
        pl.BlockSpec((1, 1, H), norm_block, memory_space=_VMEM),
        pl.BlockSpec((1, 1, H), norm_block, memory_space=_VMEM),
        pl.BlockSpec((1, 1, d), norm_block, memory_space=_VMEM),
        pl.BlockSpec((1, 1, d), norm_block, memory_space=_VMEM),
    ]
    scratch = [
        pltpu.VMEM((1, H), jnp.float32),
        pltpu.VMEM((1, H), jnp.float32),
        pltpu.VMEM((1, qd + 2 * kvd), jnp.float32),
        pltpu.VMEM((1, qd), jnp.float32),
        pltpu.VMEM((1, 2 * I), jnp.float32),
    ]
    x_out_spec = pl.BlockSpec((1, H), lambda l, u: (0, 0), memory_space=_VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((1, H), jnp.float32),
        jax.ShapeDtypeStruct((L, nk, T, d), kc.dtype),
        jax.ShapeDtypeStruct((L, nk, T, d), vc.dtype),
    ]
    if kvq:
        out_shape += [
            jax.ShapeDtypeStruct((L, nk, T), jnp.float32),
            jax.ShapeDtypeStruct((L, nk, T), jnp.float32),
        ]
    if hbm_cache:
        # caches stay in HBM (ANY), aliased input->output for in-place update;
        # the kernel DMAs the layer's K/V through VMEM scratch
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        in_specs += [any_spec, any_spec] + ([any_spec, any_spec] if kvq else [])
        out_specs = [x_out_spec, any_spec, any_spec] + (
            [any_spec, any_spec] if kvq else []
        )
        if mode == "win":
            scratch += [
                pltpu.VMEM((2, nk, WINDOW, d), kc.dtype),  # double-buffered
                pltpu.VMEM((2, nk, WINDOW, d), vc.dtype),
                pltpu.VMEM((nk, SLOT_W, d), kc.dtype),  # RMW slot window
                pltpu.VMEM((nk, SLOT_W, d), vc.dtype),
            ]
            if kvq:
                scratch += [
                    pltpu.VMEM((2, nk, WINDOW), jnp.float32),
                    pltpu.VMEM((2, nk, WINDOW), jnp.float32),
                    pltpu.VMEM((nk, 128), jnp.float32),  # scale slot windows
                    pltpu.VMEM((nk, 128), jnp.float32),
                ]
            scratch += [pltpu.SemaphoreType.DMA((16 if kvq else 8,))]
        else:
            scratch += [
                pltpu.VMEM((nk, T, d), kc.dtype),
                pltpu.VMEM((nk, T, d), vc.dtype),
                pltpu.VMEM((nk, SLOT_W, d), kc.dtype),  # unused (signature pad)
                pltpu.VMEM((nk, SLOT_W, d), vc.dtype),
            ]
            if kvq:
                scratch += [
                    pltpu.VMEM((nk, T), jnp.float32),
                    pltpu.VMEM((nk, T), jnp.float32),
                    pltpu.VMEM((nk, 128), jnp.float32),  # unused pads
                    pltpu.VMEM((nk, 128), jnp.float32),
                ]
            scratch += [pltpu.SemaphoreType.DMA((8,))]
        base = 10  # first cache input index
        if kvq:
            # kc, vc, ks, vs inputs -> outputs (in-place)
            aliases = {base: 1, base + 1: 2, base + 2: 3, base + 3: 4}
        else:
            aliases = {base: 1, base + 1: 2}
    else:
        cache_spec = pl.BlockSpec((1, nk, T, d), lambda l, u: (l, 0, 0, 0),
                                  memory_space=_VMEM)
        scale_spec = pl.BlockSpec((1, nk, T), lambda l, u: (l, 0, 0),
                                  memory_space=_VMEM)
        in_specs += [cache_spec, cache_spec] + (
            [scale_spec, scale_spec] if kvq else []
        )
        out_specs = [x_out_spec, cache_spec, cache_spec] + (
            [scale_spec, scale_spec] if kvq else []
        )
        aliases = {}

    weight_args = [fw.units, fw.scales]
    args = [
        jnp.asarray([pos], jnp.int32),
        x.astype(jnp.float32),
        cos,
        sin,
        *weight_args,
        fw.attn_norm,
        fw.mlp_norm,
        fw.q_norm,
        fw.k_norm,
        kc,
        vc,
    ]
    if kvq:
        args += [ks, vs]
    compiler_params = None
    if not interpret and pltpu is not None:
        # H=2048 (1.7B) + int8-KV scale windows overflow the default 16 MB
        # scoped-vmem cap by ~100 KB; raise it like the batched variant
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        )
    outs = pl.pallas_call(
        kernel,
        grid=(L, U),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=compiler_params,
    )(*args)
    x_out, kc_out, vc_out = outs[:3]
    kc_out = kc_out.reshape(L, 1, nk, T, d)
    vc_out = vc_out.reshape(L, 1, nk, T, d)
    if kvq:
        return (x_out, kc_out, vc_out,
                outs[3].reshape(L, 1, nk, T), outs[4].reshape(L, 1, nk, T))
    return x_out, kc_out, vc_out


def _fused_decode_step_manual(
    cfg: TransformerConfig,
    fw: FusedStepWeights,
    x: jax.Array,
    pos: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    k_scale,
    v_scale,
    interpret: bool,
    w4: bool,
    n_groups: int,
    ring: int = 2,
    mode: str = "vmem",
):
    """pallas_call wrapper for the manual-DMA kernel (grid (L,), weights in
    HBM/ANY, ring-slot VMEM scratch — see _make_kernel_manual).  mode="win"
    keeps the caches in HBM/ANY (aliased in-place) and streams windows."""
    L = fw.attn_norm.shape[0]
    T = k_cache.shape[3]
    H = cfg.hidden_size
    nk, d = cfg.num_kv_heads, cfg.head_dim
    qd, kvd, I = cfg.q_dim, cfg.kv_dim, cfg.intermediate_size
    kvq = k_scale is not None
    KU = fw.units.shape[2]
    SLOT_W = 32 if kvq else 8
    kernel, U = _make_kernel_manual(cfg, T, w4=w4, n_groups=n_groups,
                                    kvq=kvq, ring=ring, mode=mode)

    half = d // 2
    freqs = 1.0 / (cfg.rope_theta ** (jnp.arange(half, dtype=jnp.float32) / half))
    angles = pos.astype(jnp.float32) * freqs
    cos = jnp.cos(angles)[None, :]
    sin = jnp.sin(angles)[None, :]

    kc = k_cache.reshape(L, nk, T, d)
    vc = v_cache.reshape(L, nk, T, d)

    norm_block = lambda l: (l, 0, 0)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    if mode == "win":
        cache_spec = scale_spec = any_spec
    else:
        cache_spec = pl.BlockSpec((1, nk, T, d), lambda l: (l, 0, 0, 0),
                                  memory_space=_VMEM)
        scale_spec = pl.BlockSpec((1, nk, T), lambda l: (l, 0, 0),
                                  memory_space=_VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=_SMEM),  # pos
        pl.BlockSpec((1, H), lambda l: (0, 0), memory_space=_VMEM),
        pl.BlockSpec((1, half), lambda l: (0, 0), memory_space=_VMEM),
        pl.BlockSpec((1, half), lambda l: (0, 0), memory_space=_VMEM),
        pl.BlockSpec(memory_space=pl.ANY),  # units stay in HBM
        pl.BlockSpec((1, U, n_groups, N_UNIT), lambda l: (l, 0, 0, 0),
                     memory_space=_VMEM),  # scales: per-layer block
        pl.BlockSpec((1, 1, H), norm_block, memory_space=_VMEM),
        pl.BlockSpec((1, 1, H), norm_block, memory_space=_VMEM),
        pl.BlockSpec((1, 1, d), norm_block, memory_space=_VMEM),
        pl.BlockSpec((1, 1, d), norm_block, memory_space=_VMEM),
        cache_spec,
        cache_spec,
    ]
    if kvq:
        in_specs += [scale_spec, scale_spec]
    x_out_spec = pl.BlockSpec((1, H), lambda l: (0, 0), memory_space=_VMEM)
    out_specs = [x_out_spec, cache_spec, cache_spec]
    out_shape = [
        jax.ShapeDtypeStruct((1, H), jnp.float32),
        jax.ShapeDtypeStruct((L, nk, T, d), kc.dtype),
        jax.ShapeDtypeStruct((L, nk, T, d), vc.dtype),
    ]
    if kvq:
        out_specs += [scale_spec, scale_spec]
        out_shape += [
            jax.ShapeDtypeStruct((L, nk, T), jnp.float32),
            jax.ShapeDtypeStruct((L, nk, T), jnp.float32),
        ]
    scratch = [
        pltpu.VMEM((1, H), jnp.float32),  # x_s
        pltpu.VMEM((1, H), jnp.float32),  # h_s
        pltpu.VMEM((1, qd + 2 * kvd), jnp.float32),  # qkv_s
        pltpu.VMEM((1, qd), jnp.float32),  # attn_s
        pltpu.VMEM((1, 2 * I), jnp.float32),  # gu_s
        pltpu.VMEM((ring, KU, N_UNIT), fw.units.dtype),  # unit ring buffer
        pltpu.SemaphoreType.DMA((ring,)),
    ]
    aliases = {}
    if mode == "win":
        # caches alias input->output (in-place update from the RMW window);
        # window scratch per the auto kernel's win path
        scratch += [
            pltpu.VMEM((2, nk, WINDOW, d), kc.dtype),  # k_vm
            pltpu.VMEM((2, nk, WINDOW, d), vc.dtype),  # v_vm
            pltpu.VMEM((nk, SLOT_W, d), kc.dtype),  # slot_k
            pltpu.VMEM((nk, SLOT_W, d), vc.dtype),  # slot_v
        ]
        if kvq:
            scratch += [
                pltpu.VMEM((2, nk, WINDOW), jnp.float32),  # ks_vm
                pltpu.VMEM((2, nk, WINDOW), jnp.float32),  # vs_vm
                pltpu.VMEM((nk, 128), jnp.float32),  # slot_ks
                pltpu.VMEM((nk, 128), jnp.float32),  # slot_vs
            ]
        scratch += [pltpu.SemaphoreType.DMA((16 if kvq else 8,))]  # csems
        base = 10
        aliases = ({base: 1, base + 1: 2, base + 2: 3, base + 3: 4}
                   if kvq else {base: 1, base + 1: 2})
    args = [
        jnp.asarray([pos], jnp.int32),
        x.astype(jnp.float32),
        cos,
        sin,
        fw.units,
        fw.scales,
        fw.attn_norm,
        fw.mlp_norm,
        fw.q_norm,
        fw.k_norm,
        kc,
        vc,
    ]
    if kvq:
        args += [k_scale.reshape(L, nk, T), v_scale.reshape(L, nk, T)]
    compiler_params = None
    if not interpret and pltpu is not None:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        )
    outs = pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=compiler_params,
    )(*args)
    x_out, kc_out, vc_out = outs[:3]
    kc_out = kc_out.reshape(L, 1, nk, T, d)
    vc_out = vc_out.reshape(L, 1, nk, T, d)
    if kvq:
        return (x_out, kc_out, vc_out,
                outs[3].reshape(L, 1, nk, T), outs[4].reshape(L, 1, nk, T))
    return x_out, kc_out, vc_out


# ---------------------------------------------------------------------------
# Batched (B > 1) variant: one fused step for a whole serving batch.
#
# Same unit schedule as the B=1 kernel, but activations are [B, *] (the
# matvecs become real [B, H] x [H, 1024] GEMMs — better MXU occupancy and the
# weight bytes amortize over B streams).  Attention handles PER-STREAM
# positions (continuous serving: slots fill at different rates):
#   * T <= 64  ("bvmem"): per-layer cache blocks resident in VMEM (MTP).
#   * larger T ("bwin"):  cache in HBM; K/V stream through double-buffered
#     windows of BWIN(B) slots with online softmax; each stream's new slot is
#     DMA'd straight to its cache row (no RMW — a [nk, 1, d] write at an
#     arbitrary slot offset is a plain strided DMA).
# ---------------------------------------------------------------------------


def batched_window(B: int) -> int:
    """Window slots per DMA for batch B (VMEM budget: 2 bufs x B x nk x W x d)."""
    return max(128, 512 // B)


def _make_kernel_batched(cfg: TransformerConfig, T: int, B: int, mode: str,
                         w4: bool = False, n_groups: int = 1,
                         kvq: bool = False):
    H = cfg.hidden_size
    nq, nk, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    g = nq // nk
    qd, kvd = cfg.q_dim, cfg.kv_dim
    I = cfg.intermediate_size
    eps = cfg.rms_norm_eps
    n_qkv, n_wo, n_gu, n_wd = _unit_counts(cfg)
    U = n_qkv + n_wo + n_gu + n_wd
    b1, b2, b3 = n_qkv, n_qkv + n_wo, n_qkv + n_wo + n_gu
    W = batched_window(B)
    SLOT_W = 32 if kvq else 8  # int8 sublane tile: 32
    # sem layout (bwin): 0-3 cache window bufs; kvq: 4-7 scale window bufs;
    # then per-stream slot pairs (cache), then per-stream slot pairs (scale)
    SLOT_SEM = 8 if kvq else 4
    SSLOT_SEM = SLOT_SEM + 2 * B  # scale slot sems (kvq only)

    def kernel(*refs):
        (pos_ref,  # SMEM [B] int32 — per-stream write slot / position
         x_ref,  # [B, H] f32
         pos_vm,  # [B, 1] int32 (vector copy of pos for mask math)
         cos_ref,  # [B, d//2] f32
         sin_ref,  # [B, d//2] f32
         w_ref,  # [1, 1, H, N_UNIT] int8
         s_ref,  # [1, 1, 1, N_UNIT] f32
         an_ref,
         mn_ref,
         qn_ref,
         kn_ref,
         kc_in,  # bvmem: [1, B, nk, T, d] block; bwin: full [L, B, nk, T, d] ANY
         vc_in) = refs[:13]
        i = 13
        ks_in = vs_in = None
        if kvq:
            ks_in, vs_in = refs[i : i + 2]  # [L, B, nk, T] ANY (bwin)
            i += 2
        x_out, kc_out, vc_out = refs[i : i + 3]  # x_out [B, H] f32
        i += 3
        ks_out = vs_out = None
        if kvq:
            ks_out, vs_out = refs[i : i + 2]
            i += 2
        (x_s,  # [B, H] f32
         h_s,  # [B, H] f32
         qkv_s,  # [B, qd + 2*kvd] f32
         attn_s,  # [B, qd] f32
         gu_s) = refs[i : i + 5]  # [B, 2I] f32
        i += 5
        k_vm = v_vm = kslot = vslot = sems = None
        ks_vm = vs_vm = kslot_s = vslot_s = None
        if mode == "bwin":
            # k_vm [2, B, nk, W, d]; kslot [B, nk, SLOT_W, d] per-stream RMW
            k_vm, v_vm, kslot, vslot = refs[i : i + 4]
            i += 4
            if kvq:
                # ks_vm [2, B, nk, W]; kslot_s [B, nk, 128]
                ks_vm, vs_vm, kslot_s, vslot_s = refs[i : i + 4]
                i += 4
            sems = refs[i]

        l = pl.program_id(0)
        u = pl.program_id(1)
        nn = H // N_UNIT
        kind = jnp.where(u < b1, 0, jnp.where(u < b2, 1, jnp.where(u < b3, 2, 3)))
        off = jnp.where(u < b1, u * N_UNIT, (u - b2) * N_UNIT)
        i_ks = jnp.where(kind == 1, u - b1, u - b3)
        k_off = (i_ks // nn) * H
        n_off = (i_ks % nn) * N_UNIT
        off = pl.multiple_of(off, N_UNIT)
        k_off = pl.multiple_of(k_off, N_UNIT)
        n_off = pl.multiple_of(n_off, N_UNIT)

        @pl.when(jnp.logical_and(l == 0, u == 0))
        def _init():
            x_s[:] = x_ref[:]

        if mode == "bwin":
            @pl.when(u == 0)
            def _prefetch():
                # max fill level decides the window trip count; start window 0
                m = pos_ref[0]
                for b in range(1, B):
                    m = jnp.maximum(m, pos_ref[b])

                @pl.when(m > 0)
                def _():
                    pltpu.make_async_copy(
                        kc_in.at[l, :, :, pl.ds(0, W), :], k_vm.at[0],
                        sems.at[0],
                    ).start()
                    pltpu.make_async_copy(
                        vc_in.at[l, :, :, pl.ds(0, W), :], v_vm.at[0],
                        sems.at[2],
                    ).start()
                    if kvq:
                        pltpu.make_async_copy(
                            ks_in.at[l, :, :, pl.ds(0, W)], ks_vm.at[0],
                            sems.at[4],
                        ).start()
                        pltpu.make_async_copy(
                            vs_in.at[l, :, :, pl.ds(0, W)], vs_vm.at[0],
                            sems.at[6],
                        ).start()

        @pl.when(u == 0)
        def _norm_attn():
            h_s[:] = _rms(x_s[:], an_ref[0], eps)

        @pl.when(u == n_qkv)
        def _attention():
            qkv = qkv_s[:]  # [B, qd + 2kvd]
            cos = cos_ref[:][:, None, :]  # [B, 1, half]
            sin = sin_ref[:][:, None, :]
            q = qkv[:, :qd].reshape(B, nq, d)
            k = qkv[:, qd : qd + kvd].reshape(B, nk, d)
            v = qkv[:, qd + kvd :].reshape(B, nk, d)
            q = _rms(q, qn_ref[0, 0], eps)
            k = _rms(k, kn_ref[0, 0], eps)
            half = d // 2
            def rope_b(x):
                x1, x2 = x[..., :half], x[..., half:]
                return jnp.concatenate(
                    [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
                )
            q = rope_b(q)
            k = rope_b(k)
            if kvq:
                # quantize each stream's new slot in-register (quantize_kv
                # grid); k/v below are the DEQUANTIZED values
                k_sc = jnp.maximum(
                    jnp.max(jnp.abs(k), axis=-1, keepdims=True) / 127.0, 1e-8
                )  # [B, nk, 1]
                v_sc = jnp.maximum(
                    jnp.max(jnp.abs(v), axis=-1, keepdims=True) / 127.0, 1e-8
                )
                k_qr = jnp.clip(jnp.round(k / k_sc), -127, 127)
                v_qr = jnp.clip(jnp.round(v / v_sc), -127, 127)
                k = k_qr * k_sc
                v = v_qr * v_sc
                k_store, v_store = k_qr, v_qr
            else:
                k_store, v_store = k, v
            qg = q.reshape(B, nk, g, d)
            inv_sqrt_d = 1.0 / (d**0.5)
            pos_col = pos_vm[:]  # [B, 1]

            if mode == "bvmem":
                # masked-select write of each stream's new slot, full-T attn
                slot = jax.lax.broadcasted_iota(jnp.int32, (1, B, nk, T, d), 3)
                pos_b = pos_col.reshape(1, B, 1, 1, 1)
                K_new = jnp.where(
                    slot == pos_b, k[None, :, :, None, :].astype(kc_in.dtype),
                    kc_in[:],
                )
                V_new = jnp.where(
                    slot == pos_b, v[None, :, :, None, :].astype(vc_in.dtype),
                    vc_in[:],
                )
                kc_out[:] = K_new
                vc_out[:] = V_new
                # Mosaic tpu.matmul supports ONE batch dim: fold (B, nk)
                K = K_new[0].astype(jnp.float32).reshape(B * nk, T, d)
                V = V_new[0].astype(jnp.float32).reshape(B * nk, T, d)
                qf = qg.reshape(B * nk, g, d)
                sc = jax.lax.dot_general(
                    qf, K, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * inv_sqrt_d  # [B*nk, g, T]
                sc = sc.reshape(B, nk, g, T)
                tslot = jax.lax.broadcasted_iota(jnp.int32, (B, nk, g, T), 3)
                sc = jnp.where(tslot <= pos_col.reshape(B, 1, 1, 1), sc, -1e30)
                m = jnp.max(sc, axis=-1, keepdims=True)
                e = jnp.exp(sc - m)
                wts = (e / jnp.sum(e, axis=-1, keepdims=True)).reshape(
                    B * nk, g, T
                )
                out = jax.lax.dot_general(
                    wts, V, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [B*nk, g, d]
                attn_s[:] = out.reshape(B, qd)
                return

            # --- bwin: per-stream aligned RMW window around pos[b] (the
            # B=1 kernel's approach; a 1-slot staging buffer is not sliceable
            # under bf16 sublane tiling).  Writes back slots < pos unchanged,
            # so it never races the streamed window reads.
            ins = []
            for b in range(B):
                w0b = pl.multiple_of((pos_ref[b] // SLOT_W) * SLOT_W, SLOT_W)
                ki = pltpu.make_async_copy(
                    kc_in.at[l, b, :, pl.ds(w0b, SLOT_W), :], kslot.at[b],
                    sems.at[SLOT_SEM + 2 * b],
                )
                vi = pltpu.make_async_copy(
                    vc_in.at[l, b, :, pl.ds(w0b, SLOT_W), :], vslot.at[b],
                    sems.at[SLOT_SEM + 1 + 2 * b],
                )
                ki.start()
                vi.start()
                ins.append((ki, vi))
                if kvq:
                    w0s = pl.multiple_of((pos_ref[b] // 128) * 128, 128)
                    ksi = pltpu.make_async_copy(
                        ks_in.at[l, b, :, pl.ds(w0s, 128)], kslot_s.at[b],
                        sems.at[SSLOT_SEM + 2 * b],
                    )
                    vsi = pltpu.make_async_copy(
                        vs_in.at[l, b, :, pl.ds(w0s, 128)], vslot_s.at[b],
                        sems.at[SSLOT_SEM + 1 + 2 * b],
                    )
                    ksi.start()
                    vsi.start()
                    ins.append((ksi, vsi))
            for ki, vi in ins:
                ki.wait()
                vi.wait()
            wpos = jax.lax.broadcasted_iota(jnp.int32, (B, nk, SLOT_W, d), 2)
            rel = (pos_col - (pos_col // SLOT_W) * SLOT_W).reshape(B, 1, 1, 1)
            kslot[:] = jnp.where(
                wpos == rel, k_store[:, :, None, :].astype(kslot.dtype),
                kslot[:],
            )
            vslot[:] = jnp.where(
                wpos == rel, v_store[:, :, None, :].astype(vslot.dtype),
                vslot[:],
            )
            if kvq:
                spos = jax.lax.broadcasted_iota(jnp.int32, (B, nk, 128), 2)
                rel_s = (pos_col - (pos_col // 128) * 128).reshape(B, 1, 1)
                kslot_s[:] = jnp.where(spos == rel_s, k_sc, kslot_s[:])
                vslot_s[:] = jnp.where(spos == rel_s, v_sc, vslot_s[:])
            outs = []
            for b in range(B):
                w0b = pl.multiple_of((pos_ref[b] // SLOT_W) * SLOT_W, SLOT_W)
                ko = pltpu.make_async_copy(
                    kslot.at[b], kc_out.at[l, b, :, pl.ds(w0b, SLOT_W), :],
                    sems.at[SLOT_SEM + 2 * b],
                )
                vo = pltpu.make_async_copy(
                    vslot.at[b], vc_out.at[l, b, :, pl.ds(w0b, SLOT_W), :],
                    sems.at[SLOT_SEM + 1 + 2 * b],
                )
                ko.start()
                vo.start()
                outs.append((ko, vo))
                if kvq:
                    w0s = pl.multiple_of((pos_ref[b] // 128) * 128, 128)
                    kso = pltpu.make_async_copy(
                        kslot_s.at[b], ks_out.at[l, b, :, pl.ds(w0s, 128)],
                        sems.at[SSLOT_SEM + 2 * b],
                    )
                    vso = pltpu.make_async_copy(
                        vslot_s.at[b], vs_out.at[l, b, :, pl.ds(w0s, 128)],
                        sems.at[SSLOT_SEM + 1 + 2 * b],
                    )
                    kso.start()
                    vso.start()
                    outs.append((kso, vso))

            max_pos = pos_ref[0]
            for b in range(1, B):
                max_pos = jnp.maximum(max_pos, pos_ref[b])
            n_win = pl.cdiv(max_pos, W)

            def win_body(i, carry):
                m, s, acc = carry
                buf = jax.lax.rem(i, 2)
                nxt = jax.lax.rem(i + 1, 2)
                off_next = pl.multiple_of((i + 1) * W, W)

                @pl.when(i + 1 < n_win)
                def _():
                    pltpu.make_async_copy(
                        kc_in.at[l, :, :, pl.ds(off_next, W), :],
                        k_vm.at[nxt], sems.at[nxt],
                    ).start()
                    pltpu.make_async_copy(
                        vc_in.at[l, :, :, pl.ds(off_next, W), :],
                        v_vm.at[nxt], sems.at[2 + nxt],
                    ).start()
                    if kvq:
                        pltpu.make_async_copy(
                            ks_in.at[l, :, :, pl.ds(off_next, W)],
                            ks_vm.at[nxt], sems.at[4 + nxt],
                        ).start()
                        pltpu.make_async_copy(
                            vs_in.at[l, :, :, pl.ds(off_next, W)],
                            vs_vm.at[nxt], sems.at[6 + nxt],
                        ).start()

                off_i = pl.multiple_of(i * W, W)
                pltpu.make_async_copy(
                    kc_in.at[l, :, :, pl.ds(off_i, W), :], k_vm.at[buf],
                    sems.at[buf],
                ).wait()
                pltpu.make_async_copy(
                    vc_in.at[l, :, :, pl.ds(off_i, W), :], v_vm.at[buf],
                    sems.at[2 + buf],
                ).wait()
                # Mosaic tpu.matmul supports ONE batch dim: fold (B, nk)
                K_w = k_vm[buf].astype(jnp.float32).reshape(B * nk, W, d)
                V_w = v_vm[buf].astype(jnp.float32).reshape(B * nk, W, d)
                qf = qg.reshape(B * nk, g, d)
                sc = jax.lax.dot_general(
                    qf, K_w, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * inv_sqrt_d  # [B*nk, g, W]
                sc = sc.reshape(B, nk, g, W)
                if kvq:
                    pltpu.make_async_copy(
                        ks_in.at[l, :, :, pl.ds(off_i, W)], ks_vm.at[buf],
                        sems.at[4 + buf],
                    ).wait()
                    pltpu.make_async_copy(
                        vs_in.at[l, :, :, pl.ds(off_i, W)], vs_vm.at[buf],
                        sems.at[6 + buf],
                    ).wait()
                    sc = sc * ks_vm[buf][:, :, None, :]
                gslot = (
                    jax.lax.broadcasted_iota(jnp.int32, (B, nk, g, W), 3)
                    + i * W
                )
                sc = jnp.where(gslot < pos_col.reshape(B, 1, 1, 1), sc, -1e30)
                m_new = jnp.maximum(m, jnp.max(sc, axis=-1, keepdims=True))
                alpha = jnp.exp(m - m_new)
                e = jnp.exp(sc - m_new)
                s_new = s * alpha + jnp.sum(e, axis=-1, keepdims=True)
                ew = e * vs_vm[buf][:, :, None, :] if kvq else e
                acc_new = acc * alpha + jax.lax.dot_general(
                    ew.reshape(B * nk, g, W), V_w, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).reshape(B, nk, g, d)
                return m_new, s_new, acc_new

            m0 = jnp.full((B, nk, g, 1), -1e30, jnp.float32)
            s0 = jnp.zeros((B, nk, g, 1), jnp.float32)
            a0 = jnp.zeros((B, nk, g, d), jnp.float32)
            m, s, acc = jax.lax.fori_loop(0, n_win, win_body, (m0, s0, a0))

            # diagonal term: each stream's own new slot, from registers
            sc_d = (
                jnp.sum(qg * k[:, :, None, :], axis=-1, keepdims=True)
                * inv_sqrt_d
            )  # [B, nk, g, 1]
            m2 = jnp.maximum(m, sc_d)
            alpha = jnp.exp(m - m2)
            e_d = jnp.exp(sc_d - m2)
            s = s * alpha + e_d
            acc = acc * alpha + e_d * v[:, :, None, :]
            attn_s[:] = (acc / s).reshape(B, qd)
            for ko, vo in outs:
                ko.wait()
                vo.wait()

        @pl.when(u == n_qkv + n_wo)
        def _norm_mlp():
            h_s[:] = _rms(x_s[:], mn_ref[0], eps)

        @pl.when(u == n_qkv + n_wo + n_gu)
        def _activation():
            gu = gu_s[:]
            gate = gu[:, :I]
            up = gu[:, I:]
            gu_s[:, :I] = gate * (1.0 / (1.0 + jnp.exp(-gate))) * up

        matmul = _make_matmul(w_ref, s_ref, H, w4, n_groups)

        @pl.when(kind == 0)
        def _qkv_u():
            qkv_s[:, pl.ds(off, N_UNIT)] = matmul(h_s[:])

        @pl.when(kind == 1)
        def _wo_u():
            x_s[:, pl.ds(n_off, N_UNIT)] = x_s[:, pl.ds(n_off, N_UNIT)] + matmul(
                attn_s[:, pl.ds(k_off, H)]
            )

        @pl.when(kind == 2)
        def _gu_u():
            gu_s[:, pl.ds(off, N_UNIT)] = matmul(h_s[:])

        @pl.when(kind == 3)
        def _wd_u():
            x_s[:, pl.ds(n_off, N_UNIT)] = x_s[:, pl.ds(n_off, N_UNIT)] + matmul(
                gu_s[:, pl.ds(k_off, H)]
            )

        x_out[:] = x_s[:]

    return kernel, U


def fused_decode_step_batched(
    cfg: TransformerConfig,
    fw: FusedStepWeights,
    x: jax.Array,  # [B, H]
    pos: jax.Array,  # [B] int32 — per-stream positions
    k_cache: jax.Array,  # [L, B, nk, T, d]
    v_cache: jax.Array,
    k_scale: "jax.Array | None" = None,  # [L, B, nk, T] f32 (int8 KV cache)
    v_scale: "jax.Array | None" = None,
    interpret: bool = False,
):
    """Batched fused decode step (B streams, per-stream positions).

    Returns (x_out [B, H] f32, k_cache, v_cache[, k_scale, v_scale])."""
    B = x.shape[0]
    T = k_cache.shape[3]
    # clamp like dynamic_update_slice would: an overflowing position (idle
    # done stream in a serving pool) must not DMA outside the cache
    pos = jnp.minimum(jnp.asarray(pos, jnp.int32), T - 1)
    mode = "bvmem" if T <= 64 else "bwin"
    W = batched_window(B)
    if mode == "bwin" and T % W != 0:
        raise ValueError(
            f"batched fused decode needs the KV bucket ({T}) to be a "
            f"multiple of {W} at B={B}"
        )
    if k_scale is not None:
        if mode == "bvmem":
            raise ValueError(
                "int8 KV batched fused decode supports the bwin mode only "
                "(the <=64-slot bvmem caches are the MTP's, never quantized)"
            )
        if T % 128 != 0:
            raise ValueError(
                f"int8 KV batched fused decode needs the bucket ({T}) "
                f"128-aligned (scale slot windows)"
            )
    return _fused_decode_step_batched_jit(
        cfg, fw, x, pos, k_cache, v_cache, k_scale, v_scale, interpret, mode
    )


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "mode"))
def _fused_decode_step_batched_jit(
    cfg: TransformerConfig,
    fw: FusedStepWeights,
    x: jax.Array,
    pos: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    k_scale,
    v_scale,
    interpret: bool,
    mode: str,
):
    L = fw.units.shape[0]
    B = x.shape[0]
    T = k_cache.shape[3]
    H = cfg.hidden_size
    nk, d = cfg.num_kv_heads, cfg.head_dim
    qd, kvd, I = cfg.q_dim, cfg.kv_dim, cfg.intermediate_size
    W = batched_window(B)
    kvq = k_scale is not None
    SLOT_W = 32 if kvq else 8

    KU = fw.units.shape[2]  # H (int8) or H/2 (int4 nibble-packed)
    w4 = KU == H // 2
    n_groups = fw.scales.shape[2]
    kernel, U = _make_kernel_batched(cfg, T, B, mode, w4=w4, n_groups=n_groups,
                                     kvq=kvq)

    half = d // 2
    freqs = 1.0 / (cfg.rope_theta ** (jnp.arange(half, dtype=jnp.float32) / half))
    angles = pos.astype(jnp.float32)[:, None] * freqs[None, :]  # [B, half]
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)

    norm_block = lambda l, u: (l, 0, 0)
    in_specs = [
        pl.BlockSpec(memory_space=_SMEM),  # pos [B]
        pl.BlockSpec((B, H), lambda l, u: (0, 0), memory_space=_VMEM),
        pl.BlockSpec((B, 1), lambda l, u: (0, 0), memory_space=_VMEM),
        pl.BlockSpec((B, half), lambda l, u: (0, 0), memory_space=_VMEM),
        pl.BlockSpec((B, half), lambda l, u: (0, 0), memory_space=_VMEM),
        pl.BlockSpec((1, 1, KU, N_UNIT), lambda l, u: (l, u, 0, 0),
                     memory_space=_VMEM),
        pl.BlockSpec((1, 1, n_groups, N_UNIT), lambda l, u: (l, u, 0, 0),
                     memory_space=_VMEM),
        pl.BlockSpec((1, 1, H), norm_block, memory_space=_VMEM),
        pl.BlockSpec((1, 1, H), norm_block, memory_space=_VMEM),
        pl.BlockSpec((1, 1, d), norm_block, memory_space=_VMEM),
        pl.BlockSpec((1, 1, d), norm_block, memory_space=_VMEM),
    ]
    scratch = [
        pltpu.VMEM((B, H), jnp.float32),
        pltpu.VMEM((B, H), jnp.float32),
        pltpu.VMEM((B, qd + 2 * kvd), jnp.float32),
        pltpu.VMEM((B, qd), jnp.float32),
        pltpu.VMEM((B, 2 * I), jnp.float32),
    ]
    x_out_spec = pl.BlockSpec((B, H), lambda l, u: (0, 0), memory_space=_VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((B, H), jnp.float32),
        jax.ShapeDtypeStruct((L, B, nk, T, d), k_cache.dtype),
        jax.ShapeDtypeStruct((L, B, nk, T, d), v_cache.dtype),
    ]
    if kvq:
        out_shape += [
            jax.ShapeDtypeStruct((L, B, nk, T), jnp.float32),
            jax.ShapeDtypeStruct((L, B, nk, T), jnp.float32),
        ]
    if mode == "bwin":
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        in_specs += [any_spec, any_spec] + ([any_spec, any_spec] if kvq else [])
        out_specs = [x_out_spec, any_spec, any_spec] + (
            [any_spec, any_spec] if kvq else []
        )
        scratch += [
            pltpu.VMEM((2, B, nk, W, d), k_cache.dtype),
            pltpu.VMEM((2, B, nk, W, d), v_cache.dtype),
            pltpu.VMEM((B, nk, SLOT_W, d), k_cache.dtype),
            pltpu.VMEM((B, nk, SLOT_W, d), v_cache.dtype),
        ]
        if kvq:
            scratch += [
                pltpu.VMEM((2, B, nk, W), jnp.float32),
                pltpu.VMEM((2, B, nk, W), jnp.float32),
                pltpu.VMEM((B, nk, 128), jnp.float32),
                pltpu.VMEM((B, nk, 128), jnp.float32),
            ]
            scratch += [pltpu.SemaphoreType.DMA((8 + 4 * B,))]
            aliases = {11: 1, 12: 2, 13: 3, 14: 4}
        else:
            scratch += [pltpu.SemaphoreType.DMA((4 + 2 * B,))]
            aliases = {11: 1, 12: 2}
    else:
        in_specs += [
            pl.BlockSpec((1, B, nk, T, d), lambda l, u: (l, 0, 0, 0, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((1, B, nk, T, d), lambda l, u: (l, 0, 0, 0, 0),
                         memory_space=_VMEM),
        ]
        out_specs = [
            x_out_spec,
            pl.BlockSpec((1, B, nk, T, d), lambda l, u: (l, 0, 0, 0, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((1, B, nk, T, d), lambda l, u: (l, 0, 0, 0, 0),
                         memory_space=_VMEM),
        ]
        aliases = {}

    compiler_params = None
    if not interpret and pltpu is not None:
        # the default 16 MB scoped-vmem cap is conservative; B=8 windows +
        # double-buffered weight units need ~17 MB (v5e has headroom)
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        )
    args = [
        jnp.asarray(pos, jnp.int32),
        x.astype(jnp.float32),
        jnp.asarray(pos, jnp.int32)[:, None],
        cos,
        sin,
        fw.units,
        fw.scales,
        fw.attn_norm,
        fw.mlp_norm,
        fw.q_norm,
        fw.k_norm,
        k_cache,
        v_cache,
    ]
    if kvq:
        args += [k_scale, v_scale]
    outs = pl.pallas_call(
        kernel,
        grid=(L, U),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=compiler_params,
    )(*args)
    if kvq:
        return outs[0], outs[1], outs[2], outs[3], outs[4]
    return outs[0], outs[1], outs[2]
