"""Fused S=K speculative-verify step as ONE Pallas kernel (B=1).

The spec-decode verify pass (runtime/speculative.py) runs S=K candidate
inputs through the talker in one forward.  The XLA path reads the full
weight set at ~52% of its DMA floor (xplane profile, docs/ROUND3_PLAN.md);
this kernel reuses ops/fused_step.py's unit schedule — activations [S, H]
resident in VMEM, int8/int4 weights streamed once as [H, 1024] units — and
adds what S > 1 needs:

  * per-row RoPE (positions pos..pos+S-1),
  * an S-slot cache write (pos..pos+S-1) via a 2x-width aligned RMW window,
  * streamed-window attention over slots [0, pos) where every query sees
    every slot, PLUS an intra-block causal tail over the S new slots from
    registers (query s attends new slot j iff j <= s).

Prompt layout guarantees (runtime/prompt.py): the prompt is a FIXED static
length — no interior pad slots — so pure positional masking is exact, the
same argument the S=1 kernel relies on.  Stale rewound slots beyond the
fill level are always overwritten by the next verify's writes before any
query can attend them (speculative.py's rewind invariant).

Modes: "vmem" (T <= 512, whole per-layer cache as VMEM blocks) and "win"
(T % 512 == 0, WINDOW-streamed, bounded VMEM).  Both support the int8 KV
cache (per-slot scales, ops/fused_step.py conventions).
"""

from __future__ import annotations

import functools

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
from .fused_step import (
    N_UNIT,
    WINDOW,
    FusedStepWeights,
    _make_matmul,
    _rms,
    _unit_counts,
)


def verify_supported(cfg: TransformerConfig, T: int, S: int,
                     kvq: bool) -> bool:
    from .fused_step import supports

    if not supports(cfg) or not 2 <= S <= 8:
        return False
    if T <= 512:
        return not kvq or T % 128 == 0
    return T % WINDOW == 0  # win mode (512-multiples are 128-aligned)


def _make_verify_kernel(cfg: TransformerConfig, T: int, S: int, mode: str,
                        w4: bool, n_groups: int, kvq: bool):
    H = cfg.hidden_size
    nq, nk, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    g = nq // nk
    qd, kvd = cfg.q_dim, cfg.kv_dim
    I = cfg.intermediate_size
    eps = cfg.rms_norm_eps
    n_qkv, n_wo, n_gu, n_wd = _unit_counts(cfg)
    U = n_qkv + n_wo + n_gu + n_wd
    b1, b2, b3 = n_qkv, n_qkv + n_wo, n_qkv + n_wo + n_gu
    SLOT_W = 32 if kvq else 8
    RMW = 2 * SLOT_W  # S consecutive slots can span two SLOT_W windows

    def kernel(*refs):
        (pos_ref,  # SMEM [1] int32 — first write slot
         x_ref,  # [S, H] f32
         cos_ref,  # [S, d//2] f32 (row s at position pos+s)
         sin_ref,
         w_ref, s_ref, an_ref, mn_ref, qn_ref, kn_ref,
         kc_in, vc_in) = refs[:12]
        i = 12
        ks_in = vs_in = None
        if kvq:
            ks_in, vs_in = refs[i : i + 2]
            i += 2
        x_out, kc_out, vc_out = refs[i : i + 3]
        i += 3
        ks_out = vs_out = None
        if kvq:
            ks_out, vs_out = refs[i : i + 2]
            i += 2
        x_s, h_s, qkv_s, attn_s, gu_s = refs[i : i + 5]
        i += 5
        k_vm = v_vm = slot_k = slot_v = sems = None
        ks_vm = vs_vm = slot_ks = slot_vs = None
        if mode == "win":
            k_vm, v_vm, slot_k, slot_v = refs[i : i + 4]  # slot_*: [nk, RMW, d]
            i += 4
            if kvq:
                ks_vm, vs_vm, slot_ks, slot_vs = refs[i : i + 4]  # [nk, 256]
                i += 4
            sems = refs[i]

        l = pl.program_id(0)
        u = pl.program_id(1)
        nn = H // N_UNIT
        kind = jnp.where(u < b1, 0, jnp.where(u < b2, 1, jnp.where(u < b3, 2, 3)))
        off = jnp.where(u < b1, u * N_UNIT, (u - b2) * N_UNIT)
        i_ks = jnp.where(kind == 1, u - b1, u - b3)
        k_off = pl.multiple_of((i_ks // nn) * H, N_UNIT)
        n_off = pl.multiple_of((i_ks % nn) * N_UNIT, N_UNIT)
        off = pl.multiple_of(off, N_UNIT)
        pos = pos_ref[0]

        @pl.when(jnp.logical_and(l == 0, u == 0))
        def _init():
            x_s[:] = x_ref[:]

        if mode == "win":
            @pl.when(u == 0)
            def _prefetch():
                pos_ = pos_ref[0]
                w0 = jnp.minimum((pos_ // SLOT_W) * SLOT_W, T - RMW)
                w0 = pl.multiple_of(w0, SLOT_W)
                pltpu.make_async_copy(
                    kc_in.at[l, :, pl.ds(w0, RMW), :], slot_k, sems.at[4]
                ).start()
                pltpu.make_async_copy(
                    vc_in.at[l, :, pl.ds(w0, RMW), :], slot_v, sems.at[5]
                ).start()
                if kvq:
                    w0s = jnp.minimum((pos_ // 128) * 128, T - 256)
                    w0s = pl.multiple_of(w0s, 128)
                    pltpu.make_async_copy(
                        ks_in.at[l, :, pl.ds(w0s, 256)], slot_ks, sems.at[12]
                    ).start()
                    pltpu.make_async_copy(
                        vs_in.at[l, :, pl.ds(w0s, 256)], slot_vs, sems.at[13]
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

        @pl.when(u == n_qkv)
        def _attention():
            qkv = qkv_s[:]  # [S, qd + 2kvd]
            cos = cos_ref[:][:, None, :]  # [S, 1, half]
            sin = sin_ref[:][:, None, :]
            q = qkv[:, :qd].reshape(S, nq, d)
            k = qkv[:, qd : qd + kvd].reshape(S, nk, d)
            v = qkv[:, qd + kvd :].reshape(S, nk, d)
            q = _rms(q, qn_ref[0, 0], eps)
            k = _rms(k, kn_ref[0, 0], eps)
            half = d // 2

            def rope_s(x):
                x1, x2 = x[..., :half], x[..., half:]
                return jnp.concatenate(
                    [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
                )

            q = rope_s(q)
            k = rope_s(k)
            if kvq:
                k_sc = jnp.maximum(
                    jnp.max(jnp.abs(k), axis=-1, keepdims=True) / 127.0, 1e-8
                )  # [S, nk, 1]
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

            # qg rows: g_i * S + s (matches CAUSAL)
            qg = jnp.transpose(q.reshape(S, nk, g, d), (1, 2, 0, 3)).reshape(
                nk, g * S, d
            )
            k_new = jnp.transpose(k, (1, 0, 2))  # [nk, S, d] dequantized
            v_new = jnp.transpose(v, (1, 0, 2))
            inv_sqrt_d = 1.0 / (d**0.5)

            if mode == "vmem":
                # write the S new slots into the full block (S static selects)
                slot = jax.lax.broadcasted_iota(jnp.int32, (1, nk, T, d), 2)
                K_new = kc_in[:]
                V_new = vc_in[:]
                for s in range(S):
                    K_new = jnp.where(
                        slot == pos + s,
                        k_store[s][None, :, None, :].astype(kc_in.dtype), K_new,
                    )
                    V_new = jnp.where(
                        slot == pos + s,
                        v_store[s][None, :, None, :].astype(vc_in.dtype), V_new,
                    )
                kc_out[:] = K_new
                vc_out[:] = V_new
                K = K_new[0].astype(jnp.float32)
                V = V_new[0].astype(jnp.float32)
                if kvq:
                    sslot = jax.lax.broadcasted_iota(jnp.int32, (1, nk, T), 2)
                    ks_row = ks_in[:]
                    vs_row = vs_in[:]
                    for s in range(S):
                        ks_row = jnp.where(sslot == pos + s, k_sc[s][None], ks_row)
                        vs_row = jnp.where(sslot == pos + s, v_sc[s][None], vs_row)
                    ks_out[:] = ks_row
                    vs_out[:] = vs_row
                    ks_full = ks_row[0]  # [nk, T]
                    vs_full = vs_row[0]
                sc = jax.lax.dot_general(
                    qg, K, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * inv_sqrt_d  # [nk, gS, T]
                if kvq:
                    sc = sc * ks_full[:, None, :]
                # causal: query row (g_i*S + s) sees slot t <= pos + s
                # (masks built from in-kernel iota: Pallas kernels cannot
                # capture host constants)
                row_s = jax.lax.rem(
                    jax.lax.broadcasted_iota(jnp.int32, (nk, g * S, T), 1), S
                )
                tslot = jax.lax.broadcasted_iota(jnp.int32, (nk, g * S, T), 2)
                sc = jnp.where(tslot <= pos + row_s, sc, -1e30)
                m = jnp.max(sc, axis=-1, keepdims=True)
                e = jnp.exp(sc - m)
                w = e / jnp.sum(e, axis=-1, keepdims=True)
                if kvq:
                    w = w * vs_full[:, None, :]
                out = jax.lax.dot_general(
                    w, V, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [nk, gS, d]
                attn_s[:] = jnp.transpose(
                    out.reshape(nk, g, S, d), (2, 0, 1, 3)
                ).reshape(S, qd)
                return

            # --- win mode: RMW the S new slots, stream [0, pos) -----------
            w0 = jnp.minimum((pos // SLOT_W) * SLOT_W, T - RMW)
            w0 = pl.multiple_of(w0, SLOT_W)
            pltpu.make_async_copy(
                kc_in.at[l, :, pl.ds(w0, RMW), :], slot_k, sems.at[4]
            ).wait()
            pltpu.make_async_copy(
                vc_in.at[l, :, pl.ds(w0, RMW), :], slot_v, sems.at[5]
            ).wait()
            wslot = jax.lax.broadcasted_iota(jnp.int32, (nk, RMW, d), 1) + w0
            ksl = slot_k[:]
            vsl = slot_v[:]
            for s in range(S):
                ksl = jnp.where(
                    wslot == pos + s,
                    k_store[s][:, None, :].astype(slot_k.dtype), ksl,
                )
                vsl = jnp.where(
                    wslot == pos + s,
                    v_store[s][:, None, :].astype(slot_v.dtype), vsl,
                )
            slot_k[:] = ksl
            slot_v[:] = vsl
            kout = pltpu.make_async_copy(
                slot_k, kc_out.at[l, :, pl.ds(w0, RMW), :], sems.at[6]
            )
            vout = pltpu.make_async_copy(
                slot_v, vc_out.at[l, :, pl.ds(w0, RMW), :], sems.at[7]
            )
            kout.start()
            vout.start()
            souts = []
            if kvq:
                w0s = jnp.minimum((pos // 128) * 128, T - 256)
                w0s = pl.multiple_of(w0s, 128)
                pltpu.make_async_copy(
                    ks_in.at[l, :, pl.ds(w0s, 256)], slot_ks, sems.at[12]
                ).wait()
                pltpu.make_async_copy(
                    vs_in.at[l, :, pl.ds(w0s, 256)], slot_vs, sems.at[13]
                ).wait()
                sslot = (
                    jax.lax.broadcasted_iota(jnp.int32, (nk, 256), 1) + w0s
                )
                kss = slot_ks[:]
                vss = slot_vs[:]
                for s in range(S):
                    kss = jnp.where(sslot == pos + s, k_sc[s], kss)
                    vss = jnp.where(sslot == pos + s, v_sc[s], vss)
                slot_ks[:] = kss
                slot_vs[:] = vss
                kso = pltpu.make_async_copy(
                    slot_ks, ks_out.at[l, :, pl.ds(w0s, 256)], sems.at[14]
                )
                vso = pltpu.make_async_copy(
                    slot_vs, vs_out.at[l, :, pl.ds(w0s, 256)], sems.at[15]
                )
                kso.start()
                vso.start()
                souts = [kso, vso]

            n_win = pl.cdiv(pos, WINDOW)

            def win_body(i, carry):
                m, s_, acc = carry
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
                ) * inv_sqrt_d  # [nk, gS, W]
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
                    jax.lax.broadcasted_iota(jnp.int32, (nk, g * S, WINDOW), 2)
                    + i * WINDOW
                )
                sc = jnp.where(gslot < pos, sc, -1e30)
                m_new = jnp.maximum(m, jnp.max(sc, axis=-1, keepdims=True))
                alpha = jnp.exp(m - m_new)
                e = jnp.exp(sc - m_new)
                s_new = s_ * alpha + jnp.sum(e, axis=-1, keepdims=True)
                ew = e * vs_vm[buf][:, None, :] if kvq else e
                acc_new = acc * alpha + jax.lax.dot_general(
                    ew, V_w, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                return m_new, s_new, acc_new

            m0 = jnp.full((nk, g * S, 1), -1e30, jnp.float32)
            s0 = jnp.zeros((nk, g * S, 1), jnp.float32)
            a0 = jnp.zeros((nk, g * S, d), jnp.float32)
            m, s_, acc = jax.lax.fori_loop(0, n_win, win_body, (m0, s0, a0))

            # intra-block causal tail: the S new slots, from registers
            sc_d = jax.lax.dot_general(
                qg, k_new, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * inv_sqrt_d  # [nk, gS, S]
            # intra-block causal: key j <= query row's s (= row % S)
            rows_m = jax.lax.rem(
                jax.lax.broadcasted_iota(jnp.int32, (nk, g * S, S), 1), S
            )
            keys_m = jax.lax.broadcasted_iota(jnp.int32, (nk, g * S, S), 2)
            sc_d = jnp.where(keys_m <= rows_m, sc_d, -1e30)
            m2 = jnp.maximum(m, jnp.max(sc_d, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m2)
            e_d = jnp.exp(sc_d - m2)
            s_ = s_ * alpha + jnp.sum(e_d, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                e_d, v_new, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            out = acc / s_
            attn_s[:] = jnp.transpose(
                out.reshape(nk, g, S, d), (2, 0, 1, 3)
            ).reshape(S, qd)
            kout.wait()
            vout.wait()
            for so in souts:
                so.wait()

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


def fused_verify_step(
    cfg: TransformerConfig,
    fw: FusedStepWeights,
    x: jax.Array,  # [S, H] — the S candidate inputs
    pos: jax.Array,  # scalar int32 — first write slot (slots pos..pos+S-1)
    k_cache: jax.Array,  # [L, 1, nk, T, d]
    v_cache: jax.Array,
    k_scale=None,  # [L, 1, nk, T] f32 (int8 KV cache)
    v_scale=None,
    interpret: bool = False,
):
    """One fused S-token verify step (pre-final-norm output [S, H]).

    Returns (x_out, k_cache, v_cache[, k_scale, v_scale])."""
    S = x.shape[0]
    T = k_cache.shape[3]
    kvq = k_scale is not None
    if not verify_supported(cfg, T, S, kvq):
        raise ValueError(f"fused verify unsupported: T={T} S={S} kvq={kvq}")
    mode = "vmem" if T <= 512 else "win"
    # positions pos..pos+S-1 must fit (caller reserves budget below the top)
    pos = jnp.minimum(jnp.asarray(pos, jnp.int32), T - S)
    return _fused_verify_step_jit(cfg, fw, x, pos, k_cache, v_cache,
                                  k_scale, v_scale, interpret, mode)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "mode"))
def _fused_verify_step_jit(cfg, fw, x, pos, k_cache, v_cache, k_scale,
                           v_scale, interpret, mode):
    L = fw.units.shape[0]
    S = x.shape[0]
    T = k_cache.shape[3]
    H = cfg.hidden_size
    nk, d = cfg.num_kv_heads, cfg.head_dim
    qd, kvd, I = cfg.q_dim, cfg.kv_dim, cfg.intermediate_size
    kvq = k_scale is not None
    KU = fw.units.shape[2]
    w4 = KU == H // 2
    n_groups = fw.scales.shape[2]
    kernel, U = _make_verify_kernel(cfg, T, S, mode, w4, n_groups, kvq)
    SLOT_W = 32 if kvq else 8
    RMW = 2 * SLOT_W

    half = d // 2
    freqs = 1.0 / (cfg.rope_theta ** (jnp.arange(half, dtype=jnp.float32) / half))
    angles = (pos + jnp.arange(S, dtype=jnp.int32)).astype(jnp.float32)[
        :, None
    ] * freqs[None, :]
    cos = jnp.cos(angles)  # [S, half]
    sin = jnp.sin(angles)

    kc = k_cache.reshape(L, nk, T, d)
    vc = v_cache.reshape(L, nk, T, d)
    if kvq:
        ks = k_scale.reshape(L, nk, T)
        vs = v_scale.reshape(L, nk, T)

    norm_block = lambda l, u: (l, 0, 0)
    in_specs = [
        pl.BlockSpec(memory_space=_SMEM),
        pl.BlockSpec((S, H), lambda l, u: (0, 0), memory_space=_VMEM),
        pl.BlockSpec((S, half), lambda l, u: (0, 0), memory_space=_VMEM),
        pl.BlockSpec((S, half), lambda l, u: (0, 0), memory_space=_VMEM),
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
        pltpu.VMEM((S, H), jnp.float32),
        pltpu.VMEM((S, H), jnp.float32),
        pltpu.VMEM((S, qd + 2 * kvd), jnp.float32),
        pltpu.VMEM((S, qd), jnp.float32),
        pltpu.VMEM((S, 2 * I), jnp.float32),
    ]
    x_out_spec = pl.BlockSpec((S, H), lambda l, u: (0, 0), memory_space=_VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((S, H), jnp.float32),
        jax.ShapeDtypeStruct((L, nk, T, d), kc.dtype),
        jax.ShapeDtypeStruct((L, nk, T, d), vc.dtype),
    ]
    if kvq:
        out_shape += [
            jax.ShapeDtypeStruct((L, nk, T), jnp.float32),
            jax.ShapeDtypeStruct((L, nk, T), jnp.float32),
        ]
    if mode == "win":
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        in_specs += [any_spec, any_spec] + ([any_spec, any_spec] if kvq else [])
        out_specs = [x_out_spec, any_spec, any_spec] + (
            [any_spec, any_spec] if kvq else []
        )
        scratch += [
            pltpu.VMEM((2, nk, WINDOW, d), kc.dtype),
            pltpu.VMEM((2, nk, WINDOW, d), vc.dtype),
            pltpu.VMEM((nk, RMW, d), kc.dtype),
            pltpu.VMEM((nk, RMW, d), vc.dtype),
        ]
        if kvq:
            scratch += [
                pltpu.VMEM((2, nk, WINDOW), jnp.float32),
                pltpu.VMEM((2, nk, WINDOW), jnp.float32),
                pltpu.VMEM((nk, 256), jnp.float32),
                pltpu.VMEM((nk, 256), jnp.float32),
            ]
        scratch += [pltpu.SemaphoreType.DMA((16 if kvq else 8,))]
        aliases = {10: 1, 11: 2, 12: 3, 13: 4} if kvq else {10: 1, 11: 2}
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

    args = [
        jnp.asarray([pos], jnp.int32), x.astype(jnp.float32), cos, sin,
        fw.units, fw.scales, fw.attn_norm, fw.mlp_norm, fw.q_norm, fw.k_norm,
        kc, vc,
    ]
    if kvq:
        args += [ks, vs]
    compiler_params = None
    if not interpret and pltpu is not None:
        # S>1 activations + H=2048 shapes can exceed the 16 MB scoped-vmem
        # default; raise like ops/fused_step.py
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
