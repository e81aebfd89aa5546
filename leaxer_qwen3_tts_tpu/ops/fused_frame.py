"""Whole-frame fused decode: ONE Pallas dispatch per 12 Hz frame (B=1).

The sequential decode loop (runtime/generate._frame_step) spends a frame as
  sample code0 (XLA) -> codec_embed gather (XLA) -> resident MTP chain
  (kernel) -> drip/next-embed glue (XLA) -> talker step (kernel) -> final
  norm + lm_head (XLA)
— three dispatch boundaries plus ~0.3 ms of frame glue around two kernels
(docs/KERNEL_PLAN.md round-3 attribution).  This kernel runs the WHOLE
frame in one pallas_call over the talker's (L,) grid:

  * l == 0 prologue: code0 suppress/EOS-gate/sample (the in-kernel
    bisection sampler, ops/fused_mtp.gumbel_topk_topp_sample), the codec
    embed row gather, and the full resident MTP chain (ops/fused_mtp
    _chain_core — prefix included) with the trunk DMA'd into a VMEM
    scratch; finishes by seeding the talker residual stream with
    code0_embed + sub_sum + drip (reference next-input contract,
    tts_onnx.cpp:823-842).
  * every l: one manual-DMA talker layer (ops/fused_step._manual_layer_core
    — the measured-fastest unit schedule, bit-identical op sequence).
  * l == L-1 epilogue: talker final norm + lm_head matmul in-kernel (the
    head streams from HBM during the 28-layer walk), emitting the next
    frame's logits.

The big weight DMAs (MTP trunk ~78 MB int8, lm_head ~3 MB) are issued at
the top of the prologue so they overlap the sampler/chain compute; talker
units double-buffer exactly as in the standalone step kernel.

Numerics vs the multi-dispatch path: GREEDY code0/subcodes agree (argmax
is transport-invariant); SAMPLED draws are the same distribution from a
different random stream (in-kernel Gumbel sampler vs sample_token's
permuted top-K_CAP categorical), and the code0 logits use a bf16 lhs
in-kernel where the XLA path feeds f32 into the bf16-weight dot — both
per-seed deterministic.  Because the logits transport differs from the
spec-verify path's, frame-fused is SEQUENTIAL-ONLY: the engine never
combines it with spec_k (the spec==sequential greedy-identity contract is
pinned on the multi-dispatch path).  Default OFF (QTTS_FRAME_FUSED /
TTSModelConfig.frame_fused) until hardware-validated, like the resident
chain before it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
    _SMEM = pltpu.SMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None
    _SMEM = None

from ..config import CODEC_EOS, TransformerConfig
from .fused_mtp import (
    RESIDENT_MAX_BYTES,
    _chain_core,
    gumbel_topk_topp_sample,
)
from .fused_step import (
    N_UNIT,
    WINDOW,
    FusedStepWeights,
    _manual_layer_core,
    _ring,
    _rms,
)
from .quant import QuantizedLinear

# fixed VMEM beyond the resident trunk: lm_head scratch (<=6 MB bf16),
# talker unit ring (default ring=4 x <=2 MB), MTP head/table buffers
# (~6 MB), talker cache pipeline blocks (~3 MB/layer-pair), activations
_FRAME_FIXED = 24 * 1024 * 1024


def supports_frame(mfw: FusedStepWeights, T: int, cfg: TransformerConfig,
                   kvq: bool = False) -> bool:
    """True when the whole-frame kernel fits: int8/int4 MTP trunk resident
    within the VMEM budget, talker bucket in vmem mode (T <= 512,
    128-aligned under int8 KV) or win mode (any 512-multiple — the
    long-form path streams cache windows)."""
    if mfw.units.dtype != jnp.int8:
        return False  # bf16 trunks never fit (fused_mtp.supports_resident)
    if T <= 512:
        if kvq and T % 128 != 0:
            return False
    elif T % WINDOW != 0:
        return False
    from .fused_step import supports

    if not supports(cfg):
        return False
    return mfw.units.nbytes + _FRAME_FIXED <= RESIDENT_MAX_BYTES


def _make_frame_kernel(
    tcfg: TransformerConfig,
    mcfg: TransformerConfig,
    T: int,
    Vc: int,  # codec (code0) vocab
    n: int,  # MTP steps
    V: int,  # subcode vocab
    tw4: bool,
    t_groups: int,
    mw4: bool,
    m_groups: int,
    kvq: bool,
    ring: int,
    mode: str,
):
    run_layer, Ut = _manual_layer_core(tcfg, T, w4=tw4, n_groups=t_groups,
                                       kvq=kvq, ring=ring, mode=mode)
    run_chain, Um = _chain_core(mcfg, n, V, n + 2, mw4, m_groups)
    t_eps = tcfg.rms_norm_eps

    def kernel(*refs):
        (pos_ref, forbid_ref, temp_ref, topk_ref, topp_ref) = refs[:5]  # SMEM
        (ll_ref, sup_ref, g0_ref, lh_ref, drip_ref, cost_ref, sint_ref,
         tfn_ref, lms_ref) = refs[5:14]
        (ts_ref, tan_ref, tmn_ref, tqn_ref, tkn_ref, tw_hbm) = refs[14:20]
        i = 20
        kc_in, vc_in = refs[i : i + 2]
        i += 2
        ks_in = vs_in = None
        if kvq:
            ks_in, vs_in = refs[i : i + 2]
            i += 2
        lm_hbm, codec_hbm = refs[i : i + 2]
        i += 2
        (mcos_ref, msin_ref, ms_ref, man_ref, mmn_ref, mqn_ref, mkn_ref,
         mfn_ref, mhs_ref, mg_ref) = refs[i : i + 10]
        i += 10
        mw_hbm, mh_hbm, mt_hbm = refs[i : i + 3]
        i += 3
        code0_out, subc_out, logits_out, hidden_out = refs[i : i + 4]
        i += 4
        kc_out, vc_out = refs[i : i + 2]
        i += 2
        ks_out = vs_out = None
        if kvq:
            ks_out, vs_out = refs[i : i + 2]
            i += 2
        (x_s, h_s, qkv_s, attn_s, gu_s, tw_vm, tsems) = refs[i : i + 7]
        i += 7
        (mx_s, mh_s, mqkv_s, mattn_s, mgu_s, mhp_s, msum_s, mkc_s, mvc_s,
         mhead_vm, memb_vm, mw_vm, msems) = refs[i : i + 13]
        i += 13
        (c0e_vm, lm_vm, fsems) = refs[i : i + 3]
        i += 3
        win = None
        if mode == "win":
            n_w = 8 if kvq else 4
            win = tuple(refs[i : i + n_w])
            if not kvq:
                win = win + (None, None, None, None)
            win = win + (refs[i + n_w],)  # csems

        l = pl.program_id(0)
        L = pl.num_programs(0)
        pos = pos_ref[0]
        temp = temp_ref[0]
        top_k = topk_ref[0]
        top_p = topp_ref[0]

        @pl.when(l == 0)
        def _prologue():
            # big DMAs first: the talker unit ring for the layer walk, the
            # resident MTP trunk, and the lm_head — all overlap the
            # sampler + chain compute below
            for gi in range(ring - 1):
                pltpu.make_async_copy(
                    tw_hbm.at[0, gi], tw_vm.at[gi], tsems.at[gi]
                ).start()
            trunk_in = pltpu.make_async_copy(mw_hbm, mw_vm, fsems.at[0])
            trunk_in.start()
            pltpu.make_async_copy(lm_hbm, lm_vm, fsems.at[1]).start()

            # --- code0: suppress + EOS gate + sample (generate.py:96-99) ---
            lane = lax.broadcasted_iota(jnp.int32, (1, Vc), 1)
            logits0 = ll_ref[:] + sup_ref[:]
            logits0 = logits0 + jnp.where(
                (lane == CODEC_EOS) & (forbid_ref[0] != 0), -1e30, 0.0
            )
            c0 = gumbel_topk_topp_sample(
                logits0, g0_ref[:], temp, top_k, top_p
            )[0]
            code0_out[:] = jnp.full((1, 1), c0, jnp.int32)

            # codec embed row: Mosaic needs 8-aligned slices on the tiled
            # sublane dim, so the table arrives as [Vc//8, 8, H] — DMA the
            # aligned block holding c0, select the row in VMEM
            row = pltpu.make_async_copy(
                codec_hbm.at[lax.div(c0, 8)], c0e_vm, fsems.at[2]
            )
            row.start()
            row.wait()
            ce8 = c0e_vm[:].astype(jnp.float32)  # [8, H]
            rsel = (
                lax.broadcasted_iota(jnp.int32, (8, 1), 0) == lax.rem(c0, 8)
            )
            c0e = jnp.sum(jnp.where(rsel, ce8, 0.0), axis=0, keepdims=True)

            # --- resident MTP chain (prefix + n steps, in-kernel) ---
            trunk_in.wait()
            run_chain(
                temp, top_k, top_p, lh_ref[:], c0e, mcos_ref, msin_ref,
                mw_vm, ms_ref, man_ref, mmn_ref, mqn_ref, mkn_ref, mfn_ref,
                mh_hbm, mhs_ref, mt_hbm, mg_ref, subc_out, msum_s,
                mx_s, mh_s, mqkv_s, mattn_s, mgu_s, mhp_s, mkc_s, mvc_s,
                mhead_vm, memb_vm, msems,
            )

            # next talker input: codec sum + text drip (tts_onnx.cpp:823-842)
            x_s[:] = c0e + msum_s[:] + drip_ref[:]

        run_layer(
            l, L, pos, cost_ref[:], sint_ref[:], tw_hbm, ts_ref,
            tan_ref, tmn_ref, tqn_ref, tkn_ref, kc_in, vc_in, ks_in, vs_in,
            kc_out, vc_out, ks_out, vs_out,
            x_s, h_s, qkv_s, attn_s, gu_s, tw_vm, tsems, win=win,
        )

        @pl.when(l == L - 1)
        def _epilogue():
            hid = _rms(x_s[:], tfn_ref[:], t_eps)
            hidden_out[:] = hid
            pltpu.make_async_copy(lm_hbm, lm_vm, fsems.at[1]).wait()
            lw = lm_vm[:].astype(jnp.bfloat16)
            logits_out[:] = (
                lax.dot_general(
                    hid.astype(jnp.bfloat16), lw,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * lms_ref[:]
            )

    return kernel, Ut, Um


def fused_frame_step(
    tcfg: TransformerConfig,  # talker transformer
    mcfg: TransformerConfig,  # MTP trunk transformer
    tfw: FusedStepWeights,  # talker packed units (streamed)
    talker_fnorm: jax.Array,  # [H] — talker final norm
    lm_head,  # QuantizedLinear [H, Vc] | raw array
    codec_table: jax.Array,  # [codec_vocab, H] — codec_embed table
    mfw: FusedStepWeights,  # MTP trunk packed units (resident)
    mtp_fnorm: jax.Array,  # [H] — MTP final norm
    heads,  # QuantizedLinear [n, H, V] | raw
    tables: jax.Array,  # [n, Vt, H] — MTP step embed tables
    last_logits: jax.Array,  # [1, Vc] f32
    last_hidden: jax.Array,  # [1, H]
    suppress: jax.Array,  # [Vc] f32 — codec control-token mask
    drip: jax.Array,  # [1, H] — this frame's text-drip embedding
    pos: jax.Array,  # scalar int32 — talker write slot
    k_cache: jax.Array,  # [L, 1, nk, T, d]
    v_cache: jax.Array,
    g0: jax.Array,  # [1, Vc] f32 — code0 Gumbel noise
    gumbel: jax.Array,  # [n, 1, V] f32 — MTP noise rows
    temperature: jax.Array,
    top_k: jax.Array,
    top_p: jax.Array,
    forbid_eos: jax.Array,  # scalar bool/int
    k_scale=None,  # [L, 1, nk, T] f32 (int8 KV)
    v_scale=None,
    interpret: bool = False,
    mtp_cache_dtype=jnp.float32,
):
    """One whole 12 Hz frame in one kernel.

    Returns (code0 [1] i32, subcodes [1, n] i32, logits [1, Vc] f32,
    hidden [1, H] f32, k_cache, v_cache[, k_scale, v_scale])."""
    L = tfw.attn_norm.shape[0]
    T = k_cache.shape[3]
    H = tcfg.hidden_size
    nk, d = tcfg.num_kv_heads, tcfg.head_dim
    qd, kvd, I = tcfg.q_dim, tcfg.kv_dim, tcfg.intermediate_size
    kvq = k_scale is not None
    KUt = tfw.units.shape[2]
    tw4 = KUt == H // 2
    t_groups = tfw.scales.shape[2]
    Lm = mfw.attn_norm.shape[0]
    Hm = mcfg.hidden_size
    nkm, dm = mcfg.num_kv_heads, mcfg.head_dim
    qdm, kvdm, Im = mcfg.q_dim, mcfg.kv_dim, mcfg.intermediate_size
    KUm = mfw.units.shape[2]
    mw4 = KUm == Hm // 2
    m_groups = mfw.scales.shape[2]
    n, _, V = gumbel.shape
    Tm = n + 2
    Vc = last_logits.shape[-1]
    pos = jnp.minimum(jnp.asarray(pos, jnp.int32), T - 1)

    # aligned-block row gathers (see _chain_core): both embed tables are
    # reshaped so the kernel DMAs 8-row blocks off untiled leading dims
    Vt = tables.shape[1]
    if Vt % 8:
        tables = jnp.pad(tables, ((0, 0), (0, -Vt % 8), (0, 0)))
        Vt = tables.shape[1]
    tables = tables.reshape(n, Vt // 8, 8, tables.shape[-1])
    Vct = codec_table.shape[0]
    if Vct % 8:
        codec_table = jnp.pad(codec_table, ((0, -Vct % 8), (0, 0)))
        Vct = codec_table.shape[0]
    codec_table = codec_table.reshape(Vct // 8, 8, H)

    if isinstance(lm_head, QuantizedLinear):
        lmq, lms = lm_head.q, lm_head.scale.astype(jnp.float32).reshape(1, Vc)
    else:
        lmq = lm_head.astype(jnp.bfloat16)
        lms = jnp.ones((1, Vc), jnp.float32)
    if isinstance(heads, QuantizedLinear):
        mhq, mhs = heads.q, heads.scale.astype(jnp.float32)
    else:
        mhq = heads.astype(jnp.bfloat16)
        mhs = jnp.ones((n, 1, V), jnp.float32)

    half = d // 2
    freqs = 1.0 / (
        tcfg.rope_theta ** (jnp.arange(half, dtype=jnp.float32) / half)
    )
    ang = pos.astype(jnp.float32) * freqs
    cos_t = jnp.cos(ang)[None, :]
    sin_t = jnp.sin(ang)[None, :]
    halfm = dm // 2
    freqs_m = 1.0 / (
        mcfg.rope_theta ** (jnp.arange(halfm, dtype=jnp.float32) / halfm)
    )
    ang_m = jnp.arange(n + 1, dtype=jnp.float32)[:, None] * freqs_m[None, :]
    mcos = jnp.cos(ang_m)[:, None, :]
    msin = jnp.sin(ang_m)[:, None, :]

    kc = k_cache.reshape(L, nk, T, d)
    vc = v_cache.reshape(L, nk, T, d)

    ring = _ring()
    mode = "vmem" if T <= 512 else "win"
    SLOT_W = 32 if kvq else 8
    kernel, Ut, Um = _make_frame_kernel(
        tcfg, mcfg, T, Vc, n, V, tw4, t_groups, mw4, m_groups, kvq, ring,
        mode,
    )

    def const(shape):
        return pl.BlockSpec(shape, lambda l: (0,) * len(shape),
                            memory_space=_VMEM)

    norm_block = lambda l: (l, 0, 0)
    smem = pl.BlockSpec(memory_space=_SMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    if mode == "win":
        cache_spec = scale_spec = any_spec
    else:
        cache_spec = pl.BlockSpec((1, nk, T, d), lambda l: (l, 0, 0, 0),
                                  memory_space=_VMEM)
        scale_spec = pl.BlockSpec((1, nk, T), lambda l: (l, 0, 0),
                                  memory_space=_VMEM)

    in_specs = [
        smem, smem, smem, smem, smem,  # pos, forbid, temp, topk, topp
        const((1, Vc)),  # last_logits
        const((1, Vc)),  # suppress
        const((1, Vc)),  # g0
        const((1, H)),  # last_hidden
        const((1, H)),  # drip
        const((1, half)),  # cos_t
        const((1, half)),  # sin_t
        const((1, H)),  # talker final norm
        const((1, Vc)),  # lm scale
        pl.BlockSpec((1, Ut, t_groups, N_UNIT), lambda l: (l, 0, 0, 0),
                     memory_space=_VMEM),  # talker scales (layer block)
        pl.BlockSpec((1, 1, H), norm_block, memory_space=_VMEM),
        pl.BlockSpec((1, 1, H), norm_block, memory_space=_VMEM),
        pl.BlockSpec((1, 1, d), norm_block, memory_space=_VMEM),
        pl.BlockSpec((1, 1, d), norm_block, memory_space=_VMEM),
        any_spec,  # talker units (manual stream)
        cache_spec,
        cache_spec,
    ]
    if kvq:
        in_specs += [scale_spec, scale_spec]
    in_specs += [
        any_spec,  # lm_head
        any_spec,  # codec table
        const((n + 1, 1, halfm)),  # mtp cos
        const((n + 1, 1, halfm)),  # mtp sin
        const((Lm, Um, m_groups, N_UNIT)),  # mtp scales
        const((Lm, 1, Hm)),  # mtp attn norm
        const((Lm, 1, Hm)),  # mtp mlp norm
        const((Lm, 1, dm)),  # mtp q norm
        const((Lm, 1, dm)),  # mtp k norm
        const((1, Hm)),  # mtp final norm
        const((n, 1, V)),  # mtp head scales
        const((n, 1, V)),  # mtp gumbel
        any_spec,  # mtp trunk units -> scratch
        any_spec,  # mtp heads
        any_spec,  # mtp tables
    ]
    out_specs = [
        const((1, 1)),  # code0
        const((1, n)),  # subcodes
        const((1, Vc)),  # logits
        const((1, H)),  # hidden
        cache_spec,
        cache_spec,
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, 1), jnp.int32),
        jax.ShapeDtypeStruct((1, n), jnp.int32),
        jax.ShapeDtypeStruct((1, Vc), jnp.float32),
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
        pltpu.VMEM((ring, KUt, N_UNIT), tfw.units.dtype),  # talker unit ring
        pltpu.SemaphoreType.DMA((ring,)),  # tsems
        pltpu.VMEM((1, Hm), jnp.float32),  # mx_s
        pltpu.VMEM((1, Hm), jnp.float32),  # mh_s
        pltpu.VMEM((1, qdm + 2 * kvdm), jnp.float32),  # mqkv_s
        pltpu.VMEM((1, qdm), jnp.float32),  # mattn_s
        pltpu.VMEM((1, 2 * Im), jnp.float32),  # mgu_s
        pltpu.VMEM((1, Hm), jnp.float32),  # mhp_s
        pltpu.VMEM((1, Hm), jnp.float32),  # msum_s
        pltpu.VMEM((Lm, nkm, Tm, dm), mtp_cache_dtype),  # mkc_s
        pltpu.VMEM((Lm, nkm, Tm, dm), mtp_cache_dtype),  # mvc_s
        pltpu.VMEM((2, Hm, V), mhq.dtype),  # MTP head double buffer
        pltpu.VMEM((8, Hm), tables.dtype),  # MTP emb 8-row block
        pltpu.VMEM((Lm, Um, KUm, N_UNIT), mfw.units.dtype),  # trunk scratch
        pltpu.SemaphoreType.DMA((3,)),  # msems
        pltpu.VMEM((8, H), codec_table.dtype),  # c0e_vm (8-row block)
        pltpu.VMEM((H, Vc), lmq.dtype),  # lm_vm
        pltpu.SemaphoreType.DMA((3,)),  # fsems
    ]
    aliases = {}
    if mode == "win":
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
        kc_idx = 20  # 5 smem + 9 const + 5 talker layer blocks + tw ANY
        aliases = {kc_idx: 4, kc_idx + 1: 5}
        if kvq:
            aliases.update({kc_idx + 2: 6, kc_idx + 3: 7})
    args = [
        jnp.asarray([pos], jnp.int32),
        jnp.asarray([forbid_eos], jnp.int32).reshape(-1)[:1],
        jnp.reshape(jnp.asarray(temperature, jnp.float32), (-1,))[:1],
        jnp.reshape(jnp.asarray(top_k, jnp.int32), (-1,))[:1],
        jnp.reshape(jnp.asarray(top_p, jnp.float32), (-1,))[:1],
        last_logits.astype(jnp.float32),
        suppress.astype(jnp.float32).reshape(1, Vc),
        g0.astype(jnp.float32),
        last_hidden.astype(jnp.float32),
        drip.astype(jnp.float32),
        cos_t,
        sin_t,
        talker_fnorm.astype(jnp.float32).reshape(1, H),
        lms,
        tfw.scales,
        tfw.attn_norm,
        tfw.mlp_norm,
        tfw.q_norm,
        tfw.k_norm,
        tfw.units,
        kc,
        vc,
    ]
    if kvq:
        args += [k_scale.reshape(L, nk, T), v_scale.reshape(L, nk, T)]
    args += [
        lmq,
        codec_table,
        mcos,
        msin,
        mfw.scales,
        mfw.attn_norm,
        mfw.mlp_norm,
        mfw.q_norm,
        mfw.k_norm,
        mtp_fnorm.astype(jnp.float32).reshape(1, Hm),
        mhs,
        gumbel.astype(jnp.float32),
        mfw.units,
        mhq,
        tables,
    ]
    compiler_params = None
    if not interpret and pltpu is not None:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=118 * 1024 * 1024
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
    code0, subc, logits, hidden = outs[:4]
    kc_out = outs[4].reshape(L, 1, nk, T, d)
    vc_out = outs[5].reshape(L, 1, nk, T, d)
    code0 = code0.reshape(1)
    if kvq:
        return (code0, subc, logits, hidden, kc_out, vc_out,
                outs[6].reshape(L, 1, nk, T), outs[7].reshape(L, 1, nk, T))
    return code0, subc, logits, hidden, kc_out, vc_out
