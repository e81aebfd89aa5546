#!/usr/bin/env python3
"""Headline benchmark: RTF on Qwen3-TTS 0.6B, single chip.

Measures the full generation path (prefill -> chunked talker+MTP decode ->
streaming vocoder) on random-init 0.6B weights (compute is weight-value
independent), EOS suppressed so every run generates exactly BENCH_FRAMES
frames.  Prints ONE JSON line:

  {"metric": "rtf_0.6b_1chip", "value": <RTF>, "unit": "x_realtime",
   "vs_baseline": <RTF / 20.0>, ...detail fields...}

vs_baseline is against the 20x-real-time north-star target (BASELINE.md; the
reference publishes no numbers, SURVEY §6).  Env knobs: BENCH_FRAMES (default
192), BENCH_BATCH (1), BENCH_CHUNK (32), BENCH_TTFA_CHUNK (8).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def sync(x) -> None:
    """Hard sync: fetch one scalar to the host.  block_until_ready has been
    observed to return early over the axon TPU tunnel; a device->host copy
    cannot complete before the producing computation has."""
    import numpy as _np

    leaf = jax.tree_util.tree_leaves(x)[0]
    _np.asarray(jax.device_get(leaf.ravel()[0]))


def main() -> None:
    from leaxer_qwen3_tts_tpu.config import (
        FRAME_RATE,
        QWEN3_TTS_06B,
        QWEN3_TTS_17B,
    )
    from leaxer_qwen3_tts_tpu.models.codec12hz import vocoder_forward
    from leaxer_qwen3_tts_tpu.runtime.generate import make_generate_fns
    from leaxer_qwen3_tts_tpu.runtime.sampling import SamplingParams
    from leaxer_qwen3_tts_tpu.runtime.weights import init_params

    platform = jax.default_backend()
    on_accel = platform in ("tpu", "axon", "gpu")
    # defaults: a 32 s utterance decoded in 96-frame chunks — the sustained
    # single-stream serving shape (TTFA uses its own 8-frame first chunk)
    frames = int(os.environ.get("BENCH_FRAMES", "384" if on_accel else "16"))
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    chunk = int(os.environ.get("BENCH_CHUNK", "96" if on_accel else "8"))
    ttfa_chunk = int(os.environ.get("BENCH_TTFA_CHUNK", "8"))
    frames = max(chunk, (frames // chunk) * chunk)
    log(f"bench: platform={platform} frames={frames} batch={batch} chunk={chunk}")

    model = os.environ.get("BENCH_MODEL", "0.6b")
    cfg = QWEN3_TTS_17B if model == "1.7b" else QWEN3_TTS_06B
    mtp_impl = os.environ.get("BENCH_MTP")
    if mtp_impl:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, code_predictor=dataclasses.replace(cfg.code_predictor, impl=mtp_impl)
        )
    else:
        mtp_impl = cfg.code_predictor.impl
    # First device contact per process pays a tunnel/session init whose
    # latency is wildly variable (measured 5 s ... 788 s for a 1 MB put —
    # THE root cause of every "init regression" reading; transfers and
    # compiles are fast once connected).  Pay and report it separately so
    # init/fill numbers describe the model, not the tunnel.
    import numpy as _np0

    t0 = time.perf_counter()
    sync(jax.device_put(_np0.zeros(8, _np0.float32)))
    connect_s = time.perf_counter() - t0
    log(f"tunnel connect (first device contact): {connect_s:.1f}s")
    t0 = time.perf_counter()
    # benchmark timing is weight-value independent; fill with a cheap
    # deterministic pattern instead of threefry normals (which cost minutes of
    # compile+generate for 600M params over the tunnel)
    shapes = jax.eval_shape(
        lambda k: init_params(cfg, k, with_speaker_encoder=False),
        jax.random.PRNGKey(0),
    )

    # HOST-side fill + ONE batched device_put: ANY on-device fill program
    # pays the axon remote-compile service, whose latency is wildly variable
    # (5 s to 500+ s for the SAME program across runs — the root cause of the
    # round-2 "init regression").  Transfers must batch too: measured ~2.5 s
    # of tunnel overhead PER device_put call (100 separate 1 MB puts = 247 s,
    # one batched call = 0.5 s).
    import numpy as _np

    def fast_fill(shapes):
        import ml_dtypes

        np_dt = {"bfloat16": ml_dtypes.bfloat16}
        leaves, treedef = jax.tree_util.tree_flatten(shapes)
        host = []
        for i, sd in enumerate(leaves):
            n = 1
            for dd in sd.shape:
                n *= dd
            v = (_np.arange(n, dtype=_np.float32) * 16807.0 + i * 131.0) % 199.0
            arr = ((v / 199.0 - 0.5) * 0.04).reshape(sd.shape)
            host.append(arr.astype(np_dt.get(str(sd.dtype), sd.dtype)))
        return jax.tree_util.tree_unflatten(treedef, jax.device_put(host))

    # per-stage init timing keeps any recurrence diagnosable from the log
    def stamp(name):
        log(f"  init/{name}: +{time.perf_counter() - t0:.1f}s")

    params = fast_fill(shapes)
    sync(params["talker"]["lm_head"])
    stamp("fill")
    if os.environ.get("BENCH_NO_FUSE") != "1":
        from leaxer_qwen3_tts_tpu.ops.quant import fuse_params

        params = jax.jit(fuse_params)(params)  # qkv/gate-up fused (engine default)
    bf16_params = params
    quant = os.environ.get("BENCH_QUANT", "int8")
    on_tpu = platform == "tpu"  # fused kernels interpret (=crawl) off-TPU
    mtp_quant = os.environ.get("BENCH_MTP_QUANT")  # int4: engine mtp_quantize

    # Headline config (round 4+): int8 weights + int8 KV cache — the best
    # validated single-stream configuration on record (1.99 vs 2.26 ms/frame
    # same-run A/B after the 128-aligned kvq buckets, docs/BENCH_EVIDENCE_r4.md;
    # engine flag --kv-quant, models/layers.py int8 cache).  BENCH_KV_QUANT=0
    # restores the f32-KV headline; whichever arm is NOT the headline is still
    # measured and reported (decode_f32kv_ms_per_frame / decode_kvq_*), and the
    # JSON carries "kv_quant" so rounds compare like against like.  The spec
    # probes and the bf16 fidelity probe stay on the f32-KV config (their
    # longitudinal baselines).
    import dataclasses

    def _with_kvq(c):
        return dataclasses.replace(
            c,
            talker=dataclasses.replace(
                c.talker,
                transformer=dataclasses.replace(
                    c.talker.transformer, kv_cache_quant=True
                ),
            ),
        )

    kv_quant_hl = (
        os.environ.get(
            "BENCH_KV_QUANT",
            # int8 KV is the measured single-stream winner at 0.6B (1.99 vs
            # 2.26 ms/frame) but LOSES at 1.7B (9.00 vs 8.75 decode-only,
            # like-for-like A/B, docs/BENCH_EVIDENCE_r5.md) — headline each
            # model size on its best-known cache config; the other cache
            # mode is still measured as an A/B arm either way
            "1" if (on_tpu and quant == "int8" and model != "1.7b") else "0",
        )
        == "1"
    )
    cfg_f32kv = cfg
    if kv_quant_hl:
        cfg = _with_kvq(cfg)
    # kvq buckets must be 128-aligned to stay on the fused path (talker.py
    # max_len%128 gate); align the f32 headline too so A/B shares the bucket
    blen_hl = ((frames + 32 + 127) // 128) * 128
    if mtp_impl == "fused" and on_tpu and mtp_quant == "int4":
        # mixed-precision MTP trunk (engine mtp_quantize=int4): pack from the
        # RAW weights BEFORE quantize_params (the int4 grid needs raw arrays)
        from leaxer_qwen3_tts_tpu.models.code_predictor import prepare_fused_step

        params["code_predictor"] = jax.jit(
            lambda p: prepare_fused_step(cfg.code_predictor, p, bits=4)
        )(params["code_predictor"])
    if quant == "int8":  # headline config: int8 weight-only (engine --quantize)
        from leaxer_qwen3_tts_tpu.ops.quant import quantize_params

        params = jax.jit(quantize_params)(params)
    sync(params["talker"]["transformer"]["layers"].get("wqkv", params["talker"]["lm_head"]))
    stamp("fuse+quant")
    if (
        mtp_impl == "fused"
        and on_tpu
        and "fused_step" not in params["code_predictor"]
    ):
        from leaxer_qwen3_tts_tpu.models.code_predictor import prepare_fused_step

        params["code_predictor"] = jax.jit(
            lambda p: prepare_fused_step(cfg.code_predictor, p)
        )(params["code_predictor"])
    if (
        cfg.talker.decode_impl == "fused"
        and on_tpu
        and os.environ.get("BENCH_NO_FUSED_TALKER") != "1"
    ):
        from leaxer_qwen3_tts_tpu.models.talker import prepare_fused_talker

        params["talker"] = jax.jit(
            lambda p: prepare_fused_talker(cfg.talker, p)
        )(params["talker"])
    sync(params["talker"]["lm_head"])
    log(f"init {model} params (quant={quant}): {time.perf_counter() - t0:.1f}s")

    T = 16
    ids = jnp.full((batch, T), 100, jnp.int32)
    lens = jnp.full((batch,), T, jnp.int32)
    key = jax.random.PRNGKey(1)
    sp = SamplingParams.create(temperature=0.8, forbid_eos=True)

    fns = make_generate_fns(cfg, batch=batch, max_len=blen_hl,
                            chunk_len=chunk, params=params)
    voc = jax.jit(
        lambda p, codes: vocoder_forward(cfg.vocoder, p, codes)
    )

    def decode_chunk(state, bundle):
        return fns.decode(
            params, state, bundle.trailing, bundle.trailing_len, bundle.tts_pad_embed, sp
        )

    # --- compile warmup -----------------------------------------------------
    t0 = time.perf_counter()
    state, bundle = fns.prefill(params, ids, lens, key)
    sync(state.last_logits)
    log(f"prefill compile+run: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    state, frames_out, valid = decode_chunk(state, bundle)
    sync(frames_out)
    log(f"decode chunk compile+run: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    audio = voc(params["vocoder"], frames_out)
    sync(audio)
    log(f"vocoder compile+run: {time.perf_counter() - t0:.1f}s")

    # --- measured prefill (compiled; diagnostic — includes one tunnel RPC) --
    t0 = time.perf_counter()
    state, bundle = fns.prefill(params, ids, lens, key)
    sync(state.last_logits)
    prefill_s = time.perf_counter() - t0

    # --- measured end-to-end request: prefill + decode + streaming vocode ---
    # Everything chains through `state` with ONE final sync: the axon tunnel
    # costs ~33-60 ms per synced call (measured, host-RPC latency, not TPU
    # time), so syncing after prefill would bill a tunnel round-trip to the
    # model.  Production hosts attached to the chip see the chained numbers;
    # prefill_ms above is the RPC-inflated diagnostic.
    n_chunks = frames // chunk
    audios = []
    t0 = time.perf_counter()
    state, bundle = fns.prefill(params, ids, lens, key)
    for i in range(n_chunks):
        state, frames_out, valid = decode_chunk(state, bundle)
        audios.append(voc(params["vocoder"], frames_out))
    for a in audios:
        sync(a)
    total_s = time.perf_counter() - t0

    audio_s = frames / FRAME_RATE * batch  # aggregate audio across streams
    rtf = audio_s / total_s
    frame_ms = total_s / (n_chunks * chunk) * 1e3  # incl. amortized prefill
    vocode_s = 0.0  # folded into the chained pipeline

    # --- TTFA: small first chunk (prefill + ttfa_chunk frames + vocode) -----
    fns_s = make_generate_fns(
        cfg, batch=batch, max_len=blen_hl, chunk_len=ttfa_chunk,
        params=params,
    )
    state_s, bundle_s = fns_s.prefill(params, ids, lens, key)
    state_s, fr_s, _ = fns_s.decode(
        params, state_s, bundle_s.trailing, bundle_s.trailing_len,
        bundle_s.tts_pad_embed, sp,
    )
    a = voc(params["vocoder"], fr_s)
    sync(a)  # compile
    t0 = time.perf_counter()
    state_s, bundle_s = fns_s.prefill(params, ids, lens, key)
    state_s, fr_s, _ = fns_s.decode(
        params, state_s, bundle_s.trailing, bundle_s.trailing_len,
        bundle_s.tts_pad_embed, sp,
    )
    a = voc(params["vocoder"], fr_s)
    sync(a)
    ttfa_s = time.perf_counter() - t0

    # --- resident-chain A/B (opt-in): same decode with QTTS_MTP_RESIDENT=0
    # so the committed artifact carries the resident-vs-per-step delta -------
    perstep_frame_ms = None
    if os.environ.get("BENCH_RESIDENT_AB") == "1":
        prev_resident = os.environ.get("QTTS_MTP_RESIDENT")
        try:
            os.environ["QTTS_MTP_RESIDENT"] = "0"
            fns_ab = make_generate_fns(
                cfg, batch=batch, max_len=blen_hl, chunk_len=chunk,
                params=params,
            )
            st_ab, bd_ab = fns_ab.prefill(params, ids, lens, key)
            st_ab, fr_ab, _ = fns_ab.decode(
                params, st_ab, bd_ab.trailing, bd_ab.trailing_len,
                bd_ab.tts_pad_embed, sp,
            )
            sync(fr_ab)  # compile
            nab = max(2, n_chunks // 2)
            t0 = time.perf_counter()
            for _ in range(nab):
                st_ab, fr_ab, _ = fns_ab.decode(
                    params, st_ab, bd_ab.trailing, bd_ab.trailing_len,
                    bd_ab.tts_pad_embed, sp,
                )
            sync(fr_ab)
            perstep_frame_ms = round(
                (time.perf_counter() - t0) / (nab * chunk) * 1e3, 2
            )
            log(f"per-step MTP (QTTS_MTP_RESIDENT=0): "
                f"{perstep_frame_ms:.2f} ms/frame")
        except Exception as e:
            log(f"resident A/B probe failed: {e}")
        finally:
            if prev_resident is None:
                os.environ.pop("QTTS_MTP_RESIDENT", None)
            else:
                os.environ["QTTS_MTP_RESIDENT"] = prev_resident

    # --- whole-frame-kernel A/B (opt-in): same decode with
    # QTTS_FRAME_FUSED=1 (ops/fused_frame.py — one dispatch per frame) ------
    frame_fused_ms = None
    if os.environ.get("BENCH_FRAME_AB") == "1":
        prev_ff = os.environ.get("QTTS_FRAME_FUSED")
        prev_res = os.environ.get("QTTS_MTP_RESIDENT")
        try:
            os.environ["QTTS_FRAME_FUSED"] = "1"
            os.environ["QTTS_MTP_RESIDENT"] = "1"  # gate needs resident fit
            fns_ff = make_generate_fns(
                cfg, batch=batch, max_len=blen_hl, chunk_len=chunk,
                params=params,
            )
            st_ff, bd_ff = fns_ff.prefill(params, ids, lens, key)
            st_ff, fr_ff, _ = fns_ff.decode(
                params, st_ff, bd_ff.trailing, bd_ff.trailing_len,
                bd_ff.tts_pad_embed, sp,
            )
            sync(fr_ff)  # compile
            nff = max(2, n_chunks // 2)
            t0 = time.perf_counter()
            for _ in range(nff):
                st_ff, fr_ff, _ = fns_ff.decode(
                    params, st_ff, bd_ff.trailing, bd_ff.trailing_len,
                    bd_ff.tts_pad_embed, sp,
                )
            sync(fr_ff)
            frame_fused_ms = round(
                (time.perf_counter() - t0) / (nff * chunk) * 1e3, 2
            )
            log(f"whole-frame kernel (QTTS_FRAME_FUSED=1): "
                f"{frame_fused_ms:.2f} ms/frame")
        except Exception as e:
            log(f"frame-fused A/B probe failed: {e}")
        finally:
            for k, v in (("QTTS_FRAME_FUSED", prev_ff),
                         ("QTTS_MTP_RESIDENT", prev_res)):
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    # --- multi-stream serving throughput (batched, same params) -------------
    serving = {}
    if batch == 1 and os.environ.get("BENCH_SKIP_SERVING") != "1":
        for Bs in (8, 32):
            try:
                # round the bucket so the batched fused kernel's window size
                # divides it (engine ladder buckets are aligned already);
                # the batched fused talker + MTP kernels now cover B <= 32
                blen = ((frames + 32 + 127) // 128) * 128
                fnsb = make_generate_fns(
                    cfg, batch=Bs, max_len=blen, chunk_len=chunk,
                    params=params,
                )
                idsb = jnp.full((Bs, T), 100, jnp.int32)
                lensb = jnp.full((Bs,), T, jnp.int32)
                stb, bdb = fnsb.prefill(params, idsb, lensb, key)
                stb, frb, _ = fnsb.decode(
                    params, stb, bdb.trailing, bdb.trailing_len, bdb.tts_pad_embed, sp
                )
                sync(frb)  # compile
                ab = voc(params["vocoder"], frb)
                sync(ab)  # compile vocoder at this batch
                nb = max(2, n_chunks // 2)
                t0 = time.perf_counter()
                abs_ = []
                for _ in range(nb):
                    stb, frb, _ = fnsb.decode(
                        params, stb, bdb.trailing, bdb.trailing_len, bdb.tts_pad_embed, sp
                    )
                    abs_.append(voc(params["vocoder"], frb))
                for ab in abs_:
                    sync(ab)
                dtb = time.perf_counter() - t0
                serving[Bs] = (nb * chunk * Bs / FRAME_RATE) / dtb
                log(f"serving batch{Bs}: {serving[Bs]:.1f}x aggregate RTF")
                # release the B=32 state before later stages (at 1.7B the
                # retained caches stack toward RESOURCE_EXHAUSTED in the
                # B=32 spec arm)
                stb = bdb = frb = fnsb = abs_ = ab = None  # noqa: F841
            except Exception as e:  # never fail the headline on the extra probe
                log(f"serving probe (B={Bs}) failed: {e}")

    # --- bf16 (quality-exact parity config) probe, batch 1 ------------------
    bf16_frame_ms = None
    if quant == "int8" and os.environ.get("BENCH_SKIP_BF16") != "1":
        try:
            # engine quantize=None now packs bf16 (bits=16) fused units —
            # measure that config, not bare XLA decode (round-4)
            if mtp_impl == "fused" and on_tpu:
                from leaxer_qwen3_tts_tpu.models.code_predictor import (
                    prepare_fused_step,
                )

                # BENCH_BF16_MTP_QUANT=int8: the bf16 engine with only the
                # 6-layer MTP trunk quantized (engine mtp_quantize under
                # quantize=None) — the trunk then fits VMEM and the
                # resident-chain kernel engages; everything else stays
                # unquantized (the smallest-fidelity-bet >=20x candidate)
                bf_mtp_bits = (
                    8 if os.environ.get("BENCH_BF16_MTP_QUANT") == "int8"
                    else 16
                )
                bf16_params = dict(bf16_params)
                bf16_params["code_predictor"] = jax.jit(
                    lambda p: prepare_fused_step(
                        cfg.code_predictor, p, bits=bf_mtp_bits
                    )
                )(bf16_params["code_predictor"])
            if (
                cfg.talker.decode_impl == "fused"
                and on_tpu
                and os.environ.get("BENCH_NO_FUSED_TALKER") != "1"
            ):
                from leaxer_qwen3_tts_tpu.models.talker import (
                    prepare_fused_talker,
                )

                bf16_params = dict(bf16_params)
                bf16_params["talker"] = jax.jit(
                    lambda p: prepare_fused_talker(cfg.talker, p, bits=16)
                )(bf16_params["talker"])
            # bf16 measures the quality-exact parity config — keep it on the
            # f32 KV cache (its longitudinal baseline) even when the headline
            # runs int8 KV
            fns_bf = make_generate_fns(cfg_f32kv, batch=batch, max_len=blen_hl,
                                       chunk_len=chunk, params=bf16_params)
            stq, bdq = fns_bf.prefill(bf16_params, ids, lens, key)
            stq, frq, _ = fns_bf.decode(
                bf16_params, stq, bdq.trailing, bdq.trailing_len, bdq.tts_pad_embed, sp
            )
            sync(frq)  # compile
            nq = max(2, n_chunks // 2)
            t0 = time.perf_counter()
            for _ in range(nq):
                stq, frq, _ = fns_bf.decode(
                    bf16_params, stq, bdq.trailing, bdq.trailing_len, bdq.tts_pad_embed, sp
                )
            sync(frq)
            bf16_frame_ms = (time.perf_counter() - t0) / (nq * chunk) * 1e3
            log(f"bf16 decode: {bf16_frame_ms:.2f} ms/frame")
            stq = bdq = frq = fns_bf = None  # noqa: F841 — free before spec
        except Exception as e:
            log(f"bf16 probe failed: {e}")

    # --- long-form probe: 2048-frame KV bucket (BASELINE config 4) ----------
    # bucket 2560 = 2048+32 rounded to the fused kernel's 512-slot window
    # (the engine ladder rounds identically).  The windowed kernel streams
    # K/V only up to the fill level, so early long-form frames are CHEAPER
    # than the bucket suggests; the probe measures the fresh-cache regime.
    long_frame_ms = None
    if os.environ.get("BENCH_SKIP_LONGFORM") != "1":
        try:
            # pinned to the f32-KV config like the other longitudinal
            # baselines (ADVICE r4: the kvq long-form regime has its own
            # longform_kvq_ms_per_frame field below)
            fnsl = make_generate_fns(cfg_f32kv, batch=1, max_len=2560,
                                     chunk_len=chunk, params=params)
            stl, bdl = fnsl.prefill(params, ids[:1], lens[:1], key)
            # fast-forward to the EXPENSIVE end of a 2048-frame request (the
            # windowed kernel streams K/V only up to the fill level, so a
            # fresh cache would measure the cheap regime)
            fill = jnp.asarray(2000, jnp.int32)
            stl = stl._replace(
                pos=jnp.full_like(stl.pos, fill),
                cache=stl.cache._replace(
                    length=jnp.full_like(stl.cache.length, fill)
                ),
                valid_mask=jnp.ones_like(stl.valid_mask),
            )
            stl, frl, _ = fnsl.decode(
                params, stl, bdl.trailing, bdl.trailing_len, bdl.tts_pad_embed, sp
            )
            sync(frl)  # compile
            t0 = time.perf_counter()
            for _ in range(2):
                stl, frl, _ = fnsl.decode(
                    params, stl, bdl.trailing, bdl.trailing_len, bdl.tts_pad_embed, sp
                )
            sync(frl)
            long_frame_ms = (time.perf_counter() - t0) / (2 * chunk) * 1e3
            log(f"long-form (2048-frame bucket) decode: {long_frame_ms:.2f} ms/frame")
            # the 2560-bucket f32 cache is ~0.6 GB at 1.7B — free it
            stl = bdl = frl = fnsl = None  # noqa: F841
        except Exception as e:
            log(f"long-form probe failed: {e}")

    # --- int8 KV cache probes (models/layers.py kv_cache_quant) -------------
    # the KV-byte-bound regimes: batched serving (B>=8) and long-form decode.
    # Same weights; only the cache dtype/scales differ.
    kvq_results = {}
    if batch == 1 and os.environ.get("BENCH_SKIP_KVQ") != "1" and kv_quant_hl:
        # the headline already runs the int8 KV cache: measure the f32-KV arm
        # single-stream so the artifact carries the same-run A/B delta
        try:
            fnsk = make_generate_fns(cfg_f32kv, batch=1, max_len=blen_hl,
                                     chunk_len=chunk, params=params)
            stk, bdk = fnsk.prefill(params, ids[:1], lens[:1], key)
            stk, frk, _ = fnsk.decode(
                params, stk, bdk.trailing, bdk.trailing_len,
                bdk.tts_pad_embed, sp,
            )
            sync(frk)  # compile
            nk_ = max(2, n_chunks // 2)
            t0 = time.perf_counter()
            for _ in range(nk_):
                stk, frk, _ = fnsk.decode(
                    params, stk, bdk.trailing, bdk.trailing_len,
                    bdk.tts_pad_embed, sp,
                )
            sync(frk)
            kvq_results["decode_f32kv_ms_per_frame"] = round(
                (time.perf_counter() - t0) / (nk_ * chunk) * 1e3, 2
            )
            log(f"single-stream (f32 KV A/B): "
                f"{kvq_results['decode_f32kv_ms_per_frame']:.2f} ms/frame")
            # like-for-like kvq arm: the HEADLINE number folds in amortized
            # prefill + the chained vocoder, so comparing it against the
            # decode-only f32 arm above overstates kvq cost (at 1.7B the
            # bias flipped the sign of the A/B).  Measure the kvq config
            # with the IDENTICAL decode-only loop.
            stq2, bdq2 = fns.prefill(params, ids[:1], lens[:1], key)
            t0 = time.perf_counter()
            for _ in range(nk_):
                stq2, frq2, _ = fns.decode(
                    params, stq2, bdq2.trailing, bdq2.trailing_len,
                    bdq2.tts_pad_embed, sp,
                )
            sync(frq2)
            kvq_results["decode_kvq_ms_per_frame"] = round(
                (time.perf_counter() - t0) / (nk_ * chunk) * 1e3, 2
            )
            log(f"single-stream (int8-KV, decode-only A/B): "
                f"{kvq_results['decode_kvq_ms_per_frame']:.2f} ms/frame")
            # release the A/B states BEFORE the serving/spec stages: at 1.7B
            # the B=32 f32-KV spec arm allocates a ~7.5 GB cache and retained
            # probe buffers tip it into RESOURCE_EXHAUSTED (observed: this
            # arm's extra ~150 MB OOM'd serving_spec_b32 on a 16 GB chip)
            stk = bdk = frk = stq2 = bdq2 = frq2 = fnsk = None  # noqa: F841
        except Exception as e:
            log(f"f32-KV A/B probe failed: {e}")
    if batch == 1 and os.environ.get("BENCH_SKIP_KVQ") != "1" and not kv_quant_hl:
        kvq_cfg = _with_kvq(cfg)
        for Bs in (8, 32):
            try:
                blen = ((frames + 32 + 127) // 128) * 128
                fnsq = make_generate_fns(
                    kvq_cfg, batch=Bs, max_len=blen, chunk_len=chunk,
                    params=params,
                )
                idsb = jnp.full((Bs, T), 100, jnp.int32)
                lensb = jnp.full((Bs,), T, jnp.int32)
                stq, bdq = fnsq.prefill(params, idsb, lensb, key)
                stq, frq, _ = fnsq.decode(
                    params, stq, bdq.trailing, bdq.trailing_len,
                    bdq.tts_pad_embed, sp,
                )
                sync(frq)
                ab = voc(params["vocoder"], frq)
                sync(ab)
                nb = max(2, n_chunks // 2)
                t0 = time.perf_counter()
                abs_ = []
                for _ in range(nb):
                    stq, frq, _ = fnsq.decode(
                        params, stq, bdq.trailing, bdq.trailing_len,
                        bdq.tts_pad_embed, sp,
                    )
                    abs_.append(voc(params["vocoder"], frq))
                for ab in abs_:
                    sync(ab)
                dtq = time.perf_counter() - t0
                kvq_results[f"serving_kvq_rtf_batch{Bs}"] = round(
                    (nb * chunk * Bs / FRAME_RATE) / dtq, 1
                )
                log(f"serving batch{Bs} (int8 KV): "
                    f"{kvq_results[f'serving_kvq_rtf_batch{Bs}']:.1f}x aggregate RTF")
            except Exception as e:
                log(f"kvq serving probe (B={Bs}) failed: {e}")
        try:
            fnsl = make_generate_fns(kvq_cfg, batch=1, max_len=2560,
                                     chunk_len=chunk, params=params)
            stl, bdl = fnsl.prefill(params, ids[:1], lens[:1], key)
            fill = jnp.asarray(2000, jnp.int32)
            stl = stl._replace(
                pos=jnp.full_like(stl.pos, fill),
                cache=stl.cache._replace(
                    length=jnp.full_like(stl.cache.length, fill)
                ),
                valid_mask=jnp.ones_like(stl.valid_mask),
            )
            stl, frl, _ = fnsl.decode(
                params, stl, bdl.trailing, bdl.trailing_len, bdl.tts_pad_embed, sp
            )
            sync(frl)
            t0 = time.perf_counter()
            for _ in range(2):
                stl, frl, _ = fnsl.decode(
                    params, stl, bdl.trailing, bdl.trailing_len,
                    bdl.tts_pad_embed, sp,
                )
            sync(frl)
            kvq_results["longform_kvq_ms_per_frame"] = round(
                (time.perf_counter() - t0) / (2 * chunk) * 1e3, 2
            )
            log(f"long-form (int8 KV): "
                f"{kvq_results['longform_kvq_ms_per_frame']:.2f} ms/frame")
        except Exception as e:
            log(f"kvq long-form probe failed: {e}")
        try:
            # single-stream decode with the int8 KV cache: halved talker
            # cache traffic (manual kernel isolated 1.205 -> 0.708 ms/step).
            # 128-align the bucket like the engine ladder does — unaligned
            # kvq buckets fall off the fused path (talker.py max_len%128
            # gate; the unaligned arm measured 2.49 ms/frame of silent XLA)
            blen1 = ((frames + 32 + 127) // 128) * 128
            fnsk = make_generate_fns(
                kvq_cfg, batch=1, max_len=blen1, chunk_len=chunk,
                params=params,
            )
            stk, bdk = fnsk.prefill(params, ids[:1], lens[:1], key)
            stk, frk, _ = fnsk.decode(
                params, stk, bdk.trailing, bdk.trailing_len,
                bdk.tts_pad_embed, sp,
            )
            sync(frk)  # compile
            nk_ = max(2, n_chunks // 2)
            t0 = time.perf_counter()
            for _ in range(nk_):
                stk, frk, _ = fnsk.decode(
                    params, stk, bdk.trailing, bdk.trailing_len,
                    bdk.tts_pad_embed, sp,
                )
            sync(frk)
            kvq_results["decode_kvq_ms_per_frame"] = round(
                (time.perf_counter() - t0) / (nk_ * chunk) * 1e3, 2
            )
            log(f"single-stream (int8 KV): "
                f"{kvq_results['decode_kvq_ms_per_frame']:.2f} ms/frame")
        except Exception as e:
            log(f"kvq single-stream probe failed: {e}")

    # --- speculative decoding probes (runtime/speculative.py, B=1) ----------
    # Drafted frames verify in one S=K talker pass; committed codes are exact.
    # "floor" uses an always-wrong draft (acceptance 0: every iteration
    # commits exactly ITERS frames — deterministic, so dispatches chain with
    # ONE final sync); "ceil" is STRUCTURAL: make_spec_generate_fns(
    # force_accept=True) runs the identical verify+MTP+cache compute but
    # replaces the draft-match comparison with all-true, so acceptance is
    # 1.0 BY CONSTRUCTION for any weights.  (The round-3 artifact
    # regression: the old repeat-draft "ceiling" relied on greedy output
    # repeating on the synthetic weight fill — a weight-behavior bet that
    # silently degenerated to the floor.  A replayed-greedy-trajectory
    # oracle — runtime/speculative.make_replay_draft, the REAL-weight
    # oracle, tested in tests/test_speculative.py — also degenerates on
    # THIS fill: the mod-199 pattern yields tied logits whose argmax breaks
    # differently between the S=1 and S=K programs.)  Each probe ASSERTS
    # its expected acceptance regime and reports spec_probe_ok=false loudly
    # instead of mislabeling a floor as a ceiling.  Real-speech acceptance
    # lands between floor and ceiling.
    spec_results = {}
    spec_regime_ok = True

    def check_regime(name, accept):
        lo, hi = (0.9, 1.01) if "ceil" in name else (-0.01, 0.35)
        if lo <= accept <= hi:
            return True
        log(
            f"ERROR: {name} acceptance {accept:.2f} outside expected "
            f"regime [{max(lo, 0):.2f}, {min(hi, 1):.2f}] — this probe is "
            f"NOT measuring a {'ceiling' if 'ceil' in name else 'floor'}; "
            f"treat its ms/frame as invalid"
        )
        return False

    if batch == 1 and os.environ.get("BENCH_SKIP_SPEC") != "1":
        from leaxer_qwen3_tts_tpu.runtime.speculative import (
            make_spec_generate_fns,
            repeat_draft,
        )

        SPEC_K, SPEC_ITERS = 4, 8
        sp_greedy = SamplingParams.create(temperature=0.0, forbid_eos=True)
        n_disp = max(2, frames // (SPEC_K * SPEC_ITERS))
        # bucket sized for the SLOTS the probe consumes (prompt + bootstrap +
        # n_disp*ITERS*K at full acceptance), not just `frames` — at small
        # BENCH_FRAMES the old frames+32 bucket silently overflowed
        spec_len = max(frames, n_disp * SPEC_K * SPEC_ITERS) + 32

        import numpy as _np

        def wrong_draft(state, kk):
            return (
                jnp.broadcast_to(
                    (state.pending[:, None, :] + 1) % 2048, (1, kk - 1, 16)
                ),
                None,
            )

        # kvq spec arm (VERDICT r4 #5): the int8-KV bucket must be
        # 128-aligned or the fused verify path silently falls back to XLA
        spec_len_kvq = ((spec_len + 127) // 128) * 128
        for name, draft, force, pp, scfg, slen in (
            ("spec_floor", wrong_draft, False, params, cfg_f32kv, spec_len),
            ("spec_ceil", repeat_draft, True, params, cfg_f32kv, spec_len),
            ("bf16_spec_ceil", repeat_draft, True, bf16_params, cfg_f32kv,
             spec_len),
            # speculative x int8-KV: the structural ceiling on the headline
            # (kv-quant) cache config — covers the spec half of BASELINE
            # config 5 under the serving cache mode
            ("spec_kvq_ceil", repeat_draft, True, params,
             cfg if kv_quant_hl else None, spec_len_kvq),
        ):
            if name.startswith("bf16") and quant != "int8":
                continue
            if scfg is None:
                continue
            try:
                # non-kvq spec probes stay on the f32-KV config (their
                # longitudinal baseline; the verify path's multi-slot cache
                # writes are validated on the f32 cache)
                sfns = make_spec_generate_fns(
                    scfg, max_len=slen, k=SPEC_K, num_iters=SPEC_ITERS,
                    draft_fn=draft, force_accept=force, params=pp,
                )
                st, bd, f0, v0 = sfns.prefill(pp, ids, lens, key, sp_greedy)
                st, fr, vd = sfns.decode(
                    pp, st, bd.trailing, bd.trailing_len, bd.tts_pad_embed,
                    sp_greedy,
                )
                sync(fr)  # compile
                st, bd, f0, v0 = sfns.prefill(pp, ids, lens, key, sp_greedy)
                valids = []
                t0 = time.perf_counter()
                for _ in range(n_disp):
                    st, fr, vd = sfns.decode(
                        pp, st, bd.trailing, bd.trailing_len,
                        bd.tts_pad_embed, sp_greedy,
                    )
                    valids.append(vd)
                sync(fr)  # chained: last-dispatch completion implies all
                wall = time.perf_counter() - t0
                committed = int(sum(_np.asarray(v).sum() for v in valids))
                accept = committed / (n_disp * SPEC_ITERS * SPEC_K)
                ms = wall / max(committed, 1) * 1e3
                spec_results[name + "_ms_per_frame"] = round(ms, 2)
                spec_results[name + "_accept"] = round(accept, 2)
                spec_regime_ok = check_regime(name, accept) and spec_regime_ok
                log(f"{name}: {ms:.2f} ms/frame (accept {accept*100:.0f}%)")
            except Exception as e:
                log(f"spec probe {name} failed: {e}")
                spec_regime_ok = False
            # free this arm's state before the next (and before serving
            # spec): retained spec caches stack toward RESOURCE_EXHAUSTED
            # at 1.7B (observed: the B=32 serving-spec arm OOM'd)
            sfns = st = bd = f0 = v0 = fr = vd = valids = None  # noqa: F841
        if "spec_kvq_ceil_ms_per_frame" in spec_results:
            # VERDICT r4 #5 field name
            spec_results["spec_kvq_ms_per_frame"] = spec_results[
                "spec_kvq_ceil_ms_per_frame"
            ]

    # --- batched speculative serving probe (B=8): one S=K verify pass covers
    # B*K frame slots with per-stream acceptance — the serving multiplier.
    # Same structural force_accept ceiling (per-stream acceptance is 1.0 by
    # construction); floor uses per-stream always-wrong drafts.
    if batch == 1 and os.environ.get("BENCH_SKIP_SPEC") != "1":
        import numpy as _np

        from leaxer_qwen3_tts_tpu.runtime.speculative import (
            make_spec_generate_fns as _msgf,
            repeat_draft as _rd,
        )

        SPEC_K, SPEC_ITERS = 4, 8
        n_disp = max(2, frames // (SPEC_K * SPEC_ITERS))
        spec_len = max(frames, n_disp * SPEC_K * SPEC_ITERS) + 32
        # B=32 arm (VERDICT r4 #5): the serving headline batch — completes
        # the speculative half of BASELINE config 5
        arms = []
        for Bs in (8, 32):
            sfx = "" if Bs == 8 else f"_b{Bs}"
            arms.append((f"serving_spec_ceil{sfx}", _rd, True, Bs))
            arms.append((f"serving_spec_floor{sfx}", "wrong", False, Bs))
        for name, draft, force, Bs in arms:
            if draft == "wrong":
                def draft(state, kk, _B=Bs):
                    return (
                        jnp.broadcast_to(
                            (state.pending[:, None, :] + 1) % 2048,
                            (_B, kk - 1, 16),
                        ),
                        None,
                    )
            try:
                sfns = _msgf(cfg_f32kv, max_len=spec_len, k=SPEC_K,
                             num_iters=SPEC_ITERS, batch=Bs, draft_fn=draft,
                             force_accept=force)
                idsb = jnp.full((Bs, T), 100, jnp.int32)
                lensb = jnp.full((Bs,), T, jnp.int32)
                spg = SamplingParams.create(temperature=0.0, forbid_eos=True)
                st, bd, f0, v0 = sfns.prefill(params, idsb, lensb, key, spg)
                st, fr, vd = sfns.decode(
                    params, st, bd.trailing, bd.trailing_len,
                    bd.tts_pad_embed, spg,
                )
                sync(fr)  # compile
                st, bd, f0, v0 = sfns.prefill(params, idsb, lensb, key, spg)
                valids = []
                t0 = time.perf_counter()
                for _ in range(n_disp):
                    st, fr, vd = sfns.decode(
                        params, st, bd.trailing, bd.trailing_len,
                        bd.tts_pad_embed, spg,
                    )
                    valids.append(vd)
                sync(fr)
                wall = time.perf_counter() - t0
                committed = int(sum(_np.asarray(v).sum() for v in valids))
                accept = committed / (n_disp * SPEC_ITERS * SPEC_K * Bs)
                agg_rtf = (committed / FRAME_RATE) / wall
                spec_results[name + "_rtf"] = round(agg_rtf, 1)
                spec_results[name + "_accept"] = round(accept, 2)
                spec_regime_ok = check_regime(name, accept) and spec_regime_ok
                log(f"{name} (B={Bs}): {agg_rtf:.1f}x aggregate RTF "
                    f"({committed} frames in {wall*1e3:.0f} ms, "
                    f"accept {accept*100:.0f}%)")
            except Exception as e:
                log(f"{name} probe failed: {e}")
                spec_regime_ok = False
            sfns = st = bd = f0 = v0 = fr = vd = valids = None  # noqa: F841
        spec_results["spec_probe_ok"] = bool(spec_regime_ok)

    # diagnostic: host<->device round-trip latency (tunnel overhead)
    fid = jax.jit(lambda x: x + 1.0)
    xs = jnp.ones((8, 128), jnp.float32)
    sync(fid(xs))
    t0 = time.perf_counter()
    for _ in range(10):
        sync(fid(xs))
    rpc_ms = (time.perf_counter() - t0) / 10 * 1e3

    result = {
        "metric": f"rtf_{model}_1chip",
        "value": round(rtf, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 20.0, 3),
        "platform": platform,
        "batch": batch,
        "frames": frames,
        "prefill_ms": round(prefill_s * 1e3, 1),
        "decode_ms_per_frame": round(frame_ms, 2),
        "vocode_s": round(vocode_s, 3),
        "ttfa_ms": round(ttfa_s * 1e3, 1),
        "host_rpc_ms": round(rpc_ms, 1),
        "tunnel_connect_s": round(connect_s, 1),
        "frames_per_s": round(frames * batch / total_s, 1),
    }
    result["mtp_impl"] = cfg.code_predictor.impl
    result["quant"] = quant
    result["kv_quant"] = "int8" if kv_quant_hl else "none"

    # --- roofline accounting (VERDICT r4 #9): bytes/frame and %-of-DMA-floor
    # per component, from the ACTUAL packed array sizes, so kernel
    # regressions are visible across rounds without re-deriving KERNEL_PLAN
    # math.  HBM_GBPS is the v5e spec number used in KERNEL_PLAN.md.
    HBM_GBPS = 819.0

    def _bytes(tree) -> int:
        return sum(
            int(l.size) * l.dtype.itemsize
            for l in jax.tree_util.tree_leaves(tree)
            if hasattr(l, "dtype")
        )

    try:
        talker_w = _bytes(params["talker"].get("fused_step"))
        lm_head_b = _bytes(params["talker"]["lm_head"])
        trunk_b = _bytes(params["code_predictor"].get("fused_step"))
        heads_b = _bytes(
            params["code_predictor"].get(
                "heads", params["code_predictor"].get("head")
            )
        )
        # talker step reads: packed weights + lm_head + K/V up to the bucket
        kv_item = 1 if kv_quant_hl else 2  # int8 vs bf16 cache entries
        tt = cfg.talker.transformer
        kv_b = (
            2 * tt.num_layers * tt.num_kv_heads * blen_hl * tt.head_dim
            * kv_item
        )
        talker_step_b = talker_w + lm_head_b + kv_b
        # resident MTP chain: trunk once + all step heads + tiny embeds
        mtp_frame_b = trunk_b + heads_b
        frame_b = talker_step_b + mtp_frame_b
        floor_ms = frame_b / (HBM_GBPS * 1e6)
        result["talker_step_mb"] = round(talker_step_b / 1e6, 1)
        result["mtp_frame_mb"] = round(mtp_frame_b / 1e6, 1)
        result["frame_bytes_mb"] = round(frame_b / 1e6, 1)
        result["frame_dma_floor_ms"] = round(floor_ms, 3)
        result["dma_floor_frac"] = round(floor_ms / max(frame_ms, 1e-9), 3)
        # the INGEST roofline (docs/BENCH_EVIDENCE_r5.md, tools/a8_probe.py):
        # the resident MTP trunk is re-ingested VMEM->MXU every chain step at
        # the measured ~1.12 us per int8 MB — per-frame compute the HBM floor
        # cannot see.  Talker weights stream from HBM (slower than ingest),
        # so its bound stays the DMA floor.
        INGEST_US_PER_MB = 1.12
        n_steps = cfg.code_predictor.num_steps
        mtp_ingest_ms = (
            (n_steps * trunk_b + heads_b) / 1e6 * INGEST_US_PER_MB / 1e3
        )
        roofline_ms = floor_ms - mtp_frame_b / (HBM_GBPS * 1e6) + max(
            mtp_ingest_ms, mtp_frame_b / (HBM_GBPS * 1e6)
        )
        result["mtp_ingest_floor_ms"] = round(mtp_ingest_ms, 3)
        result["frame_roofline_ms"] = round(roofline_ms, 3)
        result["roofline_frac"] = round(
            roofline_ms / max(frame_ms, 1e-9), 3
        )
        log(
            f"roofline: frame {frame_b/1e6:.0f} MB, HBM floor "
            f"{floor_ms:.2f} ms, ingest roofline {roofline_ms:.2f} ms, "
            f"measured {frame_ms:.2f} ms "
            f"({100*roofline_ms/max(frame_ms,1e-9):.0f}% of roofline)"
        )
    except Exception as e:
        log(f"roofline accounting failed: {e}")
    # bucket length of the headline/TTFA/resident probes: 128-aligned for the
    # kvq fused path, so it can exceed prior rounds' frames+32 — recorded so
    # round-over-round deltas attribute bucket changes (ADVICE r4)
    result["bucket_max_len"] = int(blen_hl)
    for Bs, rtf_b in serving.items():
        result[f"serving_rtf_batch{Bs}"] = round(rtf_b, 1)
    if perstep_frame_ms is not None:
        result["perstep_mtp_ms_per_frame"] = perstep_frame_ms
    if frame_fused_ms is not None:
        result["frame_fused_ms_per_frame"] = frame_fused_ms
    if bf16_frame_ms is not None:
        result["bf16_decode_ms_per_frame"] = round(bf16_frame_ms, 2)
    if long_frame_ms is not None:
        result["longform_decode_ms_per_frame"] = round(long_frame_ms, 2)
        # the long-form probe is PINNED to the f32-KV config (its
        # longitudinal baseline; ADVICE r4) — annotate so cross-round
        # comparisons stay like-for-like
        result["longform_kv"] = "none"
    result.update(kvq_results)
    result.update(spec_results)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
