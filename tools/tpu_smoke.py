"""Engine-level TPU smoke: the flagship serving configs end-to-end.

Drives the FULL TTSEngine (ctor transforms: fuse -> quantize -> fused packs,
incl. int8 KV cache and speculative decoding with the adaptive fallback) on
the real chip with deterministic-filled 0.6B params — the complement to
bench.py, which drives the runtime fns directly.  Wall-clock RTF printed
here is TUNNEL-RPC-BOUND (each streamed chunk pays a ~35-60 ms round trip
plus audio transfer at tunnel bandwidth); production hosts attached to the
chip see the bench numbers.  What this validates: every engine code path
compiles and runs on hardware, outputs are finite, and the adaptive spec
policy behaves (on fill weights the repeat draft's greedy acceptance is
data-dependent — a spec_fallback=True run demonstrates the revert live).

Usage:  PYTHONPATH=.:/root/.axon_site python -m tools.tpu_smoke
"""
import time, json, os, tempfile, jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))

sync(jax.device_put(np.zeros(8, np.float32)))
print("connected", flush=True)

import importlib.util
spec = importlib.util.spec_from_file_location(
    "ge", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"))
ge = importlib.util.module_from_spec(spec); spec.loader.exec_module(ge)
from leaxer_qwen3_tts_tpu.config import QWEN3_TTS_06B
from leaxer_qwen3_tts_tpu.runtime.weights import init_params
from leaxer_qwen3_tts_tpu.frontend._bpe_py import byte_to_proxy
from leaxer_qwen3_tts_tpu.frontend import Tokenizer
from leaxer_qwen3_tts_tpu.api.engine import TTSEngine

shapes = jax.eval_shape(lambda k: init_params(QWEN3_TTS_06B, k, with_speaker_encoder=False), jax.random.PRNGKey(0))
t0 = time.perf_counter()
params = ge._fast_fill(shapes)
sync(params["talker"]["lm_head"])
print(f"params: {time.perf_counter()-t0:.1f}s", flush=True)

proxy = byte_to_proxy()
tokens = [proxy[b] for b in range(256)]
merges = []
for a, b in [("h","e"),("l","l"),("he","ll"),("hell","o"),("Ġ","w"),("o","r"),("Ġw","or"),("l","d"),("Ġwor","ld")]:
    merges.append((a,b))
    if a+b not in tokens: tokens.append(a+b)
d = tempfile.mkdtemp()
json.dump({t:i for i,t in enumerate(tokens)}, open(os.path.join(d,"vocab.json"),"w"))
open(os.path.join(d,"merges.txt"),"w").write("#version: 0.2\n" + "".join(f"{a} {b}\n" for a,b in merges))
tok = Tokenizer(os.path.join(d,"vocab.json"), os.path.join(d,"merges.txt"))

SMOKE_ONLY = os.environ.get("SMOKE_ONLY")
for name, kw in (
    ("int8+kvq", dict(quantize="int8", kv_quant=True)),
    ("int8+kvq+spec4", dict(quantize="int8", kv_quant=True, spec_k=4, spec_iters=8)),
    ("bf16-fused", dict()),  # quantize=None -> bits=16 packs (r4)
    # whole-frame kernel, engine path (r4c; needs resident-eligible MTP)
    ("int8+frame-fused", dict(quantize="int8", mtp_resident=True,
                              frame_fused=True)),
    ("int8+kvq+frame-fused", dict(quantize="int8", kv_quant=True,
                                  mtp_resident=True, frame_fused=True)),
):
    if SMOKE_ONLY not in (None, "engine"):
        break
    t0 = time.perf_counter()
    eng = TTSEngine(config=QWEN3_TTS_06B, params=params, tokenizer=tok,
                    max_frames=96, chunk_len=32, first_chunk_len=8, **kw)
    assert eng.is_ready(), eng.get_error()
    r = eng.synthesize("hello world", temperature=0.0, seed=1)
    dt = time.perf_counter() - t0
    rtf = r.metrics.rtf
    print(f"{name}: {r.metrics.frames} frames, rtf {rtf:.1f}x "
          f"(incl. compile, total {dt:.1f}s), finite={bool(np.isfinite(r.audio).all())}, "
          f"spec_fallback={r.metrics.spec_fallback}", flush=True)
    # warm second request = the serving-steady-state number
    t0 = time.perf_counter()
    r2 = eng.synthesize("hello world hello world", temperature=0.8, seed=2)
    print(f"{name} warm: {r2.metrics.frames} frames, rtf {r2.metrics.rtf:.1f}x, "
          f"ttfa {r2.metrics.ttfa_seconds*1e3:.0f}ms", flush=True)
    del eng
# --- multilingual + sampling sweep (BASELINE config 2) -------------------
# zh/ja/ko prompts (byte-proxy tokenizer covers all UTF-8 bytes) + the
# sweep knobs (temp 0.7 / top-k 30 / top-p 0.9): language plumbing is
# tts_onnx.cpp:466-477 (codec prefill [THINK, THINK_BOS, lang_id,
# THINK_EOS]); knob vectors are traced [B] inputs, language id a traced
# scalar — pass 2 over the warmed buckets must hit ZERO fresh compiles.
if SMOKE_ONLY in (None, "lang"):
    import logging

    class _CompileCounter(logging.Handler):
        count = 0
        def emit(self, record):
            if "ompiling" in record.getMessage():
                _CompileCounter.count += 1

    eng = TTSEngine(config=QWEN3_TTS_06B, params=params, tokenizer=tok,
                    max_frames=48, chunk_len=16, quantize="int8",
                    kv_quant=True)
    assert eng.is_ready(), eng.get_error()
    prompts = [("en", "hello world"), ("zh", "你好世界"),
               ("ja", "こんにちは世界"),
               ("ko", "안녕하세요 세계")]
    sweeps = [dict(temperature=0.8, top_k=50, top_p=0.95),
              dict(temperature=0.7, top_k=30, top_p=0.9)]
    # pass 1: warm every (language x knob) combination
    for lang, text in prompts:
        for kw in sweeps:
            eng.synthesize(text, language=lang, seed=3, **kw)
    # pass 2: measured, with the compile counter armed
    h = _CompileCounter()
    logging.getLogger("jax").addHandler(h)
    jax.config.update("jax_log_compiles", True)
    try:
        for lang, text in prompts:
            t0 = time.perf_counter()
            r = eng.synthesize(text, language=lang, seed=4, **sweeps[1])
            dt = time.perf_counter() - t0
            wall_rtf = r.metrics.frames * (1 / 12.0) / dt
            print(f"lang {lang}: {r.metrics.frames} frames, device rtf "
                  f"{r.metrics.rtf:.1f}x (wall {wall_rtf:.1f}x incl. tunnel), "
                  f"finite={bool(np.isfinite(r.audio).all())}", flush=True)
    finally:
        jax.config.update("jax_log_compiles", False)
        logging.getLogger("jax").removeHandler(h)
    print(f"lang sweep: fresh compiles after warmup = {_CompileCounter.count}",
          flush=True)
    assert _CompileCounter.count == 0, "recompile after warmup in lang sweep"
    del eng

# --- continuous pool (production serving) on hardware -------------------
from leaxer_qwen3_tts_tpu.serve.pool import ContinuousBatcher

if SMOKE_ONLY in (None, "pool"):
    # pool chunk 16: first streamed audio after ONE 16-frame chunk (~64 ms of
    # decode at 4 ms/frame) — the TTFA knob; throughput stays batched
    POOL_CHUNK = int(os.environ.get("SMOKE_POOL_CHUNK", "16"))
    eng = TTSEngine(config=QWEN3_TTS_06B, params=params, tokenizer=tok,
                    max_frames=96, chunk_len=POOL_CHUNK, quantize="int8",
                    kv_quant=True)
    assert eng.is_ready(), eng.get_error()
    pool = ContinuousBatcher(eng, pool_size=4, chunk_len=POOL_CHUNK,
                             kv_bucket=256, text_bucket_max=32)
    try:
        t0 = time.perf_counter()
        futs = [pool.submit(f"hello world {i}", temperature=0.8, max_tokens=48)
                for i in range(8)]
        results = [f.result(timeout=1200) for f in futs]
        dt = time.perf_counter() - t0
        frames = sum(r.metrics.frames for r in results)
        print(f"pool: 8 requests over 4 slots, {frames} frames in {dt:.1f}s "
              f"(incl. compile), all finite="
              f"{all(bool(np.isfinite(r.audio).all()) for r in results)}, "
              f"stats={pool.stats}", flush=True)
        # --- streaming THROUGH the pool: TTFA with 3 co-tenants (warm) -------
        pool.warmup(streaming=True)
        cot = [pool.submit(f"background {i}", temperature=0.8, max_tokens=64)
               for i in range(3)]
        t0 = time.perf_counter()
        stream = pool.submit_stream("hello world", temperature=0.8, seed=7,
                                    max_tokens=48)
        parts, ttfa_ms, result = [], None, None
        for item in stream:
            if ttfa_ms is None:
                ttfa_ms = (time.perf_counter() - t0) * 1e3
            if isinstance(item, np.ndarray):
                parts.append(item)
            else:
                result = item
        exact = bool(np.array_equal(np.concatenate(parts), result.audio))
        # tunnel context: one synced host RPC costs ~35-60 ms; the TTFA path
        # pays ~3 of them (admission sync, decode-dispatch sync, audio fetch)
        # that co-located production hosts don't
        probe = jax.device_put(np.zeros(8, np.float32))
        t0 = time.perf_counter()
        for _ in range(4):
            sync(probe)
        rpc_ms = (time.perf_counter() - t0) / 4 * 1e3
        q_ms = result.metrics.stage_seconds.get("queued", 0) * 1e3
        print(f"pool stream: TTFA {ttfa_ms:.0f}ms (3 co-tenants, admission "
              f"{q_ms:.0f}ms, incl. tunnel RPC at {rpc_ms:.0f}ms/hop; the "
              f"path pays ~2 hops a co-located host doesn't), "
              f"{len(parts)} chunks, concat==retired {exact}", flush=True)
        assert exact, "streamed concatenation != retired audio"
        for f in cot:
            f.result(timeout=1200)
        # --- idle-pool stream: the uncontended TTFA (admission bootstrap +
        # splice + 1-frame vocode; no chunk-boundary wait) ---------------
        t0 = time.perf_counter()
        stream2 = pool.submit_stream("hello world", temperature=0.8,
                                     seed=9, max_tokens=48)
        ttfa2, parts2, result2 = None, [], None
        for item in stream2:
            if ttfa2 is None:
                ttfa2 = (time.perf_counter() - t0) * 1e3
            if isinstance(item, np.ndarray):
                parts2.append(item)
            else:
                result2 = item
        q2_ms = result2.metrics.stage_seconds.get("queued", 0) * 1e3
        print(f"pool stream idle: TTFA {ttfa2:.0f}ms (0 co-tenants, "
              f"admission {q2_ms:.0f}ms, RPC {rpc_ms:.0f}ms/hop x ~2 hops "
              f"in path), {len(parts2)} chunks", flush=True)
    finally:
        pool.shutdown()

if os.environ.get("SMOKE_TRAIN") == "1":
    # --- training step on hardware (bf16, single chip) ------------------

    from leaxer_qwen3_tts_tpu.config import (
        CodePredictorConfig, TalkerConfig, TransformerConfig, TTSModelConfig, VocoderConfig)
    from leaxer_qwen3_tts_tpu.runtime.weights import init_params
    from leaxer_qwen3_tts_tpu.training import init_train_state, make_optimizer, make_train_step

    tr = dict(num_layers=4, num_heads=16, num_kv_heads=8, head_dim=128,
              intermediate_size=3072, dtype="bfloat16")
    cfg = TTSModelConfig(
        name="train-smoke",
        talker=TalkerConfig(transformer=TransformerConfig(hidden_size=1024, **tr),
                            text_vocab_size=152000, text_embed_dim=1024),
        code_predictor=CodePredictorConfig(
            transformer=TransformerConfig(hidden_size=1024, **tr)),
        vocoder=VocoderConfig(d_model=32, num_prenet_blocks=1,
                              upsample_channels=(16, 16, 8, 8), dtype="float32"),
        speaker_encoder=None,
    )
    params = init_params(cfg, jax.random.PRNGKey(0), with_speaker_encoder=False)
    tx = make_optimizer(learning_rate=1e-3)
    state = init_train_state(params, tx)
    step = make_train_step(cfg, tx, donate=True)
    rng = np.random.default_rng(0)
    batch = {
        "text_ids": jnp.asarray(rng.integers(0, 1000, (4, 16)), jnp.int32),
        "text_len": jnp.asarray(rng.integers(4, 17, (4,)), jnp.int32),
        "codes": jnp.asarray(rng.integers(0, 2048, (4, 24, 16)), jnp.int32),
        "num_frames": jnp.asarray(rng.integers(8, 25, (4,)), jnp.int32),
    }
    t0 = time.perf_counter()
    state, m = step(state, batch)
    l0 = float(jax.device_get(m.loss))
    print(f"step 1 (compile): loss {l0:.3f} in {time.perf_counter()-t0:.1f}s", flush=True)
    losses = [l0]
    t0 = time.perf_counter()
    for _ in range(30):
        state, m = step(state, batch)
        losses.append(float(jax.device_get(m.loss)))
    print(f"30 steps: {(time.perf_counter()-t0)/30*1e3:.0f} ms/step, "
          f"loss {losses[0]:.3f} -> {losses[-1]:.3f} "
          f"(start near ln-vocab sum ~16: {abs(losses[0]-16)<4})", flush=True)
    assert losses[-1] < losses[0], "loss did not decrease"
    print("TRAIN TPU SMOKE OK", flush=True)

if os.environ.get("SMOKE_CLONE") == "1":
    # --- voice-clone path on hardware: WAV -> resample -> mel -> speaker
    # encoder -> clone prompt splice -> synthesis (verified on v5e:
    # embedding (1024,) finite in 4.1 s incl. compile, 32 finite frames)
    from leaxer_qwen3_tts_tpu.frontend import write_wav

    cshapes = jax.eval_shape(
        lambda k: init_params(QWEN3_TTS_06B, k, with_speaker_encoder=True),
        jax.random.PRNGKey(0),
    )
    cparams = ge._fast_fill(cshapes)
    sr = 24000
    tt = np.arange(3 * sr) / sr
    ref = (0.3 * np.sin(2 * np.pi * 220 * tt)
           * (1 + 0.2 * np.sin(2 * np.pi * 3 * tt))).astype(np.float32)
    ref_path = os.path.join(d, "ref.wav")
    write_wav(ref_path, ref, sr)
    ceng = TTSEngine(config=QWEN3_TTS_06B, params=cparams, tokenizer=tok,
                     max_frames=32, chunk_len=16, quantize="int8")
    assert ceng.is_ready() and ceng.has_speaker_encoder(), ceng.get_error()
    emb = ceng.extract_speaker_embedding(ref_path)
    rc = ceng.synthesize_clone("hello", ref_path, temperature=0.0)
    print(f"clone: embedding {emb.shape} finite="
          f"{bool(np.isfinite(emb).all())}, {rc.metrics.frames} frames "
          f"finite={bool(np.isfinite(rc.audio).all())}", flush=True)
    del ceng, cparams

print("ENGINE TPU SMOKE OK", flush=True)
