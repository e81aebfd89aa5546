"""Shared tiny-model construction + golden-output computation.

Used by conftest.py (fixtures) and make_regression_fixtures.py (standalone),
so the regression fixture is generated from exactly the model the tests use.
"""

import os


def force_cpu():
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_threefry_partitionable", True)
    jax.config.update("jax_default_matmul_precision", "highest")
    return jax


def build_tiny_cfg():
    from leaxer_qwen3_tts_tpu.config import (
        CodePredictorConfig,
        SpeakerEncoderConfig,
        TalkerConfig,
        TransformerConfig,
        TTSModelConfig,
        VocoderConfig,
    )

    return TTSModelConfig(
        name="tiny-test",
        talker=TalkerConfig(
            transformer=TransformerConfig(
                hidden_size=64,
                num_layers=2,
                num_heads=4,
                num_kv_heads=2,
                head_dim=16,
                intermediate_size=128,
                dtype="float32",
            ),
            codec_vocab_size=3072,
            text_vocab_size=152000,
            text_embed_dim=64,
        ),
        code_predictor=CodePredictorConfig(
            transformer=TransformerConfig(
                hidden_size=64,
                num_layers=2,
                num_heads=4,
                num_kv_heads=4,
                head_dim=16,
                intermediate_size=128,
                dtype="float32",
            ),
            num_steps=15,
            subcode_vocab_size=2048,
        ),
        vocoder=VocoderConfig(
            d_model=32,
            num_prenet_blocks=1,
            upsample_rates=(10, 8, 5, 5),
            upsample_channels=(16, 16, 8, 8),
            dtype="float32",
        ),
        speaker_encoder=SpeakerEncoderConfig(
            d_model=32, num_layers=1, num_heads=4, intermediate_size=64,
            output_dim=64,
        ),
    )


def build_tiny(jax):
    from leaxer_qwen3_tts_tpu.runtime.weights import init_params

    cfg = build_tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def tiny_regression_outputs():
    """Golden outputs at every stage: prompt embeds, prefill logits, greedy
    frames, waveform, mel, speaker embedding (all deterministic)."""
    jax = force_cpu()
    import jax.numpy as jnp
    import numpy as np

    from leaxer_qwen3_tts_tpu.config import MelConfig
    from leaxer_qwen3_tts_tpu.frontend import log_mel
    from leaxer_qwen3_tts_tpu.models.codec12hz import vocoder_forward
    from leaxer_qwen3_tts_tpu.models.speaker_encoder import speaker_encoder_forward
    from leaxer_qwen3_tts_tpu.runtime.generate import make_generate_fns
    from leaxer_qwen3_tts_tpu.runtime.prompt import build_prompt
    from leaxer_qwen3_tts_tpu.runtime.sampling import SamplingParams

    cfg, params = build_tiny(jax)
    text_ids = jnp.asarray([[101, 2002, 30303, 4, 55555]], jnp.int32)
    text_len = jnp.asarray([5], jnp.int32)

    bundle = build_prompt(params["embeddings"], text_ids, text_len, None)

    fns = make_generate_fns(cfg, batch=1, max_len=32, chunk_len=4, donate=False)
    key = jax.random.PRNGKey(42)
    state, bundle2 = fns.prefill(params, text_ids, text_len, key)
    prefill_logits = np.asarray(state.last_logits, np.float32)
    sp = SamplingParams.create(temperature=0.0)  # greedy: RNG-independent
    state, frames, valid = fns.decode(
        params, state, bundle2.trailing, bundle2.trailing_len,
        bundle2.tts_pad_embed, sp,
    )
    audio = vocoder_forward(cfg.vocoder, params["vocoder"], frames)

    t = np.arange(2400) / 24000.0
    sine = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    mel = log_mel(sine, MelConfig())
    spk = speaker_encoder_forward(
        cfg.speaker_encoder, params["speaker_encoder"], jnp.asarray(mel)[None]
    )

    return {
        "prompt_embeds": np.asarray(bundle.prompt_embeds, np.float32),
        "trailing": np.asarray(bundle.trailing, np.float32),
        "prefill_logits": prefill_logits,
        "greedy_frames": np.asarray(frames, np.int32),
        "frame_valid": np.asarray(valid, bool),
        "audio_head": np.asarray(audio[:, :4000], np.float32),
        "mel": np.asarray(mel, np.float32),
        "speaker_embed": np.asarray(spk, np.float32),
    }
