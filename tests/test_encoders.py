"""Encoders (voice-cloning front-ends): RVQ correctness, shape contracts,
codebook tying with the vocoder, and torch-state-dict converter round-trips
(VERDICT r1 #2/#3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.core.config import tiny_engine_config
from qwen3_tts_tpu.models import encoders, vocoder

CFG = tiny_engine_config()


def test_rvq_recovers_exact_codes():
    """Latents that ARE sums of codebook rows must quantize back to exactly
    those codes (the defining property of residual VQ: the encoder's search
    inverts the decoder's embedding sum)."""
    rng = np.random.default_rng(0)
    Q, V, D = 4, 32, 24
    # trained RVQ codebooks have geometrically decaying residual energy —
    # that structure is what makes greedy stage-wise search exact
    scales = 0.35 ** np.arange(Q)
    cbs = jnp.asarray(rng.normal(size=(Q, V, D)) * scales[:, None, None],
                      jnp.float32)
    want = rng.integers(0, V, size=(7, Q))
    latents = np.zeros((7, D), np.float32)
    for q in range(Q):
        latents += np.asarray(cbs[q])[want[:, q]]
    got = encoders.rvq_encode(jnp.asarray(latents), cbs)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_audio_encoder_contract():
    ae, _ = encoders.random_encoders(jax.random.key(1), CFG)
    wav = np.random.default_rng(1).normal(
        size=3 * CFG.audio_encoder.frame_samples + 777).astype(np.float32)
    codes = ae.encode(wav)
    assert codes.shape == (3 * 16,)          # partial frame dropped
    assert codes.dtype == np.int64
    assert (codes >= 0).all() and (codes < CFG.audio_encoder.code_vocab).all()
    assert ae.encode(np.zeros(100, np.float32)).shape == (0,)


def test_codebooks_tied_to_vocoder():
    voc = vocoder.init_vocoder(jax.random.key(2), CFG.vocoder)
    ae, _ = encoders.random_encoders(jax.random.key(1), CFG,
                                     vocoder_params=voc)
    np.testing.assert_array_equal(np.asarray(ae.params["codebooks"]),
                                  np.asarray(voc["embed"]))


def test_speaker_encoder_contract():
    _, se = encoders.random_encoders(jax.random.key(3), CFG)
    rng = np.random.default_rng(4)
    a = rng.normal(size=24000).astype(np.float32) * 0.1
    b = rng.normal(size=24000).astype(np.float32) * 0.1
    ea, eb = se.encode(a), se.encode(b)
    assert ea.shape == (CFG.speaker_encoder.out_dim,)
    assert np.isfinite(ea).all()
    assert not np.allclose(ea, eb)           # embedding depends on audio
    np.testing.assert_allclose(se.encode(a), ea)   # deterministic
    # too-short audio: graceful zero embedding
    assert se.encode(np.zeros(10, np.float32)).shape == (
        CFG.speaker_encoder.out_dim,)


# ---------------------------------------------------------------- converters
def test_audio_encoder_converter_roundtrip():
    cfg = CFG.audio_encoder
    params = encoders.init_audio_encoder(jax.random.key(5), cfg)
    sd = encoders.export_audio_encoder_state_dict(params, cfg)
    params2 = encoders.convert_audio_encoder_state_dict(sd, cfg)

    wav = np.random.default_rng(6).normal(
        size=2 * cfg.frame_samples).astype(np.float32)
    a = encoders.AudioEncoder(params, cfg).encode(wav)
    b = encoders.AudioEncoder(jax.tree.map(jnp.asarray, params2),
                              cfg).encode(wav)
    np.testing.assert_array_equal(a, b)


def test_speaker_encoder_converter_roundtrip():
    cfg = CFG.speaker_encoder
    params = encoders.init_speaker_encoder(jax.random.key(7), cfg)
    sd = encoders.export_speaker_encoder_state_dict(params, cfg)
    params2 = encoders.convert_speaker_encoder_state_dict(sd, cfg)

    wav = np.random.default_rng(8).normal(size=24000).astype(np.float32)
    a = encoders.SpeakerEncoder(params, cfg, CFG.mel).encode(wav)
    b = encoders.SpeakerEncoder(jax.tree.map(jnp.asarray, params2),
                                cfg, CFG.mel).encode(wav)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_vocoder_converter_roundtrip():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    import convert_weights as cw

    cfg = CFG.vocoder
    params = vocoder.init_vocoder(jax.random.key(9), cfg)
    # canonicalize: real checkpoints have per-channel transposed-conv
    # biases (tiled across the kernel positions by the converter)
    for i, s in enumerate(cfg.upsample_factors):
        c_out = params["up"][i]["w"].shape[1] // s
        params["up"][i]["b"] = jnp.tile(params["up"][i]["b"][:c_out], s)

    sd = cw.export_vocoder_state_dict(params, cfg)
    params2 = jax.tree.map(jnp.asarray,
                           cw.convert_vocoder_state_dict(sd, cfg))

    codes = jnp.asarray(np.random.default_rng(10).integers(
        0, cfg.code_vocab, (1, 5, 16)), jnp.int32)
    wav_a, va, _ = vocoder.decode(params, cfg, codes,
                                  vocoder.init_state(cfg, 1), True)
    wav_b, vb, _ = vocoder.decode(params2, cfg, codes,
                                  vocoder.init_state(cfg, 1), True)
    assert va.tolist() == vb.tolist()
    np.testing.assert_allclose(np.asarray(wav_a), np.asarray(wav_b),
                               rtol=1e-6, atol=1e-7)
