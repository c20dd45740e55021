"""Vocoder: streaming-chunked decode must be bit-identical to one-shot
decode (the reference's carried-state contract, src/models/onnx.rs:342-496),
plus shape/validity invariants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.core.config import tiny_engine_config
from qwen3_tts_tpu.models import vocoder

CFG = tiny_engine_config().vocoder


@pytest.fixture(scope="module")
def params():
    return vocoder.init_vocoder(jax.random.key(0), CFG)


def _codes(n_frames, batch=1, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.integers(0, CFG.code_vocab, size=(batch, n_frames, 16)), jnp.int32
    )


def test_shapes_and_valid(params):
    codes = _codes(5)
    state = vocoder.init_state(CFG, 1)
    wav, valid, state = vocoder.decode(params, CFG, codes, state, False)
    assert wav.shape == (1, 5 * CFG.frame_samples)
    assert valid.tolist() == [5 * CFG.frame_samples]
    assert int(state.frames_done[0]) == 5
    assert np.isfinite(np.asarray(wav)).all()


def test_streaming_equals_oneshot(params):
    """4-frame chunks + remainder (the reference's 64-code batching,
    src/tts/engine.rs:510-537) must reproduce the one-shot waveform."""
    total = 11
    codes = _codes(total, seed=3)

    state = vocoder.init_state(CFG, 1)
    one_shot, _, _ = vocoder.decode(params, CFG, codes, state, True)

    state = vocoder.init_state(CFG, 1)
    chunks = []
    for start in range(0, total, 4):
        part = codes[:, start:start + 4]
        last = start + 4 >= total
        wav, valid, state = vocoder.decode(params, CFG, part, state, last)
        chunks.append(np.asarray(wav)[:, : int(valid[0])])
    streamed = np.concatenate(chunks, axis=1)

    np.testing.assert_allclose(
        streamed, np.asarray(one_shot), rtol=1e-5, atol=1e-5
    )


def test_code_clamping(params):
    """Out-of-range codes are clamped like the decoder thread's
    c.clamp(0, 2047) (src/tts/engine.rs:515-519)."""
    state = vocoder.init_state(CFG, 1)
    lo = jnp.full((1, 2, 16), -5, jnp.int32)
    hi = jnp.full((1, 2, 16), 99_999, jnp.int32)
    wav_lo, _, _ = vocoder.decode(params, CFG, lo, state, False)
    wav_zero, _, _ = vocoder.decode(
        params, CFG, jnp.zeros((1, 2, 16), jnp.int32), state, False)
    wav_hi, _, _ = vocoder.decode(params, CFG, hi, state, False)
    wav_max, _, _ = vocoder.decode(
        params, CFG, jnp.full((1, 2, 16), CFG.code_vocab - 1, jnp.int32),
        state, False)
    np.testing.assert_array_equal(np.asarray(wav_lo), np.asarray(wav_zero))
    np.testing.assert_array_equal(np.asarray(wav_hi), np.asarray(wav_max))


def test_batch_rows_independent(params):
    a = _codes(6, seed=1)
    b = _codes(6, seed=2)
    both = jnp.concatenate([a, b], axis=0)
    wav_b, _, _ = vocoder.decode(params, CFG, both,
                                 vocoder.init_state(CFG, 2), False)
    wav_a, _, _ = vocoder.decode(params, CFG, a,
                                 vocoder.init_state(CFG, 1), False)
    np.testing.assert_allclose(
        np.asarray(wav_b)[0], np.asarray(wav_a)[0], rtol=1e-5, atol=1e-6
    )
