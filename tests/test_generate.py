"""Generation loop: fused-vs-streaming consistency, padding invariance,
determinism, and protocol invariants — on tiny random-weight models."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.assets import tables
from qwen3_tts_tpu.core import protocol
from qwen3_tts_tpu.core.config import tiny_engine_config
from qwen3_tts_tpu.models import decoder
from qwen3_tts_tpu.tts import generate

CFG = tiny_engine_config(max_steps=6)


@pytest.fixture(scope="module")
def models():
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "talker": decoder.init_decoder(k1, CFG.talker),
        "predictor": decoder.init_decoder(k2, CFG.predictor),
        "assets": tables.random_assets(
            k3, text_vocab=256, codec_rows=2176,
            dim=CFG.talker.hidden, proj_dim=CFG.predictor.hidden,
        ),
    }


def _prompt(batch, seqlen, seed=1):
    key = jax.random.key(seed)
    return 0.1 * jax.random.normal(key, (batch, seqlen, CFG.talker.hidden))


def test_generate_shapes_and_ranges(models):
    prompt = _prompt(1, 7)
    codes, n_frames = generate.generate_codes(
        models, CFG.talker, CFG.predictor, prompt,
        jnp.zeros((1,), jnp.int32), jax.random.key(0),
        0.0, 0, 1.0, CFG.max_steps,
    )
    codes = np.asarray(codes)
    n = int(n_frames[0])
    assert codes.shape == (1, CFG.max_steps, 16)
    assert 0 < n <= CFG.max_steps
    # code_0 within the talker sampling range; codebooks 1..15 within [0,2048)
    assert (codes[0, :n, 0] < protocol.TALKER_SAMPLE_LIMIT).all()
    assert (codes[0, :n, 1:] >= 0).all() and (codes[0, :n, 1:] < 2048).all()
    # frames past EOS are zero-filled
    assert (codes[0, n:] == 0).all()


def test_greedy_deterministic(models):
    prompt = _prompt(1, 5)
    out = []
    for _ in range(2):
        codes, n = generate.generate_codes(
            models, CFG.talker, CFG.predictor, prompt,
            jnp.zeros((1,), jnp.int32), jax.random.key(7),
            0.0, 0, 1.0, CFG.max_steps,
        )
        out.append((np.asarray(codes), np.asarray(n)))
    np.testing.assert_array_equal(out[0][0], out[1][0])
    np.testing.assert_array_equal(out[0][1], out[1][1])


def test_sampled_fixed_seed_deterministic(models):
    prompt = _prompt(1, 5)
    a = generate.generate_codes(
        models, CFG.talker, CFG.predictor, prompt,
        jnp.zeros((1,), jnp.int32), jax.random.key(42), 0.7, 40, 0.9,
        CFG.max_steps,
    )
    b = generate.generate_codes(
        models, CFG.talker, CFG.predictor, prompt,
        jnp.zeros((1,), jnp.int32), jax.random.key(42), 0.7, 40, 0.9,
        CFG.max_steps,
    )
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_streaming_matches_fused_greedy(models):
    """The jitted per-frame streaming path must produce exactly the fused
    while_loop's codes (greedy ⇒ RNG-free comparison)."""
    prompt = _prompt(1, 6)
    pad = jnp.zeros((1,), jnp.int32)
    fused_codes, fused_n = generate.generate_codes(
        models, CFG.talker, CFG.predictor, prompt, pad,
        jax.random.key(3), 0.0, 0, 1.0, CFG.max_steps,
    )
    prefill_fn, step_fn = generate.make_stream_fns(
        CFG.talker, CFG.predictor, top_k=0, frames_per_call=1
    )
    state = prefill_fn(models, prompt, pad, jax.random.key(3), 0.0, 1.0)
    got = []
    for _ in range(CFG.max_steps):
        state, codes, active = step_fn(models, state)
        if not bool(active[0, 0]):
            break
        got.append(np.asarray(codes[0, 0]))
    got = np.stack(got) if got else np.zeros((0, 16), np.int32)
    n = int(fused_n[0])
    assert got.shape[0] == n
    np.testing.assert_array_equal(got, np.asarray(fused_codes)[0, :n])


def test_left_padding_invariance(models):
    """A left-padded row must generate the same greedy codes as the same
    prompt unpadded (mask correctness for ragged DP batches)."""
    prompt = _prompt(1, 5, seed=9)
    codes_a, n_a = generate.generate_codes(
        models, CFG.talker, CFG.predictor, prompt,
        jnp.zeros((1,), jnp.int32), jax.random.key(0), 0.0, 0, 1.0,
        CFG.max_steps,
    )
    pad_len = 3
    padded = jnp.concatenate(
        [jnp.full((1, pad_len, CFG.talker.hidden), 7.7), prompt], axis=1
    )  # garbage pad content must be fully masked
    codes_b, n_b = generate.generate_codes(
        models, CFG.talker, CFG.predictor, padded,
        jnp.full((1,), pad_len, jnp.int32), jax.random.key(0), 0.0, 0, 1.0,
        CFG.max_steps,
    )
    assert int(n_a[0]) == int(n_b[0])
    np.testing.assert_array_equal(np.asarray(codes_a), np.asarray(codes_b))


def test_batched_rows_independent(models):
    """Greedy generation per batch row must equal the single-row result."""
    p1 = _prompt(1, 5, seed=11)
    p2 = _prompt(1, 5, seed=22)
    both = jnp.concatenate([p1, p2], axis=0)
    pad = jnp.zeros((2,), jnp.int32)
    codes_b, n_b = generate.generate_codes(
        models, CFG.talker, CFG.predictor, both, pad,
        jax.random.key(0), 0.0, 0, 1.0, CFG.max_steps,
    )
    for i, p in enumerate([p1, p2]):
        codes_s, n_s = generate.generate_codes(
            models, CFG.talker, CFG.predictor, p,
            jnp.zeros((1,), jnp.int32), jax.random.key(0), 0.0, 0, 1.0,
            CFG.max_steps,
        )
        n = min(int(n_s[0]), int(n_b[i]))
        assert int(n_s[0]) == int(n_b[i])
        np.testing.assert_array_equal(
            np.asarray(codes_b)[i, :n], np.asarray(codes_s)[0, :n]
        )


def test_generate_audio_matches_two_step(models):
    """The fused one-program offline path (generation while_loop -> vocoder,
    generate.generate_audio) must produce exactly the waveform of the
    two-step path (codes -> separate vocoder decode) on each row's first
    n_frames — zero-code padding is causal-safe."""
    from qwen3_tts_tpu.models import vocoder

    vcfg = CFG.vocoder
    voc = vocoder.init_vocoder(jax.random.key(4), vcfg)
    prompt = _prompt(2, 5, seed=9)
    pad = jnp.zeros((2,), jnp.int32)
    args = (prompt, pad, jax.random.key(3), 0.0, 0, 1.0, CFG.max_steps)

    codes, n2 = generate.generate_codes(
        models, CFG.talker, CFG.predictor, *args)
    wav2, _, _ = vocoder.decode(voc, vcfg, codes,
                                vocoder.init_state(vcfg, 2), True)

    wav1, n1 = generate.generate_audio(
        models, voc, CFG.talker, CFG.predictor, vcfg, *args)

    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    for b in range(2):
        n = int(n1[b]) * vcfg.frame_samples
        np.testing.assert_array_equal(
            np.asarray(wav1)[b, :n], np.asarray(wav2)[b, :n])


def test_step_cap_bucket_matches_exact(models):
    """Bucketed extent + dynamic step_cap (the engine's one-compile-many-
    lengths path) must produce the same frames as compiling the exact
    extent."""
    prompt = _prompt(1, 8)
    pad = jnp.zeros((1,), jnp.int32)
    key = jax.random.key(3)
    exact_codes, exact_n = generate.generate_codes(
        models, CFG.talker, CFG.predictor, prompt, pad, key,
        0.0, 0, 1.0, 5)
    buck_codes, buck_n = generate.generate_codes(
        models, CFG.talker, CFG.predictor, prompt, pad, key,
        0.0, 0, 1.0, 12, step_cap=jnp.int32(5))
    assert int(exact_n[0]) == int(buck_n[0])
    n = int(exact_n[0])
    np.testing.assert_array_equal(np.asarray(exact_codes[0, :n]),
                                  np.asarray(buck_codes[0, :n]))
    np.testing.assert_array_equal(np.asarray(buck_codes[0, n:]), 0)


def test_jacobi_predictor_matches_ar(models):
    """Jacobi self-speculative expansion converges to the same greedy
    codes as the AR scan for arbitrary drafts (oracle, zero, adversarial)
    — it is a fixed-point iteration of the same chain."""
    from qwen3_tts_tpu.models import predictor as pred_mod

    B = 3
    h = jax.random.normal(jax.random.key(5), (B, CFG.predictor.hidden),
                          jnp.float32)
    c0 = jax.random.randint(jax.random.key(6), (B,), 0, 2048, jnp.int32)
    want = pred_mod.frame_codes(models["predictor"], CFG.predictor,
                                models["assets"], h, c0)
    # oracle draft: must converge in one pass, exactly
    got_oracle = pred_mod.frame_codes_jacobi(
        models["predictor"], CFG.predictor, models["assets"], h, c0,
        draft=want[:, 1:])
    np.testing.assert_array_equal(np.asarray(got_oracle), np.asarray(want))
    # zero draft (the generation loop's first frame)
    got_zero = pred_mod.frame_codes_jacobi(
        models["predictor"], CFG.predictor, models["assets"], h, c0)
    np.testing.assert_array_equal(np.asarray(got_zero), np.asarray(want))
    # adversarial draft
    adv = (want[:, 1:] + 7) % 2048
    got_adv = pred_mod.frame_codes_jacobi(
        models["predictor"], CFG.predictor, models["assets"], h, c0,
        draft=adv)
    np.testing.assert_array_equal(np.asarray(got_adv), np.asarray(want))


def test_jacobi_generation_matches_default(models, monkeypatch):
    """QWEN3_TTS_PRED_JACOBI=1: the whole fused generation loop (previous
    frame as draft) produces the same greedy code matrix as the default
    path."""
    prompt = _prompt(1, 8)
    pad = jnp.zeros((1,), jnp.int32)
    key = jax.random.key(2)
    base, n_base = generate.generate_codes(
        models, CFG.talker, CFG.predictor, prompt, pad, key, 0.0, 0, 1.0, 6)
    monkeypatch.setenv("QWEN3_TTS_PRED_JACOBI", "1")
    jax.clear_caches()     # trace-time knob
    try:
        jac, n_jac = generate.generate_codes(
            models, CFG.talker, CFG.predictor, prompt, pad, key,
            0.0, 0, 1.0, 6)
    finally:
        monkeypatch.delenv("QWEN3_TTS_PRED_JACOBI")
        jax.clear_caches()
    assert int(n_base[0]) == int(n_jac[0])
    np.testing.assert_array_equal(np.asarray(base), np.asarray(jac))
