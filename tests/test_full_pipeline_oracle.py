"""ONE independent numpy oracle of the ENTIRE pipeline (VERDICT r4 #3):
prompt assembly -> talker prefill -> per-frame greedy code_0 -> predictor
16-code expansion -> feedback embedding -> talker step -> ... -> vocoder ->
waveform, sharing zero code with the package, compared against the fused
`generate.generate_audio` program on the tiny config.

This is the strongest in-container stand-in for the blocked real-weight
waveform-allclose gate (BASELINE config 1): the per-stage oracles
(test_numpy_oracle, test_prompt, test_vocoder) lock each stage's math, but
only a whole-pipeline oracle catches SEAM bugs — wrong hidden handed to the
projection, positions off by one between prefill and steps, feedback built
from the wrong code set, vocoder fed a transposed code matrix.

Reference behavior being reproduced end-to-end: the whole of
`src/tts/engine.rs:445-656` (run_inference_stream) under greedy sampling.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.assets import tables
from qwen3_tts_tpu.core import protocol as P
from qwen3_tts_tpu.core.config import tiny_engine_config
from qwen3_tts_tpu.models import decoder, vocoder
from qwen3_tts_tpu.tts import generate, prompt as prompt_mod

from test_numpy_oracle import np_forward
from test_prompt import oracle_core
from test_vocoder import np_vocoder_oneshot

CFG = tiny_engine_config(max_steps=16)
MAX_STEPS = 12


@pytest.fixture(scope="module")
def models():
    k = jax.random.split(jax.random.key(7), 4)
    return {
        "talker": decoder.init_decoder(k[0], CFG.talker),
        "predictor": decoder.init_decoder(k[1], CFG.predictor),
        "assets": tables.random_assets(
            k[2], text_vocab=256, codec_rows=2176,
            dim=CFG.talker.hidden, proj_dim=CFG.predictor.hidden,
        ),
    }


@pytest.fixture(scope="module")
def voc_params():
    return vocoder.init_vocoder(jax.random.key(8), CFG.vocoder)


def np_full_pipeline(models, voc_params, prompt_np, max_steps):
    """Greedy run_inference_stream in plain numpy.

    prompt_np [S, hidden] -> (codes [n, 16], wav [n*frame_samples]).
    The talker and predictor are evaluated by FULL-sequence recompute each
    step (test_numpy_oracle proves full == incremental-with-cache), so this
    shares no caching machinery with the JAX stack either.
    """
    tcfg, pcfg, vcfg = CFG.talker, CFG.predictor, CFG.vocoder
    a = models["assets"]
    codec = np.asarray(a.codec_tables)            # [16, rows, hidden]
    text = np.asarray(a.text_table)
    pw = np.asarray(a.proj_weight)                # [1024-d, hidden] torch
    pb = np.asarray(a.proj_bias)
    # row 151671; jnp indexing clamps OOB (tiny table), numpy must match
    tts_pad = text[min(P.TEXT_AUDIO_MARKER, text.shape[0] - 1)]

    def project(h):                               # src/assets_manager.rs:383
        return h @ pw.T + pb

    seq = [prompt_np[i] for i in range(prompt_np.shape[0])]
    frames = []
    for _step in range(max_steps):
        x = np.stack(seq).astype(np.float32)
        h_all, logits_all = np_forward(models["talker"], tcfg, x,
                                       np.arange(len(seq)))
        code0 = int(np.argmax(logits_all[-1][: P.TALKER_SAMPLE_LIMIT]))
        if code0 in P.TALKER_EOS_IDS:             # EOS frame NOT emitted
            break
        h1024 = project(h_all[-1])

        # predictor: prefill [h1024, proj(codec0[code0])] then greedy
        # codebooks 1..15, each sampling head slice [(q-1)*2048, q*2048)
        codes = [code0]
        pseq = [h1024, project(codec[0, code0])]
        for q in range(1, P.NUM_CODEBOOKS):
            px = np.stack(pseq).astype(np.float32)
            _, plogits = np_forward(models["predictor"], pcfg, px,
                                    np.arange(len(pseq)))
            sl = plogits[-1][(q - 1) * P.CODE_VOCAB: q * P.CODE_VOCAB]
            cq = int(np.argmax(sl))
            codes.append(cq)
            pseq.append(project(codec[q, cq]))
        frames.append(codes)

        # feedback: sum of the 16 codec rows + tts_pad
        fb = tts_pad.copy()
        for q, c in enumerate(codes):
            fb = fb + codec[q, c]
        seq.append(fb)

    codes_np = np.asarray(frames, np.int64).reshape(-1, P.NUM_CODEBOOKS)
    # the fused program zero-pads codes past EOS and vocodes max_steps
    # frames; mirror that so waveforms compare over the full extent
    padded = np.zeros((max_steps, P.NUM_CODEBOOKS), np.int64)
    padded[: codes_np.shape[0]] = codes_np
    wav = np_vocoder_oneshot(voc_params, vcfg, padded)
    return codes_np, wav


def test_whole_pipeline_matches_numpy_oracle(models, voc_params):
    # prompt assembly included: the jax PromptBuilder vs the numpy
    # transcription of src/tts/prompt.rs (test_prompt.oracle_core)
    text_ids = [5, 99, 17, 250, 3]
    pd = prompt_mod.build_core(models["assets"], text_ids, lang_id=2055,
                               spk_id=3065)
    want_prompt = oracle_core(models["assets"], text_ids, lang_id=2055,
                              spk_id=3065)
    prompt_np = np.asarray(pd.embeds, np.float32)
    np.testing.assert_allclose(prompt_np, want_prompt, rtol=1e-5, atol=1e-6)

    want_codes, want_wav = np_full_pipeline(models, voc_params, prompt_np,
                                            MAX_STEPS)

    wav, n_frames = generate.generate_audio(
        models, voc_params, CFG.talker, CFG.predictor, CFG.vocoder,
        pd.embeds[None], jnp.zeros((1,), jnp.int32), jax.random.key(0),
        0.0, 0, 1.0, MAX_STEPS,                  # greedy fixed-extent
    )
    got_codes, got_n = generate.generate_codes(
        models, CFG.talker, CFG.predictor, pd.embeds[None],
        jnp.zeros((1,), jnp.int32), jax.random.key(0), 0.0, 0, 1.0,
        MAX_STEPS,
    )

    n = int(got_n[0])
    assert n == want_codes.shape[0], (n, want_codes.shape[0])
    assert n >= 8, f"oracle must cover >= 8 frames, got {n} (reseed)"
    np.testing.assert_array_equal(np.asarray(got_codes[0, :n]), want_codes)
    # codes past EOS are zero in the fused buffer
    np.testing.assert_array_equal(np.asarray(got_codes[0, n:]), 0)

    got_wav = np.asarray(wav)[0, : MAX_STEPS * CFG.vocoder.frame_samples]
    assert got_wav.shape == want_wav.shape
    np.testing.assert_allclose(got_wav, want_wav, rtol=2e-4, atol=2e-4)


def test_whole_pipeline_oracle_spk_emb_path(models, voc_params):
    """Preset-speaker route (spk_emb vector instead of spk_id row): the
    minimum end-to-end slice every preset voice uses."""
    emb = np.asarray(
        0.1 * jax.random.normal(jax.random.key(11), (CFG.talker.hidden,)),
        np.float32)
    text_ids = [42, 7]
    pd = prompt_mod.build_core(models["assets"], text_ids,
                               spk_emb=jnp.asarray(emb))
    want_prompt = oracle_core(models["assets"], text_ids, spk_emb=emb)
    prompt_np = np.asarray(pd.embeds, np.float32)
    np.testing.assert_allclose(prompt_np, want_prompt, rtol=1e-5, atol=1e-6)

    want_codes, _ = np_full_pipeline(models, voc_params, prompt_np, 6)
    got_codes, got_n = generate.generate_codes(
        models, CFG.talker, CFG.predictor, pd.embeds[None],
        jnp.zeros((1,), jnp.int32), jax.random.key(0), 0.0, 0, 1.0, 6,
    )
    n = int(got_n[0])
    assert n == want_codes.shape[0]
    np.testing.assert_array_equal(np.asarray(got_codes[0, :n]), want_codes)
