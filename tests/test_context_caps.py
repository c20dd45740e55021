"""Context-cap enforcement on every generation path (VERDICT r1 #5).

Reference behavior: the talker runs with n_ctx=4096 (`src/tts/engine.rs:133`)
— generation can never write past the KV cache. Round 1 enforced this only
on the offline path; these tests drive the offline loop, `generate_stream`,
and `ServingEngine` into the cap and assert a clean stop (frames bounded by
context room / vocoder capacity), plus admission rejection for prompts that
alone exceed capacity.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tts_tpu.core import protocol as P
from qwen3_tts_tpu.core.config import tiny_engine_config
from qwen3_tts_tpu.serving import ServingEngine
from qwen3_tts_tpu.tts import generate
from qwen3_tts_tpu.tts.engine import TtsEngine
from qwen3_tts_tpu.utils.voice_file import VoiceFile


def _tiny_engine(max_steps=100, talker_max_seq=24, vocoder_max_frames=32):
    cfg = tiny_engine_config(max_steps=max_steps)
    cfg = dataclasses.replace(
        cfg,
        talker=dataclasses.replace(cfg.talker, max_seq=talker_max_seq),
        vocoder=dataclasses.replace(cfg.vocoder,
                                    max_frames=vocoder_max_frames),
        max_steps=max_steps,
    )
    eng = TtsEngine(config=cfg, random_weights=True, seed=1)
    eng.set_max_steps(max_steps)
    return eng


def _voice():
    return VoiceFile(ref_text="", audio_codes=[],
                     speaker_embedding=[0.01] * 2048)


def test_offline_loop_stops_at_context_cap():
    """generate_codes with max_steps far past the context: rows stop when the
    next feedback slot would leave the cache, with no clamped writes to live
    rows."""
    eng = _tiny_engine(max_steps=64, talker_max_seq=12)
    cfg = eng.config
    S = 6
    prompt = 0.1 * jnp.ones((1, S, cfg.talker.hidden), jnp.float32)
    pad = jnp.zeros((1,), jnp.int32)
    codes, n_frames = generate.generate_codes(
        eng.models, cfg.talker, cfg.predictor, prompt, pad,
        jax.random.key(0), 0.0, 40, 0.9, 64)
    n = int(n_frames[0])
    # room: slots S..max_seq-1 hold feedbacks -> at most max_seq - S frames
    assert n <= cfg.talker.max_seq - S
    # frames past the stop are zero-filled (clean stop, not garbage)
    assert int(jnp.abs(codes[0, n:]).sum()) == 0


def test_generate_stream_respects_context_and_vocoder_caps():
    eng = _tiny_engine(max_steps=500, talker_max_seq=64,
                       vocoder_max_frames=8)
    chunks = []
    audio = eng.generate_stream("aaaa bbbb cccc", _voice(),
                                on_chunk=chunks.append)
    frames = len(audio.samples) // eng.config.vocoder.frame_samples
    assert len(audio.samples) % eng.config.vocoder.frame_samples == 0
    # budget = min(max_steps, context room, vocoder.max_frames) = <= 8
    assert 0 < frames <= eng.config.vocoder.max_frames


def test_serving_rejects_oversized_prompt():
    eng = _tiny_engine(talker_max_seq=48)   # tiny context
    srv = ServingEngine(eng, max_streams=2)
    sid = srv.submit("a" * 300, _voice())   # prompt alone > 48 slots
    assert sid is not None
    s = srv.streams[sid]
    assert s.done and s.error is not None
    assert "context" in s.error or "length" in s.error
    # the slot was released: a well-sized stream can still be admitted
    sid2 = srv.submit("ok", _voice())
    assert sid2 is not None and srv.streams[sid2].error is None


def test_serving_stops_at_vocoder_capacity():
    eng = _tiny_engine(max_steps=1000, talker_max_seq=512,
                       vocoder_max_frames=12)
    srv = ServingEngine(eng, max_streams=2)
    sid = srv.submit("hello world", _voice())
    srv.run_until_drained(max_ticks=100)
    s = srv.streams[sid]
    assert s.done
    cap = eng.config.vocoder.max_frames - P.STREAM_CHUNK_FRAMES
    assert s.frames <= cap
    assert s.result is not None
    assert len(s.result.samples) == s.frames * eng.config.vocoder.frame_samples


def test_stream_matches_offline_under_cap():
    """Greedy streaming output equals the offline path when both hit the
    same context cap."""
    eng = _tiny_engine(max_steps=64, talker_max_seq=16)
    eng.set_sampler_config(
        dataclasses.replace(eng.sampler_config, temperature=0.0))
    v = _voice()
    a_off = eng.generate_with_voice("xyz", v)
    a_str = eng.generate_stream("xyz", v)
    np.testing.assert_allclose(a_off.samples, a_str.samples, atol=2e-5)
