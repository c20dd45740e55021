"""warmup() must precompile the programs users actually hit first
(VERDICT r1 #7): the offline generate path AND the streaming
(prefill, step) pair used by generate_stream / ServingEngine.

Verified via jit cache introspection: after warmup, a real streaming request
with a same-bucket prompt must not add cache entries (i.e. no new compiles).
"""

import dataclasses

from qwen3_tts_tpu.core.config import tiny_engine_config
from qwen3_tts_tpu.serving import ServingEngine
from qwen3_tts_tpu.tts.engine import TtsEngine
from qwen3_tts_tpu.utils.voice_file import VoiceFile


def _voice():
    return VoiceFile(ref_text="", audio_codes=[],
                     speaker_embedding=[0.01] * 2048)


def test_warmup_covers_streaming_path():
    eng = TtsEngine(config=tiny_engine_config(max_steps=8),
                    random_weights=True, seed=3)
    eng.set_sampler_config(
        dataclasses.replace(eng.sampler_config, temperature=0.0, seed=0))
    eng.warmup(prompt_buckets=(64,), batch_sizes=(1,))

    prefill_fn, step_fn = eng._get_stream_fns()
    pre_n = prefill_fn._cache_size()
    step_n = step_fn._cache_size()
    assert pre_n >= 1 and step_n >= 1, "warmup compiled nothing for streaming"

    audio = eng.generate_stream("hello", _voice())
    assert len(audio.samples) > 0
    assert prefill_fn._cache_size() == pre_n, "first stream recompiled prefill"
    assert step_fn._cache_size() == step_n, "first stream recompiled step"


def test_serving_warmup_covers_batch_step():
    eng = TtsEngine(config=tiny_engine_config(max_steps=8),
                    random_weights=True, seed=3)
    srv = ServingEngine(eng, max_streams=2)
    srv.warmup()
    _, step_fn = eng._get_stream_fns()
    n = step_fn._cache_size()
    sid = srv.submit("hi", _voice())
    srv.run_until_drained(max_ticks=20)
    assert srv.streams[sid].done
    assert step_fn._cache_size() == n, "first serving tick recompiled step"


def test_warmup_covers_offline_path():
    """The offline fused program compiled by warmup must be byte-for-byte
    the signature _run_inference dispatches (same bucketed extent + dynamic
    step_cap): a first real request after warmup adds NO jit cache entry.
    (Regression lock: warmup used to compile the pre-bucketing signature
    and the first request recompiled anyway.)"""
    from qwen3_tts_tpu.tts import generate

    eng = TtsEngine(config=tiny_engine_config(max_steps=8),
                    random_weights=True, seed=4)
    eng.set_sampler_config(
        dataclasses.replace(eng.sampler_config, temperature=0.0, seed=0))
    eng.warmup(prompt_buckets=(64,), batch_sizes=(1,))
    n = generate.generate_audio._cache_size()
    assert n >= 1, "warmup compiled nothing for the offline path"

    audio = eng.generate_with_voice("hello there", _voice())
    assert len(audio.samples) > 0
    assert generate.generate_audio._cache_size() == n, \
        "first offline request recompiled after warmup"

    # a different max_steps within the same bucket must also reuse it
    eng.set_max_steps(5)
    audio2 = eng.generate_with_voice("again", _voice())
    assert len(audio2.samples) >= 0
    assert generate.generate_audio._cache_size() == n, \
        "step-cap bucketing failed: distinct max_steps recompiled"
