"""End-to-end engine tests on tiny random-weight models: preset-speaker
synthesis -> WAV, streaming chunks, voice files, cloning, cache round-trip."""

import json
import os

import numpy as np
import jax
import pytest

from qwen3_tts_tpu import (
    AudioSample, SamplerConfig, TtsEngine, VoiceFile, tiny_engine_config,
)
from qwen3_tts_tpu.core import protocol as P
from qwen3_tts_tpu.models import encoders
from qwen3_tts_tpu.utils import cache as feature_cache

CFG = tiny_engine_config(max_steps=8)


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    sdir = tmp_path_factory.mktemp("speakers")
    emb = np.random.default_rng(0).normal(size=64).astype(np.float32)
    with open(sdir / "vivian.json", "w") as f:
        json.dump({"name": "vivian", "spk_id": 3065,
                   "spk_emb": emb.tolist()}, f)
    eng = TtsEngine(config=CFG, random_weights=True, seed=0,
                    speakers_dir=str(sdir))
    eng.set_sampler_config(SamplerConfig(temperature=0.0, top_k=0, top_p=1.0,
                                         seed=42))
    return eng


def test_preset_speaker_to_wav(engine, tmp_path):
    voice = engine.get_speaker("vivian")
    audio = engine.generate_with_voice("hello world", voice)
    assert audio.sample_rate == P.SAMPLE_RATE
    assert len(audio.samples) % P.FRAME_SAMPLES == 0
    assert len(audio.samples) > 0
    out = tmp_path / "out.wav"
    audio.save_wav(str(out))
    back = AudioSample.load_wav(str(out))
    assert back.sample_rate == P.SAMPLE_RATE
    assert abs(len(back.samples) - len(audio.samples)) == 0


def test_speaker_fallback(engine):
    # unknown id falls back to vivian (src/tts/engine.rs:211-231)
    v = engine.get_speaker("does-not-exist")
    assert v.name == "vivian"


def test_streaming_matches_offline_greedy(engine):
    voice = engine.get_speaker("vivian")
    offline = engine.generate_with_voice("stream me", voice)
    chunks = []
    streamed = engine.generate_stream("stream me", voice,
                                      on_chunk=chunks.append)
    assert len(chunks) >= 1
    # chunk sizes: whole frames (the first chunk withholds the vocoder's
    # lookahead window; the final chunk flushes it)
    for c in chunks:
        assert len(c) % P.FRAME_SAMPLES == 0
        assert 0 < len(c) <= (P.STREAM_CHUNK_FRAMES
                              + engine.config.vocoder.lookahead) \
            * P.FRAME_SAMPLES
    np.testing.assert_allclose(
        streamed.samples, offline.samples, rtol=1e-4, atol=1e-5
    )


def test_clone_voice_path(engine):
    """VoiceFile with audio_codes routes through the clone prompt."""
    rng = np.random.default_rng(1)
    vf = VoiceFile(
        ref_text="reference",
        audio_codes=[int(c) for c in rng.integers(0, 2048, size=3 * 16)],
        speaker_embedding=rng.normal(size=64).astype(np.float32).tolist(),
    )
    audio = engine.generate_with_voice("clone test", vf)
    assert len(audio.samples) > 0


def test_batched_generation(engine):
    voice = engine.get_speaker("vivian")
    outs = engine.generate_batch(["short", "a bit longer text"],
                                 [voice, voice])
    assert len(outs) == 2
    single = engine.generate_with_voice("short", voice)
    np.testing.assert_allclose(
        outs[0].samples, single.samples, rtol=1e-4, atol=1e-5
    )


def test_create_voice_file_and_cache(engine, tmp_path):
    engine.encoder, engine.speaker_encoder = encoders.random_encoders(
        jax.random.key(5), CFG)
    wav = AudioSample(
        samples=np.random.default_rng(2).normal(
            size=3 * P.FRAME_SAMPLES).astype(np.float32) * 0.1,
        sample_rate=24000,
    )
    path = tmp_path / "ref.wav"
    wav.save_wav(str(path))

    vf = engine.create_voice_file(str(path), "ref text")
    assert len(vf.audio_codes) == 3 * 16
    assert len(vf.speaker_embedding) == CFG.speaker_encoder.out_dim
    vf_path = tmp_path / "voice.json"
    vf.save(str(vf_path))
    vf2 = VoiceFile.load(str(vf_path))
    assert vf2.audio_codes == vf.audio_codes

    # process_reference writes a TTSC sidecar and reuses it
    codes, emb = engine.process_reference(str(path))
    cache_path = tmp_path / "ref.cache"
    assert cache_path.exists()
    c2, e2 = feature_cache.load_cache(str(cache_path))
    np.testing.assert_array_equal(np.asarray(codes).reshape(-1), c2)
    np.testing.assert_allclose(emb, e2, rtol=1e-6)
    # cached retrieval must short-circuit (poison the encoders to prove it)
    engine.encoder = None
    engine.speaker_encoder = None
    c3, _ = engine.process_reference(str(path))
    np.testing.assert_array_equal(np.asarray(c3).reshape(-1), c2)


def test_sample_rate_validation(engine, tmp_path):
    engine.encoder, engine.speaker_encoder = encoders.random_encoders(
        jax.random.key(5), CFG)
    wav = AudioSample(samples=np.zeros(4000, np.float32), sample_rate=16000)
    path = tmp_path / "bad.wav"
    wav.save_wav(str(path))
    with pytest.raises(ValueError, match="24000Hz"):
        engine.create_voice_file(str(path), "x")


def test_cloning_without_encoders_raises(tmp_path):
    eng = TtsEngine(config=CFG, random_weights=True, seed=1)
    wav = AudioSample(samples=np.zeros(4000, np.float32), sample_rate=24000)
    p = tmp_path / "r.wav"
    wav.save_wav(str(p))
    with pytest.raises(RuntimeError, match="not loaded"):
        eng.create_voice_file(str(p), "x")


def test_generate_long_splits_and_concatenates():
    """generate_long: arbitrary-length text is split at sentence
    boundaries, synthesized as ONE DP batch with the same voice, and
    concatenated — the reference's only answer to long text is max-steps
    truncation (SURVEY §5 long-context row)."""
    import numpy as np

    from qwen3_tts_tpu import SamplerConfig, TtsEngine, tiny_engine_config
    from qwen3_tts_tpu.utils.voice_file import VoiceFile

    eng = TtsEngine(config=tiny_engine_config(max_steps=4),
                    random_weights=True, seed=6)
    eng.set_sampler_config(SamplerConfig(temperature=0.0, top_k=0,
                                         top_p=1.0, seed=1))
    voice = VoiceFile(speaker_embedding=[0.01] * 64)

    # short text: identical to the plain path
    short = eng.generate_long("hi there.", voice, max_chunk_tokens=48)
    plain = eng.generate_with_voice("hi there.", voice)
    np.testing.assert_array_equal(short.samples, plain.samples)

    # long text: multiple chunks, concatenated in order, with pauses
    long_text = "one sentence. " * 12
    out = eng.generate_long(long_text, voice, max_chunk_tokens=32,
                            pause_s=0.1)
    # the per-chunk outputs concatenate to the same waveform
    import re
    sentences = [s for s in re.split(r"(?<=[.!?;\n])\s*", long_text)
                 if s.strip()]
    assert len(sentences) == 12
    assert out.samples.size > plain.samples.size
    assert out.duration() > 0

    # a single run-on "sentence" longer than the cap still synthesizes
    runon = "word " * 80
    out2 = eng.generate_long(runon.strip(), voice, max_chunk_tokens=24)
    assert out2.samples.size > 0
