"""Continuous-batching serving: staggered streams must produce EXACTLY the
audio they'd produce running alone (greedy), slots must recycle, and the
engine must drain cleanly."""

import json

import numpy as np
import pytest

from qwen3_tts_tpu import SamplerConfig, TtsEngine, tiny_engine_config
from qwen3_tts_tpu.serving import ServingEngine

CFG = tiny_engine_config(max_steps=8)


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    sdir = tmp_path_factory.mktemp("speakers")
    emb = np.random.default_rng(0).normal(size=64).astype(np.float32)
    (sdir / "vivian.json").write_text(json.dumps(
        {"name": "vivian", "spk_id": 3065, "spk_emb": emb.tolist()}))
    eng = TtsEngine(config=CFG, random_weights=True, seed=0,
                    speakers_dir=str(sdir))
    eng.set_sampler_config(SamplerConfig(temperature=0.0, top_k=0,
                                         top_p=1.0, seed=1))
    return eng


def test_staggered_streams_match_solo(engine):
    voice = engine.get_speaker("vivian")
    texts = ["first utterance", "second one", "the third text"]
    solo = [engine.generate_with_voice(t, voice) for t in texts]

    srv = ServingEngine(engine, max_streams=2)
    s0 = srv.submit(texts[0], voice)
    assert s0 is not None
    srv.step()                              # stream 0 advances alone
    s1 = srv.submit(texts[1], voice)        # admitted mid-flight
    assert s1 is not None
    s2 = srv.submit(texts[2], voice)        # batch full
    assert s2 is None

    # drain until a slot frees, then admit the third
    for _ in range(64):
        srv.step()
        if srv.result(s0) is not None or srv.result(s1) is not None:
            break
    s2 = srv.submit(texts[2], voice)
    assert s2 is not None
    srv.run_until_drained()

    for sid, want in zip((s0, s1, s2), solo):
        got = srv.result(sid)
        assert got is not None, f"stream {sid} did not finish"
        np.testing.assert_allclose(
            got.samples, want.samples, rtol=1e-4, atol=1e-5,
            err_msg=f"stream {sid} diverged from solo generation",
        )


def test_chunk_callbacks_fire(engine):
    voice = engine.get_speaker("vivian")
    srv = ServingEngine(engine, max_streams=1)
    chunks = []
    sid = srv.submit("callback test", voice, on_chunk=chunks.append)
    srv.run_until_drained()
    out = srv.result(sid)
    assert out is not None
    assert len(chunks) >= 1
    np.testing.assert_allclose(np.concatenate(chunks), out.samples)


def test_slot_reuse_many_streams(engine):
    voice = engine.get_speaker("vivian")
    srv = ServingEngine(engine, max_streams=2)
    ids = []
    pending = ["a", "bb", "ccc", "dddd"]
    while pending or srv.slots.active() > 0:
        while pending:
            sid = srv.submit(pending[0], voice)
            if sid is None:
                break
            ids.append(sid)
            pending.pop(0)
        srv.step()
    assert len(ids) == 4
    for sid in ids:
        r = srv.result(sid)
        assert r is not None and len(r.samples) > 0


def test_sixteen_concurrent_slots(engine):
    """B=16 — the fused kernels' batch cap (ops/fused_*.py max_b) and the
    measured serving config (BENCH r4: 177 audio-s/s/chip at batch 16).
    All 16 admitted at once, all finish, slot count never exceeds 16."""
    voice = engine.get_speaker("vivian")
    srv = ServingEngine(engine, max_streams=16)
    ids = [srv.submit(f"utterance {i}", voice) for i in range(16)]
    assert all(sid is not None for sid in ids)
    assert srv.slots.active() == 16
    assert srv.submit("over capacity", voice) is None
    srv.run_until_drained()
    for sid in ids:
        r = srv.result(sid)
        assert r is not None and len(r.samples) > 0


def test_failed_submission_does_not_poison_batch(engine):
    """A stream whose prompt build fails is reported failed and its slot is
    recycled; other streams are unaffected."""

    class BadVoice:
        audio_codes = []
        ref_text = ""

        @property
        def spk_emb(self):
            raise ValueError("corrupt embedding")

    srv = ServingEngine(engine, max_streams=1)
    bad = srv.submit("x", BadVoice())
    assert bad is not None
    s = srv.streams[bad]
    assert s.done and s.error is not None
    assert srv.slots.active() == 0          # slot recycled immediately

    voice = engine.get_speaker("vivian")
    good = srv.submit("recovered", voice)
    assert good is not None
    srv.run_until_drained()
    assert srv.result(good) is not None
    assert len(srv.result(good).samples) > 0


def test_kv_window_matches_full_cache(engine):
    """A serving engine with a bounded talker KV window produces the same
    greedy output as the full-cache one (streams fit the window), and
    admission rejects prompts that fill the window."""
    from qwen3_tts_tpu import serving as serving_mod
    from qwen3_tts_tpu.utils.voice_file import VoiceFile

    full = serving_mod.ServingEngine(engine, max_streams=2)
    win = serving_mod.ServingEngine(engine, max_streams=2, kv_window=256)
    assert win._state is None
    voice = VoiceFile(speaker_embedding=[0.0] * 64)

    sid_f = full.submit("window parity", voice)
    sid_w = win.submit("window parity", voice)
    for eng in (full, win):
        while eng.step():
            pass
    a = full.result(sid_f).samples
    b = win.result(sid_w).samples
    np.testing.assert_array_equal(a, b)
    assert win._state["cache"]["k"].shape[3] == 256

    # a prompt that fills the window is rejected cleanly, not admitted
    tiny_win = serving_mod.ServingEngine(engine, max_streams=2, kv_window=8)
    sid = tiny_win.submit("this prompt is far too long for the window",
                          voice)
    res = tiny_win.result(sid)
    assert tiny_win.streams[sid].error is not None
    assert res.samples.size == 0


def test_thirtytwo_slots_with_window(engine):
    """32 concurrent slots on a windowed KV cache (the B=32 serving
    envelope the r5 bench measures on hardware): admission fills all
    slots, streams complete and recycle."""
    from qwen3_tts_tpu import serving as serving_mod

    srv = serving_mod.ServingEngine(engine, max_streams=32, kv_window=256)
    voice = engine.get_speaker("vivian")
    sids = [srv.submit(f"slot {i}", voice) for i in range(32)]
    assert all(s is not None for s in sids)
    assert srv.submit("no room", voice) is None      # batch full
    while srv.step():
        pass
    for sid in sids:
        res = srv.result(sid)
        assert res is not None and res.samples.size > 0
    # slots recycled: a new stream admits again
    assert srv.submit("again", voice) is not None
