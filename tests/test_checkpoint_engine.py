"""Engine checkpoint round-trip: save_checkpoint -> TtsEngine(model_dir)
reproduces identical generations, and the downloader manifest resolves."""

import numpy as np

from qwen3_tts_tpu import SamplerConfig, TtsEngine, VoiceFile, tiny_engine_config
from qwen3_tts_tpu import download

CFG = tiny_engine_config(max_steps=5)


def test_save_load_roundtrip(tmp_path):
    eng = TtsEngine(config=CFG, random_weights=True, seed=3)
    eng.set_sampler_config(SamplerConfig(temperature=0.0, top_k=0,
                                         top_p=1.0, seed=1))
    voice = VoiceFile(speaker_embedding=np.random.default_rng(0)
                      .normal(size=64).astype(np.float32).tolist())
    want = eng.generate_with_voice("roundtrip", voice)

    ckpt = tmp_path / "models"
    eng.save_checkpoint(str(ckpt))
    for f in ("talker.npz", "predictor.npz", "vocoder.npz",
              "qwen3_assets.gguf"):
        assert (ckpt / f).exists(), f

    eng2 = TtsEngine(model_dir=str(ckpt), config=CFG)
    eng2.set_sampler_config(SamplerConfig(temperature=0.0, top_k=0,
                                          top_p=1.0, seed=1))
    got = eng2.generate_with_voice("roundtrip", voice)
    np.testing.assert_allclose(got.samples, want.samples, rtol=1e-5,
                               atol=1e-6)


def test_download_manifest_offline(tmp_path):
    d = download.Downloader(offline=True)
    missing = d.missing(str(tmp_path), "q8_0")
    assert "gguf_q8_0/qwen3_tts_talker.gguf" in missing
    res = d.check_and_download(str(tmp_path), "q8_0")
    assert all(v == "missing" for v in res.values())
    # existing files are reported and never re-fetched
    (tmp_path / "tokenizer").mkdir()
    (tmp_path / "tokenizer" / "tokenizer.json").write_text("{}")
    res = d.check_and_download(str(tmp_path), "q8_0")
    assert res["tokenizer/tokenizer.json"] == "exists"


def test_warmup_precompiles(tmp_path):
    import time
    import numpy as np
    from qwen3_tts_tpu import VoiceFile

    eng = TtsEngine(config=CFG, random_weights=True, seed=4)
    eng.set_sampler_config(SamplerConfig(temperature=0.0, top_k=0,
                                         top_p=1.0, seed=1))
    eng.warmup(prompt_buckets=(64,), batch_sizes=(1,))
    voice = VoiceFile(speaker_embedding=np.zeros(64).tolist())
    t0 = time.time()
    out = eng.generate_with_voice("after warmup", voice)
    dt = time.time() - t0
    assert len(out.samples) > 0
    assert dt < 3.0, f"first request still paid compile latency: {dt:.1f}s"


def test_long_text_step_cap():
    """max_steps beyond the talker context / vocoder capacity is capped, not
    crashed (long-text config)."""
    import numpy as np
    from qwen3_tts_tpu import VoiceFile

    eng = TtsEngine(config=CFG, random_weights=True, seed=5)
    eng.set_sampler_config(SamplerConfig(temperature=0.0, top_k=0,
                                         top_p=1.0, seed=1))
    eng.set_max_steps(100_000)
    voice = VoiceFile(speaker_embedding=np.zeros(64).tolist())
    out = eng.generate_with_voice("cap me", voice)
    max_frames = CFG.vocoder.max_frames
    assert 0 < len(out.samples) <= max_frames * 2000
