"""Downloader robustness + product-path wiring (VERDICT r2 #5): streaming
progress, .part resume, sha256 verification, TtsEngine.download_models,
--quant selecting the per-quant model subdirectory, and direct GGUF loading
of the artifacts the manifest actually fetches (src/download.rs:55-101)."""

import io
import json
import os
import urllib.request

import numpy as np
import pytest

from qwen3_tts_tpu import SamplerConfig, TtsEngine, VoiceFile, download
from qwen3_tts_tpu.assets.llama_gguf import export_llama_gguf
from qwen3_tts_tpu.core.config import tiny_engine_config

CFG = tiny_engine_config(max_steps=4)


class _Resp(io.BytesIO):
    """urlopen-compatible canned HTTP response."""

    def __init__(self, payload: bytes, status=200, length_known=True):
        super().__init__(payload)
        self.status = status
        self.headers = {"Content-Length": str(len(payload))} \
            if length_known else {}

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _serve(monkeypatch, payload: bytes, support_range=True, fail_first=0):
    """Patch urlopen to serve `payload`, honouring Range; optionally failing
    the first `fail_first` GETs."""
    calls = {"n": 0, "ranges": []}

    def fake_urlopen(req, timeout=None):
        url = req.full_url if hasattr(req, "full_url") else req
        if getattr(req, "get_method", lambda: "GET")() == "HEAD":
            return _Resp(b"")
        calls["n"] += 1
        if calls["n"] <= fail_first:
            raise OSError("synthetic network drop")
        rng = req.headers.get("Range") if hasattr(req, "headers") else None
        calls["ranges"].append(rng)
        if rng and support_range:
            start = int(rng.split("=")[1].rstrip("-"))
            return _Resp(payload[start:], status=206)
        return _Resp(payload)

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    return calls


def test_streamed_download_with_progress(monkeypatch, tmp_path):
    payload = bytes(range(256)) * 9000        # > 1 MiB: multiple chunks
    _serve(monkeypatch, payload)
    seen = []
    d = download.Downloader(offline=False,
                            progress=lambda rel, done, total:
                            seen.append((rel, done, total)))
    res = d.check_and_download(str(tmp_path), "q8_0")
    assert set(res.values()) == {"downloaded"}
    rel = "gguf_q8_0/qwen3_tts_talker.gguf"
    with open(tmp_path / rel, "rb") as f:
        assert f.read() == payload
    ours = [s for s in seen if s[0] == rel]
    assert len(ours) >= 2                      # chunked, not one-shot
    assert ours[-1] == (rel, len(payload), len(payload))
    assert ours[0][1] < len(payload)


def test_part_file_resume(monkeypatch, tmp_path):
    payload = b"0123456789" * 200_000
    calls = _serve(monkeypatch, payload)
    rel = "tokenizer/tokenizer.json"
    part = tmp_path / (rel + ".part")
    part.parent.mkdir(parents=True)
    part.write_bytes(payload[:500_000])       # interrupted earlier fetch
    d = download.Downloader(offline=False, progress=lambda *a: None)
    res = d.check_and_download(str(tmp_path), "q8_0")
    assert res[rel] == "downloaded"
    with open(tmp_path / rel, "rb") as f:
        assert f.read() == payload
    assert "bytes=500000-" in calls["ranges"]


def test_retry_after_failure(monkeypatch, tmp_path):
    payload = b"x" * 1000
    _serve(monkeypatch, payload, fail_first=1)
    d = download.Downloader(offline=False, retries=2,
                            progress=lambda *a: None)
    res = d.check_and_download(str(tmp_path), "none")
    assert set(res.values()) == {"downloaded"}


def test_sha256_verification(monkeypatch, tmp_path):
    import hashlib
    payload = b"good-model-bytes" * 100
    _serve(monkeypatch, payload)
    rel = "gguf/qwen3_assets.gguf"
    sums = {rel: hashlib.sha256(payload).hexdigest()}
    (tmp_path / "checksums.json").write_text(json.dumps(sums))

    # corrupt existing file -> re-fetched and verified
    (tmp_path / "gguf").mkdir()
    (tmp_path / rel).write_bytes(b"tampered")
    d = download.Downloader(offline=False, progress=lambda *a: None)
    res = d.check_and_download(str(tmp_path), "none")
    assert res[rel] == "downloaded"
    with open(tmp_path / rel, "rb") as f:
        assert f.read() == payload

    # wrong checksum -> corrupt, file quarantined
    sums[rel] = "0" * 64
    res = d.check_and_download(str(tmp_path), "none", checksums=sums)
    assert res[rel] == "corrupt"
    assert not (tmp_path / rel).exists()


def test_engine_download_models_offline(tmp_path):
    res = TtsEngine.download_models(str(tmp_path), "q5_k_m", offline=True)
    assert set(res.values()) == {"missing"}
    assert "gguf_q5_k_m/qwen3_tts_talker.gguf" in res


# ------------------------------------------------- quant-dir weight loading
def _seed_quant_dir(tmp_path, quant="q8_0"):
    eng = TtsEngine(config=CFG, random_weights=True, seed=7)
    qdir = tmp_path / download.quant_dir(quant)
    eng.save_checkpoint(str(qdir))
    return eng


def test_engine_loads_from_quant_subdir(tmp_path):
    ref = _seed_quant_dir(tmp_path, "q8_0")
    eng = TtsEngine(model_dir=str(tmp_path), config=CFG, quant="q8_0")
    sc = SamplerConfig(temperature=0.0, top_k=0, top_p=1.0, seed=1)
    ref.set_sampler_config(sc)
    eng.set_sampler_config(sc)
    voice = VoiceFile(speaker_embedding=np.zeros(64, np.float32).tolist())
    a = ref.generate_with_voice("quant dir", voice)
    b = eng.generate_with_voice("quant dir", voice)
    np.testing.assert_array_equal(a.samples, b.samples)


def test_engine_loads_reference_gguf_directly(tmp_path):
    """The downloader's own artifacts (llama.cpp-layout GGUF) load without a
    conversion step, like the reference engine (src/tts/engine.rs:126-130)."""
    ref = _seed_quant_dir(tmp_path, "none")
    qdir = tmp_path / "gguf"
    t = jax_to_np(ref.models["talker"])
    p = jax_to_np(ref.models["predictor"])
    export_llama_gguf(str(qdir / "qwen3_tts_talker.gguf"), CFG.talker, t)
    export_llama_gguf(str(qdir / "qwen3_tts_predictor.gguf"),
                      CFG.predictor, p)
    os.remove(qdir / "talker.npz")
    os.remove(qdir / "predictor.npz")

    eng = TtsEngine(model_dir=str(tmp_path), config=CFG)
    sc = SamplerConfig(temperature=0.0, top_k=0, top_p=1.0, seed=1)
    ref.set_sampler_config(sc)
    eng.set_sampler_config(sc)
    voice = VoiceFile(speaker_embedding=np.zeros(64, np.float32).tolist())
    a = ref.generate_with_voice("direct gguf", voice)
    b = eng.generate_with_voice("direct gguf", voice)
    np.testing.assert_array_equal(a.samples, b.samples)


def test_engine_gguf_geometry_mismatch(tmp_path):
    _seed_quant_dir(tmp_path, "none")
    qdir = tmp_path / "gguf"
    os.remove(qdir / "talker.npz")
    import dataclasses
    wrong = dataclasses.replace(CFG.talker, n_layers=3)
    from qwen3_tts_tpu.models import decoder
    import jax
    bad = jax_to_np(decoder.init_decoder(jax.random.key(0), wrong))
    export_llama_gguf(str(qdir / "qwen3_tts_talker.gguf"), wrong, bad)
    with pytest.raises(ValueError, match="n_layers"):
        TtsEngine(model_dir=str(tmp_path), config=CFG)


def test_missing_weights_clear_error(tmp_path):
    with pytest.raises(FileNotFoundError, match="download_models"):
        TtsEngine(model_dir=str(tmp_path), config=CFG)


def jax_to_np(tree):
    import jax
    return jax.tree.map(np.asarray, tree)


# ------------------------------------------------------------ CLI wiring
def test_cli_download_flow_offline(tmp_path, monkeypatch, capsys):
    """Offline-mode CLI proves the download->engine flow: the missing
    manifest is reported and model loading fails cleanly (rc 1)."""
    from qwen3_tts_tpu import cli

    monkeypatch.setenv("QWEN3_TTS_OFFLINE", "1")
    rc = cli.main(["--text", "hi", "--tiny",
                   "--model-dir", str(tmp_path / "nothing"),
                   "--quant", "q8_0"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "gguf_q8_0/qwen3_tts_talker.gguf" in err
    assert "Failed to load models" in err


def test_cli_quant_dir_generation(tmp_path, monkeypatch):
    """End-to-end: checkpoints in the per-quant subdir, --quant selects
    them, --no-download skips fetching."""
    from qwen3_tts_tpu import cli

    _seed_quant_dir(tmp_path, "q5_k_m")
    sdir = tmp_path / "speakers"
    sdir.mkdir()
    (sdir / "vivian.json").write_text(json.dumps(
        {"name": "vivian", "spk_emb": np.zeros(64).tolist()}))
    out = str(tmp_path / "o.wav")
    rc = cli.main(["--text", "quant cli", "--tiny", "--no-download",
                   "--model-dir", str(tmp_path), "--quant", "q5_k_m",
                   "--max-steps", "4", "--output", out,
                   "--speakers-dir", str(sdir)])
    assert rc == 0
    assert os.path.exists(out)
