"""tools/validate_release.py against a synthetic fixture release: the
one-shot that turns real-weight day into a command must itself run
end-to-end in CI (VERDICT r4 #9). The fixture mirrors the downloader's
layout exactly (`src/download.rs:55-101`): tokenizer/tokenizer.json,
onnx/qwen3_tts_decoder.onnx, gguf/{qwen3_assets,qwen3_tts_talker,
qwen3_tts_predictor}.gguf."""

import json
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import convert_weights as cw  # noqa: E402
import validate_release  # noqa: E402
from qwen3_tts_tpu.assets.llama_gguf import export_llama_gguf  # noqa: E402
from qwen3_tts_tpu.core.config import tiny_engine_config  # noqa: E402
from qwen3_tts_tpu.tts.engine import TtsEngine  # noqa: E402

CFG = tiny_engine_config()


def _np(tree):
    return jax.tree.map(np.asarray, tree)


def _write_tokenizer_json(path):
    """A real (tiny) HF tokenizer.json so the validator exercises the
    non-fallback tokenizer path."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    vocab = {w: i for i, w in enumerate(
        ["[UNK]", "hello", "from", "the", "release", "validator", "world"])}
    tok = Tokenizer(WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tok.save(path)


@pytest.fixture(scope="module")
def release_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("release")
    eng = TtsEngine(config=CFG, random_weights=True, seed=3)
    qdir = root / "gguf"
    eng.save_checkpoint(str(qdir))

    # decoders ship as llama.cpp GGUF (what the downloader fetches), not npz
    export_llama_gguf(str(qdir / "qwen3_tts_talker.gguf"), CFG.talker,
                      _np(eng.models["talker"]))
    export_llama_gguf(str(qdir / "qwen3_tts_predictor.gguf"), CFG.predictor,
                      _np(eng.models["predictor"]))
    for stale in ("talker.npz", "predictor.npz", "vocoder.npz",
                  "vocoder_config.json"):
        os.remove(qdir / stale)     # the validator must regenerate these

    # the vocoder ships as the stateful ONNX graph
    os.makedirs(root / "onnx", exist_ok=True)
    cw.write_vocoder_onnx(str(root / "onnx" / "qwen3_tts_decoder.onnx"),
                          _np(eng.vocoder_params), CFG.vocoder)
    _write_tokenizer_json(str(root / "tokenizer" / "tokenizer.json"))

    # a geometry-compatible preset speaker (the repo's shipped speakers are
    # 2048-d; the tiny fixture needs a 64-d embedding)
    sdir = root / "preset_speakers"
    os.makedirs(sdir, exist_ok=True)
    (sdir / "vivian.json").write_text(json.dumps({
        "name": "vivian", "ref_text": "",
        "audio_codes": [],
        "speaker_embedding": [0.01] * CFG.talker.hidden,
    }))
    return str(root)


def test_validator_passes_on_fixture_release(release_dir, tmp_path, capsys):
    wav = str(tmp_path / "validated.wav")
    rc = validate_release.main(["--model-dir", release_dir,
                               "--geometry", "tiny", "--steps", "6",
                               "--wav-out", wav, "--quant-gate", "0"])
    out = capsys.readouterr().out
    report = json.loads(out.strip().splitlines()[-1])
    assert rc == 0, report
    assert report["pass"] is True, report
    for name in ("manifest", "tokenizer", "assets_gguf", "talker_gguf",
                 "predictor_gguf", "vocoder_onnx", "synthesis"):
        assert report["checks"][name]["status"] == "pass", report["checks"]
    # encoders absent from the fixture -> explicitly skipped, not failed
    assert report["checks"]["audio_encoder_onnx"]["status"] == "skip"
    # quant acceptance recorded on these weights (gate disabled: random
    # fixture weights are near-tie degenerate)
    assert report["checks"]["quant_agreement"]["status"] == "pass"
    assert "int8" in report["checks"]["quant_agreement"]["detail"]
    assert os.path.exists(wav) and os.path.getsize(wav) > 44
    # conversion artifacts landed in the release dir (now engine-loadable)
    assert os.path.exists(os.path.join(release_dir, "gguf", "vocoder.npz"))
    assert os.path.exists(os.path.join(release_dir, "gguf",
                                       "vocoder_config.json"))


def test_validator_fails_loud_on_missing_file(release_dir, tmp_path, capsys):
    import shutil
    broken = str(tmp_path / "broken")
    shutil.copytree(release_dir, broken)
    os.remove(os.path.join(broken, "gguf", "qwen3_tts_talker.gguf"))
    rc = validate_release.main(["--model-dir", broken, "--geometry", "tiny",
                               "--skip-synthesis"])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1
    assert report["pass"] is False
    assert report["checks"]["manifest"]["status"] == "fail"
    assert "qwen3_tts_talker.gguf" in report["checks"]["manifest"]["detail"]


def test_validator_general_vocoder_release(release_dir, tmp_path, capsys):
    """A release whose decoder.onnx is in the BigVGAN/DAC family: the
    validator auto-derives the architecture, converts, persists
    vocoder_config.json, and the synthesis smoke serves it."""
    import dataclasses
    import shutil

    gdir = str(tmp_path / "grelease")
    shutil.copytree(release_dir, gdir)
    gcfg = dataclasses.replace(
        CFG.vocoder, upsample_kernels=(10, 10, 10, 8, 8),
        resblock_dilations=(1, 3), resblock_kernel=7, final_conv_kernel=7,
        activation="snake")
    from qwen3_tts_tpu.models import vocoder as voc
    p = _np(voc.init_vocoder(jax.random.key(5), gcfg))
    p["transformer"]["head"] = np.zeros_like(p["transformer"]["head"])
    cw.write_vocoder_onnx(os.path.join(gdir, "onnx",
                                       "qwen3_tts_decoder.onnx"), p, gcfg)
    for stale in ("vocoder.npz", "vocoder_config.json"):
        path = os.path.join(gdir, "gguf", stale)
        if os.path.exists(path):
            os.remove(path)

    rc = validate_release.main(["--model-dir", gdir, "--geometry", "tiny",
                               "--steps", "4", "--quant-gate", "0"])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0, report
    assert "general" in report["checks"]["vocoder_onnx"]["detail"]
    assert report["checks"]["synthesis"]["status"] == "pass", report["checks"]

    from qwen3_tts_tpu.core.config import load_vocoder_config
    saved = load_vocoder_config(os.path.join(gdir, "gguf",
                                             "vocoder_config.json"))
    assert saved.general_upsampler and saved.activation == "snake"


def test_validator_auto_geometry(release_dir, capsys):
    """--geometry auto (the real-release default): the engine geometry is
    read from the talker/predictor GGUF metadata, not hand-configured —
    synthesis must still run end-to-end on the fixture."""
    rc = validate_release.main(["--model-dir", release_dir,
                               "--geometry", "auto", "--steps", "4",
                               "--quant-gate", "0"])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0, report
    assert report["checks"]["talker_gguf"]["status"] == "pass"
    assert "hidden=64" in report["checks"]["talker_gguf"]["detail"]
    assert report["checks"]["synthesis"]["status"] == "pass", report["checks"]
