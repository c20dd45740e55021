"""CLI surface: flag parity with the reference binary, tiny end-to-end run,
clean error paths."""

import json
import os

import numpy as np
import pytest

from qwen3_tts_tpu import cli


def test_flag_surface_matches_reference():
    """Every reference flag (src/bin/qwen3_tts.rs:8-74) must parse."""
    p = cli.build_parser()
    args = p.parse_args([
        "--model-dir", "m", "--quant", "q8_0", "--text", "t",
        "--voice-file", "v.json", "--ref-audio", "r.wav",
        "--ref-text", "rt", "--save-voice", "sv.json",
        "--output", "o.wav", "--max-steps", "100",
        "--speakers-dir", "s", "--speaker", "vivian",
        "--instruction", "Happy", "--temperature", "0.5",
        "--top-k", "20", "--top-p", "0.8", "--seed", "7",
    ])
    assert args.text == "t" and args.seed == 7 and args.max_steps == 100


def test_cli_end_to_end_tiny(tmp_path):
    sdir = tmp_path / "speakers"
    sdir.mkdir()
    emb = np.random.default_rng(0).normal(size=64).tolist()
    (sdir / "vivian.json").write_text(json.dumps(
        {"name": "vivian", "spk_emb": emb}))
    out = tmp_path / "out.wav"
    rc = cli.main([
        "--text", "cli test", "--tiny", "--random-weights",
        "--speakers-dir", str(sdir), "--max-steps", "5",
        "--temperature", "0", "--seed", "1", "--output", str(out),
    ])
    assert rc == 0
    assert out.exists() and out.stat().st_size > 44


def test_cli_bad_voice_file(tmp_path, capsys):
    rc = cli.main([
        "--text", "x", "--tiny", "--random-weights",
        "--voice-file", str(tmp_path / "missing.json"),
    ])
    assert rc == 1
    assert "Failed to load voice file" in capsys.readouterr().err


def test_cli_missing_required_flag():
    with pytest.raises(SystemExit):
        cli.build_parser().parse_args([])
