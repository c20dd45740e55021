"""bench.py's fallback ladder (VERDICT r3 #2/#7): a kernel regression at
any level must degrade the record, never zero the run. The r3 round was
lost to exactly this — the fallback re-entered the same broken kernel path.
These tests exercise the ladder logic off-device."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402


@pytest.fixture(autouse=True)
def _clean_env():
    keys = ("QWEN3_TTS_NO_PTAB_GATHER", "QWEN3_TTS_NO_FUSED")
    saved = {k: os.environ.pop(k, None) for k in keys}
    yield
    for k, v in saved.items():
        os.environ.pop(k, None)
        if v is not None:
            os.environ[k] = v


def test_first_level_success_short_circuits():
    calls = []
    name, result, errors = bench.run_ladder([
        ("a", {}, lambda: calls.append("a") or "ra"),
        ("b", {"QWEN3_TTS_NO_FUSED": "1"}, lambda: calls.append("b")),
    ])
    assert (name, result, errors) == ("a", "ra", [])
    assert calls == ["a"]
    assert "QWEN3_TTS_NO_FUSED" not in os.environ   # level b never entered


def test_failure_falls_through_with_env_and_cache_clear():
    cleared = []

    def broken():
        raise RuntimeError("Mosaic: Slice shape must be aligned to tiling")

    def ok():
        assert os.environ.get("QWEN3_TTS_NO_PTAB_GATHER") == "1"
        return "recovered"

    name, result, errors = bench.run_ladder(
        [
            ("kernel", {}, broken),
            ("fallback", {"QWEN3_TTS_NO_PTAB_GATHER": "1"}, ok),
        ],
        clear_caches=lambda: cleared.append(True),
    )
    assert name == "fallback" and result == "recovered"
    assert cleared == [True]        # trace-time knob needs a cache clear
    assert len(errors) == 1 and "Mosaic" in errors[0]


def test_total_failure_returns_degraded_not_raise():
    def boom():
        raise ValueError("still broken")

    name, result, errors = bench.run_ladder([
        ("x", {}, boom),
        ("y", {"QWEN3_TTS_NO_FUSED": "1"}, boom),
    ])
    assert name == "none" and result is None
    assert len(errors) == 2
