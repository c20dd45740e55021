"""On-device kernel A/B smoke (VERDICT r2 #6): promoted from tools/ claims
to a regression-checked fact.

The pytest session itself is pinned to a virtual CPU mesh (conftest.py), so
the smoke runs `tools/tpu_smoke.py` in a SUBPROCESS with a clean JAX env; the
child sees the session's real TPU (axon backend) when one is attached and
reports per-step fused-vs-XLA agreement as JSON. Skipped when no TPU is
reachable — the bench driver environment has the chip.

Set QWEN3_TTS_TPU_SMOKE=1 to force-enable (fails instead of skipping when
the chip is missing); unset runs it opportunistically.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # on-device subprocess smoke (docs/TESTING.md)

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TOOL = os.path.join(_ROOT, "tools", "tpu_smoke.py")


@pytest.fixture(scope="module")
def smoke_report():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    try:
        proc = subprocess.run(
            [sys.executable, _TOOL], capture_output=True, text=True,
            timeout=1500, env=env,
        )
    except subprocess.TimeoutExpired:
        pytest.fail("tpu smoke timed out (1500 s)")
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    try:
        report = json.loads(line)
    except (json.JSONDecodeError, IndexError):
        pytest.fail(f"tpu smoke produced no JSON: rc={proc.returncode} "
                    f"stdout={proc.stdout[-500:]} stderr={proc.stderr[-800:]}")
    if not report.get("ok"):
        if os.environ.get("QWEN3_TTS_TPU_SMOKE") == "1":
            pytest.fail(f"TPU required but unavailable: {report}")
        pytest.skip(f"no TPU backend ({report.get('reason')})")
    return report


@pytest.mark.parametrize("kind", ["int8", "int4"])
def test_fused_talker_on_device(smoke_report, kind):
    """Compiled fused talker step tracks the XLA path: same greedy argmax on
    nearly every teacher-forced step (bf16 near-ties may flip; VERDICT
    fused_talker.py header documents the deviation class). B=8 exercises the
    flattened per-row attention loop (the serving batch path)."""
    for b in (1, 2, 8):
        entry = smoke_report.get(f"talker_{kind}_b{b}")
        assert isinstance(entry, dict), entry
        assert entry["agree_frac"] >= 0.75, entry
        assert entry["max_dlogits"] < 1.0, entry


@pytest.mark.parametrize("kind", ["int8", "int4"])
def test_fused_predictor_on_device(smoke_report, kind):
    """Per-step codes agreement. Random weights make the 2048-way argmax
    nearly tie-degenerate (real checkpoints have peaked logits), so the
    bound is a regression tripwire, not a quality claim — r3 on-device
    reference: int8 0.797, int4 0.922."""
    entry = smoke_report.get(f"predictor_{kind}")
    assert isinstance(entry, dict), entry
    assert entry["agree_frac"] >= 0.7, entry


@pytest.mark.parametrize("kind", ["int8", "int4"])
def test_fused_talker_peaked_on_device(smoke_report, kind):
    """Decisive-logit regime (tools/tpu_smoke.peak_head, VERDICT r3 #4):
    when top-1/top-2 gaps dwarf quant noise — as in real checkpoints — the
    fused kernel must agree with the XLA path on essentially every step.
    Counts pooled across B=1/B=8 (72 samples). Gate 0.93, not 1.0: the
    talker's fused-vs-XLA bf16 step already differs by ~0.1 in unit-scale
    logits (flash vs fused attention rounding, documented deviation class),
    which is ~4% of a boosted top-2 gap — rare near-ties still flip."""
    agree = total = 0
    for b in (1, 8):
        entry = smoke_report.get(f"talker_{kind}_b{b}_peaked")
        assert isinstance(entry, dict), entry
        a, t = map(int, entry["argmax_agree"].split("/"))
        agree += a
        total += t
    assert agree / total >= 0.93, (agree, total, kind)


@pytest.mark.parametrize("kind", ["int8", "int4"])
def test_fused_predictor_peaked_on_device(smoke_report, kind):
    """Decisive-logit regime for the 16-codebook frame expansion: near-1.0
    codes agreement is achievable and asserted (was 0.70 informational)."""
    entry = smoke_report.get(f"predictor_{kind}_peaked")
    assert isinstance(entry, dict), entry
    assert entry["agree_frac"] >= 0.95, entry
