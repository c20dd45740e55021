"""Native host runtime (ttsrt): ring buffer, reference-parity chunker, WAV
writer, slot manager — exercised through the ctypes binding (falls back to
pure Python when the .so isn't built; both paths share these tests)."""

import numpy as np
import pytest

from qwen3_tts_tpu import runtime


def test_ring_roundtrip():
    r = runtime.PcmRing(1024)
    x = np.linspace(-1, 1, 300).astype(np.float32)
    assert r.push(x) == 300
    assert r.available() == 300
    out = r.pop(300)
    np.testing.assert_allclose(out, x)
    assert r.available() == 0


def test_ring_overflow():
    r = runtime.PcmRing(100)
    x = np.ones(150, np.float32)
    assert r.push(x) == 100          # partial push when full
    assert r.push(x) == 0
    assert len(r.pop(60)) == 60
    assert r.push(x) == 60           # wraps


def test_ring_s16_clamp():
    r = runtime.PcmRing(16)
    r.push(np.asarray([0.0, 1.0, -1.0, 2.0, -2.0], np.float32))
    out = r.pop_s16(5)
    assert out.dtype == np.int16
    assert out.tolist() == [0, 32767, -32767, 32767, -32768]


def test_chunker_reference_policy():
    """64-code batching, whole-frame truncation, remainder carry, clamp
    (src/tts/engine.rs:510-537)."""
    c = runtime.CodeChunker(64, 16)
    # 3 frames: below threshold, nothing released
    assert len(c.push(np.arange(48))) == 0
    assert c.pending() == 48
    # +2 frames = 80 >= 64: release all 80 (whole frames), carry 0
    out = c.push(np.arange(48, 80))
    assert len(out) == 80
    assert c.pending() == 0
    # partial frame is held until final
    assert len(c.push(np.arange(8))) == 0
    out = c.push(np.asarray([5000, -3] + list(range(6))), is_final=True)
    assert len(out) == 16
    assert out[8] == 2047 and out[9] == 0   # clamped
    assert c.pending() == 0


def test_chunker_final_flush_partial():
    c = runtime.CodeChunker(64, 16)
    c.push(np.arange(20))                    # 1 frame + 4 codes
    out = c.push(np.zeros(0, np.int64), is_final=True)
    assert len(out) == 16                    # truncated to whole frames
    assert c.pending() == 0


def test_wav_writer(tmp_path):
    from qwen3_tts_tpu.utils.audio import AudioSample
    x = (0.25 * np.sin(np.linspace(0, 40, 2400))).astype(np.float32)
    path = str(tmp_path / "native.wav")
    ok = runtime.write_wav_native(path, x, 24000)
    if not ok:
        pytest.skip("native library not built")
    back = AudioSample.load_wav(path)
    assert back.sample_rate == 24000
    # one LSB of truncation + the 32767-encode / 32768-decode asymmetry
    np.testing.assert_allclose(back.samples, x, atol=2.5 / 32768)


def test_slot_manager():
    s = runtime.SlotManager(3)
    slots = [s.acquire() for _ in range(3)]
    assert all(sl is not None for sl, _ in slots)
    assert {sl for sl, _ in slots} == {0, 1, 2}
    assert s.acquire() == (None, None)       # full
    assert s.active() == 3
    s.mark_frames(1, 7)
    assert s.frames(1) == 7
    s.mark_eos(1)
    s.release(1)
    assert s.active() == 2
    slot, sid = s.acquire()
    assert slot == 1 and sid is not None
