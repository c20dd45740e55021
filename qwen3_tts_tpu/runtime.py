"""Python binding for the native ttsrt host runtime (ctypes).

Loads `native/libttsrt.so` (built with `make -C native`) and exposes the
ring buffer, the reference-parity 64-code chunker, the streaming WAV writer,
and the continuous-batching slot manager. Every class has a pure-Python
fallback with identical semantics, so the framework works before the native
library is built; `NATIVE` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cand in (
        os.path.join(here, "native", "libttsrt.so"),
        os.path.join(here, "libttsrt.so"),
        os.environ.get("TTSRT_LIB", ""),
    ):
        if cand and os.path.exists(cand):
            return cand
    # the .so is a build artifact (not committed): build it on first use
    ndir = os.path.join(here, "native")
    if os.path.exists(os.path.join(ndir, "Makefile")):
        import subprocess

        try:
            subprocess.run(["make", "-C", ndir], check=True,
                           capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            return None
        cand = os.path.join(ndir, "libttsrt.so")
        if os.path.exists(cand):
            return cand
    return None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    c = ctypes.c_int64
    p = ctypes.c_void_p
    lib.ttsrt_ring_new.restype = p
    lib.ttsrt_ring_new.argtypes = [c]
    lib.ttsrt_ring_free.argtypes = [p]
    lib.ttsrt_ring_available.restype = c
    lib.ttsrt_ring_available.argtypes = [p]
    lib.ttsrt_ring_push.restype = c
    lib.ttsrt_ring_push.argtypes = [p, ctypes.POINTER(ctypes.c_float), c]
    lib.ttsrt_ring_pop.restype = c
    lib.ttsrt_ring_pop.argtypes = [p, ctypes.POINTER(ctypes.c_float), c]
    lib.ttsrt_ring_pop_s16.restype = c
    lib.ttsrt_ring_pop_s16.argtypes = [p, ctypes.POINTER(ctypes.c_int16), c]
    lib.ttsrt_chunker_new.restype = p
    lib.ttsrt_chunker_new.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.ttsrt_chunker_free.argtypes = [p]
    lib.ttsrt_chunker_pending.restype = c
    lib.ttsrt_chunker_pending.argtypes = [p]
    lib.ttsrt_chunker_push.restype = c
    lib.ttsrt_chunker_push.argtypes = [
        p, ctypes.POINTER(ctypes.c_int64), c, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), c]
    lib.ttsrt_wav_write.restype = c
    lib.ttsrt_wav_write.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), c, ctypes.c_int]
    lib.ttsrt_slots_new.restype = p
    lib.ttsrt_slots_new.argtypes = [ctypes.c_int]
    lib.ttsrt_slots_free.argtypes = [p]
    lib.ttsrt_slots_acquire.restype = ctypes.c_int
    lib.ttsrt_slots_acquire.argtypes = [p, ctypes.POINTER(ctypes.c_int64)]
    lib.ttsrt_slots_mark_frames.argtypes = [p, ctypes.c_int, c]
    lib.ttsrt_slots_mark_eos.argtypes = [p, ctypes.c_int]
    lib.ttsrt_slots_release.argtypes = [p, ctypes.c_int]
    lib.ttsrt_slots_active.restype = ctypes.c_int
    lib.ttsrt_slots_active.argtypes = [p]
    lib.ttsrt_slots_frames.restype = c
    lib.ttsrt_slots_frames.argtypes = [p, ctypes.c_int]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


class PcmRing:
    """SPSC float PCM ring buffer (native when available)."""

    def __init__(self, capacity: int):
        self._lib = _load()
        if self._lib is not None:
            self._h = self._lib.ttsrt_ring_new(capacity)
        else:
            self._buf = np.zeros(0, np.float32)
        self.capacity = capacity

    def push(self, samples: np.ndarray) -> int:
        samples = np.ascontiguousarray(samples, np.float32)
        if self._lib is not None:
            return int(self._lib.ttsrt_ring_push(
                self._h, samples.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_float)), len(samples)))
        room = self.capacity - len(self._buf)
        take = min(room, len(samples))
        self._buf = np.concatenate([self._buf, samples[:take]])
        return take

    def available(self) -> int:
        if self._lib is not None:
            return int(self._lib.ttsrt_ring_available(self._h))
        return len(self._buf)

    def pop(self, max_n: int) -> np.ndarray:
        if self._lib is not None:
            out = np.empty(max_n, np.float32)
            n = int(self._lib.ttsrt_ring_pop(
                self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                max_n))
            return out[:n]
        n = min(max_n, len(self._buf))
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def pop_s16(self, max_n: int) -> np.ndarray:
        if self._lib is not None:
            out = np.empty(max_n, np.int16)
            n = int(self._lib.ttsrt_ring_pop_s16(
                self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                max_n))
            return out[:n]
        f = self.pop(max_n)
        return np.clip(f * 32767.0, -32768, 32767).astype(np.int16)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and self._h:
            self._lib.ttsrt_ring_free(self._h)
            self._h = None


class CodeChunker:
    """64-code batching with remainder carry and [0,2047] clamp — the
    reference decoder-thread policy (src/tts/engine.rs:510-537)."""

    def __init__(self, chunk_codes: int = 64, frame_codes: int = 16):
        self.chunk_codes = chunk_codes
        self.frame_codes = frame_codes
        self._lib = _load()
        if self._lib is not None:
            self._h = self._lib.ttsrt_chunker_new(chunk_codes, frame_codes)
        else:
            self._pending: list[int] = []

    def push(self, codes: np.ndarray, is_final: bool = False) -> np.ndarray:
        codes = np.ascontiguousarray(codes, np.int64).reshape(-1)
        if self._lib is not None:
            cap = (len(codes) + self.chunk_codes * 64)
            out = np.empty(cap, np.int64)
            n = int(self._lib.ttsrt_chunker_push(
                self._h,
                codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(codes), int(is_final),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), cap))
            return out[:n]
        self._pending.extend(int(c) for c in codes)
        if len(self._pending) < self.chunk_codes and not is_final:
            return np.zeros(0, np.int64)
        valid = (len(self._pending) // self.frame_codes) * self.frame_codes
        if valid <= 0:
            if is_final:
                self._pending.clear()
            return np.zeros(0, np.int64)
        out = np.clip(np.asarray(self._pending[:valid], np.int64), 0, 2047)
        if is_final:
            self._pending.clear()
        else:
            del self._pending[:valid]
        return out

    def pending(self) -> int:
        if self._lib is not None:
            return int(self._lib.ttsrt_chunker_pending(self._h))
        return len(self._pending)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and self._h:
            self._lib.ttsrt_chunker_free(self._h)
            self._h = None


class SlotManager:
    """Continuous-batching slots for multi-stream serving."""

    def __init__(self, n_slots: int):
        self.n_slots = n_slots
        self._lib = _load()
        if self._lib is not None:
            self._h = self._lib.ttsrt_slots_new(n_slots)
        else:
            self._state = [0] * n_slots
            self._frames = [0] * n_slots
            self._next = 1

    def acquire(self):
        if self._lib is not None:
            sid = ctypes.c_int64(0)
            slot = int(self._lib.ttsrt_slots_acquire(self._h,
                                                     ctypes.byref(sid)))
            return (slot, int(sid.value)) if slot >= 0 else (None, None)
        for i, s in enumerate(self._state):
            if s == 0:
                self._state[i] = 1
                self._frames[i] = 0
                sid = self._next
                self._next += 1
                return i, sid
        return None, None

    def mark_frames(self, slot: int, n: int) -> None:
        if self._lib is not None:
            self._lib.ttsrt_slots_mark_frames(self._h, slot, n)
        else:
            self._frames[slot] += n

    def mark_eos(self, slot: int) -> None:
        if self._lib is not None:
            self._lib.ttsrt_slots_mark_eos(self._h, slot)
        elif self._state[slot] == 1:
            self._state[slot] = 2

    def release(self, slot: int) -> None:
        if self._lib is not None:
            self._lib.ttsrt_slots_release(self._h, slot)
        else:
            self._state[slot] = 0

    def active(self) -> int:
        if self._lib is not None:
            return int(self._lib.ttsrt_slots_active(self._h))
        return sum(1 for s in self._state if s != 0)

    def frames(self, slot: int) -> int:
        if self._lib is not None:
            return int(self._lib.ttsrt_slots_frames(self._h, slot))
        return self._frames[slot]

    def __del__(self):
        if getattr(self, "_lib", None) is not None and self._h:
            self._lib.ttsrt_slots_free(self._h)
            self._h = None


def write_wav_native(path: str, samples: np.ndarray,
                     sample_rate: int = 24000) -> bool:
    """Native fast path for WAV emission; False -> caller should use
    utils.audio.AudioSample.save_wav."""
    lib = _load()
    if lib is None:
        return False
    samples = np.ascontiguousarray(samples, np.float32)
    n = int(lib.ttsrt_wav_write(
        path.encode(), samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(samples), sample_rate))
    return n == len(samples)
