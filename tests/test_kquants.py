"""K-quant dequantisation vs scalar oracles transcribed from llama.cpp's
dequantize_row_q{4,5,6}_K (ggml-quants.c reference semantics)."""

import numpy as np
import pytest

from qwen3_tts_tpu.assets import gguf


def scale_min_k4(j, q):
    if j < 4:
        return q[j] & 63, q[j + 4] & 63
    return ((q[j + 4] & 0xF) | ((q[j - 4] >> 6) << 4),
            (q[j + 4] >> 4) | ((q[j] >> 6) << 4))


def oracle_q4_k(block):
    d = np.frombuffer(block[0:2], np.float16)[0].astype(np.float32)
    dmin = np.frombuffer(block[2:4], np.float16)[0].astype(np.float32)
    scales = block[4:16]
    qs = block[16:144]
    y = []
    is_ = 0
    q = qs
    for j in range(0, 256, 64):
        sc1, m1 = scale_min_k4(is_, scales)
        sc2, m2 = scale_min_k4(is_ + 1, scales)
        d1, mm1 = d * sc1, dmin * m1
        d2, mm2 = d * sc2, dmin * m2
        for l in range(32):
            y.append(d1 * (q[l] & 0xF) - mm1)
        for l in range(32):
            y.append(d2 * (q[l] >> 4) - mm2)
        q = q[32:]
        is_ += 2
    return np.asarray(y, np.float32)


def oracle_q5_k(block):
    d = np.frombuffer(block[0:2], np.float16)[0].astype(np.float32)
    dmin = np.frombuffer(block[2:4], np.float16)[0].astype(np.float32)
    scales = block[4:16]
    qh = block[16:48]
    ql = block[48:176]
    y = []
    is_ = 0
    u1, u2 = 1, 2
    for j in range(0, 256, 64):
        sc1, m1 = scale_min_k4(is_, scales)
        sc2, m2 = scale_min_k4(is_ + 1, scales)
        d1, mm1 = d * sc1, dmin * m1
        d2, mm2 = d * sc2, dmin * m2
        for l in range(32):
            y.append(d1 * ((ql[l] & 0xF) + (16 if qh[l] & u1 else 0)) - mm1)
        for l in range(32):
            y.append(d2 * ((ql[l] >> 4) + (16 if qh[l] & u2 else 0)) - mm2)
        ql = ql[32:]
        is_ += 2
        u1 <<= 2
        u2 <<= 2
    return np.asarray(y, np.float32)


def oracle_q6_k(block):
    ql = block[0:128]
    qh = block[128:192]
    sc = np.frombuffer(block[192:208], np.int8)
    d = np.frombuffer(block[208:210], np.float16)[0].astype(np.float32)
    y = np.zeros(256, np.float32)
    yo = 0
    for n in range(0, 256, 128):
        for l in range(32):
            is_ = l // 16
            q1 = int((ql[l] & 0xF) | (((qh[l] >> 0) & 3) << 4)) - 32
            q2 = int((ql[l + 32] & 0xF) | (((qh[l] >> 2) & 3) << 4)) - 32
            q3 = int((ql[l] >> 4) | (((qh[l] >> 4) & 3) << 4)) - 32
            q4 = int((ql[l + 32] >> 4) | (((qh[l] >> 6) & 3) << 4)) - 32
            y[yo + l] = d * sc[is_] * q1
            y[yo + l + 32] = d * sc[is_ + 2] * q2
            y[yo + l + 64] = d * sc[is_ + 4] * q3
            y[yo + l + 96] = d * sc[is_ + 6] * q4
        yo += 128
        ql = ql[64:]
        qh = qh[32:]
        sc = sc[8:]
    return y


def _blocks(n, nbytes, seed):
    rng = np.random.default_rng(seed)
    raw = rng.integers(0, 256, size=n * nbytes, dtype=np.uint8)
    # overwrite the f16 scale fields with sane small values per block
    raw = raw.reshape(n, nbytes)
    for i in range(n):
        if nbytes in (144, 176):
            raw[i, 0:2] = np.frombuffer(
                np.float16(0.01 * (i + 1)).tobytes(), np.uint8)
            raw[i, 2:4] = np.frombuffer(
                np.float16(0.002 * (i + 1)).tobytes(), np.uint8)
        else:  # q6_k: d at the end
            raw[i, 208:210] = np.frombuffer(
                np.float16(0.01 * (i + 1)).tobytes(), np.uint8)
    return raw.reshape(-1).tobytes()


@pytest.mark.parametrize("fn,oracle,nbytes", [
    (gguf.dequant_q4_k, oracle_q4_k, 144),
    (gguf.dequant_q5_k, oracle_q5_k, 176),
    (gguf.dequant_q6_k, oracle_q6_k, 210),
])
def test_kquant_matches_oracle(fn, oracle, nbytes):
    n = 3
    raw = _blocks(n, nbytes, seed=nbytes)
    got = fn(raw, n * 256)
    want = np.concatenate([
        oracle(np.frombuffer(raw, np.uint8)[i * nbytes:(i + 1) * nbytes])
        for i in range(n)
    ])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
