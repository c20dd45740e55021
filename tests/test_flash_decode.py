"""Flash-decode Pallas kernel vs the dense masked-attention reference, in
interpreter mode (tile-realistic shapes: hd=128, BLK-multiple cache).

The kernel attends over the PRE-update cache plus the current token's k/v
passed directly; the dense reference materialises the token into the cache
first — both must agree."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # interpret-mode Pallas flash-decode kernel (docs/TESTING.md)

from qwen3_tts_tpu.ops import attention, flash_decode


def _mk(B=2, T=512, nq=8, nk=4, hd=128, seed=0):
    ks = jax.random.split(jax.random.key(seed), 5)
    q = 0.3 * jax.random.normal(ks[0], (B, nq, hd), jnp.float32)
    k = 0.3 * jax.random.normal(ks[1], (B, nk, T, hd), jnp.float32)
    v = 0.3 * jax.random.normal(ks[2], (B, nk, T, hd), jnp.float32)
    k_new = 0.3 * jax.random.normal(ks[3], (B, nk, hd), jnp.float32)
    v_new = 0.3 * jax.random.normal(ks[4], (B, nk, hd), jnp.float32)
    return q, k, v, k_new, v_new


def _dense(q, k, v, k_new, v_new, kv_len, valid_from):
    """Reference: write the token into the cache, then dense attention."""
    kf = np.asarray(k).copy()
    vf_ = np.asarray(v).copy()
    for b in range(q.shape[0]):
        kf[b, :, int(kv_len[b])] = np.asarray(k_new)[b]
        vf_[b, :, int(kv_len[b])] = np.asarray(v_new)[b]
    return attention.gqa_attention(
        q[:, None], jnp.asarray(kf), jnp.asarray(vf_),
        jnp.asarray(kv_len), jnp.asarray(kv_len) + 1, valid_from,
    )[:, 0]


@pytest.mark.parametrize("kv_lens", [[0, 5], [300, 77], [255, 256],
                                     [511, 1], [257, 500]])
def test_matches_dense(kv_lens):
    q, k, v, k_new, v_new = _mk()
    kv_len = jnp.asarray(kv_lens, jnp.int32)
    valid_from = jnp.zeros((2,), jnp.int32)
    got = flash_decode.decode_attention(q, k, v, k_new, v_new, kv_len,
                                        valid_from, interpret=True)
    want = _dense(q, k, v, k_new, v_new, kv_lens, valid_from)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_valid_from_masking():
    """Left-pad offsets must exclude the pad slots exactly like the dense
    path — including a fully-masked first block (valid_from >= BLK)."""
    q, k, v, k_new, v_new = _mk(seed=1)
    kv_len = [400, 300]
    valid_from = jnp.asarray([37, 260], jnp.int32)
    got = flash_decode.decode_attention(
        q, k, v, k_new, v_new, jnp.asarray(kv_len, jnp.int32), valid_from,
        interpret=True)
    want = _dense(q, k, v, k_new, v_new, kv_len, valid_from)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_bf16_cache():
    q, k, v, k_new, v_new = _mk(seed=2)
    k = k.astype(jnp.bfloat16)
    v = v.astype(jnp.bfloat16)
    kv_len = [512 - 1, 200]
    valid_from = jnp.zeros((2,), jnp.int32)
    got = flash_decode.decode_attention(
        q, k, v, k_new, v_new, jnp.asarray(kv_len, jnp.int32), valid_from,
        interpret=True)
    want = _dense(q, k.astype(jnp.float32), v.astype(jnp.float32),
                  k_new, v_new, kv_len, valid_from)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_empty_cache_first_token():
    """kv_len=0: only the current token participates — softmax of one."""
    q, k, v, k_new, v_new = _mk(seed=3)
    kv_len = jnp.zeros((2,), jnp.int32)
    vf = jnp.zeros((2,), jnp.int32)
    got = flash_decode.decode_attention(q, k, v, k_new, v_new, kv_len, vf,
                                        interpret=True)
    # softmax over a single key == v_new broadcast to each q head group
    B, nq, hd = q.shape
    nk = k.shape[1]
    g = nq // nk
    want = np.repeat(np.asarray(v_new), g, axis=1).reshape(B, nq, hd)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_usable_gates():
    from qwen3_tts_tpu.core.config import TalkerConfig
    cfg = TalkerConfig()          # hd 128, max_seq 4096
    # cpu backend in tests -> kernel disabled, dense path used
    assert flash_decode.usable(cfg) is False
