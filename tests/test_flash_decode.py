"""Flash-decode Pallas kernel vs the dense masked-attention reference, in
interpreter mode (tile-realistic shapes: hd=128, BLK-multiple cache)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.ops import attention, flash_decode


def _mk(B=2, T=512, nq=8, nk=4, hd=128, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    q = 0.3 * jax.random.normal(ks[0], (B, nq, hd), jnp.float32)
    k = 0.3 * jax.random.normal(ks[1], (B, nk, T, hd), jnp.float32)
    v = 0.3 * jax.random.normal(ks[2], (B, nk, T, hd), jnp.float32)
    return q, k, v


def _dense(q, k, v, kv_len, valid_from):
    return attention.gqa_attention(
        q[:, None], k, v,
        jnp.asarray(kv_len) - 1, jnp.asarray(kv_len), valid_from,
    )[:, 0]


@pytest.mark.parametrize("kv_lens", [[512, 512], [300, 77], [1, 256]])
def test_matches_dense(kv_lens):
    q, k, v = _mk()
    kv_len = jnp.asarray(kv_lens, jnp.int32)
    valid_from = jnp.zeros((2,), jnp.int32)
    got = flash_decode.decode_attention(q, k, v, kv_len, valid_from,
                                        interpret=True)
    want = _dense(q, k, v, kv_len, valid_from)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_valid_from_masking():
    """Left-pad offsets must exclude the pad slots exactly like the dense
    path."""
    q, k, v = _mk(seed=1)
    kv_len = jnp.asarray([400, 256], jnp.int32)
    valid_from = jnp.asarray([37, 0], jnp.int32)
    got = flash_decode.decode_attention(q, k, v, kv_len, valid_from,
                                        interpret=True)
    want = _dense(q, k, v, kv_len, valid_from)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_bf16_cache():
    q, k, v = _mk(seed=2)
    k = k.astype(jnp.bfloat16)
    v = v.astype(jnp.bfloat16)
    kv_len = jnp.asarray([512, 200], jnp.int32)
    valid_from = jnp.zeros((2,), jnp.int32)
    got = flash_decode.decode_attention(q, k, v, kv_len, valid_from,
                                        interpret=True)
    want = _dense(q, k, v, kv_len, valid_from)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_usable_gates():
    from qwen3_tts_tpu.core.config import TalkerConfig
    cfg = TalkerConfig()          # hd 128, max_seq 4096
    # cpu backend in tests -> kernel disabled, dense path used
    assert flash_decode.usable(cfg) is False
