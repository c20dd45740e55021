"""Weight conversion: llama.cpp GGUF <-> decoder pytree round-trip, Q8_0
dequantisation, and forward-pass equivalence through the converted weights."""

import os
import struct
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import convert_weights as cw  # noqa: E402
from qwen3_tts_tpu.assets import checkpoint, gguf  # noqa: E402
from qwen3_tts_tpu.core.config import TalkerConfig  # noqa: E402
from qwen3_tts_tpu.models import decoder  # noqa: E402

TINY = TalkerConfig(
    hidden=32, n_layers=2, n_q_heads=4, n_kv_heads=2, head_dim=8,
    ffn_dim=64, vocab=48, max_seq=64, mrope_sections=(2, 1, 1, 0),
    dtype="float32",
)


def test_gguf_roundtrip_and_forward(tmp_path):
    params = decoder.init_decoder(jax.random.key(0), TINY)
    path = str(tmp_path / "talker.gguf")
    cw.export_llama_gguf(path, TINY, jax.tree.map(np.asarray, params))

    cfg2, params2 = cw.convert_llama_gguf(path, "talker")
    assert cfg2.hidden == TINY.hidden
    assert cfg2.n_layers == TINY.n_layers
    assert cfg2.n_kv_heads == TINY.n_kv_heads
    assert cfg2.mrope_sections == TINY.mrope_sections
    assert cfg2.vocab == TINY.vocab

    # every tensor round-trips exactly
    flat1 = jax.tree_util.tree_leaves(jax.tree.map(np.asarray, params))
    flat2 = jax.tree_util.tree_leaves(params2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(a, b, rtol=1e-6)

    # forward pass through converted weights matches
    x = 0.1 * jax.random.normal(jax.random.key(1), (1, 4, TINY.hidden))
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    cache = decoder.init_kv_cache(TINY, 1)
    _, logits1, _ = decoder.forward(params, TINY, x, pos, cache, jnp.int32(0))
    p2 = jax.tree.map(jnp.asarray, params2)
    _, logits2, _ = decoder.forward(p2, TINY, x, pos, cache, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(logits1), np.asarray(logits2),
                               rtol=1e-5, atol=1e-5)


def test_npz_checkpoint_roundtrip(tmp_path):
    params = decoder.init_decoder(jax.random.key(2), TINY)
    path = str(tmp_path / "talker.npz")
    checkpoint.save_pytree(path, params)
    like = jax.eval_shape(lambda: decoder.init_decoder(jax.random.key(0), TINY))
    loaded = checkpoint.load_pytree(path, like)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_q8_0_dequant():
    """Synthetic Q8_0 blocks: scale * int8 recovered exactly."""
    rng = np.random.default_rng(0)
    n = 96  # 3 blocks
    scales = rng.uniform(0.01, 0.2, size=3).astype(np.float16)
    qs = rng.integers(-127, 127, size=(3, 32), dtype=np.int8)
    raw = b"".join(
        struct.pack("<e", float(scales[i])) + qs[i].tobytes() for i in range(3)
    )
    got = gguf.dequant_q8_0(raw, n)
    want = (qs.astype(np.float32)
            * scales.astype(np.float32)[:, None]).reshape(-1)
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_q8_0_tensor_in_gguf(tmp_path):
    """Hand-assembled GGUF with one Q8_0 tensor reads back dequantised."""
    rng = np.random.default_rng(1)
    scales = rng.uniform(0.05, 0.1, size=2).astype(np.float16)
    qs = rng.integers(-100, 100, size=(2, 32), dtype=np.int8)
    payload = b"".join(
        struct.pack("<e", float(scales[i])) + qs[i].tobytes() for i in range(2)
    )
    path = str(tmp_path / "q.gguf")
    with open(path, "wb") as f:
        f.write(b"GGUF" + struct.pack("<I", 3))
        f.write(struct.pack("<Q", 1))       # 1 tensor
        f.write(struct.pack("<Q", 0))       # 0 kv
        name = b"w"
        f.write(struct.pack("<Q", len(name)) + name)
        f.write(struct.pack("<I", 2))       # 2 dims
        f.write(struct.pack("<Q", 32))      # ne[0] (inner)
        f.write(struct.pack("<Q", 2))       # ne[1]
        f.write(struct.pack("<I", 8))       # Q8_0
        f.write(struct.pack("<Q", 0))       # offset
        pos = f.tell()
        f.write(b"\x00" * ((-pos) % 32))
        f.write(payload)
    g = gguf.GGUFFile(path)
    got = g.read_tensor("w")
    assert got.shape == (2, 32)
    want = qs.astype(np.float32) * scales.astype(np.float32)[:, None]
    np.testing.assert_allclose(got, want, rtol=1e-3)
