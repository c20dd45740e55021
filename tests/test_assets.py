"""Assets: GGUF round-trip, lookup semantics, projection parity with a numpy
oracle of src/assets_manager.rs:383-460."""

import numpy as np
import jax
import jax.numpy as jnp

from qwen3_tts_tpu.assets import gguf, tables
from qwen3_tts_tpu.core import protocol


def _small_tables(rng):
    dim = protocol.EMBED_DIM
    text = rng.normal(size=(64, dim)).astype(np.float32)
    codecs = [rng.normal(size=(32, dim)).astype(np.float32) for _ in range(16)]
    proj_w = rng.normal(size=(protocol.PROJ_DIM, dim)).astype(np.float32)
    proj_b = rng.normal(size=(protocol.PROJ_DIM,)).astype(np.float32)
    return text, codecs, proj_w, proj_b


def test_gguf_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "proj.weight": rng.normal(size=(8, 4)).astype(np.float32),
        "proj.bias": rng.normal(size=(8,)).astype(np.float32),
        "text_embd": rng.normal(size=(10, 4)).astype(np.float32),
    }
    path = str(tmp_path / "t.gguf")
    gguf.write_gguf(path, tensors, {"general.name": "test", "n": 3, "f": 1.5,
                                    "flag": True, "arr": [1, 2, 3]})
    f = gguf.GGUFFile(path)
    assert f.metadata["general.name"] == "test"
    assert f.metadata["arr"] == [1, 2, 3]
    for name, arr in tensors.items():
        got = f.read_tensor(name)
        assert got.shape == arr.shape
        np.testing.assert_array_equal(got, arr)


def test_load_assets_gguf(tmp_path):
    rng = np.random.default_rng(1)
    text, codecs, proj_w, proj_b = _small_tables(rng)
    tensors = {"proj.weight": proj_w, "proj.bias": proj_b, "text_embd": text}
    for i, c in enumerate(codecs):
        tensors[f"codec_embd.{i}"] = c
    gguf.write_gguf(str(tmp_path / "qwen3_assets.gguf"), tensors)
    a = tables.load_assets(str(tmp_path))
    np.testing.assert_allclose(np.asarray(a.text_table), text, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a.codec_tables[3]), codecs[3], rtol=1e-6)


def test_projection_matches_oracle():
    rng = np.random.default_rng(2)
    text, codecs, proj_w, proj_b = _small_tables(rng)
    a = tables.build_assets(text, codecs, proj_w, proj_b)
    h = rng.normal(size=(protocol.EMBED_DIM,)).astype(np.float32)
    got = np.asarray(a.project(jnp.asarray(h)))
    want = proj_w @ h + proj_b   # PyTorch Linear [out,in] layout
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_codec_lookup_oob_semantics():
    rng = np.random.default_rng(3)
    text, codecs, proj_w, proj_b = _small_tables(rng)
    a = tables.build_assets(text, codecs, proj_w, proj_b)
    # negative clamps to row 0 (src/assets_manager.rs:422)
    np.testing.assert_allclose(
        np.asarray(a.codec_embedding(2, -5)), codecs[2][0], rtol=1e-6)
    # OOB row returns zeros (src/assets_manager.rs:427-436)
    assert np.all(np.asarray(a.codec_embedding(2, 10_000)) == 0.0)
    # codec_embedding_1024 = lookup then project
    got = np.asarray(a.codec_embedding_1024(4, 7))
    want = proj_w @ codecs[4][7] + proj_b
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_text_oob_fallback_pattern():
    rng = np.random.default_rng(4)
    text, codecs, proj_w, proj_b = _small_tables(rng)
    a = tables.build_assets(text, codecs, proj_w, proj_b)
    tid = 1000  # beyond the 64-row test table
    got = np.asarray(a.text_embedding(tid))
    want = np.array([((tid * 17 + i) % 2) - 1.0 for i in range(protocol.EMBED_DIM)],
                    np.float32)
    np.testing.assert_array_equal(got, want)


def test_frame_embedding_sum():
    rng = np.random.default_rng(5)
    text, codecs, proj_w, proj_b = _small_tables(rng)
    a = tables.build_assets(text, codecs, proj_w, proj_b)
    frame = rng.integers(0, 32, size=(16,)).astype(np.int32)
    got = np.asarray(a.frame_embedding_sum(jnp.asarray(frame)))
    want = np.sum([codecs[q][frame[q]] for q in range(16)], axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_assets_is_pytree():
    a = tables.random_assets(jax.random.key(0), text_vocab=32, codec_rows=16)
    leaves = jax.tree_util.tree_leaves(a)
    assert len(leaves) == 4
