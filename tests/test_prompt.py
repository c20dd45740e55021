"""Prompt-assembly golden tests vs a naive numpy oracle of
src/tts/prompt.rs (protocol constants make exact sequences computable,
SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.assets import tables
from qwen3_tts_tpu.core import protocol as P
from qwen3_tts_tpu.tts import prompt


@pytest.fixture(scope="module")
def assets():
    # Rows big enough to cover all protocol codec ids (up to 2160) and a text
    # table covering the chat ids via OOB-fallback for the huge ones.
    return tables.random_assets(
        jax.random.key(0), text_vocab=1024, codec_rows=2176, dim=64,
        proj_dim=32,
    )


def _text(assets, tid):
    return np.asarray(assets.text_embedding(jnp.int32(tid)))


def _codec0(assets, cid):
    return np.asarray(assets.codec_embedding(jnp.int32(0), jnp.int32(cid)))


def oracle_core(assets, text_ids, lang_id=None, spk_id=None, spk_emb=None,
                instruct_ids=None, mid=None):
    """Literal transcription of src/tts/prompt.rs:141-277."""
    rows = []
    if instruct_ids is not None:
        for t in [P.IM_START, P.ROLE_USER, P.NEWLINE]:
            rows.append(_text(assets, t))
        for t in instruct_ids:
            rows.append(_text(assets, t))
        for t in [P.IM_END, P.NEWLINE]:
            rows.append(_text(assets, t))
    for t in [P.IM_START, P.ROLE_ASSISTANT, P.NEWLINE]:
        rows.append(_text(assets, t))
    marker = _text(assets, P.TEXT_AUDIO_MARKER)
    ctrl = ([P.THINK, P.THINK_BOS, lang_id, P.THINK_EOS]
            if lang_id is not None else [P.NOTHINK, P.THINK_BOS, P.THINK_EOS])
    for c in ctrl:
        rows.append(marker + _codec0(assets, c))
    if spk_id is not None:
        rows.append(marker + _codec0(assets, spk_id))
    elif spk_emb is not None:
        rows.append(marker + spk_emb)
    if mid is not None:
        rows.extend(list(mid))
    pad0 = _codec0(assets, P.PAD)
    rows.append(_text(assets, P.BOS_TOKEN) + pad0)
    for t in text_ids:
        rows.append(_text(assets, t) + pad0)
    rows.append(_text(assets, P.EOS_TOKEN) + pad0)
    rows.append(marker + _codec0(assets, P.BOS))
    return np.stack(rows)


def test_custom_prompt_matches_oracle(assets):
    text_ids = [5, 9, 200]
    got = prompt.build_custom_prompt(assets, text_ids, spk_id=3065,
                                     lang_id=P.LANG_CHINESE)
    want = oracle_core(assets, text_ids, lang_id=P.LANG_CHINESE, spk_id=3065)
    assert got.embeds.shape == want.shape
    np.testing.assert_allclose(np.asarray(got.embeds), want, rtol=1e-5, atol=1e-5)


def test_nothink_and_instruct_blocks(assets):
    text_ids = [1, 2]
    instruct = [42, 43, 44]
    spk = np.asarray(jax.random.normal(jax.random.key(3), (64,)), np.float32)
    got = prompt.build_core(assets, text_ids, lang_id=None, spk_emb=spk,
                            instruct_ids=instruct)
    want = oracle_core(assets, text_ids, lang_id=None, spk_emb=spk,
                       instruct_ids=instruct)
    # length: (3 prefix + 3 instruct + 2 suffix) + 3 role + 3 ctrl (nothink)
    #         + 1 spk + (2 + 2) task + 1 activation = 20
    assert got.embeds.shape[0] == 3 + len(instruct) + 2 + 3 + 3 + 1 + 4 + 1
    np.testing.assert_allclose(np.asarray(got.embeds), want, rtol=1e-5, atol=1e-5)


def test_clone_prompt_matches_oracle(assets):
    rng = np.random.default_rng(0)
    ref_codes = rng.integers(0, 2048, size=(3, 16)).astype(np.int32)
    ref_text_ids = [7, 8]
    text_ids = [100, 101]
    spk = rng.normal(size=(64,)).astype(np.float32)

    got = prompt.build_clone_prompt(assets, text_ids, ref_codes, ref_text_ids,
                                    spk, lang_id=P.LANG_CHINESE)

    # oracle mid-block: src/tts/prompt.rs:28-106
    marker = _text(assets, P.TEXT_AUDIO_MARKER)
    pad0 = _codec0(assets, P.PAD)
    mid = []
    for t in [P.BOS_TOKEN, *ref_text_ids, P.EOS_TOKEN]:
        mid.append(_text(assets, t) + pad0)
    mid.append(marker + _codec0(assets, P.CODEC_BOS))
    for f in range(3):
        s = np.zeros(64, np.float32)
        for q in range(16):
            s += np.asarray(assets.codec_embedding(jnp.int32(q),
                                                   jnp.int32(ref_codes[f, q])))
        mid.append(marker + s)
    mid.append(marker + pad0)
    want = oracle_core(assets, text_ids, lang_id=P.LANG_CHINESE, spk_emb=spk,
                       mid=mid)
    assert got.embeds.shape == want.shape
    np.testing.assert_allclose(np.asarray(got.embeds), want, rtol=1e-4, atol=1e-4)


def test_pad_batch_left_pads(assets):
    a = jnp.ones((3, 64))
    b = jnp.full((5, 64), 2.0)
    batch, offs = prompt.pad_batch([a, b], bucket=1)
    assert batch.shape == (2, 5, 64)
    assert offs.tolist() == [2, 0]
    assert np.all(np.asarray(batch[0, :2]) == 0)
    assert np.all(np.asarray(batch[0, 2:]) == 1)


def test_pad_batch_buckets_lengths(assets):
    """Lengths round up to the bucket so nearby prompt lengths share one
    compiled program; pads stay left and fully masked via offsets."""
    a = jnp.ones((3, 8))
    batch, offs = prompt.pad_batch([a], bucket=64)
    assert batch.shape == (1, 64, 8)
    assert offs.tolist() == [61]
    b = jnp.ones((70, 8))
    batch2, offs2 = prompt.pad_batch([b], bucket=64)
    assert batch2.shape == (1, 128, 8)
    assert offs2.tolist() == [58]
