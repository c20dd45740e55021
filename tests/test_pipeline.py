"""VocoderPipeline: threaded vocoding must equal inline decoding, preserve
order, and surface worker errors."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.core.config import tiny_engine_config
from qwen3_tts_tpu.models import vocoder
from qwen3_tts_tpu.parallel.pipeline import VocoderPipeline

CFG = tiny_engine_config().vocoder


@pytest.fixture(scope="module")
def params():
    return vocoder.init_vocoder(jax.random.key(0), CFG)


def test_pipeline_matches_inline(params):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, CFG.code_vocab, size=(1, 10, 16))

    state = vocoder.init_state(CFG, 1)
    want, valid, _ = vocoder.decode(params, CFG, jnp.asarray(codes), state,
                                    True)
    want = np.asarray(want)[0, : int(valid[0])]

    chunks = []
    pipe = VocoderPipeline(params, CFG, batch=1, on_chunk=chunks.append)
    for start in range(0, 10, 4):
        pipe.submit(codes[:, start:start + 4])
    got = pipe.close()          # drains the lookahead (no is_final was sent)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert len(chunks) == 4     # 3 decode chunks + the close() flush
    np.testing.assert_allclose(np.concatenate(chunks), got)


def test_pipeline_error_surfaces(params):
    pipe = VocoderPipeline(params, CFG, batch=1)
    # wrong codebook count -> the worker fails; close() must raise, not hang
    pipe.submit(np.zeros((1, 2, 7), np.int64))
    with pytest.raises(RuntimeError, match="vocoder pipeline failed"):
        pipe.close()


def test_pipeline_empty_stream(params):
    pipe = VocoderPipeline(params, CFG, batch=1)
    out = pipe.close()
    assert out.shape == (0,)
