"""Sharded end-to-end step: build models on a mesh and run generation.

Used by tests (8 virtual CPU devices), by `__graft_entry__.dryrun_multichip`
(the driver's multi-chip compile validation), and by multi-chip benchmarks.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding

from ..assets import tables
from ..core.config import EngineConfig, PredictorConfig, TalkerConfig, VocoderConfig
from ..models import decoder, vocoder
from ..tts import generate
from . import mesh as mesh_lib
from . import sharding
from .mesh import MODEL_AXIS


def parallel_test_config(max_steps: int = 4) -> EngineConfig:
    """Tiny geometry whose head/ffn dims divide a 4-way model axis."""
    return EngineConfig(
        talker=TalkerConfig(
            hidden=64, n_layers=2, n_q_heads=8, n_kv_heads=4, head_dim=16,
            ffn_dim=128, vocab=2176, max_seq=256,
            mrope_sections=(4, 2, 2, 0), dtype="float32",
        ),
        predictor=PredictorConfig(
            hidden=32, n_layers=2, n_q_heads=4, n_kv_heads=4, head_dim=16,
            ffn_dim=64, max_seq=32, mrope_sections=(8, 0, 0, 0),
            dtype="float32",
        ),
        vocoder=VocoderConfig(
            embed_dim=16, hidden=32, n_layers=2, n_heads=4, head_dim=8,
            ffn_dim=64, lookahead=2, max_frames=16,
        ),
        max_steps=max_steps,
    )


def tp_interleave_factor(mesh: Mesh, cfg) -> int:
    """Head-interleave factor for this mesh's model axis (1 = flat layout).
    Must be applied identically at weight-placement and at trace time —
    both build_sharded_models and sharded_generate_step derive it from the
    mesh so callers cannot desynchronise the two."""
    m = mesh.shape[MODEL_AXIS]
    if m > 1 and cfg.n_q_heads % m == 0 and cfg.n_kv_heads % m == 0:
        return m
    return 1


def tp_config(mesh: Mesh, cfg: EngineConfig) -> EngineConfig:
    """EngineConfig with tp_interleave set for this mesh."""
    import dataclasses

    return dataclasses.replace(
        cfg,
        talker=dataclasses.replace(
            cfg.talker,
            tp_interleave=tp_interleave_factor(mesh, cfg.talker)),
        predictor=dataclasses.replace(
            cfg.predictor,
            tp_interleave=tp_interleave_factor(mesh, cfg.predictor)),
    )


def build_sharded_models(mesh: Mesh, cfg: EngineConfig, seed: int = 0):
    """Random-init talker/predictor/assets + vocoder, placed with TP/DP
    partition specs on the mesh. wqkv is emitted in the head-interleaved
    TP layout (sharding.interleave_wqkv) whenever the mesh's model axis
    divides the head counts, so the post-matmul q/k/v split needs no
    GSPMD resharding."""
    k = jax.random.split(jax.random.key(seed), 4)
    big = cfg.talker.hidden >= 2048
    models = {
        "talker": decoder.init_decoder(k[0], cfg.talker),
        "predictor": decoder.init_decoder(k[1], cfg.predictor),
        "assets": tables.random_assets(
            k[2],
            text_vocab=8192 if big else 1024,
            codec_rows=3072 if big else 2176,
            dim=cfg.talker.hidden, proj_dim=cfg.predictor.hidden,
        ),
    }
    for name, part in (("talker", cfg.talker), ("predictor", cfg.predictor)):
        m = tp_interleave_factor(mesh, part)
        if m > 1:
            models[name]["layers"]["wqkv"] = sharding.interleave_wqkv(
                models[name]["layers"]["wqkv"], part, m)
    models = mesh_lib.shard(mesh, models, sharding.models_specs())
    voc = vocoder.init_vocoder(k[3], cfg.vocoder)
    voc = mesh_lib.shard(mesh, voc, sharding.vocoder_param_specs())
    return models, voc


def sharded_generate_step(
    mesh: Mesh,
    cfg: EngineConfig,
    models: Dict,
    vocoder_params: Dict,
    batch: int,
    prompt_len: int,
    max_steps: int,
    seed: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Full sharded pipeline: DP prompt batch -> fused generation loop ->
    vocoder decode. Returns (wav [B, T], n_frames [B])."""
    data_sharding = NamedSharding(mesh, sharding.batch_spec())
    prompt = jax.device_put(
        0.1 * jax.random.normal(
            jax.random.key(seed + 1), (batch, prompt_len, cfg.talker.hidden)
        ),
        data_sharding,
    )
    pad = jax.device_put(
        jnp.zeros((batch,), jnp.int32), data_sharding
    )
    cfg = tp_config(mesh, cfg)      # match build_sharded_models' layout
    with jax.set_mesh(mesh):
        # same single fused program as the single-chip offline path
        # (generation while_loop -> vocoder, generate.generate_audio)
        wav, n_frames = generate.generate_audio(
            models, vocoder_params, cfg.talker, cfg.predictor, cfg.vocoder,
            prompt, pad, jax.random.key(seed), 0.0, 0, 1.0, max_steps,
        )
    return wav, n_frames
