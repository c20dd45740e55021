"""Long-context / sequence-parallel prefill (SURVEY §5 aux surface).

The reference has no sequence parallelism and caps context at n_ctx=4096
(`src/tts/engine.rs:133`); prefill is where long prompts cost — O(S²)
attention plus O(S) matmuls over every layer (long voice-clone reference
audio + long task text can fill most of the window, ~5.5 minutes of
context at 12 frames/s).

This module shards the SEQUENCE dimension of prefill activations over the
mesh's data axis (Megatron-SP flavored, GSPMD-implemented): every qkv/wo/
mlp matmul, norm and rope runs on S/M tokens per device, and XLA inserts
exactly one K/V all-gather per layer for the causal attention. That gather
is O(S) memory — the right trade at this model's 4096-token cap: ring
attention's O(S/M) working set only pays above ~32k tokens, while its
round-robin ppermute schedule serialises the gather latency into the
compute. Decode steps (S=1) keep the head-sharded TP layout; the returned
KV cache is constrained to the head-sharded decode layout
(prefill_cache_specs — batch stays replicated: a long-context prefill is
one utterance, so the data axis has no batch to carry) and the generation
loop picks it up without further resharding.

Composes with tensor parallelism: weights stay TP-sharded over `model`
while activations shard over `data` — the (data, model) mesh serves
(sequence, tensor) parallel prefill for a single long utterance, then
(batch, tensor) for decode.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import decoder
from .mesh import DATA_AXIS, MODEL_AXIS


def seq_spec() -> P:
    """Prefill activations [B, S, H]: sequence over the data axis."""
    return P(None, DATA_AXIS, None)


def prefill_cache_specs() -> Dict[str, P]:
    """KV cache layout for sequence-parallel prefill: heads over `model`
    only. The standard decode spec also shards batch over `data`
    (sharding.kv_cache_specs), but the long-context case is a SINGLE
    utterance — the data axis carries the sequence during prefill and
    nothing afterwards, so the cache keeps batch replicated."""
    spec = P(None, None, MODEL_AXIS, None, None)
    return {"k": spec, "v": spec}


def prefill_sequence_sharded(
    mesh: Mesh,
    params: Dict,
    cfg,
    x: jax.Array,              # [B, S, H] prompt embeddings
    positions: jax.Array,      # [B, S]
    cache: Dict[str, jax.Array],
    cache_len: jax.Array,
    *,
    kv_valid_from: Optional[jax.Array] = None,
    with_logits: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array], Dict[str, jax.Array]]:
    """decoder.forward with sequence-sharded activations.

    Output contract matches decoder.forward; the cache comes back in the
    decode-time layout (heads over `model`, batch over `data`).
    """
    xs = NamedSharding(mesh, seq_spec())
    ps = NamedSharding(mesh, P(None, DATA_AXIS))
    cs = {k: NamedSharding(mesh, v)
          for k, v in prefill_cache_specs().items()}
    # NamedSharding constraints carry the mesh themselves, so this body is
    # jit-safe (no ambient set_mesh needed) and callable under an outer jit
    x = jax.lax.with_sharding_constraint(x, xs)
    positions = jax.lax.with_sharding_constraint(positions, ps)
    h, logits, cache = decoder.forward(
        params, cfg, x, positions, cache, cache_len,
        kv_valid_from=kv_valid_from, with_logits=with_logits)
    cache = {k: jax.lax.with_sharding_constraint(v, cs[k])
             for k, v in cache.items()}
    return h, logits, cache
