"""Reference-semantics token sampling in pure JAX.

Reproduces the decision pipeline of the reference sampler
(`src/models/llama/mod.rs:666-772`): slice the logit range, then

    greedy (temperature <= 0):  argmax over the slice
    otherwise:                  sort desc -> top-k truncate
                                -> softmax((l - max) / T)
                                -> top-p truncate (inclusive of the
                                   probability that crosses the threshold)
                                -> renormalise -> multinomial draw

Greedy is bit-exact with the reference. The sampled path reproduces the same
*distribution* under `jax.random` threaded keys instead of Rust `StdRng`
(documented RNG policy, SURVEY.md §7 "fixed-seed reproducibility").

Everything is shape-static so it stays inside one compiled program: `top_k`
must be a Python int (static), and the logit slice is taken by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def greedy_sample(logits: jax.Array) -> jax.Array:
    """Argmax over the last axis; ties resolve to the lowest index, matching
    the reference's strict `>` comparison scan (src/models/llama/mod.rs:689-700)."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("top_k",))
def sample(
    logits: jax.Array,
    key: jax.Array,
    temperature: float | jax.Array,
    top_k: int,
    top_p: float | jax.Array,
) -> jax.Array:
    """Sample token index from `logits[..., :]` with reference semantics.

    Args:
      logits: [..., vocab_slice] float logits (already sliced by caller).
      key: jax PRNG key.
      temperature: > 0 for stochastic sampling; <= 0 falls back to greedy.
      top_k: static int; 0 disables top-k (keeps the whole slice).
      top_p: nucleus threshold; >= 1.0 disables.

    Returns:
      int32 index into the slice (same leading shape as logits[..., 0]).
    """
    vocab = logits.shape[-1]
    k = vocab if top_k <= 0 else min(top_k, vocab)

    # Sort desc + truncate to k (reference steps 2-3). lax.top_k returns
    # values sorted descending with ties broken by lowest index, matching the
    # reference's stable sort on equal logits.
    top_vals, top_idx = jax.lax.top_k(logits, k)

    temperature = jnp.asarray(temperature, logits.dtype)
    top_p = jnp.asarray(top_p, logits.dtype)

    # Softmax over kept candidates, max-subtracted (reference steps 4-5).
    safe_t = jnp.where(temperature > 0, temperature, 1.0)
    scaled = (top_vals - top_vals[..., :1]) / safe_t
    expd = jnp.exp(scaled)
    probs = expd / jnp.sum(expd, axis=-1, keepdims=True)

    # Top-p: keep every candidate whose *preceding* cumulative mass is below
    # top_p — i.e. include the element that crosses the threshold
    # (reference step 6: `cumsum += p; if cumsum >= top_p {cutoff = i+1}`).
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) < top_p
    keep = keep.at[..., 0].set(True)  # never drop the argmax candidate

    masked = jnp.where(keep, probs, 0.0)
    logp = jnp.log(jnp.where(keep, masked, 1e-38))
    draw = jax.random.categorical(key, logp, axis=-1)
    sampled = jnp.take_along_axis(
        top_idx, draw[..., None].astype(jnp.int32), axis=-1
    )[..., 0]

    greedy = top_idx[..., 0]
    return jnp.where(temperature > 0, sampled, greedy).astype(jnp.int32)


def sample_slice(
    logits: jax.Array,
    key: jax.Array,
    temperature: float,
    top_k: int,
    top_p: float,
    limit_start: int = 0,
    limit_end: int | None = None,
) -> jax.Array:
    """Sample within [limit_start, limit_end) of the vocab axis, returning the
    *absolute* vocab index — mirror of `LlamaSampler::sample`'s limit args."""
    sliced = logits[..., limit_start:limit_end]
    rel = sample(sliced, key, temperature, top_k, top_p)
    return rel + limit_start
