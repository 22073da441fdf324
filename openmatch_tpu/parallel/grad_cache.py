"""GradCache: large-batch contrastive training in bounded memory.

Reference behavior (/root/reference/src/openmatch/trainer/dense_trainer.py:130-160,
orchestrating the external luyug/GradCache package): encode q/p in no-grad
chunks, compute the full-batch contrastive loss on the concatenated reps,
then replay each chunk's forward with gradients against the cached rep
gradients.

JAX formulation — the whole dance is one function with two passes:

1. rep pass: ``lax.map`` over chunks (sequential → peak activation memory is
   one chunk), no tangents kept.
2. loss + rep-grads: d(loss)/d(reps) on the [B, D] rep matrices (tiny).
3. replay pass: ``lax.scan`` over chunks; per chunk ``jax.vjp`` of the
   encoder pulls the rep-grad chunk back to parameter space, accumulating
   grads. Activation memory again one chunk.

The returned gradient is mathematically identical to plain
``jax.grad(loss ∘ encode)`` — verified in tests to 1e-5 — while peak memory
scales with chunk size, not batch size.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def _reshape_chunks(tree, num_chunks: int):
    """[B, ...] leaves → [num_chunks, B/num_chunks, ...]."""
    def r(x):
        b = x.shape[0]
        assert b % num_chunks == 0, f"batch {b} % chunks {num_chunks} != 0"
        return x.reshape(num_chunks, b // num_chunks, *x.shape[1:])

    return jax.tree.map(r, tree)


def grad_cache_value_and_grad(
    encode_q: Callable[[Any, Dict], jnp.ndarray],
    encode_p: Callable[[Any, Dict], jnp.ndarray],
    loss_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    q_chunks: int,
    p_chunks: int,
):
    """Build a ``(params, q_batch, p_batch[, q_rngs, p_rngs]) ->
    (loss, grads)`` function.

    encode_*: (params, batch_dict) -> [b, D] reps — or, when per-chunk
    RNGs are passed, (params, batch_dict, rng) -> [b, D].
    loss_fn: (q_reps [Bq, D], p_reps [Bp, D]) -> scalar.
    q_chunks / p_chunks: number of chunks (reference flags are chunk *sizes*
    gc_q_chunk_size / gc_p_chunk_size; drivers convert).

    ``q_rngs``/``p_rngs`` ([chunks]-stacked PRNG keys) enable dropout
    under GradCache: the SAME per-chunk key feeds both the no-grad rep
    pass and the vjp replay, so the replayed forward sees identical
    dropout masks and the gradient stays exact — the JAX equivalent of
    the reference GradCache's RandContext RNG-state save/restore
    (luyug/GradCache semantics behind dense_trainer.py:130-160).
    """

    def value_and_grad(params, q_batch, p_batch, q_rngs=None, p_rngs=None):
        q_parts = _reshape_chunks(q_batch, q_chunks)
        p_parts = _reshape_chunks(p_batch, p_chunks)

        def rep_pass(encode, parts, rngs):
            if rngs is None:
                return jax.lax.map(lambda ch: encode(params, ch), parts)
            return jax.lax.map(
                lambda cr: encode(params, cr[0], cr[1]), (parts, rngs))

        # pass 1: representations without stored activations
        q_reps = rep_pass(encode_q, q_parts, q_rngs)
        p_reps = rep_pass(encode_p, p_parts, p_rngs)
        q_reps = q_reps.reshape(-1, q_reps.shape[-1])
        p_reps = p_reps.reshape(-1, p_reps.shape[-1])

        # pass 2: loss and gradients wrt the (small) rep matrices
        loss, (g_q, g_p) = jax.value_and_grad(loss_fn, argnums=(0, 1))(q_reps, p_reps)
        g_q = g_q.reshape(q_chunks, -1, g_q.shape[-1])
        g_p = g_p.reshape(p_chunks, -1, g_p.shape[-1])

        # pass 3: replay chunks, pull rep-grads back to params (same
        # per-chunk rng as pass 1 -> identical masks -> exact gradient)
        zero_grads = jax.tree.map(jnp.zeros_like, params)

        def replay(encode, with_rng):
            def step(acc, xs):
                if with_rng:
                    chunk, g, rng = xs
                    _, vjp = jax.vjp(lambda pr: encode(pr, chunk, rng), params)
                else:
                    chunk, g = xs
                    _, vjp = jax.vjp(lambda pr: encode(pr, chunk), params)
                (g_params,) = vjp(g)
                return jax.tree.map(jnp.add, acc, g_params), None

            return step

        q_xs = (q_parts, g_q) if q_rngs is None else (q_parts, g_q, q_rngs)
        p_xs = (p_parts, g_p) if p_rngs is None else (p_parts, g_p, p_rngs)
        grads, _ = jax.lax.scan(replay(encode_q, q_rngs is not None),
                                zero_grads, q_xs)
        grads, _ = jax.lax.scan(replay(encode_p, p_rngs is not None),
                                grads, p_xs)
        return loss, grads

    return value_and_grad
