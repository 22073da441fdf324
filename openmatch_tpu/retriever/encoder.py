"""Batch encoding of corpora/queries to embedding shards.

Reference: the encode loops in Retriever
(/root/reference/src/openmatch/retriever/dense_retriever.py:60-92,139-164)
— per-rank pickle files ``embeddings.{corpus|query}.rank.{i}``. Here:

- the jitted encode step runs fixed-shape batches (last batch padded, then
  sliced) so XLA compiles exactly once;
- shards are .npz files (embeddings fp32/bf16 + ids) with a json manifest —
  the same durable, idempotent artifact contract, resumable per shard.
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.collators import InferenceCollator
from ..data.loader import batched, prefetch
from ..models.dr_model import DRModel


def make_encode_fn(model: DRModel, is_query: bool):
    @jax.jit
    def encode(params, input_ids, attention_mask):
        return model.encode(params, input_ids, attention_mask, is_query=is_query)

    return encode


def encode_dataset(
    model: DRModel,
    params,
    dataset: Iterable[dict],
    batch_size: int,
    max_len: int,
    pad_token_id: int,
    is_query: bool = False,
    out_dtype=np.float16,
) -> Tuple[np.ndarray, List[str]]:
    """Encode an id+input_ids stream → (embeddings [N, D], ids)."""
    encode = make_encode_fn(model, is_query)
    collator = InferenceCollator(pad_token_id=pad_token_id, max_len=max_len)
    chunks, all_ids = [], []
    stream = batched(dataset, batch_size, collator, pad_to_full=True)
    for (text_ids, batch), n_valid in prefetch(stream, depth=4):
        reps = encode(params, jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]))
        reps = np.asarray(reps, dtype=np.float32)[:n_valid]
        chunks.append(reps.astype(out_dtype))
        all_ids.extend(text_ids[:n_valid])
    if not chunks:
        return np.zeros((0, 0), out_dtype), []
    return np.concatenate(chunks, axis=0), all_ids


def shard_path(save_dir: str, kind: str, shard_index: int) -> str:
    return os.path.join(save_dir, f"embeddings.{kind}.rank.{shard_index}.npz")


def save_embeddings(embeddings: np.ndarray, ids: List[str], path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, embeddings=embeddings, ids=np.array(ids))


def load_embeddings(path: str) -> Tuple[np.ndarray, List[str]]:
    with np.load(path, allow_pickle=False) as z:
        return z["embeddings"], [str(x) for x in z["ids"]]


def write_manifest(save_dir: str, kind: str, num_shards: int, counts: List[int]):
    with open(os.path.join(save_dir, f"manifest.{kind}.json"), "w") as f:
        json.dump({"num_shards": num_shards, "counts": counts}, f)


def list_shards(save_dir: str, kind: str) -> List[str]:
    names = [
        n for n in os.listdir(save_dir)
        if n.startswith(f"embeddings.{kind}.rank.") and n.endswith(".npz")
    ]
    return [os.path.join(save_dir, n) for n in sorted(names, key=lambda n: int(n.split(".")[-2]))]
