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
    """Cached per (model, is_query) ON the model instance (DRModel is a
    plain dataclass, not hashable): the ANCE generator calls
    encode_corpus + encode_queries every generation, and a fresh @jax.jit
    closure per call would retrace/re-lower the encode program each time
    (minutes over the remote-compile tunnel) — same reason as
    models/t5._cached_decode_step."""
    attr = "_encode_fn_q" if is_query else "_encode_fn_p"
    fn = getattr(model, attr, None)
    if fn is None:

        @jax.jit
        def encode(params, input_ids, attention_mask):
            return model.encode(params, input_ids, attention_mask, is_query=is_query)

        setattr(model, attr, encode)
        fn = encode
    return fn


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
        # (0, D), not (0, 0): an empty shard (encode_num_shard > docs)
        # must still concatenate against real [n, D] shards at load time
        d = model.head_out_dim if model.has_head else model.head_in_dim
        return np.zeros((0, d), out_dtype), []
    return np.concatenate(chunks, axis=0), all_ids


def shard_path(save_dir: str, kind: str, shard_index: int) -> str:
    return os.path.join(save_dir, f"embeddings.{kind}.rank.{shard_index}.npz")


def save_embeddings(embeddings: np.ndarray, ids: List[str], path: str,
                    num_shards: Optional[int] = None):
    """Write one shard ATOMICALLY (tmp + rename — a crashed encoder never
    leaves a truncated npz behind), plus a sidecar manifest when the
    writer knows the collection's total shard count; list_shards uses the
    sidecars to detect missing shards at load time."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, embeddings=embeddings, ids=np.array(ids))
    os.replace(tmp, path)
    if num_shards is not None:
        mtmp = path + ".manifest.tmp"
        with open(mtmp, "w") as f:
            json.dump({"num_shards": int(num_shards),
                       "rows": int(embeddings.shape[0])}, f)
        os.replace(mtmp, path + ".manifest.json")


def load_embeddings(path: str) -> Tuple[np.ndarray, List[str]]:
    with np.load(path, allow_pickle=False) as z:
        return z["embeddings"], [str(x) for x in z["ids"]]


def list_shards(save_dir: str, kind: str) -> List[str]:
    """Shard paths in rank order. When sidecar manifests exist, verify
    COMPLETENESS: every rank 0..num_shards-1 must be present (a silent
    gap would search a partial index and quietly depress recall)."""
    names = [
        n for n in os.listdir(save_dir)
        if n.startswith(f"embeddings.{kind}.rank.") and n.endswith(".npz")
        and not n.endswith(".tmp.npz")
    ]
    paths = [os.path.join(save_dir, n)
             for n in sorted(names, key=lambda n: int(n.split(".")[-2]))]
    declared = set()
    for p in paths:
        mpath = p + ".manifest.json"
        if os.path.exists(mpath):
            with open(mpath) as f:
                declared.add(json.load(f)["num_shards"])
    if declared:
        if len(declared) > 1:
            raise ValueError(
                f"shard manifests in {save_dir} disagree on num_shards: "
                f"{sorted(declared)}")
        want = declared.pop()
        have = {int(p.split(".")[-2]) for p in paths}
        missing = sorted(set(range(want)) - have)
        if missing:
            raise ValueError(
                f"embedding shards missing from {save_dir}: ranks {missing} "
                f"of {want} (partial encode? rerun build_index for them)")
    return paths
