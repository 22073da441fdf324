"""Representation pooling and the linear projection head.

Reference semantics:
- pooling "first" / "mean"
  (/root/reference/src/openmatch/modeling/dense_retrieval_model.py:145-148,
  /root/reference/src/openmatch/utils.py:233-235)
- bias-free LinearHead with json+weights sidecar persistence
  (/root/reference/src/openmatch/modeling/linear.py:12-39)
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def mean_pooling(hidden: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Mask-aware mean over the sequence axis. hidden: [B, S, D], mask: [B, S]."""
    mask = attention_mask[..., None].astype(hidden.dtype)
    summed = jnp.sum(hidden * mask, axis=1)
    counts = jnp.clip(jnp.sum(mask, axis=1), 1e-9, None)
    return summed / counts


def pool_hidden(hidden: jnp.ndarray, attention_mask: jnp.ndarray, pooling: str) -> jnp.ndarray:
    if pooling == "first":
        return hidden[:, 0, :]
    if pooling == "mean":
        return mean_pooling(hidden, attention_mask)
    raise ValueError(f"Unknown pooling type: {pooling}")


class LinearHead(nn.Module):
    """Bias-free linear projection (reference: modeling/linear.py:12-24)."""

    input_dim: int = 768
    output_dim: int = 768
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, reps: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.output_dim, use_bias=False, dtype=self.dtype, name="linear")(reps)

    # -- persistence (sidecar layout mirrors head_config.json + linear weights) --

    @staticmethod
    def save_params(params, input_dim: int, output_dim: int, ckpt_dir: str):
        os.makedirs(ckpt_dir, exist_ok=True)
        kernel = np.asarray(params["linear"]["kernel"], dtype=np.float32)
        np.save(os.path.join(ckpt_dir, "linear_head.npy"), kernel)
        with open(os.path.join(ckpt_dir, "head_config.json"), "w") as f:
            json.dump({"input_dim": input_dim, "output_dim": output_dim}, f, indent=4)

    @staticmethod
    def load_params(ckpt_dir: str):
        with open(os.path.join(ckpt_dir, "head_config.json")) as f:
            cfg = json.load(f)
        kernel = np.load(os.path.join(ckpt_dir, "linear_head.npy"))
        head = LinearHead(cfg["input_dim"], cfg["output_dim"])
        return head, {"linear": {"kernel": jnp.asarray(kernel)}}
