"""Convert a sentence-transformers GTR checkpoint to OpenMatch-TPU layout.

Reference: /root/reference/scripts/gtr/convert_sbert_ckpt.ipynb — GTR ships
as a sentence-transformers dir (T5 encoder + mean pooling + a ``2_Dense``
linear head + L2 normalize). Output: a DRModel checkpoint dir
(openmatch_config.json + params.msgpack) with backbone=t5 (encoder-only),
pooling=mean, linear head, normalize=True.

    python scripts/gtr/convert_gtr_ckpt.py --input gtr-t5-base-dir --output om_gtr
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def load_dense_head(dense_dir: str):
    """sentence-transformers Dense module: config.json + pytorch_model.bin
    (linear.weight [out, in], no bias for GTR)."""
    import torch

    with open(os.path.join(dense_dir, "config.json")) as f:
        cfg = json.load(f)
    for name in ("pytorch_model.bin", "model.safetensors"):
        path = os.path.join(dense_dir, name)
        if os.path.exists(path):
            if name.endswith(".bin"):
                sd = torch.load(path, map_location="cpu", weights_only=True)
            else:
                from safetensors.torch import load_file

                sd = load_file(path)
            break
    else:
        raise FileNotFoundError(f"no weights in {dense_dir}")
    weight = sd["linear.weight"].numpy()  # [out, in]
    return cfg["in_features"], cfg["out_features"], weight.T  # -> [in, out]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="sentence-transformers GTR dir")
    parser.add_argument("--output", required=True)
    args = parser.parse_args()

    import jax.numpy as jnp

    from openmatch_tpu.models.dr_model import DRModel
    from openmatch_tpu.models.t5 import load_t5_encoder

    enc_cfg, enc_params = load_t5_encoder(args.input)
    dense_dir = os.path.join(args.input, "2_Dense")
    if os.path.isdir(dense_dir):
        in_dim, out_dim, kernel = load_dense_head(dense_dir)
        has_head = True
    else:
        in_dim = out_dim = enc_cfg.d_model
        kernel = None
        has_head = False

    model = DRModel(
        encoder_config=enc_cfg,
        backbone_type="t5",
        tied=True,
        pooling="mean",
        normalize=True,
        has_head=has_head,
        head_in_dim=in_dim,
        head_out_dim=out_dim,
    )
    params = {"encoder_q": enc_params}
    if has_head:
        params["head_q"] = {"linear": {"kernel": jnp.asarray(kernel)}}
    model.save(params, args.output)
    print(f"converted GTR -> {args.output} (head={has_head}, dim {in_dim}->{out_dim})")


if __name__ == "__main__":
    main()
