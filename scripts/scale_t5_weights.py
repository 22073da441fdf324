"""Scale T5 weights for reduced-precision stability.

Reference recipe: /root/reference/scripts/scale_t5_weights.py:24-33 and
docs/scale-t5-weights.md — divide attention output projections and the
shared embedding by 100 and FFN weights by 10 so fp16/bf16 activations
stay in range. Operates directly on our converted Flax param trees (and,
with --hf, on a HF torch checkpoint dir for interop).
"""

import argparse
import json
import os


def scale_flax_encdec(params: dict, num_layers: int) -> dict:
    """Scale a T5EncoderDecoderStep param tree in place."""
    for i in range(num_layers):
        for stack in ("enc", "dec"):
            blk = params.get(f"{stack}_layer_{i}")
            if blk is None:
                continue
            blk["self_attn"]["o"]["kernel"] = blk["self_attn"]["o"]["kernel"] / 100
            if "cross_attn" in blk:
                blk["cross_attn"]["o"]["kernel"] = blk["cross_attn"]["o"]["kernel"] / 100
            for w in ("wi", "wi_0", "wi_1", "wo"):
                if w in blk["ff"]:
                    blk["ff"][w]["kernel"] = blk["ff"][w]["kernel"] / 10
    params["shared"]["embedding"] = params["shared"]["embedding"] / 100
    return params


def scale_flax_encoder(params: dict, num_layers: int) -> dict:
    for i in range(num_layers):
        blk = params.get(f"layer_{i}")
        if blk is None:
            continue
        blk["self_attn"]["o"]["kernel"] = blk["self_attn"]["o"]["kernel"] / 100
        for w in ("wi", "wi_0", "wi_1", "wo"):
            if w in blk["ff"]:
                blk["ff"][w]["kernel"] = blk["ff"][w]["kernel"] / 10
    params["shared"]["embedding"] = params["shared"]["embedding"] / 100
    return params


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_model_path", type=str, required=True)
    parser.add_argument("--output_model_path", type=str, required=True)
    parser.add_argument("--num_layers", type=int, default=12)
    args = parser.parse_args()

    import numpy as np

    om_cfg = os.path.join(args.input_model_path, "openmatch_config.json")
    if os.path.exists(om_cfg):
        # OpenMatch-TPU checkpoint
        from flax import serialization

        with open(os.path.join(args.input_model_path, "params.msgpack"), "rb") as f:
            params = serialization.msgpack_restore(f.read())
        with open(om_cfg) as f:
            cfg = json.load(f)
        enc = params.get("encoder_q", params.get("encoder"))
        if any(k.startswith("enc_layer_") for k in enc):
            scale_flax_encdec(enc, args.num_layers)
        else:
            scale_flax_encoder(enc, args.num_layers)
        if "encoder_p" in params:
            tgt = params["encoder_p"]
            (scale_flax_encdec if any(k.startswith("enc_layer_") for k in tgt)
             else scale_flax_encoder)(tgt, args.num_layers)
        os.makedirs(args.output_model_path, exist_ok=True)
        with open(os.path.join(args.output_model_path, "params.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(params))
        with open(os.path.join(args.output_model_path, "openmatch_config.json"), "w") as f:
            json.dump(cfg, f, indent=4)
    else:
        # raw HF torch checkpoint (reference-identical key scaling)
        import shutil
        import torch
        from transformers import AutoModel

        model = AutoModel.from_pretrained(args.input_model_path)
        sd = {k: v.clone() for k, v in model.state_dict().items()}
        for i in range(args.num_layers):
            sd[f"encoder.block.{i}.layer.0.SelfAttention.o.weight"] /= 100
            sd[f"encoder.block.{i}.layer.1.DenseReluDense.wi.weight"] /= 10
            sd[f"encoder.block.{i}.layer.1.DenseReluDense.wo.weight"] /= 10
            if f"decoder.block.{i}.layer.0.SelfAttention.o.weight" in sd:
                sd[f"decoder.block.{i}.layer.1.EncDecAttention.o.weight"] /= 100
                sd[f"decoder.block.{i}.layer.0.SelfAttention.o.weight"] /= 100
                sd[f"decoder.block.{i}.layer.2.DenseReluDense.wi.weight"] /= 10
                sd[f"decoder.block.{i}.layer.2.DenseReluDense.wo.weight"] /= 10
        sd["shared.weight"] /= 100
        os.makedirs(args.output_model_path, exist_ok=True)
        torch.save(sd, os.path.join(args.output_model_path, "pytorch_model.bin"))
        for name in os.listdir(args.input_model_path):
            if name not in ("pytorch_model.bin", "model.safetensors"):
                src = os.path.join(args.input_model_path, name)
                if os.path.isfile(src):
                    shutil.copy(src, args.output_model_path)
    print(f"scaled -> {args.output_model_path}")


if __name__ == "__main__":
    main()
