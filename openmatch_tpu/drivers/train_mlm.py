"""Domain-adaptive MLM pretraining (reference v1/train_bertmlm.py).

    python -m openmatch_tpu.drivers.train_mlm \
        --model_name_or_path bert-base-uncased --train_path corpus.txt \
        --output_dir mlm_out --max_steps 10000
Input: one text per line (txt) or jsonl with a "text" field.
"""

from __future__ import annotations

import json

import numpy as np

from ..config import ArgumentParser, DataArguments, ModelArguments, TrainingArguments
from .common import load_tokenizer, maybe_init_distributed, setup_logging


def iter_texts(path: str):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if path.endswith((".json", ".jsonl")):
                yield json.loads(line).get("text", "")
            else:
                yield line


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from functools import partial

    from ..data.loader import batched, prefetch
    from ..models.hf_convert import load_bert_encoder
    from ..research.mlm import MLMModel, mask_tokens, mlm_logits, mlm_loss
    from ..train.state import TrainState, make_optimizer, save_train_state

    setup_logging()
    parser = ArgumentParser((ModelArguments, DataArguments, TrainingArguments))
    model_args, data_args, train_args = parser.parse(argv)
    maybe_init_distributed()

    tokenizer = load_tokenizer(model_args)
    config, enc_params = load_bert_encoder(model_args.model_name_or_path, model_args.cache_dir)
    model = MLMModel(config)
    rng = jax.random.PRNGKey(train_args.seed)
    init_params = model.init(
        rng, jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32)
    )["params"]
    params = dict(init_params)
    params["bert"] = jax.tree.map(jnp.asarray, enc_params)

    total_steps = train_args.max_steps if train_args.max_steps > 0 else 10_000
    tx = make_optimizer(train_args, total_steps)
    state = TrainState.create(params, tx)

    mask_id = tokenizer.mask_token_id
    special = tuple(tokenizer.all_special_ids)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, rng, input_ids, attention_mask):
        rng, sub = jax.random.split(rng)

        def loss_fn(p):
            masked, labels = mask_tokens(
                sub, input_ids, attention_mask, mask_id, config.vocab_size, special
            )
            logits = mlm_logits(model, p, masked, attention_mask)
            return mlm_loss(logits, labels)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), rng, loss

    def encode(text):
        enc = tokenizer(
            text, truncation=True, max_length=data_args.p_max_len,
            padding="max_length", return_tensors="np",
        )
        return enc["input_ids"][0].astype(np.int32), enc["attention_mask"][0].astype(np.int32)

    def batches():
        while True:
            stream = (encode(t) for t in iter_texts(data_args.train_path))
            yield from batched(
                stream, train_args.per_device_train_batch_size,
                lambda xs: (np.stack([x[0] for x in xs]), np.stack([x[1] for x in xs])),
                drop_last=True,
            )

    log_loss = 0.0
    for ids, mask in prefetch(batches(), depth=4):
        if int(state.step) >= total_steps:
            break
        state, rng, loss = step(state, rng, jnp.asarray(ids), jnp.asarray(mask))
        log_loss += float(loss)
        s = int(state.step)
        if s % train_args.logging_steps == 0 and s > 0:
            print(f"step {s}/{total_steps} mlm loss {log_loss / train_args.logging_steps:.4f}")
            log_loss = 0.0

    save_train_state(state, train_args.output_dir)
    # also export the encoder weights in DRModel-loadable layout
    from ..models.dr_model import DRModel

    enc_only = jax.device_get(state.params)["bert"]
    dr = DRModel(encoder_config=config, tied=True)
    dr.save({"encoder_q": enc_only}, train_args.output_dir)
    tokenizer.save_pretrained(train_args.output_dir)
    print(f"saved MLM-adapted encoder -> {train_args.output_dir}")


if __name__ == "__main__":
    main()
