"""Train a cross-encoder reranker (reference driver/train_rr.py)."""

from __future__ import annotations

import math

from ..config import ArgumentParser, DataArguments, ModelArguments, TrainingArguments
from ..data.collators import PairCollator
from ..data.train_dataset import RRTrainDataset
from ..models.rr_model import RRModel
from ..train.rr_trainer import RRTrainer
from .common import epochs_iterator, load_tokenizer, maybe_init_distributed, setup_logging


def main(argv=None):
    setup_logging()
    parser = ArgumentParser((ModelArguments, DataArguments, TrainingArguments))
    model_args, data_args, train_args = parser.parse(argv)
    rank, world = maybe_init_distributed()

    tokenizer = load_tokenizer(model_args)
    model, params = RRModel.build(model_args, train_args, tokenizer=tokenizer)

    dataset = RRTrainDataset(
        tokenizer, data_args,
        shuffle_seed=train_args.seed,
        shard_index=rank, num_shards=world,
    )
    import jax

    # steps are counted in GLOBAL batches; each host FEEDS only its local
    # rows (per-device batch x addressable devices) from its dataset shard
    global_batch = train_args.per_device_train_batch_size * len(jax.devices())
    local_batch = train_args.per_device_train_batch_size * jax.local_device_count()
    steps_per_epoch = max(len(dataset) // max(global_batch, 1), 1)
    num_epochs = int(math.ceil(train_args.num_train_epochs))
    total_steps = (
        train_args.max_steps if train_args.max_steps > 0
        else steps_per_epoch * num_epochs
    )

    trainer = RRTrainer(model, params, train_args, total_steps=total_steps)
    trainer.maybe_resume()

    collator = PairCollator(
        pad_token_id=tokenizer.pad_token_id or 0,
        q_max_len=data_args.q_max_len,
        p_max_len=data_args.p_max_len,
    )
    data_iter = epochs_iterator(dataset, collator, local_batch, num_epochs, train_args.seed)
    trainer.train(data_iter)
    trainer.save_model()
    tokenizer.save_pretrained(train_args.output_dir)


if __name__ == "__main__":
    main()
