"""Train a dense retriever.

Usage mirrors the reference driver
(/root/reference/src/openmatch/driver/train_dr.py:20-99):

    python -m openmatch_tpu.drivers.train_dr \
        --model_name_or_path bert-base-uncased \
        --train_path train.jsonl --output_dir out \
        [--negatives_x_device] [--grad_cache]
"""

from __future__ import annotations

import math

from ..config import ArgumentParser, DataArguments, ModelArguments, TrainingArguments
from ..data.collators import QPCollator
from ..data.train_dataset import DRTrainDataset
from ..models.dr_model import DRModel
from ..train.dr_trainer import DRTrainer
from .common import epochs_iterator, load_tokenizer, maybe_init_distributed, setup_logging


def main(argv=None):
    setup_logging()
    parser = ArgumentParser((ModelArguments, DataArguments, TrainingArguments))
    model_args, data_args, train_args = parser.parse(argv)
    rank, world = maybe_init_distributed()

    tokenizer = load_tokenizer(model_args)
    model, params = DRModel.build(model_args, train_args)

    dataset = DRTrainDataset(
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

    trainer = DRTrainer(model, params, train_args, total_steps=total_steps)
    trainer.maybe_resume()

    collator = QPCollator(
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
