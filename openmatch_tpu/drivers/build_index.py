"""Encode a corpus into embedding shards (reference driver/build_index.py).

    python -m openmatch_tpu.drivers.build_index \
        --model_name_or_path <ckpt> --corpus_path corpus.jsonl \
        --encoded_save_path emb_dir [--encode_shard_index i --encode_num_shard n]
"""

from __future__ import annotations

from ..config import ArgumentParser, DataArguments, InferenceArguments, ModelArguments
from ..data.inference_dataset import InferenceDataset
from ..models.dr_model import DRModel
from ..retriever.retriever import Retriever
from .common import load_tokenizer, maybe_init_distributed, setup_logging


def main(argv=None):
    setup_logging()
    parser = ArgumentParser((ModelArguments, DataArguments, InferenceArguments))
    model_args, data_args, infer_args = parser.parse(argv)
    maybe_init_distributed()

    tokenizer = load_tokenizer(model_args)
    model, params = DRModel.build(model_args)

    corpus = InferenceDataset.load(
        tokenizer, data_args,
        data_files=data_args.encode_in_path or data_args.corpus_path,
        is_query=data_args.encode_is_qry,
        shard_index=data_args.encode_shard_index,
        num_shards=data_args.encode_num_shard,
    )
    retriever = Retriever(model, params, data_args, infer_args, tokenizer.pad_token_id or 0)
    if data_args.encode_is_qry:
        emb, ids = retriever.encode_queries(
            corpus, save_dir=infer_args.encoded_save_path,
            shard_index=data_args.encode_shard_index,
        )
    else:
        emb, ids = retriever.encode_corpus(
            corpus, save_dir=infer_args.encoded_save_path,
            shard_index=data_args.encode_shard_index,
        )
    print(f"encoded {len(ids)} items -> {infer_args.encoded_save_path}")


if __name__ == "__main__":
    main()
