"""Rerank a TREC run with a cross-encoder (reference driver/rerank.py).

    python -m openmatch_tpu.drivers.rerank \
        --model_name_or_path <rr_ckpt> \
        --query_path queries.tsv --corpus_path corpus.tsv \
        --trec_run_path run.trec --trec_save_path reranked.trec \
        [--reranking_depth 100]
"""

from __future__ import annotations

from ..config import ArgumentParser, DataArguments, InferenceArguments, ModelArguments
from ..data.inference_dataset import InferenceDataset
from ..models.rr_model import RRModel
from ..retriever.reranker import Reranker
from ..utils.trec import load_from_trec, save_as_trec
from .common import load_tokenizer, maybe_init_distributed, setup_logging


def main(argv=None):
    setup_logging()
    parser = ArgumentParser((ModelArguments, DataArguments, InferenceArguments))
    model_args, data_args, infer_args = parser.parse(argv)
    maybe_init_distributed()

    tokenizer = load_tokenizer(model_args)
    model, params = RRModel.build(model_args, tokenizer=tokenizer)

    queries = InferenceDataset.load(tokenizer, data_args, is_query=True).to_dict()
    corpus = InferenceDataset.load(tokenizer, data_args, is_query=False).to_dict()
    run = load_from_trec(infer_args.trec_run_path, max_len_per_q=infer_args.reranking_depth)

    reranker = Reranker(model, params, tokenizer, data_args, infer_args)
    result = reranker.rerank(queries, corpus, run, depth=infer_args.reranking_depth)
    save_as_trec(result, infer_args.trec_save_path)
    print(f"reranked {len(result)} queries -> {infer_args.trec_save_path}")


if __name__ == "__main__":
    main()
