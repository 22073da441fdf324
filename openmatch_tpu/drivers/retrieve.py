"""Dense retrieval over saved embedding shards (reference driver/retrieve.py).

    python -m openmatch_tpu.drivers.retrieve \
        --model_name_or_path <ckpt> --query_path queries.tsv \
        --encoded_save_path emb_dir --trec_save_path run.trec \
        [--retrieve_depth 100]
"""

from __future__ import annotations

from ..config import ArgumentParser, DataArguments, InferenceArguments, ModelArguments
from ..data.inference_dataset import InferenceDataset
from ..models.dr_model import DRModel
from ..retriever.retriever import Retriever
from ..utils.trec import save_as_trec
from .common import load_tokenizer, maybe_init_distributed, setup_logging


def main(argv=None, retriever_cls=Retriever):
    setup_logging()
    parser = ArgumentParser((ModelArguments, DataArguments, InferenceArguments))
    model_args, data_args, infer_args = parser.parse(argv)
    maybe_init_distributed()

    tokenizer = load_tokenizer(model_args)
    model, params = DRModel.build(model_args)

    queries = InferenceDataset.load(tokenizer, data_args, is_query=True)
    retriever = retriever_cls.from_embeddings(
        model, params, data_args, infer_args, tokenizer.pad_token_id or 0
    )
    result = retriever.retrieve(queries, topk=infer_args.retrieve_depth)
    save_as_trec(result, infer_args.trec_save_path)
    print(f"wrote {sum(len(v) for v in result.values())} entries -> {infer_args.trec_save_path}")


if __name__ == "__main__":
    main()
