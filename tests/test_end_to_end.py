"""End-to-end slice: train a tiny bi-encoder on separable synthetic data,
encode a corpus, retrieve with the MIPS engine, rerank, and score with the
native metrics — the full reference workflow (SURVEY.md §3) in miniature.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openmatch_tpu.config import DataArguments, InferenceArguments, ModelArguments, TrainingArguments
from openmatch_tpu.data.collators import QPCollator
from openmatch_tpu.data.train_dataset import DRTrainDataset
from openmatch_tpu.models.bert import BertConfig
from openmatch_tpu.models.dr_model import DRModel
from openmatch_tpu.retriever.retriever import Retriever, SuccessiveRetriever
from openmatch_tpu.train.dr_trainer import DRTrainer
from openmatch_tpu.utils.metrics import eval_mrr
from openmatch_tpu.utils.trec import load_from_trec, save_as_trec


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    from transformers import BertTokenizerFast

    d = tmp_path_factory.mktemp("tok")
    topics = [f"topic{i}" for i in range(8)]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "about", "document", "query"] + topics
    (d / "vocab.txt").write_text("\n".join(vocab))
    return BertTokenizerFast(vocab_file=str(d / "vocab.txt"))


@pytest.fixture(scope="module")
def synthetic(tmp_path_factory, tokenizer):
    """8 topics; queries and docs about the same topic should match."""
    d = tmp_path_factory.mktemp("data")
    train_rows, corpus_rows, query_rows, qrels = [], [], [], {}
    for i in range(8):
        topic = f"topic{i}"
        other = f"topic{(i + 1) % 8}"
        train_rows.append({
            "query": f"query about {topic}",
            "positives": [f"document about {topic}"],
            "negatives": [f"document about {other}"],
        })
        corpus_rows.append({"id": f"d{i}", "title": "", "text": f"document about {topic}"})
        query_rows.append({"id": f"q{i}", "text": f"query about {topic}"})
        qrels[f"q{i}"] = {f"d{i}": 1}
    (d / "train.jsonl").write_text("\n".join(json.dumps(r) for r in train_rows) + "\n")
    (d / "corpus.jsonl").write_text("\n".join(json.dumps(r) for r in corpus_rows) + "\n")
    (d / "queries.jsonl").write_text("\n".join(json.dumps(r) for r in query_rows) + "\n")
    return str(d), qrels


def tiny_model():
    cfg = BertConfig(
        vocab_size=32, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=32, add_pooler=False,
    )
    model = DRModel(encoder_config=cfg, tied=True, normalize=True, dtype=jnp.float32)
    return model, model.init_params(jax.random.PRNGKey(0))


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def trained(self, tokenizer, synthetic, mesh8, tmp_path_factory):
        data_dir, qrels = synthetic
        model, params = tiny_model()
        data_args = DataArguments(
            train_path=os.path.join(data_dir, "train.jsonl"),
            corpus_path=os.path.join(data_dir, "corpus.jsonl"),
            query_path=os.path.join(data_dir, "queries.jsonl"),
            train_n_passages=2, q_max_len=8, p_max_len=8,
            doc_template="<text>",
        )
        train_args = TrainingArguments(
            learning_rate=5e-3, warmup_ratio=0.1, logging_steps=1000, save_steps=0,
        )
        trainer = DRTrainer(model, params, train_args, total_steps=60, mesh=mesh8)
        ds = DRTrainDataset(tokenizer, data_args)
        collator = QPCollator(pad_token_id=tokenizer.pad_token_id, q_max_len=8, p_max_len=8)

        from openmatch_tpu.data.loader import batched

        for epoch in range(60):
            for batch in batched(ds.epoch_iterator(epoch, None), 8, collator, drop_last=True):
                trainer.train_step(batch)
        return model, jax.device_get(trainer.state.params), data_args, qrels

    def test_retrieval_mrr_is_perfect(self, tokenizer, trained, tmp_path_factory):
        model, params, data_args, qrels = trained
        from openmatch_tpu.data.inference_dataset import InferenceDataset

        out = tmp_path_factory.mktemp("out")
        infer_args = InferenceArguments(
            per_device_eval_batch_size=4,
            encoded_save_path=str(out), retrieve_depth=4,
        )
        retriever = Retriever(model, params, data_args, infer_args, tokenizer.pad_token_id)
        corpus = InferenceDataset.load(tokenizer, data_args, is_query=False)
        retriever.encode_corpus(corpus, save_dir=str(out))
        queries = InferenceDataset.load(tokenizer, data_args, is_query=True)
        result = retriever.retrieve(queries, topk=4)

        trec = out / "run.trec"
        save_as_trec(result, str(trec))
        run = load_from_trec(str(trec))
        mrr = eval_mrr(qrels, run, cutoff=10)["all"]
        assert mrr > 0.95, f"expected near-perfect MRR on separable data, got {mrr}"

    def test_successive_matches_resident(self, tokenizer, trained, tmp_path_factory):
        model, params, data_args, qrels = trained
        from openmatch_tpu.data.inference_dataset import InferenceDataset

        out = tmp_path_factory.mktemp("succ")
        infer_args = InferenceArguments(
            per_device_eval_batch_size=4, encoded_save_path=str(out), retrieve_depth=3,
        )
        # write the corpus as two shards
        r = Retriever(model, params, data_args, infer_args, tokenizer.pad_token_id)
        corpus_items = list(InferenceDataset.load(tokenizer, data_args, is_query=False))
        from openmatch_tpu.retriever.encoder import encode_dataset, save_embeddings, shard_path

        for shard, sl in enumerate((slice(0, 4), slice(4, 8))):
            emb, ids = encode_dataset(model, params, iter(corpus_items[sl]), 4, 8,
                                      tokenizer.pad_token_id, is_query=False)
            save_embeddings(emb, ids, shard_path(str(out), "corpus", shard))

        resident = Retriever.from_embeddings(model, params, data_args, infer_args, tokenizer.pad_token_id)
        successive = SuccessiveRetriever.from_embeddings(model, params, data_args, infer_args, tokenizer.pad_token_id)
        queries = list(InferenceDataset.load(tokenizer, data_args, is_query=True))
        res_a = resident.retrieve(iter(queries), topk=3)
        res_b = successive.retrieve(iter(queries), topk=3)
        assert set(res_a) == set(res_b)
        for qid in res_a:
            assert set(res_a[qid]) == set(res_b[qid])
            for did in res_a[qid]:
                assert res_a[qid][did] == pytest.approx(res_b[qid][did], abs=1e-3)

    def test_rerank_improves_or_keeps_separable_ranking(self, tokenizer, trained, tmp_path_factory):
        """Drive the Reranker runtime over a deliberately shuffled run."""
        model, params, data_args, qrels = trained
        from openmatch_tpu.models.rr_model import RRModel
        from openmatch_tpu.retriever.reranker import Reranker
        from openmatch_tpu.data.inference_dataset import InferenceDataset

        # an untrained RR model just exercises the runtime path end-to-end
        cfg = BertConfig(vocab_size=32, hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=32,
                         max_position_embeddings=32, add_pooler=False)
        rr = RRModel(encoder_config=cfg, head_in_dim=16)
        rr_params = rr.init_params(jax.random.PRNGKey(1))
        infer_args = InferenceArguments(per_device_eval_batch_size=4)

        data_args2 = DataArguments(
            corpus_path=data_args.corpus_path, query_path=data_args.query_path,
            q_max_len=8, p_max_len=8, doc_template="<text>", query_template="<text>",
        )
        queries = InferenceDataset.load(tokenizer, data_args2, is_query=True).to_dict()
        corpus = InferenceDataset.load(tokenizer, data_args2, is_query=False).to_dict()
        run = {f"q{i}": {f"d{j}": 1.0 for j in range(8)} for i in range(8)}

        reranker = Reranker(rr, rr_params, tokenizer, data_args2, infer_args)
        result = reranker.rerank(queries, corpus, run, depth=4)
        assert set(result) == set(run)
        assert all(len(v) == 4 for v in result.values())  # depth respected
