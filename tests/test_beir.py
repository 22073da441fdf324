"""BEIR layout loading + the retrieve_beir driver end-to-end."""

import csv
import json

import pytest

from openmatch_tpu.data.beir import BEIRDataset


@pytest.fixture()
def beir_dir(tmp_path):
    d = tmp_path / "scifact"
    (d / "qrels").mkdir(parents=True)
    corpus = [
        {"_id": "d1", "title": "virus study", "text": "the virus spread"},
        {"_id": "d2", "title": "", "text": "cats and dogs"},
        {"_id": "d3", "title": "cells", "text": "cell biology basics"},
    ]
    (d / "corpus.jsonl").write_text("\n".join(json.dumps(r) for r in corpus) + "\n")
    queries = [
        {"_id": "q1", "text": "virus spread"},
        {"_id": "q2", "text": "unrelated question"},  # no qrels -> filtered
        {"_id": "q3", "text": "cell biology"},
    ]
    (d / "queries.jsonl").write_text("\n".join(json.dumps(r) for r in queries) + "\n")
    (d / "qrels" / "test.tsv").write_text(
        "query-id\tcorpus-id\tscore\nq1\td1\t1\nq3\td3\t2\n"
    )
    return str(d)


class TestBEIRDataset:
    def test_qrels(self, beir_dir):
        ds = BEIRDataset(beir_dir)
        assert ds.qrels == {"q1": {"d1": 1}, "q3": {"d3": 2}}

    def test_queries_filtered_to_qrels(self, beir_dir):
        ds = BEIRDataset(beir_dir)
        qids = [q["id"] for q in ds.iter_queries()]
        assert qids == ["q1", "q3"]

    def test_corpus_title_placeholder(self, beir_dir):
        ds = BEIRDataset(beir_dir)
        docs = {d["id"]: d for d in ds.iter_corpus()}
        assert docs["d2"]["title"] == "-"  # empty title placeholder
        assert docs["d1"]["title"] == "virus study"


class TestRetrieveBeirDriver:
    def test_end_to_end_metrics(self, beir_dir, tmp_path, monkeypatch):
        """Drive the driver main() with a tiny offline checkpoint."""
        import torch
        from transformers import BertConfig as HFBertConfig, BertModel, BertTokenizerFast

        torch.manual_seed(0)
        words = ["virus", "spread", "cell", "biology", "cats", "dogs", "study",
                 "basics", "title", "text", "the", "and"]
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
        (tmp_path / "vocab.txt").write_text("\n".join(vocab))
        tok = BertTokenizerFast(vocab_file=str(tmp_path / "vocab.txt"))
        hf = BertModel(HFBertConfig(
            vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64, max_position_embeddings=64))
        hf.save_pretrained(str(tmp_path / "hf"))
        tok.save_pretrained(str(tmp_path / "hf"))

        from openmatch_tpu.drivers.retrieve_beir import main

        metrics = main([
            "--model_name_or_path", str(tmp_path / "hf"),
            "--data_dir", beir_dir,
            "--q_max_len", "16", "--p_max_len", "32",
            "--trec_save_path", str(tmp_path / "run.trec"),
            "--per_device_eval_batch_size", "4",
            "--dtype", "float32",
        ])
        assert set(metrics) == {"ndcg_cut_10", "recall_100"}
        assert 0.0 <= metrics["ndcg_cut_10"] <= 1.0
        assert metrics["recall_100"] == 1.0  # 3-doc corpus, depth 100
        assert (tmp_path / "run.trec").exists()
