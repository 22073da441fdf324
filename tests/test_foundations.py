"""Unit tests for templates, TREC I/O, metrics, and config parsing."""

import math

import pytest

from openmatch_tpu.templates import fill_template, find_all_markers
from openmatch_tpu.utils.trec import (
    load_from_trec,
    merge_retrieval_results_by_score,
    save_as_trec,
)
from openmatch_tpu.utils import metrics as M
from openmatch_tpu.config import (
    ArgumentParser,
    DataArguments,
    ModelArguments,
    TrainingArguments,
)


class TestTemplates:
    def test_find_markers(self):
        assert find_all_markers("Title: <title> Text: <text>") == ["title", "text"]
        assert find_all_markers("<a.b.c>") == ["a.b.c"]
        assert find_all_markers("no markers") == []

    def test_fill(self):
        out = fill_template("Title: <title> Text: <text>", {"title": "T", "text": "x"})
        assert out == "Title: T Text: x"

    def test_fill_dotted(self):
        out = fill_template("<meta.title>!", {"meta": {"title": "deep"}})
        assert out == "deep!"

    def test_fill_missing_raises(self):
        with pytest.raises(ValueError):
            fill_template("<nope>", {})

    def test_fill_missing_allowed(self):
        with pytest.warns(RuntimeWarning):
            assert fill_template("a<nope>b", {}, allow_not_found=True) == "ab"


class TestTrec:
    def test_roundtrip(self, tmp_path):
        run = {"q1": {"d1": 2.0, "d2": 3.0}, "q2": {"d3": 1.0}}
        path = tmp_path / "run.trec"
        save_as_trec(run, str(path))
        lines = path.read_text().strip().split("\n")
        # ranks sorted by score descending
        assert lines[0].split()[:4] == ["q1", "Q0", "d2", "1"]
        assert lines[1].split()[:4] == ["q1", "Q0", "d1", "2"]
        loaded = load_from_trec(str(path))
        assert loaded == run

    def test_load_as_list_and_depth(self, tmp_path):
        path = tmp_path / "run.trec"
        path.write_text("q1 d1 3.0\nq1 d2 2.0\nq1 d3 1.0\n")
        loaded = load_from_trec(str(path), as_list=True, max_len_per_q=2)
        assert loaded == {"q1": [("d1", 3.0), ("d2", 2.0)]}

    def test_merge_partitions(self):
        p0 = {"q1": {"d1": 0.9, "d2": 0.1}}
        p1 = {"q1": {"d3": 0.5}, "q2": {"d4": 0.7}}
        merged = merge_retrieval_results_by_score([p0, p1], topk=2)
        assert list(merged["q1"].keys()) == ["d1", "d3"]
        assert merged["q2"] == {"d4": 0.7}

    def test_merge_first_wins(self):
        p0 = {"q1": {"d1": 0.9}}
        p1 = {"q1": {"d1": 0.1}}
        merged = merge_retrieval_results_by_score([p0, p1], topk=10)
        assert merged["q1"]["d1"] == 0.9


class TestMetrics:
    def setup_method(self):
        self.qrels = {"q1": {"d1": 1, "d3": 2}, "q2": {"d9": 1}}
        self.run = {
            "q1": {"d2": 0.9, "d1": 0.8, "d3": 0.7},
            "q2": {"d5": 0.5, "d9": 0.4},
        }

    def test_mrr(self):
        res = M.eval_mrr(self.qrels, self.run)
        assert res["q1"] == 0.5
        assert res["q2"] == 0.5
        assert res["all"] == 0.5

    def test_mrr_cutoff(self):
        res = M.eval_mrr(self.qrels, self.run, cutoff=1)
        assert res["all"] == 0.0

    def test_ndcg_hand_computed(self):
        ranked = M._ranked_docids(self.run["q1"])
        # DCG = 1/log2(3) + 2/log2(4); IDCG = 2/log2(2) + 1/log2(3)
        dcg = 1 / math.log2(3) + 2 / math.log2(4)
        idcg = 2 + 1 / math.log2(3)
        assert M.ndcg_at_k(self.qrels["q1"], ranked, 10) == pytest.approx(dcg / idcg)

    def test_recall_precision_map(self):
        ranked = ["d2", "d1", "d3"]
        q = self.qrels["q1"]
        assert M.recall_at_k(q, ranked, 2) == 0.5
        assert M.recall_at_k(q, ranked, 3) == 1.0
        assert M.precision_at_k(q, ranked, 2) == 0.5
        # AP = (1/2 + 2/3) / 2
        assert M.average_precision(q, ranked) == pytest.approx((0.5 + 2 / 3) / 2)

    def test_tie_break_docid_desc(self):
        # equal scores: trec_eval ranks higher docid first
        ranked = M._ranked_docids({"dA": 1.0, "dB": 1.0})
        assert ranked == ["dB", "dA"]

    def test_evaluate_run_missing_query_counts_zero(self):
        qrels = {"q1": {"d1": 1}, "q2": {"d2": 1}}
        run = {"q1": {"d1": 1.0}}
        res = M.evaluate_run(qrels, run, ["ndcg_10"])
        assert res["ndcg_10"] == pytest.approx(0.5)

    def test_err(self):
        q = {"d1": 1}
        assert M.err_at_k(q, ["d1"], 10) == pytest.approx(0.5)  # (2^1-1)/2^1

    def test_parse_qrel_run(self):
        qr = M.parse_qrel(["q1 0 d1 2", "q1 0 d2 0"])
        assert qr == {"q1": {"d1": 2, "d2": 0}}
        rn = M.parse_run(["q1 Q0 d1 1 3.5 tag"])
        assert rn == {"q1": {"d1": 3.5}}


class TestConfig:
    def test_cli_parse(self):
        parser = ArgumentParser((ModelArguments, DataArguments, TrainingArguments))
        m, d, t = parser.parse(
            [
                "--model_name_or_path", "bert-base-uncased",
                "--untie_encoder",
                "--train_n_passages", "4",
                "--learning_rate", "1e-5",
                "--negatives_x_device",
            ]
        )
        assert m.model_name_or_path == "bert-base-uncased"
        assert m.untie_encoder is True
        assert d.train_n_passages == 4
        assert t.learning_rate == 1e-5
        assert t.negatives_x_device is True

    def test_json_parse(self, tmp_path):
        import json

        cfg = tmp_path / "cfg.json"
        cfg.write_text(json.dumps({"model_name_or_path": "t5-base", "pooling": "mean"}))
        parser = ArgumentParser((ModelArguments,))
        (m,) = parser.parse([str(cfg)])
        assert m.model_name_or_path == "t5-base"
        assert m.pooling == "mean"

    def test_unknown_flag_raises(self):
        parser = ArgumentParser((ModelArguments,))
        with pytest.raises(ValueError):
            parser.parse(["--bogus", "1"])

    def test_eq_flag_form(self):
        parser = ArgumentParser((DataArguments,))
        (d,) = parser.parse(["--q_max_len=64"])
        assert d.q_max_len == 64
