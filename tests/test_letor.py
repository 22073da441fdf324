"""Classic features, RankLib-format IO, coordinate ascent, RankSVM."""

import numpy as np
import pytest

from openmatch_tpu.letor.classic_extractor import ClassicExtractor, Corpus
from openmatch_tpu.letor.coor_ascent import CoorAscent, ndcg_at_k_grouped
from openmatch_tpu.letor.features import (
    FeatureSet,
    kfold_split,
    load_feature_file,
    parse_feature_line,
    save_feature_file,
    scores_to_trec,
)
from openmatch_tpu.letor.ranksvm import RankSVM


class TestClassicExtractor:
    def setup_method(self):
        self.corpus = Corpus({
            "d1": "the cat sat on the mat",
            "d2": "dogs and cats living together",
            "d3": "quantum computing with qubits",
        })
        self.docs_terms, self.df, self.total_df, self.avg_len = self.corpus.cnt_corpus()

    def _ex(self, query, doc):
        q_terms, _ = self.corpus.text2lm(query)
        return ClassicExtractor(q_terms, self.docs_terms[doc], self.df,
                                self.total_df, self.avg_len)

    def test_text2lm(self):
        terms, n = self.corpus.text2lm("The cat, the CAT!")
        assert terms == {"the": 2, "cat": 2}
        assert n == 4

    def test_all_features_present(self):
        feats = self._ex("cat mat", "d1").get_feature()
        assert set(feats) == {
            "lm", "lm_dir", "lm_jm", "lm_twoway", "bm25",
            "coordinate", "cosine", "tf_idf", "bool_and", "bool_or",
        }

    def test_matching_beats_nonmatching(self):
        match = self._ex("cat mat", "d1").get_feature()
        miss = self._ex("cat mat", "d3").get_feature()
        for name in ("lm", "lm_dir", "lm_jm", "tf_idf", "coordinate", "bm25"):
            assert match[name] > miss[name], name

    def test_bool_features(self):
        full = self._ex("cat mat", "d1").get_feature()
        assert full["bool_and"] == 1 and full["bool_or"] == 1
        partial = self._ex("cat quantum", "d1").get_feature()
        assert partial["bool_and"] == 0 and partial["bool_or"] == 1
        none = self._ex("qubits", "d1").get_feature()
        assert none["bool_or"] == 0

    def test_lm_hand_computed(self):
        # query "cat" on d1: tf(cat)=1, doc_len=6 -> log(1/6) * 1
        ex = self._ex("cat", "d1")
        assert ex.lm() == pytest.approx(np.log(1 / 6))

    def test_empty_doc(self):
        ex = ClassicExtractor({"cat": 1}, {}, self.df, self.total_df, self.avg_len)
        assert ex.lm() == pytest.approx(np.log(1e-10))
        assert ex.bm25() == 0.0


class TestFeatureIO:
    def test_parse_line(self):
        label, qid, vec, docid = parse_feature_line("2 id:q7 1:0.5 2:1.5 3:-1 # d9")
        assert (label, qid, docid) == (2.0, "q7", "d9")
        assert vec == [0.5, 1.5, -1.0]

    def test_roundtrip(self, tmp_path):
        fs = FeatureSet(["q1", "q1", "q2"], ["d1", "d2", "d3"],
                        np.array([1, 0, 1]), np.array([[0.1, 2], [0.3, 4], [0.5, 6]]))
        path = tmp_path / "feats.txt"
        save_feature_file(fs, str(path))
        fs2 = load_feature_file(str(path))
        assert fs2.qids == fs.qids and fs2.docids == fs.docids
        np.testing.assert_allclose(fs2.features, fs.features)

    def test_kfold_by_query(self):
        fs = FeatureSet(
            [f"q{i}" for i in range(6) for _ in range(2)],
            [f"d{i}" for i in range(12)],
            np.zeros(12), np.zeros((12, 2)),
        )
        folds = kfold_split(fs, 3, seed=0)
        assert len(folds) == 3
        for train, test in folds:
            assert set(train.qids).isdisjoint(set(test.qids))
            assert len(test.qids) == 4  # 2 queries x 2 docs


def _separable_features(n_queries=12, docs_per_q=8, seed=0):
    """Feature 0 is informative (label + noise), feature 1 is noise."""
    rng = np.random.RandomState(seed)
    qids, docids, labels, rows = [], [], [], []
    for q in range(n_queries):
        for d in range(docs_per_q):
            label = 1 if d < 2 else 0
            qids.append(f"q{q}")
            docids.append(f"q{q}d{d}")
            labels.append(label)
            rows.append([label + rng.randn() * 0.3, rng.randn()])
    return FeatureSet(qids, docids, np.array(labels), np.array(rows))


class TestCoorAscent:
    def test_learns_informative_feature(self):
        fs = _separable_features()
        model = CoorAscent(metric_k=10, n_restarts=2, n_max_iters=10, seed=0)
        model.fit(fs)
        assert abs(model.weights[0]) > abs(model.weights[1])
        assert model.evaluate(fs) > 0.8

    def test_beats_random_baseline(self):
        fs = _separable_features(seed=1)
        model = CoorAscent(metric_k=10, n_restarts=2, seed=1).fit(fs)
        groups = fs.query_groups()
        rng = np.random.RandomState(0)
        random_scores = rng.randn(len(fs))
        rand_m = model._mean_metric(fs, groups, random_scores)
        assert model.evaluate(fs) > rand_m + 0.1

    def test_save_load(self, tmp_path):
        fs = _separable_features()
        model = CoorAscent(n_restarts=1, n_max_iters=3).fit(fs)
        p = tmp_path / "ca.npz"
        model.save(str(p))
        loaded = CoorAscent.load(str(p))
        np.testing.assert_allclose(loaded.predict(fs), model.predict(fs))

    def test_ndcg_grouped(self):
        labels = np.array([2.0, 1.0, 0.0])
        perfect = ndcg_at_k_grouped(labels, np.array([3.0, 2.0, 1.0]), 10)
        assert perfect == pytest.approx(1.0)
        worst = ndcg_at_k_grouped(labels, np.array([1.0, 2.0, 3.0]), 10)
        assert worst < 1.0


class TestRankSVM:
    def test_learns_informative_feature(self):
        fs = _separable_features(seed=2)
        model = RankSVM(epochs=50, seed=0).fit(fs)
        ca = CoorAscent(metric_k=10)
        m = ca._mean_metric(fs, fs.query_groups(), model.predict(fs))
        assert m > 0.8

    def test_scores_to_trec(self):
        fs = _separable_features(n_queries=2, docs_per_q=2)
        res = scores_to_trec(fs, np.arange(4, dtype=float))
        assert set(res) == {"q0", "q1"}
        assert res["q1"]["q1d1"] == 3.0
