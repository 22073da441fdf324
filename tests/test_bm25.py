"""Native BM25 engine: scoring correctness vs a numpy re-derivation,
persistence, analyzer, and retriever wrapper."""

import math

import numpy as np
import pytest

from openmatch_tpu.bm25.engine import BM25Index, BM25Retriever, SimpleAnalyzer


def bm25_numpy(docs_tokens, query_tokens, k1=0.9, b=0.4):
    """Reference scoring: Lucene idf = ln(1 + (N - df + .5)/(df + .5))."""
    N = len(docs_tokens)
    avg = sum(len(d) for d in docs_tokens) / N
    df = {}
    for d in docs_tokens:
        for t in set(d):
            df[t] = df.get(t, 0) + 1
    scores = np.zeros(N)
    for t in query_tokens:
        if t not in df:
            continue
        idf = math.log(1 + (N - df[t] + 0.5) / (df[t] + 0.5))
        for i, d in enumerate(docs_tokens):
            tf = d.count(t)
            if tf == 0:
                continue
            scores[i] += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(d) / avg))
    return scores


@pytest.fixture(scope="module")
def plain_analyzer():
    return SimpleAnalyzer(stopwords=False, stem=False)


class TestBM25Scoring:
    def test_matches_numpy(self, plain_analyzer):
        docs = [
            "the cat sat on the mat",
            "dogs and cats living together happily",
            "the quick brown fox jumps over the lazy dog",
            "cat cat cat",
        ]
        idx = BM25Index(analyzer=plain_analyzer)
        for i, text in enumerate(docs):
            idx.add(f"d{i}", text)
        idx.finalize()

        query = "cat dog"
        results = dict(idx.search(query, k=10))
        docs_tokens = [plain_analyzer(t) for t in docs]
        expected = bm25_numpy(docs_tokens, plain_analyzer(query))
        for i, exp in enumerate(expected):
            if exp > 0:
                assert results[f"d{i}"] == pytest.approx(exp, rel=1e-5)
            else:
                assert f"d{i}" not in results

    def test_ranking_order(self, plain_analyzer):
        idx = BM25Index(analyzer=plain_analyzer)
        idx.add("exact", "apple banana")
        idx.add("partial", "apple cherry date elderberry fig")
        idx.add("none", "grape kiwi")
        idx.finalize()
        hits = idx.search("apple banana", k=10)
        assert hits[0][0] == "exact"
        assert [h[0] for h in hits] == ["exact", "partial"]

    def test_unknown_query_terms(self, plain_analyzer):
        idx = BM25Index(analyzer=plain_analyzer)
        idx.add("d0", "hello world")
        idx.finalize()
        assert idx.search("zzz qqq", k=5) == []

    def test_k_truncation(self, plain_analyzer):
        idx = BM25Index(analyzer=plain_analyzer)
        for i in range(20):
            idx.add(f"d{i}", "common term here")
        idx.finalize()
        assert len(idx.search("common", k=5)) == 5

    def test_save_load(self, plain_analyzer, tmp_path):
        idx = BM25Index(analyzer=plain_analyzer)
        idx.add("a", "alpha beta gamma")
        idx.add("b", "beta delta")
        idx.finalize()
        before = idx.search("beta", k=5)
        idx.save(str(tmp_path / "idx"))
        loaded = BM25Index.load(str(tmp_path / "idx"), analyzer=plain_analyzer)
        assert loaded.num_docs == 2
        assert loaded.search("beta", k=5) == before


class TestAnalyzer:
    def test_tokenize(self):
        a = SimpleAnalyzer(stopwords=False, stem=False)
        assert a("Hello, World! 42x") == ["hello", "world", "42x"]

    def test_stopwords_if_available(self):
        a = SimpleAnalyzer(stopwords=True, stem=False)
        toks = a("the cat and the hat")
        if a._stop:  # nltk data present
            assert "the" not in toks and "cat" in toks


class TestRetriever:
    def test_retrieve_dict(self, plain_analyzer):
        corpus = [
            {"id": "d1", "title": "feline", "text": "cats purr"},
            {"id": "d2", "title": "canine", "text": "dogs bark"},
        ]
        r = BM25Retriever(analyzer=plain_analyzer).index_corpus(iter(corpus))
        res = r.retrieve({"q1": "cats", "q2": "dogs bark"}, k=5)
        assert list(res["q1"]) == ["d1"]
        assert res["q2"]["d2"] > 0
