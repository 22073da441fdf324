"""Data pipeline: sampling semantics, sharding, collators, inference sets."""

import json

import numpy as np
import pytest

from openmatch_tpu.config import DataArguments
from openmatch_tpu.data.collators import InferenceCollator, PairCollator, QPCollator, pad_ids
from openmatch_tpu.data.inference_dataset import InferenceDataset
from openmatch_tpu.data.loader import batched, prefetch
from openmatch_tpu.data.train_dataset import DRTrainDataset, RRTrainDataset, count_lines


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    from transformers import BertTokenizerFast

    d = tmp_path_factory.mktemp("tok")
    words = ["hello", "world", "dense", "retrieval", "passage", "query", "doc"]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
    (d / "vocab.txt").write_text("\n".join(vocab))
    return BertTokenizerFast(vocab_file=str(d / "vocab.txt"))


@pytest.fixture()
def train_file(tmp_path):
    path = tmp_path / "train.jsonl"
    rows = []
    for i in range(20):
        rows.append(
            {
                "query": f"query {i}",
                "positives": [f"hello world {i}", f"dense retrieval {i}"],
                "negatives": [f"doc {j}" for j in range(4)],
            }
        )
    path.write_text("\n".join(json.dumps(r) for r in rows))
    return str(path)


class TestDRTrainDataset:
    def _ds(self, tokenizer, train_file, **kw):
        args = DataArguments(train_path=train_file, train_n_passages=3, q_max_len=16, p_max_len=16, **kw)
        return DRTrainDataset(tokenizer, args)

    def test_len(self, tokenizer, train_file):
        assert len(self._ds(tokenizer, train_file)) == 20

    def test_structure(self, tokenizer, train_file):
        ds = self._ds(tokenizer, train_file)
        ex = next(ds.epoch_iterator(0, None))
        assert len(ex["passages"]) == 3
        assert ex["query"][0] == tokenizer.cls_token_id
        assert ex["query"][-1] == tokenizer.sep_token_id

    def test_unseeded_uses_first_positive(self, tokenizer, train_file):
        ds = self._ds(tokenizer, train_file)
        ex = next(ds.epoch_iterator(0, None))
        expected = ds._encode("hello world 0", 16)
        assert ex["passages"][0] == expected

    def test_seeded_positive_rotates_with_epoch(self, tokenizer, train_file):
        ds = self._ds(tokenizer, train_file)
        e0 = ds.process_one(
            {"query": "query", "positives": ["hello", "world"], "negatives": ["doc"] * 3},
            epoch=0, hashed_seed=4,
        )
        e1 = ds.process_one(
            {"query": "query", "positives": ["hello", "world"], "negatives": ["doc"] * 3},
            epoch=1, hashed_seed=4,
        )
        assert e0["passages"][0] == ds._encode("hello", 16)  # (4+0)%2 = 0
        assert e1["passages"][0] == ds._encode("world", 16)  # (4+1)%2 = 1

    def test_short_negatives_cycle_unseeded(self, tokenizer, train_file):
        ds = self._ds(tokenizer, train_file)
        ex = ds.process_one(
            {"query": "q", "positives": ["hello"], "negatives": ["doc"]},
            epoch=0, hashed_seed=None,
        )
        # negative_size=2 from 1 negative -> doubled then truncated
        assert ex["passages"][1] == ex["passages"][2] == ds._encode("doc", 16)

    def test_short_negatives_seeded_vary_per_example_deterministically(
            self, tokenizer, train_file):
        """Seeded short-negative sampling must differ BETWEEN examples in
        an epoch (a (seed, epoch)-only RNG hands every short example the
        identical index pattern — silent diversity collapse vs the
        reference's advancing global RNG) yet reproduce run-to-run."""
        args = DataArguments(train_path=train_file, train_n_passages=9,
                             q_max_len=16, p_max_len=16)
        ds = DRTrainDataset(tokenizer, args)
        # 4 in-vocab, mutually distinguishable negatives; 4 < 8 -> choices
        negs = ["hello", "world", "dense", "retrieval"]

        def draws(query, epoch):
            ex = ds.process_one(
                {"query": query, "positives": ["hello"], "negatives": negs},
                epoch=epoch, hashed_seed=7)
            return ex["passages"][1:]

        # deterministic: same example + seed + epoch -> identical
        assert draws("query a", 0) == draws("query a", 0)
        # varies across examples and across epochs
        assert draws("query a", 0) != draws("query b", 0)
        assert draws("query a", 0) != draws("query a", 1)

    def test_epoch_offset_window(self, tokenizer, train_file):
        args = DataArguments(train_path=train_file, train_n_passages=3,
                             q_max_len=16, p_max_len=16, negative_passage_no_shuffle=True)
        ds = DRTrainDataset(tokenizer, args)
        ex = ds.process_one(
            {"query": "q", "positives": ["hello"], "negatives": ["doc 0", "doc 1", "doc 2", "doc 3"]},
            epoch=0, hashed_seed=None,
        )
        assert ex["passages"][1:] == [ds._encode("doc 0", 16), ds._encode("doc 1", 16)]

    def test_shard_disjoint_cover(self, tokenizer, tmp_path):
        # queries of distinct token lengths so shards are distinguishable
        path = tmp_path / "t.jsonl"
        rows = [
            {"query": "hello " * (i + 1), "positives": ["world"], "negatives": ["doc"]}
            for i in range(12)
        ]
        path.write_text("\n".join(json.dumps(r) for r in rows))
        args = DataArguments(train_path=str(path), train_n_passages=2, q_max_len=32, p_max_len=16)
        seen = []
        for shard in range(4):
            ds = DRTrainDataset(tokenizer, args, shard_index=shard, num_shards=4)
            seen.append([tuple(e["query"]) for e in ds.epoch_iterator(0, None)])
        assert sum(len(s) for s in seen) == 12
        flat = [q for s in seen for q in s]
        assert len(set(flat)) == 12  # all distinct examples, no duplication

    def test_shuffle_deterministic(self, tokenizer, tmp_path):
        path = tmp_path / "t.jsonl"
        rows = [
            {"query": "hello " * (i + 1), "positives": ["world"], "negatives": ["doc"]}
            for i in range(12)
        ]
        path.write_text("\n".join(json.dumps(r) for r in rows))
        args = DataArguments(train_path=str(path), train_n_passages=2, q_max_len=32, p_max_len=16)
        ds = DRTrainDataset(tokenizer, args, shuffle_seed=13)
        a = [tuple(e["query"]) for e in ds.epoch_iterator(1, 99)]
        b = [tuple(e["query"]) for e in ds.epoch_iterator(1, 99)]
        c = [tuple(e["query"]) for e in ds.epoch_iterator(2, 99)]
        assert a == b
        assert a != c  # epoch changes the order


class TestRRTrainDataset:
    def test_pair_structure(self, tokenizer, train_file):
        args = DataArguments(train_path=train_file, q_max_len=8, p_max_len=8)
        ds = RRTrainDataset(tokenizer, args)
        ex = next(ds.epoch_iterator(0, None))
        assert ex["pos_pair"][0] == tokenizer.cls_token_id
        assert len(ex["pos_pair"]) <= 8 + 8 + 2
        assert "neg_pair" in ex


class TestCollators:
    def test_pad_ids(self):
        out = pad_ids([[1, 2, 3], [4]], max_len=5, pad_id=0)
        np.testing.assert_array_equal(out["input_ids"], [[1, 2, 3, 0, 0], [4, 0, 0, 0, 0]])
        np.testing.assert_array_equal(out["attention_mask"], [[1, 1, 1, 0, 0], [1, 0, 0, 0, 0]])

    def test_qp_collator_flattens(self):
        coll = QPCollator(pad_token_id=0, q_max_len=4, p_max_len=6)
        batch = coll([
            {"query": [1, 2], "passages": [[3], [4, 5]]},
            {"query": [6], "passages": [[7], [8]]},
        ])
        assert batch["query"]["input_ids"].shape == (2, 4)
        assert batch["passage"]["input_ids"].shape == (4, 6)

    def test_pair_collator_len(self):
        coll = PairCollator(pad_token_id=0, q_max_len=4, p_max_len=6)
        batch = coll([{"pos_pair": [1], "neg_pair": [2]}])
        assert batch["pos_pairs"]["input_ids"].shape == (1, 12)

    def test_inference_collator(self):
        coll = InferenceCollator(pad_token_id=0, max_len=4)
        ids, batch = coll([{"id": "d1", "input_ids": [5, 6]}])
        assert ids == ["d1"]
        assert batch["input_ids"].shape == (1, 4)


class TestInferenceDataset:
    def test_jsonl_with_template(self, tokenizer, tmp_path):
        path = tmp_path / "corpus.jsonl"
        path.write_text("\n".join(
            json.dumps({"id": f"d{i}", "title": "hello", "text": "world"}) for i in range(5)
        ))
        args = DataArguments(corpus_path=str(path), doc_template="<title> <text>", p_max_len=8)
        ds = InferenceDataset.load(tokenizer, args, is_query=False)
        items = list(ds)
        assert len(items) == 5
        assert items[0]["id"] == "d0"
        decoded = tokenizer.decode(items[0]["input_ids"])
        assert "hello" in decoded and "world" in decoded

    def test_tsv(self, tokenizer, tmp_path):
        path = tmp_path / "queries.tsv"
        path.write_text("q1\thello world\nq2\tdense retrieval\n")
        args = DataArguments(query_path=str(path), query_template="<text>",
                             query_column_names="id,text", q_max_len=8)
        ds = InferenceDataset.load(tokenizer, args, is_query=True)
        items = list(ds)
        assert [i["id"] for i in items] == ["q1", "q2"]

    def test_to_dict(self, tokenizer, tmp_path):
        path = tmp_path / "c.jsonl"
        path.write_text(json.dumps({"id": "d7", "text": "hello"}))
        args = DataArguments(corpus_path=str(path), doc_template="<text>", p_max_len=8)
        ds = InferenceDataset.load(tokenizer, args, is_query=False)
        d = ds.to_dict()
        assert d["d7"]["text"] == "hello"

    def test_sharded(self, tokenizer, tmp_path):
        path = tmp_path / "c.jsonl"
        path.write_text("\n".join(json.dumps({"id": f"d{i}", "text": "hello"}) for i in range(10)))
        args = DataArguments(corpus_path=str(path), doc_template="<text>", p_max_len=8)
        all_ids = []
        for s in range(3):
            ds = InferenceDataset.load(tokenizer, args, is_query=False, shard_index=s, num_shards=3)
            all_ids += [i["id"] for i in ds]
        assert sorted(all_ids) == [f"d{i}" for i in range(10)]


class TestLoader:
    def test_batched_pad_to_full(self):
        items = list(range(7))
        batches = list(batched(items, 3, lambda xs: xs, pad_to_full=True))
        assert batches[0] == ([0, 1, 2], 3)
        assert batches[2] == ([6, 6, 6], 1)

    def test_batched_drop_last(self):
        items = list(range(7))
        batches = list(batched(items, 3, lambda xs: xs, drop_last=True))
        assert len(batches) == 2

    def test_prefetch_order(self):
        assert list(prefetch(iter(range(100)), depth=4)) == list(range(100))


class TestPreTokenizedInputs:
    """The reference's train jsonl holds token-id lists; fast tokenizers
    reject them in encode_plus, so the encode helpers route ids through
    build_inputs_with_special_tokens."""

    def test_encode_one_ids(self, tokenizer):
        from openmatch_tpu.data.tokenization import encode_one

        ids = tokenizer.encode("hello world", add_special_tokens=False)
        out = encode_one(tokenizer, ids, max_length=16)
        assert out == tokenizer.encode("hello world")  # with specials

    def test_encode_one_truncates(self, tokenizer):
        from openmatch_tpu.data.tokenization import encode_one

        ids = list(range(5, 10)) 
        out = encode_one(tokenizer, ids, max_length=4)
        assert len(out) == 4
        assert out[0] == tokenizer.cls_token_id and out[-1] == tokenizer.sep_token_id

    def test_encode_pair_ids_longest_first(self, tokenizer):
        from openmatch_tpu.data.tokenization import encode_pair

        a = [5] * 10
        b = [6] * 3
        out = encode_pair(tokenizer, a, b, max_length=12)
        assert len(out) == 12
        assert out.count(6) == 3  # shorter side untouched

    def test_encode_pair_mixed_text_and_ids(self, tokenizer):
        """Rerank over a pre-tokenized corpus: a TEXT query paired with an
        id-list doc must encode like the all-text pair (fast tokenizers
        reject encode_plus((str, List[int])) outright)."""
        from openmatch_tpu.data.tokenization import (
            encode_pair, encode_pair_with_segments)

        doc_ids = tokenizer.encode("dense retrieval", add_special_tokens=False)
        want = encode_pair(tokenizer, "hello world", "dense retrieval", 16)
        assert encode_pair(tokenizer, "hello world", doc_ids, 16) == want
        ids, segs = encode_pair_with_segments(
            tokenizer, "hello world", doc_ids, 16)
        assert ids == want
        assert segs[:3] == [0, 0, 0] and segs[-1] == 1  # q=0, passage=1

    def test_shard_manifest_detects_missing_shard(self, tmp_path):
        """Sidecar shard manifests: a gap in the rank sequence must raise
        at load time, not silently search a partial index."""
        from openmatch_tpu.retriever.encoder import (
            list_shards, save_embeddings, shard_path)

        emb = np.ones((3, 4), np.float16)
        for rank in (0, 2):  # rank 1 never encoded
            save_embeddings(emb, [f"d{rank}{i}" for i in range(3)],
                            shard_path(str(tmp_path), "corpus", rank),
                            num_shards=3)
        with pytest.raises(ValueError, match=r"ranks \[1\]"):
            list_shards(str(tmp_path), "corpus")
        # completing the set heals it
        save_embeddings(emb, ["d10", "d11", "d12"],
                        shard_path(str(tmp_path), "corpus", 1), num_shards=3)
        assert len(list_shards(str(tmp_path), "corpus")) == 3

    def test_dr_dataset_with_id_lists(self, tokenizer, tmp_path):
        path = tmp_path / "t.jsonl"
        qids = tokenizer.encode("hello", add_special_tokens=False)
        pids = tokenizer.encode("world", add_special_tokens=False)
        path.write_text(json.dumps({"query": qids, "positives": [pids], "negatives": [pids]}) + "\n")
        args = DataArguments(train_path=str(path), train_n_passages=2, q_max_len=8, p_max_len=8)
        ds = DRTrainDataset(tokenizer, args)
        ex = next(ds.epoch_iterator(0, None))
        assert ex["query"] == tokenizer.encode("hello")


class TestPrefetchExceptions:
    def test_upstream_error_propagates(self):
        """A crashing producer must raise, not truncate (review finding)."""
        def bad():
            yield 1
            yield 2
            raise ValueError("boom at item 3")

        out = []
        with pytest.raises(ValueError, match="boom"):
            for x in prefetch(bad(), depth=2):
                out.append(x)
        assert out == [1, 2]
