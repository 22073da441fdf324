"""Offline preprocessing: qrels/queries/collection IO, hard-negative mining."""

import json

import numpy as np
import pytest

from openmatch_tpu.data.preprocessor import (
    ShardedJsonlWriter,
    TrainPreProcessor,
    load_ranking_negatives,
    read_collection_tsv,
    read_qrel,
    read_queries,
)


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    from transformers import BertTokenizerFast

    d = tmp_path_factory.mktemp("tok")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "hello", "world", "title"]
    (d / "vocab.txt").write_text("\n".join(vocab))
    return BertTokenizerFast(vocab_file=str(d / "vocab.txt"))


class TestIO:
    def test_read_queries(self, tmp_path):
        p = tmp_path / "q.tsv"
        p.write_text("q1\thello world\nq2\tworld\n")
        assert read_queries(str(p)) == {"q1": "hello world", "q2": "world"}

    def test_read_qrel(self, tmp_path):
        p = tmp_path / "qrels.tsv"
        p.write_text("q1\t0\td1\t1\nq1\t0\td2\t1\nq2\t0\td3\t1\n")
        assert read_qrel(str(p)) == {"q1": ["d1", "d2"], "q2": ["d3"]}

    def test_read_collection(self, tmp_path):
        p = tmp_path / "coll.tsv"
        p.write_text("d1\ttitle\thello\nd2\t\tworld\n")
        coll = read_collection_tsv(str(p))
        assert coll["d1"]["text"] == "hello"
        assert coll["d2"]["title"] == ""


class TestTrainPreProcessor:
    def test_process_one(self, tokenizer, tmp_path):
        proc = TrainPreProcessor(
            queries={"q1": "hello"},
            collection={
                "d1": {"text_id": "d1", "title": "title", "text": "hello"},
                "d2": {"text_id": "d2", "title": "", "text": "world"},
            },
            tokenizer=tokenizer,
            doc_template="<title> <text>",
            allow_not_found=True,
        )
        line = proc.process_one(("q1", ["d1"], ["d2"]))
        obj = json.loads(line)
        assert obj["query"] == tokenizer.encode("hello", add_special_tokens=False)
        assert obj["positives"] == [tokenizer.encode("title hello", add_special_tokens=False)]
        assert obj["negatives"] == [tokenizer.encode("world", add_special_tokens=False)]


class TestHardNegativeMining:
    def test_load_ranking_drops_positives(self, tmp_path):
        run = tmp_path / "run.trec"
        run.write_text(
            "q1 Q0 d1 1 3.0 x\n"   # positive -> dropped
            "q1 Q0 d2 2 2.0 x\n"
            "q1 Q0 d3 3 1.0 x\n"
            "q2 Q0 d4 1 9.0 x\n"
            "q2 Q0 d5 2 8.0 x\n"
        )
        rel = {"q1": ["d1"], "q2": ["d9"]}
        out = list(load_ranking_negatives(str(run), rel, n_sample=10, depth=10, seed=0))
        assert len(out) == 2
        q1 = out[0]
        assert q1[0] == "q1" and q1[1] == ["d1"] and set(q1[2]) == {"d2", "d3"}
        q2 = out[1]
        assert set(q2[2]) == {"d4", "d5"}

    def test_queries_missing_from_qrels_are_skipped(self, tmp_path):
        """A run query with no qrels entry cannot form a training example;
        it must be skipped, not KeyError mid-file (the reference crashes
        there, losing everything after the first unlabeled query)."""
        run = tmp_path / "run.trec"
        run.write_text(
            "q1 Q0 d2 1 3.0 x\n"
            "qX Q0 d3 1 9.0 x\n"   # qX absent from qrels
            "q2 Q0 d5 1 8.0 x\n"
        )
        rel = {"q1": ["d1"], "q2": ["d9"]}
        out = list(load_ranking_negatives(str(run), rel, n_sample=5, depth=5,
                                          seed=0))
        assert [row[0] for row in out] == ["q1", "q2"]
        assert out[1][2] == ["d5"]

    def test_depth_and_sample_caps(self, tmp_path):
        run = tmp_path / "run.trec"
        lines = [f"q1 Q0 d{i} {i} {100 - i} x" for i in range(1, 21)]
        run.write_text("\n".join(lines) + "\n")
        out = list(load_ranking_negatives(str(run), {"q1": []}, n_sample=3, depth=5, seed=1))
        (qid, pos, negs), = out
        assert len(negs) == 3
        assert set(negs) <= {f"d{i}" for i in range(1, 6)}  # only from depth window


class TestShardedWriter:
    def test_shards(self, tmp_path):
        w = ShardedJsonlWriter(str(tmp_path), shard_size=3)
        for i in range(7):
            w.write(json.dumps({"i": i}))
        w.close()
        names = sorted(p.name for p in tmp_path.iterdir())
        assert names == ["split00.jsonl", "split01.jsonl", "split02.jsonl"]
        assert len((tmp_path / "split02.jsonl").read_text().strip().split("\n")) == 1


class TestScaleT5:
    def test_scale_flax_tree(self):
        import sys
        sys.path.insert(0, "scripts")
        from scale_t5_weights import scale_flax_encoder

        params = {
            "shared": {"embedding": np.ones((4, 4))},
            "layer_0": {
                "self_attn": {"o": {"kernel": np.ones((2, 2))}},
                "ff": {"wi": {"kernel": np.ones((2, 2))}, "wo": {"kernel": np.ones((2, 2))}},
            },
        }
        out = scale_flax_encoder(params, num_layers=1)
        assert out["shared"]["embedding"][0, 0] == 0.01
        assert out["layer_0"]["self_attn"]["o"]["kernel"][0, 0] == 0.01
        assert out["layer_0"]["ff"]["wi"]["kernel"][0, 0] == 0.1
