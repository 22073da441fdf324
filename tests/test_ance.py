"""ANCE loop: filesystem contract, negative sampling, full alternating run."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openmatch_tpu.ance.loop import (
    AnceConfig,
    build_ann_lines,
    generate_hard_negatives,
    latest_ann_data,
    run_ance_alternating,
    write_ann_data,
)


class TestFilesystemContract:
    def test_empty_dir(self, tmp_path):
        assert latest_ann_data(str(tmp_path)) == (None, -1, None)

    def test_roundtrip_and_latest(self, tmp_path):
        write_ann_data(str(tmp_path), 0, ['{"a": 1}'], {"ndcg": 0.1})
        write_ann_data(str(tmp_path), 3, ['{"b": 2}'], {"ndcg": 0.3})
        path, gen, metrics = latest_ann_data(str(tmp_path))
        assert gen == 3
        assert metrics["ndcg"] == 0.3
        assert json.loads(open(path).read()) == {"b": 2}

    def test_no_tmp_left_behind(self, tmp_path):
        write_ann_data(str(tmp_path), 0, ["x"])
        assert not any(n.endswith(".tmp") for n in os.listdir(tmp_path))


class TestNegativeSampling:
    def test_excludes_positives_and_caps(self):
        retrieved = {"q1": {f"d{i}": float(100 - i) for i in range(10)}}
        qrels = {"q1": ["d0", "d1"]}
        cfg = AnceConfig(topk_training=5, negative_sample=2, seed=0)
        negs = generate_hard_negatives(retrieved, qrels, cfg)
        assert len(negs["q1"]) == 2
        assert set(negs["q1"]) <= {"d2", "d3", "d4"}  # top-5 minus positives

    def test_deterministic_per_generation(self):
        retrieved = {"q1": {f"d{i}": float(100 - i) for i in range(50)}}
        qrels = {"q1": []}
        cfg = AnceConfig(topk_training=50, negative_sample=5, seed=7)
        a = generate_hard_negatives(retrieved, qrels, cfg, generation=1)
        b = generate_hard_negatives(retrieved, qrels, cfg, generation=1)
        c = generate_hard_negatives(retrieved, qrels, cfg, generation=2)
        assert a == b
        assert a != c

    def test_build_ann_lines(self):
        negs = {"q1": ["d2"], "q2": ["d9"]}  # q2's positive not in corpus
        qrels = {"q1": ["d1"], "q2": ["dX"]}
        tq = {"q1": [1, 2], "q2": [3]}
        tc = {"d1": [10], "d2": [20], "d9": [90]}
        lines = list(build_ann_lines(negs, qrels, tq, tc))
        assert len(lines) == 1
        obj = json.loads(lines[0])
        assert obj == {"query": [1, 2], "positives": [[10]], "negatives": [[20]]}


class TestAlternating:
    def test_refresh_improves_and_swaps(self, mesh8, tmp_path):
        """Full miniature ANCE: train on random negatives, refresh with
        model-mined hard negatives, verify the loop swaps files and trains."""
        from openmatch_tpu.config import DataArguments, TrainingArguments
        from openmatch_tpu.data.collators import QPCollator
        from openmatch_tpu.data.loader import batched
        from openmatch_tpu.data.train_dataset import DRTrainDataset
        from openmatch_tpu.models.bert import BertConfig
        from openmatch_tpu.models.dr_model import DRModel
        from openmatch_tpu.train.dr_trainer import DRTrainer
        from transformers import BertTokenizerFast

        topics = [f"topic{i}" for i in range(8)]
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "about", "document", "query"] + topics
        (tmp_path / "vocab.txt").write_text("\n".join(vocab))
        tokenizer = BertTokenizerFast(vocab_file=str(tmp_path / "vocab.txt"))

        # initial data: easy random negatives
        rows = []
        for i in range(8):
            rows.append({
                "query": f"query about topic{i}",
                "positives": [f"document about topic{i}"],
                "negatives": [f"document about topic{(i + 4) % 8}"],
            })
        init_path = tmp_path / "gen_init.jsonl"
        init_path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")

        cfg = BertConfig(vocab_size=32, hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=32,
                         max_position_embeddings=16, add_pooler=False)
        model = DRModel(encoder_config=cfg, normalize=True, dtype=jnp.float32)
        params = model.init_params(jax.random.PRNGKey(0))
        args = TrainingArguments(learning_rate=3e-3, warmup_ratio=0.0,
                                 logging_steps=1000, save_steps=0)
        trainer = DRTrainer(model, params, args, total_steps=10_000, mesh=mesh8)

        data_args = DataArguments(train_path=str(init_path), train_n_passages=2,
                                  q_max_len=8, p_max_len=8)
        collator = QPCollator(pad_token_id=tokenizer.pad_token_id, q_max_len=8, p_max_len=8)

        def make_data_iter(path):
            da = DataArguments(train_path=path, train_n_passages=2, q_max_len=8, p_max_len=8)
            ds = DRTrainDataset(tokenizer, da)
            return batched(ds.epoch_iterator(0, None), 8, collator, drop_last=True)

        refreshed_with = []

        def refresh_fn(tr, generation):
            # mine negatives with the CURRENT params via brute-force search
            from openmatch_tpu.ance.loop import AnceConfig, build_ann_lines, generate_hard_negatives, write_ann_data

            enc = lambda text: tokenizer.encode_plus(
                text, truncation="only_first", max_length=8, padding=False,
                return_attention_mask=False, return_token_type_ids=False)["input_ids"]
            corpus = {f"d{i}": enc(f"document about topic{i}") for i in range(8)}
            queries = {f"q{i}": enc(f"query about topic{i}") for i in range(8)}
            qrels = {f"q{i}": [f"d{i}"] for i in range(8)}

            from openmatch_tpu.data.collators import pad_ids

            p = jax.device_get(tr.state.params)
            c_batch = pad_ids(list(corpus.values()), 8, tokenizer.pad_token_id)
            q_batch = pad_ids(list(queries.values()), 8, tokenizer.pad_token_id)
            c_reps = np.asarray(model.encode_passage(p, jnp.asarray(c_batch["input_ids"]), jnp.asarray(c_batch["attention_mask"])))
            q_reps = np.asarray(model.encode_query(p, jnp.asarray(q_batch["input_ids"]), jnp.asarray(q_batch["attention_mask"])))
            scores = q_reps @ c_reps.T
            retrieved = {
                f"q{i}": {f"d{j}": float(scores[i, j]) for j in range(8)}
                for i in range(8)
            }
            cfg = AnceConfig(ann_dir=str(tmp_path / "ann"), topk_training=8,
                             negative_sample=1, seed=0)
            negatives = generate_hard_negatives(retrieved, qrels, cfg, generation)
            refreshed_with.append(negatives)
            return write_ann_data(str(tmp_path / "ann"), generation,
                                  build_ann_lines(negatives, qrels, queries, corpus))

        used = run_ance_alternating(trainer, make_data_iter, refresh_fn,
                                    str(init_path), steps_per_generation=3,
                                    num_generations=3)
        # the LAST generation's refresh is skipped (its data file would
        # never be trained on), so 3 generations -> 2 published files,
        # both consumed
        assert len(used) == 3
        assert used[1].endswith("ann_training_data_0")
        assert used[2].endswith("ann_training_data_1")
        assert int(trainer.state.step) == 9
        assert len(refreshed_with) == 2
        # mined negatives never include the positive
        for gen in refreshed_with:
            for qid, negs in gen.items():
                assert qid.replace("q", "d") not in negs
