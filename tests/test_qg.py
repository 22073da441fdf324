"""T5 seq2seq generation + ContrastQG pipeline."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from openmatch_tpu.models.t5 import (
    T5Config,
    T5Seq2Seq,
    convert_t5_encdec_state_dict,
    seq2seq_loss,
    shift_right,
)
from openmatch_tpu.research.qg import QGModel, build_contrast_pairs
from openmatch_tpu.train.state import TrainState


def tiny_cfg(vocab=32):
    return T5Config(
        vocab_size=vocab, d_model=16, d_kv=4, d_ff=32, num_layers=1,
        num_decoder_layers=1, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=20,
        decoder_start_token_id=0, pad_token_id=0,
    )


class TestT5Seq2Seq:
    def test_teacher_forcing_matches_torch(self):
        """Full-sequence decode parity vs torch T5ForConditionalGeneration."""
        import torch
        from transformers import T5Config as HFT5Config, T5ForConditionalGeneration

        torch.manual_seed(0)
        hf_cfg = HFT5Config(
            vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_layers=2,
            num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
            relative_attention_max_distance=20, decoder_start_token_id=0,
        )
        tm = T5ForConditionalGeneration(hf_cfg)
        tm.eval()
        cfg = T5Config.from_hf_config(hf_cfg)
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params = convert_t5_encdec_state_dict(sd, cfg)

        rng = np.random.RandomState(0)
        ids = rng.randint(2, 64, (2, 9)).astype(np.int64)
        mask = np.ones((2, 9), np.int64)
        dec = rng.randint(2, 64, (2, 5)).astype(np.int64)
        dec[:, 0] = 0
        with torch.no_grad():
            expected = tm(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
                decoder_input_ids=torch.tensor(dec),
            ).logits.numpy()
        got = np.asarray(
            T5Seq2Seq(cfg, dtype=jnp.float32).apply(
                {"params": params}, jnp.array(ids), jnp.array(mask), jnp.array(dec)
            )["logits"]
        )
        np.testing.assert_allclose(got, expected, atol=3e-4)

    def test_shift_right(self):
        ids = jnp.array([[5, 6, 7]])
        out = np.asarray(shift_right(ids, start_token_id=0))
        np.testing.assert_array_equal(out, [[0, 5, 6]])

    def test_seq2seq_loss_masks_pads(self):
        logits = jnp.zeros((1, 3, 4))
        labels = jnp.array([[2, 1, 0]])
        mask = jnp.array([[1, 1, 0]])
        loss = seq2seq_loss(logits, labels, mask)
        assert float(loss) == pytest.approx(np.log(4), rel=1e-5)


class TestQGTrainingAndGeneration:
    def test_overfits_and_generates_memorized_target(self):
        """Train tiny T5 to map a fixed source to a fixed target query;
        greedy generation must reproduce it."""
        cfg = tiny_cfg()
        qg = QGModel(cfg)
        qg.init_params(jax.random.PRNGKey(0))

        src = jnp.array([[5, 6, 7, 8]], jnp.int32)
        src_mask = jnp.ones((1, 4), jnp.int32)
        target = jnp.array([[9, 10, 11, 1]], jnp.int32)  # ends with eos=1
        batch = {
            "input_ids": src, "attention_mask": src_mask,
            "labels": target, "label_mask": jnp.ones((1, 4), jnp.int32),
        }
        tx = optax.adam(5e-3)
        state = TrainState.create(qg.params, tx)
        step = qg.make_train_step()
        for _ in range(300):
            state, loss = step(state, batch)
        assert float(loss) < 0.1
        qg.params = state.params
        gen = np.asarray(qg.generate(src, src_mask, max_new_tokens=4, eos_token_id=1))
        np.testing.assert_array_equal(gen[0], [9, 10, 11, 1])


class TestSynthesisPipeline:
    """End-to-end ContrastQG driver (VERDICT r2 next #7): prepro -> seed
    QG -> BM25 subset retrieval -> pair sampling -> contrastive QG ->
    train jsonl consumable by the DR training stack. Tiny random models:
    the structural contract (every stage wired, output format trainable)
    is what's under test; generation quality needs real checkpoints."""

    def test_pipeline_produces_trainable_jsonl(self, tmp_path):
        import os

        from transformers import BertTokenizerFast

        from openmatch_tpu.config import DataArguments, TrainingArguments
        from openmatch_tpu.data.collators import QPCollator
        from openmatch_tpu.data.loader import batched
        from openmatch_tpu.data.train_dataset import DRTrainDataset
        from openmatch_tpu.drivers.qg_synthesis import load_corpus, run_pipeline
        from openmatch_tpu.models.bert import BertConfig
        from openmatch_tpu.models.dr_model import DRModel
        from openmatch_tpu.parallel.mesh import make_mesh
        from openmatch_tpu.train.dr_trainer import DRTrainer

        topics = [f"topic{i}" for i in range(8)]
        # every content word appears in every doc so ANY greedy-generated
        # seed query has BM25 term overlap (the random tiny model's output
        # vocabulary is unconstrained)
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                 "document", "query", "positive", "negative", ":"] + topics
        (tmp_path / "vocab.txt").write_text("\n".join(vocab))
        tokenizer = BertTokenizerFast(vocab_file=str(tmp_path / "vocab.txt"))

        corpus_path = tmp_path / "docs.jsonl"
        corpus_path.write_text("\n".join(
            json.dumps({"id": f"d{i}", "title": "",
                        "text": f"document query positive negative {t}"})
            for i, t in enumerate(topics)) + "\n")

        # tiny random QG/ContrastQG over the tokenizer's vocab size
        cfg = tiny_cfg(vocab=tokenizer.vocab_size)
        qg = QGModel(cfg)
        qg.init_params(jax.random.PRNGKey(0))
        cqg = QGModel(cfg)
        cqg.init_params(jax.random.PRNGKey(1))

        out_path = str(tmp_path / "synthetic.train.jsonl")
        corpus = load_corpus(str(corpus_path))
        assert corpus["d0"] == "document query positive negative topic0"
        # eos_token_id=-1: random tiny models would otherwise greedily
        # emit eos first and synthesize nothing — full-length greedy
        # sequences keep the structural test deterministic and non-empty
        n = run_pipeline(
            qg, cqg, tokenizer, corpus, out_path,
            max_src_len=16, max_new_tokens=4, batch_size=4, bm25_topk=8,
            neg_rank_range=(2, 6), seed=0, eos_token_id=-1)
        assert n >= 1 and os.path.exists(out_path)

        rows = [json.loads(l) for l in open(out_path)]
        assert len(rows) == n
        for r in rows:
            assert r["query"] and r["positives"] and r["negatives"]
            assert r["positives"][0] in corpus.values()
            assert r["negatives"][0] in corpus.values()
            assert r["positives"][0] != r["negatives"][0]

        # the synthesized file feeds the DR training stack directly
        bcfg = BertConfig(
            vocab_size=tokenizer.vocab_size, hidden_size=16,
            num_hidden_layers=1, num_attention_heads=2, intermediate_size=32,
            max_position_embeddings=32, add_pooler=False)
        model = DRModel(encoder_config=bcfg, tied=True, dtype=jnp.float32)
        params = model.init_params(jax.random.PRNGKey(2))
        data_args = DataArguments(train_path=out_path, train_n_passages=2,
                                  q_max_len=8, p_max_len=8)
        mesh1 = make_mesh(dp_size=1, tp_size=1, devices=jax.devices()[:1])
        trainer = DRTrainer(
            model, params,
            TrainingArguments(learning_rate=1e-3, warmup_ratio=0.0,
                              logging_steps=1000, save_steps=0),
            total_steps=1, mesh=mesh1)
        ds = DRTrainDataset(tokenizer, data_args)
        collator = QPCollator(pad_token_id=tokenizer.pad_token_id,
                              q_max_len=8, p_max_len=8)
        batch = next(iter(batched(ds.epoch_iterator(0, None), n, collator)))
        loss = trainer.train_step(batch)
        assert np.isfinite(float(loss))


class TestContrastPairs:
    def test_pairs_from_run(self):
        run = {"q1": {f"d{i}": float(100 - i) for i in range(10)}}
        pairs = list(build_contrast_pairs(
            run, {"q1": "d0"}, neg_rank_range=(5, 10), seed=0))
        (qid, pos, neg), = pairs
        assert (qid, pos) == ("q1", "d0")
        assert neg in {f"d{i}" for i in range(5, 10)}

    def test_empty_band_falls_back(self):
        run = {"q1": {"d0": 2.0, "d1": 1.0}}
        pairs = list(build_contrast_pairs(run, {}, neg_rank_range=(50, 100)))
        (qid, pos, neg), = pairs
        assert pos == "d0" and neg == "d1"
