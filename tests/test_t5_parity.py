"""Numerical parity: our Flax T5 stacks vs torch T5 (random-init, local)."""

import numpy as np
import pytest

import jax.numpy as jnp

from openmatch_tpu.models.t5 import (
    T5Config,
    T5Encoder,
    T5EncoderDecoderStep,
    convert_t5_encdec_state_dict,
    convert_t5_encoder_state_dict,
)


def _small_hf_t5(gated=False, tie=True):
    import torch
    from transformers import T5Config as HFT5Config, T5ForConditionalGeneration

    torch.manual_seed(0)
    cfg = HFT5Config(
        vocab_size=120,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=2,
        num_decoder_layers=2,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
        feed_forward_proj="gated-gelu" if gated else "relu",
        tie_word_embeddings=tie,
        decoder_start_token_id=0,
    )
    model = T5ForConditionalGeneration(cfg)
    model.eval()
    return cfg, model


def _inputs(seed=0, b=2, s=11):
    rng = np.random.RandomState(seed)
    ids = rng.randint(3, 120, size=(b, s)).astype(np.int64)
    mask = np.ones((b, s), dtype=np.int64)
    mask[1, 7:] = 0
    ids = ids * mask
    return ids, mask


@pytest.mark.parametrize("gated,tie", [(False, True), (True, False)])
def test_t5_encoder_parity(gated, tie):
    import torch

    hf_cfg, torch_model = _small_hf_t5(gated=gated, tie=tie)
    cfg = T5Config.from_hf_config(hf_cfg)
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params = convert_t5_encoder_state_dict(sd, cfg)

    ids, mask = _inputs()
    with torch.no_grad():
        expected = (
            torch_model.encoder(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            )
            .last_hidden_state.numpy()
        )
    got = np.asarray(
        T5Encoder(cfg, dtype=jnp.float32).apply(
            {"params": params}, jnp.array(ids), jnp.array(mask)
        )["last_hidden_state"]
    )
    for b in range(2):
        n = int(mask[b].sum())
        np.testing.assert_allclose(got[b, :n], expected[b, :n], atol=2e-4)


@pytest.mark.parametrize("gated,tie", [(False, True), (True, False)])
def test_t5_one_step_decode_parity(gated, tie):
    import torch

    hf_cfg, torch_model = _small_hf_t5(gated=gated, tie=tie)
    cfg = T5Config.from_hf_config(hf_cfg)
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params = convert_t5_encdec_state_dict(sd, cfg)

    ids, mask = _inputs(seed=1)
    dec_ids = np.zeros((2, 1), dtype=np.int64)
    with torch.no_grad():
        out = torch_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            decoder_input_ids=torch.tensor(dec_ids),
        )
    expected_logits = out.logits.numpy()

    got = T5EncoderDecoderStep(cfg, dtype=jnp.float32).apply(
        {"params": params}, jnp.array(ids), jnp.array(mask)
    )
    np.testing.assert_allclose(np.asarray(got["logits"]), expected_logits, atol=3e-4)


def test_monot5_two_token_scores():
    """Scores = one-step logits at [neg_token, pos_token] columns
    (reference reranking_model.py:110-114)."""
    import torch

    hf_cfg, torch_model = _small_hf_t5()
    cfg = T5Config.from_hf_config(hf_cfg)
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params = convert_t5_encdec_state_dict(sd, cfg)
    ids, mask = _inputs(seed=2)
    neg_id, pos_id = 7, 11

    got = T5EncoderDecoderStep(cfg, dtype=jnp.float32).apply(
        {"params": params}, jnp.array(ids), jnp.array(mask)
    )
    scores = np.asarray(got["logits"][:, 0, [neg_id, pos_id]])
    with torch.no_grad():
        expected = torch_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            decoder_input_ids=torch.zeros((2, 1), dtype=torch.long),
        ).logits[:, 0, [neg_id, pos_id]].numpy()
    np.testing.assert_allclose(scores, expected, atol=3e-4)


def test_dr_t5_encdec_build_parity(tmp_path):
    """DRModel.build on a raw T5 checkpoint (without --encoder_only) must
    reproduce the reference's DEFAULT T5 DR semantics: run the full
    encoder-decoder one step on decoder_input_ids=0 and take decoder
    token 0's hidden state as the rep, bypassing the pooling config
    (dense_retrieval_model.py:129-141)."""
    import torch

    from openmatch_tpu.config import ModelArguments
    from openmatch_tpu.models.dr_model import DRModel

    hf_cfg, torch_model = _small_hf_t5()
    path = tmp_path / "tiny-t5"
    torch_model.save_pretrained(path)

    args = ModelArguments(model_name_or_path=str(path), dtype="float32",
                          pooling="mean")  # pooling must be IGNORED
    model, params = DRModel.build(args)
    assert model.backbone_type == "t5_encdec"

    ids, mask = _inputs(seed=2)
    got = np.asarray(model.encode_query(params, jnp.array(ids),
                                        jnp.array(mask)))
    with torch.no_grad():
        out = torch_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            decoder_input_ids=torch.zeros((2, 1), dtype=torch.long),
            output_hidden_states=True,
        )
    expected = out.decoder_hidden_states[-1][:, 0, :].numpy()
    np.testing.assert_allclose(got, expected, atol=3e-4)


def test_dr_t5_encoder_only_build(tmp_path):
    """--encoder_only keeps the encoder-stack path (the GTR recipe)."""
    from openmatch_tpu.config import ModelArguments
    from openmatch_tpu.models.dr_model import DRModel

    _, torch_model = _small_hf_t5()
    path = tmp_path / "tiny-t5"
    torch_model.save_pretrained(path)

    args = ModelArguments(model_name_or_path=str(path), dtype="float32",
                          encoder_only=True, pooling="mean")
    model, params = DRModel.build(args)
    assert model.backbone_type == "t5"
    ids, mask = _inputs(seed=3)
    reps = np.asarray(model.encode_query(params, jnp.array(ids),
                                         jnp.array(mask)))
    assert reps.shape == (2, 32) and np.isfinite(reps).all()


def test_dr_t5_encdec_save_load_roundtrip(tmp_path):
    """The t5_encdec backbone string survives the openmatch_config.json
    sidecar round-trip with identical encodings."""
    from openmatch_tpu.config import ModelArguments
    from openmatch_tpu.models.dr_model import DRModel

    _, torch_model = _small_hf_t5()
    src = tmp_path / "tiny-t5"
    torch_model.save_pretrained(src)
    model, params = DRModel.build(
        ModelArguments(model_name_or_path=str(src), dtype="float32"))

    ids, mask = _inputs(seed=4)
    before = np.asarray(model.encode_passage(params, jnp.array(ids),
                                             jnp.array(mask)))
    out = tmp_path / "ckpt"
    model.save(params, str(out))
    model2, params2 = DRModel.load(str(out))
    assert model2.backbone_type == "t5_encdec"
    after = np.asarray(model2.encode_passage(params2, jnp.array(ids),
                                             jnp.array(mask)))
    np.testing.assert_allclose(after, before, atol=1e-5)
