"""HF interop: numerical parity of converted weights against HF torch forward.

A randomly-initialized HF DistilBertForMaskedLM / BertForMaskedLM is saved,
converted to the dhr_tpu param tree, and both models run the same batch; the
hidden states and MLM logits must agree to f32 tolerance.  This pins the
entire weight mapping (attention head splitting, LayerNorm naming, tied
embedding projection, GELU variant) to HF ground truth.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from dhr_tpu.models.hf_io import (  # noqa: E402
    convert_hf_mlm_to_params,
    convert_params_to_hf_mlm,
    encoder_config_from_hf,
    load_hf_state_dict,
)
from dhr_tpu.models.transformer import EncoderConfig, EncoderWithMLM  # noqa: E402


def tiny_distilbert_dir(tmp_path):
    cfg = transformers.DistilBertConfig(
        vocab_size=99, dim=32, n_layers=2, n_heads=2, hidden_dim=64,
        max_position_embeddings=48, dropout=0.0, attention_dropout=0.0,
        activation="gelu",
    )
    model = transformers.DistilBertForMaskedLM(cfg)
    model.eval()
    d = tmp_path / "distilbert"
    model.save_pretrained(str(d), safe_serialization=False)
    return str(d), model


def tiny_bert_dir(tmp_path):
    cfg = transformers.BertConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=48, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, type_vocab_size=2,
    )
    model = transformers.BertForMaskedLM(cfg)
    model.eval()
    d = tmp_path / "bert"
    model.save_pretrained(str(d), safe_serialization=False)
    return str(d), model


def run_parity(model_dir, hf_model, rng):
    cfg = encoder_config_from_hf(model_dir, dtype=jnp.float32)
    sd = load_hf_state_dict(model_dir)
    params = {"params": convert_hf_mlm_to_params(sd, cfg)}

    B, L = 2, 10
    ids = rng.integers(0, cfg.vocab_size, (B, L))
    mask = np.ones((B, L), np.int64)
    mask[:, -3:] = 0

    with torch.no_grad():
        out = hf_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            output_hidden_states=True,
        )
    t_hidden = out.hidden_states[-1].numpy()
    t_logits = out.logits.numpy()

    model = EncoderWithMLM(cfg)
    j_hidden, j_logits = model.apply(
        params, jnp.asarray(ids), jnp.asarray(mask)
    )
    # compare only unmasked positions: HF distilbert masks attention but
    # masked rows still produce (meaningless) outputs in both frameworks
    np.testing.assert_allclose(
        np.asarray(j_hidden)[:, :7], t_hidden[:, :7], atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(j_logits)[:, :7], t_logits[:, :7], atol=2e-3
    )
    return cfg, params


def test_distilbert_forward_parity(tmp_path, rng):
    d, hf_model = tiny_distilbert_dir(tmp_path)
    run_parity(d, hf_model, rng)


def test_bert_forward_parity(tmp_path, rng):
    d, hf_model = tiny_bert_dir(tmp_path)
    run_parity(d, hf_model, rng)


def test_roundtrip_export(tmp_path, rng):
    d, hf_model = tiny_distilbert_dir(tmp_path)
    cfg = encoder_config_from_hf(d, dtype=jnp.float32)
    sd = load_hf_state_dict(d)
    params = convert_hf_mlm_to_params(sd, cfg)
    back = convert_params_to_hf_mlm(params, cfg, arch="distilbert")
    orig = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    for k, v in back.items():
        np.testing.assert_allclose(v, orig[k], atol=1e-6, err_msg=k)


def test_sidecar_tied_loads_in_torch_strict(tmp_path, rng):
    """A tied sidecar export must load through the reference's tied
    LinearPooler with strict load_state_dict (DHR/modeling.py:46-68): the
    tied module aliases linear_p = linear_q, so its state_dict contains
    BOTH key families and strict loading requires both."""
    import torch
    import torch.nn as nn

    from dhr_tpu.models.hf_io import load_sidecar_head, save_sidecar_head

    kernel = rng.standard_normal((16, 8)).astype(np.float32)
    bias = rng.standard_normal(8).astype(np.float32)
    save_sidecar_head(
        str(tmp_path), "pooler", {"kernel": kernel, "bias": bias}, None,
        input_dim=16, output_dim=8,
    )

    class TiedPooler(nn.Module):  # reference-shaped strict loader
        def __init__(self):
            super().__init__()
            self.linear_q = nn.Linear(16, 8)
            self.linear_p = self.linear_q

    pooler = TiedPooler()
    sd = torch.load(tmp_path / "pooler.pt", map_location="cpu", weights_only=True)
    pooler.load_state_dict(sd)  # strict=True default: raises on missing keys
    np.testing.assert_allclose(
        pooler.linear_q.weight.detach().numpy(), kernel.T, atol=1e-7
    )
    np.testing.assert_allclose(
        pooler.linear_p.bias.detach().numpy(), bias, atol=1e-7
    )

    # and our own loader still reads it back as tied
    side = load_sidecar_head(str(tmp_path), "pooler")
    assert side["p"] is None and side["config"]["tied"] is True
    np.testing.assert_allclose(side["q"]["kernel"], kernel, atol=1e-7)


def test_encoder_only_export_loads_in_torch_automodel(tmp_path, rng):
    """Dense/skip-MLM/ColBERT families export encoder-only checkpoints the
    reference loads via AutoModel (Aggretriever/modeling.py:503-508):
    torch DistilBertModel hidden states must match our encoder's."""
    from dhr_tpu.models.retrievers import BiEncoder, RetrieverConfig
    from dhr_tpu.models.transformer import TransformerEncoder
    from dhr_tpu.train.checkpoint import export_hf_checkpoint

    cfg = RetrieverConfig(
        model_type="dense",
        encoder=EncoderConfig(
            vocab_size=99, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_position_embeddings=48,
            type_vocab_size=0, dtype=jnp.float32,
            hidden_dropout=0.0, attention_dropout=0.0,
        ),
        add_pooler=True, projection_dim=8,
    )
    model = BiEncoder(cfg)
    batch = {"input_ids": jnp.asarray(rng.integers(1, 99, (2, 10)), jnp.int32),
             "attention_mask": jnp.ones((2, 10), jnp.int32)}
    params = jax.device_get(model.init(
        jax.random.PRNGKey(0), query=batch, passage=batch)["params"])
    out = str(tmp_path / "export")
    export_hf_checkpoint(out, params, cfg)

    t_model = transformers.AutoModel.from_pretrained(out)
    t_model.eval()
    with torch.no_grad():
        t_hidden = t_model(
            input_ids=torch.from_numpy(np.asarray(batch["input_ids"], np.int64)),
            attention_mask=torch.from_numpy(
                np.asarray(batch["attention_mask"], np.int64)),
        ).last_hidden_state.numpy()

    enc = TransformerEncoder(cfg.encoder)
    j_hidden = enc.apply({"params": params["encoder_q"]["backbone"]},
                         batch["input_ids"], batch["attention_mask"])
    np.testing.assert_allclose(np.asarray(j_hidden), t_hidden, atol=2e-4)

    # round trip: the exported encoder-only checkpoint loads back into our
    # param tree (mlm=None) bit-exactly
    sd = load_hf_state_dict(out)
    back = convert_hf_mlm_to_params(sd, cfg.encoder)
    assert back["mlm"] is None
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-6),
        back["encoder"], params["encoder_q"]["backbone"],
    )
