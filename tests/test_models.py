import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhr_tpu.models.retrievers import BiEncoder, RetrieverConfig
from dhr_tpu.models.transformer import EncoderConfig, EncoderWithMLM


def tiny_cfg(**kw):
    return EncoderConfig.tiny(vocab_size=101, dtype=jnp.float32, **kw)


def make_batch(rng, B=2, L=10, vocab=101):
    ids = rng.integers(0, vocab, (B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    mask[:, L - 2:] = 0
    return {"input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(mask)}


def test_encoder_with_mlm_shapes(rng):
    cfg = tiny_cfg()
    model = EncoderWithMLM(cfg)
    batch = make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), **batch)
    hidden, logits = model.apply(params, **batch)
    assert hidden.shape == (2, 10, 32)
    assert logits.shape == (2, 10, 101)


def test_mask_isolation(rng):
    """Masked positions must not influence unmasked outputs."""
    cfg = tiny_cfg()
    model = EncoderWithMLM(cfg)
    batch = make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), **batch)
    h1, _ = model.apply(params, **batch)
    ids2 = np.asarray(batch["input_ids"]).copy()
    ids2[:, -1] = 7  # change a masked position
    h2, _ = model.apply(
        params, jnp.asarray(ids2), batch["attention_mask"]
    )
    np.testing.assert_allclose(
        np.asarray(h1[:, :-2]), np.asarray(h2[:, :-2]), atol=1e-5
    )


@pytest.mark.parametrize("model_type", ["dense", "dhr", "dlr", "agg", "colbert"])
def test_biencoder_forward(rng, model_type):
    cfg = RetrieverConfig(
        model_type=model_type,
        encoder=tiny_cfg(),
        add_pooler=(model_type in ("dhr", "agg", "colbert")),
        projection_dim=16,
        dlr_out_dim=8,
        agg_dim=8,
    )
    model = BiEncoder(cfg)
    q = make_batch(rng, B=2, L=6)
    p = make_batch(rng, B=4, L=10)
    params = model.init(jax.random.PRNGKey(0), query=q, passage=p)
    q_reps, p_reps = model.apply(params, query=q, passage=p)
    if model_type == "dense":
        assert q_reps.dense.shape == (2, 32)
        assert p_reps.dense.shape == (4, 32)
    elif model_type in ("dhr", "dlr"):
        assert q_reps.lexical.shape == (2, 101)
        assert q_reps.semantic.shape[0] == 2
        if model_type == "dhr":
            assert q_reps.semantic.shape == (2, 16)
    elif model_type == "agg":
        assert p_reps.lexical.shape == (4, 101)
        assert p_reps.semantic.shape == (4, 16)
    else:
        assert q_reps.token_cls.shape == (2, 1, 16)
        assert q_reps.token.shape == (2, 5, 16)
        assert p_reps.token.shape == (4, 9, 16)


def test_dhr_lexical_rep_is_seq_max_of_weighted_softmax(rng):
    cfg = RetrieverConfig(model_type="dhr", encoder=tiny_cfg())
    model = BiEncoder(cfg)
    p = make_batch(rng, B=2, L=8)
    params = model.init(jax.random.PRNGKey(0), passage=p)
    _, p_reps = model.apply(params, passage=p)
    assert p_reps.lexical.shape == (2, 101)
    # positions beyond the mask contribute 0; values bounded by |tw|*softmax<=|tw|
    assert np.isfinite(np.asarray(p_reps.lexical)).all()


def test_tied_encoders_share_params(rng):
    cfg = RetrieverConfig(model_type="dense", encoder=tiny_cfg())
    model = BiEncoder(cfg)
    q = make_batch(rng, B=2, L=6)
    params = model.init(jax.random.PRNGKey(0), query=q, passage=q)
    # same inputs through both roles must produce identical dense reps
    q_reps, p_reps = model.apply(params, query=q, passage=q)
    np.testing.assert_allclose(
        np.asarray(q_reps.dense), np.asarray(p_reps.dense), atol=1e-6
    )
    assert "encoder_p" not in params["params"]


def test_untied_encoders_have_separate_params(rng):
    cfg = RetrieverConfig(
        model_type="dense", encoder=tiny_cfg(), untie_encoder=True
    )
    model = BiEncoder(cfg)
    q = make_batch(rng, B=2, L=6)
    params = model.init(jax.random.PRNGKey(0), query=q, passage=q)
    assert "encoder_p" in params["params"]


def test_colbert_query_length_normalization(rng):
    cfg = RetrieverConfig(
        model_type="colbert", encoder=tiny_cfg(), projection_dim=16
    )
    model = BiEncoder(cfg)
    q = make_batch(rng, B=2, L=8)
    params = model.init(jax.random.PRNGKey(0), query=q)
    q_reps, _ = model.apply(params, query=q)
    # re-run as passage: no normalization
    p_reps_q, _ = None, None
    _, p_reps = model.apply(params, passage=q)
    q_len = np.asarray(q["attention_mask"]).sum(-1)  # 6 per row
    ratio = np.asarray(q_reps.token) / np.asarray(p_reps.token)
    valid = np.abs(np.asarray(p_reps.token)) > 1e-6
    np.testing.assert_allclose(
        ratio[valid], (32.0 / q_len[0]), rtol=1e-4
    )


def test_remat_encoder_matches_non_remat(rng):
    """remat=True (the BEIR long-sequence config) is numerically identical."""
    import dataclasses

    cfg = tiny_cfg()
    cfg_r = dataclasses.replace(cfg, remat=True)
    batch = make_batch(rng)
    m1, m2 = EncoderWithMLM(cfg), EncoderWithMLM(cfg_r)
    params = m1.init(jax.random.PRNGKey(0), **batch)
    h1, l1 = m1.apply(params, **batch)
    h2, l2 = m2.apply(params, **batch)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)

    # gradients flow through the rematerialized layers
    def loss(p, m):
        h, l = m.apply(p, **batch)
        return jnp.sum(l ** 2)

    g1 = jax.grad(loss)(params, m1)
    g2 = jax.grad(loss)(params, m2)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        g1, g2,
    )
