"""Train-step tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from dhr_tpu.models.retrievers import BiEncoder, RetrieverConfig
from dhr_tpu.models.transformer import EncoderConfig
from dhr_tpu.parallel import make_mesh, replicate, shard_batch
from dhr_tpu.train import (
    LossConfig,
    OptimizerConfig,
    TrainState,
    make_grad_cache_train_step,
    make_optimizer,
    make_train_step,
    restore_train_state,
    save_train_state,
)


def tiny_retriever(model_type="dhr", **kw):
    return RetrieverConfig(
        model_type=model_type,
        encoder=EncoderConfig.tiny(vocab_size=70, dtype=jnp.float32,
                                   hidden_dropout=0.0, attention_dropout=0.0),
        dlr_out_dim=8,
        agg_dim=8,
        add_pooler=(model_type in ("dhr", "agg", "colbert")),
        projection_dim=8,
        **kw,
    )


def make_train_batch(rng, B=8, n=2, Lq=6, Lp=8, vocab=70):
    def block(m, L):
        ids = rng.integers(0, vocab, (m, L)).astype(np.int32)
        mask = np.ones((m, L), np.int32)
        return {"input_ids": ids, "attention_mask": mask}

    return {"query": block(B, Lq), "passage": block(B * n, Lp)}


def init_state(cfg, batch, lr=1e-3):
    model = BiEncoder(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        query=jax.tree.map(jnp.asarray, batch["query"]),
        passage=jax.tree.map(jnp.asarray, batch["passage"]),
    )["params"]
    tx = make_optimizer(
        OptimizerConfig(learning_rate=lr, total_steps=100), params
    )
    return model, TrainState.create(params, tx)


@pytest.mark.parametrize("model_type", ["dense", "dhr", "agg", "colbert"])
def test_sharded_train_step_runs_and_reduces_loss(
    rng, eight_devices, model_type
):
    mesh = make_mesh(eight_devices)
    cfg = tiny_retriever(model_type)
    batch = make_train_batch(rng)
    model, state = init_state(cfg, batch, lr=5e-3)
    step = make_train_step(model, cfg, LossConfig(n_passages=2, remove_dims=6))
    step = jax.jit(step)

    with jax.set_mesh(mesh):
        state = replicate(state, mesh)
        dev_batch = shard_batch(batch, mesh)
        key = jax.device_put(
            jax.random.PRNGKey(1), NamedSharding(mesh, P())
        )
        losses = []
        for _ in range(8):
            state, metrics = step(state, dev_batch, key)
            losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(jax.device_get(state.step)) == 8


def test_grad_cache_matches_standard_step(rng, eight_devices):
    """Gradient-cache must produce the same gradients as the plain step.

    Compared under SGD so the assertion tests gradient equivalence directly
    (Adam's first-step sign normalization would amplify f32 noise).
    """
    import optax

    cfg = tiny_retriever("dense")
    batch = make_train_batch(rng, B=8, n=2)
    model = BiEncoder(cfg)
    jbatch = jax.tree.map(jnp.asarray, batch)
    params = model.init(
        jax.random.PRNGKey(0), query=jbatch["query"], passage=jbatch["passage"]
    )["params"]
    state = TrainState.create(params, optax.sgd(1.0))
    key = jax.random.PRNGKey(3)

    plain = make_train_step(model, cfg, LossConfig(n_passages=2))
    cached = make_grad_cache_train_step(
        model, cfg, LossConfig(n_passages=2), q_chunks=4, p_chunks=4
    )
    s1, m1 = jax.jit(plain)(state, jbatch, key)
    s2, m2 = jax.jit(cached)(state, jbatch, key)
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    # params moved by exactly -grad; equality of params == equality of grads
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        s1.params, s2.params,
    )


def test_tct_distillation_runs(rng):
    """DHR student with an in-graph ColBERT teacher."""
    cfg = tiny_retriever("dhr")
    t_cfg = tiny_retriever("colbert")
    batch = make_train_batch(rng, B=4, n=2)
    jbatch = jax.tree.map(jnp.asarray, batch)
    model, state = init_state(cfg, batch)
    teacher = BiEncoder(t_cfg)
    t_params = teacher.init(
        jax.random.PRNGKey(7), query=jbatch["query"], passage=jbatch["passage"]
    )

    def teacher_apply(query, passage):
        return teacher.apply(t_params, query=query, passage=passage)

    step = make_train_step(
        model, cfg, LossConfig(n_passages=2, remove_dims=6, use_tct_teacher=True),
        teacher_apply=teacher_apply,
    )
    state2, metrics = jax.jit(step)(state, jbatch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_checkpoint_roundtrip(rng, tmp_path):
    cfg = tiny_retriever("dense")
    batch = make_train_batch(rng, B=4, n=2)
    jbatch = jax.tree.map(jnp.asarray, batch)
    model, state = init_state(cfg, batch)
    step = jax.jit(make_train_step(model, cfg, LossConfig(n_passages=2)))
    state, _ = step(state, jbatch, jax.random.PRNGKey(0))
    state, _ = step(state, jbatch, jax.random.PRNGKey(0))

    ckpt_dir = str(tmp_path / "ckpt")
    save_train_state(ckpt_dir, state)

    _, fresh = init_state(cfg, batch)
    restored = restore_train_state(ckpt_dir, fresh)
    assert int(jax.device_get(restored.step)) == 2
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        state.params, restored.params,
    )
    # training continues identically from the restored state
    s_a, m_a = step(state, jbatch, jax.random.PRNGKey(9))
    s_b, m_b = step(restored, jbatch, jax.random.PRNGKey(9))
    assert abs(float(m_a["loss"]) - float(m_b["loss"])) < 1e-6


def test_frozen_word_embeddings(rng):
    cfg = tiny_retriever("dhr")
    batch = make_train_batch(rng, B=4, n=2)
    jbatch = jax.tree.map(jnp.asarray, batch)
    model = BiEncoder(cfg)
    params = model.init(
        jax.random.PRNGKey(0), query=jbatch["query"], passage=jbatch["passage"]
    )["params"]
    tx = make_optimizer(
        OptimizerConfig(learning_rate=1e-2, total_steps=10,
                        freeze_word_embeddings=True),
        params,
    )
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(model, cfg, LossConfig(n_passages=2, remove_dims=6)))
    new_state, _ = step(state, jbatch, jax.random.PRNGKey(0))
    before = params["encoder_q"]["backbone"]["encoder"]["embeddings"]["word"][
        "embedding"
    ]
    after = new_state.params["encoder_q"]["backbone"]["encoder"]["embeddings"][
        "word"
    ]["embedding"]
    np.testing.assert_allclose(np.asarray(before), np.asarray(after))
    # but other params moved
    b2 = params["encoder_q"]["backbone"]["mlm"]["transform"]["kernel"]
    a2 = new_state.params["encoder_q"]["backbone"]["mlm"]["transform"]["kernel"]
    assert np.abs(np.asarray(a2) - np.asarray(b2)).max() > 0
