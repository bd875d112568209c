"""Token-packed training: packed step == plain step, collate/loader wiring.

The packed passage tower must produce the same loss and the same parameter
update as the plain pad-to-p_max_len step on identical examples (dropout
zeroed so layout-dependent masks don't enter): block-diagonal attention
gives each passage exactly its own context, and the two-level reduce
(per-token densify/fold, segment max) selects the same winner as the plain
token-max-then-fold, so gradients match up to float rounding.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dhr_tpu.data.collate import collate_train, collate_train_packed
from dhr_tpu.models.retrievers import BiEncoder, RetrieverConfig
from dhr_tpu.models.transformer import EncoderConfig
from dhr_tpu.train import (
    LossConfig,
    OptimizerConfig,
    TrainState,
    make_optimizer,
    make_packed_train_step,
    make_train_step,
)

VOCAB = 70
Q_LEN, P_LEN = 6, 24
B, NPSG = 4, 3
CLS, SEP = 1, 0


def tiny_retriever(model_type="dhr", **kw):
    return RetrieverConfig(
        model_type=model_type,
        encoder=EncoderConfig.tiny(vocab_size=VOCAB, dtype=jnp.float32,
                                   hidden_dropout=0.0, attention_dropout=0.0),
        dlr_out_dim=8,
        agg_dim=8,
        add_pooler=(model_type in ("dhr", "agg")),
        projection_dim=8,
        **kw,
    )


def make_examples(rng):
    """(query, passages, None) with variable passage lengths (3..P_LEN-4)."""
    exs = []
    for _ in range(B):
        q = rng.integers(2, VOCAB, Q_LEN - 2).tolist()
        ps = [
            rng.integers(2, VOCAB, int(rng.integers(3, P_LEN - 4))).tolist()
            for _ in range(NPSG)
        ]
        exs.append((q, ps, None))
    return exs


def init_state(cfg, batch, lr=1e-2):
    # plain SGD, not Adam: attention key biases have mathematically zero
    # gradient (a shared key shift moves every logit of a query position
    # equally; softmax is invariant), so Adam would normalize their
    # +-1e-9 float-noise gradients into full-size sign-dependent updates
    # and the packed-vs-plain comparison would measure noise, not math
    import optax

    model = BiEncoder(cfg)
    dummy = {"input_ids": jnp.zeros((2, 8), jnp.int32),
             "attention_mask": jnp.ones((2, 8), jnp.int32)}
    params = model.init(
        jax.random.PRNGKey(0),
        query=jax.tree.map(jnp.asarray, batch["query"]),
        passage=dummy,
    )["params"]
    return model, TrainState.create(params, optax.sgd(lr))


def _leaf_close(a, b, atol):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol,
                               rtol=1e-4)


@pytest.mark.parametrize("model_type",
                         ["dense", "dhr", "dlr", "agg", "colbert"])
def test_packed_step_matches_plain(rng, model_type):
    cfg = tiny_retriever(model_type)
    exs = make_examples(rng)
    plain_b = collate_train(exs, Q_LEN, P_LEN, cls_id=CLS, sep_id=SEP)
    packed_b = collate_train_packed(exs, Q_LEN, P_LEN, pack_rows=8,
                                    pack_segments=3, cls_id=CLS, sep_id=SEP)
    loss_cfg = LossConfig(n_passages=NPSG, remove_dims=6)
    model, state = init_state(cfg, plain_b)

    plain_step = jax.jit(make_train_step(model, cfg, loss_cfg))
    packed_step = jax.jit(make_packed_train_step(model, cfg, loss_cfg))
    key = jax.random.PRNGKey(7)

    s1, m1 = plain_step(state, jax.tree.map(jnp.asarray, plain_b), key)
    s2, m2 = packed_step(state, jax.tree.map(jnp.asarray, packed_b), key)

    assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), abs=1e-5)
    jax.tree.map(lambda a, b: _leaf_close(a, b, 1e-5), s1.params, s2.params)


def test_packed_step_matches_plain_dhr_segfirst(rng):
    """Segment-first head order gives the same loss and parameter update."""
    cfg = tiny_retriever("dhr", packed_segfirst=True)
    exs = make_examples(rng)
    plain_b = collate_train(exs, Q_LEN, P_LEN, cls_id=CLS, sep_id=SEP)
    packed_b = collate_train_packed(exs, Q_LEN, P_LEN, pack_rows=8,
                                    pack_segments=3, cls_id=CLS, sep_id=SEP)
    loss_cfg = LossConfig(n_passages=NPSG, remove_dims=6)
    model, state = init_state(cfg, plain_b)

    plain_step = jax.jit(make_train_step(model, cfg, loss_cfg))
    packed_step = jax.jit(make_packed_train_step(model, cfg, loss_cfg))
    key = jax.random.PRNGKey(7)
    s1, m1 = plain_step(state, jax.tree.map(jnp.asarray, plain_b), key)
    s2, m2 = packed_step(state, jax.tree.map(jnp.asarray, packed_b), key)
    assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), abs=1e-5)
    jax.tree.map(lambda a, b: _leaf_close(a, b, 1e-5), s1.params, s2.params)


def test_packed_step_matches_plain_kd_teacher_scores(rng):
    """Teacher scores (listwise, the dhr_loss teacher shape) flow through
    the packed step's TCT temperature splits identically to plain."""
    cfg = tiny_retriever("dhr")
    exs = make_examples(rng)
    plain_b = collate_train(exs, Q_LEN, P_LEN, cls_id=CLS, sep_id=SEP)
    packed_b = collate_train_packed(exs, Q_LEN, P_LEN, pack_rows=8,
                                    pack_segments=3, cls_id=CLS, sep_id=SEP)
    teacher = rng.normal(size=(B, B * NPSG)).astype(np.float32)
    plain_b["teacher_scores"] = teacher
    packed_b["teacher_scores"] = teacher
    loss_cfg = LossConfig(n_passages=NPSG, remove_dims=6)
    model, state = init_state(cfg, plain_b)
    key = jax.random.PRNGKey(7)
    _, m1 = jax.jit(make_train_step(model, cfg, loss_cfg))(
        state, jax.tree.map(jnp.asarray, plain_b), key)
    _, m2 = jax.jit(make_packed_train_step(model, cfg, loss_cfg))(
        state, jax.tree.map(jnp.asarray, packed_b), key)
    assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), abs=1e-5)


def test_packed_colbert_full_length_passage(rng):
    """A passage that fills its row exactly (no pads) must keep its genuine
    — possibly negative — MaxSim terms: the plain path only has 0-score
    zero-vector candidates when the row has pads, and the packed twin's
    floor rule must replicate that boundary exactly."""
    cfg = tiny_retriever("colbert")
    exs = []
    for _ in range(B):
        q = rng.integers(2, VOCAB, Q_LEN - 2).tolist()
        ps = [rng.integers(2, VOCAB, P_LEN - 2).tolist()]  # wraps to P_LEN
        ps += [rng.integers(2, VOCAB, 4).tolist()
               for _ in range(NPSG - 1)]
        exs.append((q, ps, None))
    plain_b = collate_train(exs, Q_LEN, P_LEN, cls_id=CLS, sep_id=SEP)
    packed_b = collate_train_packed(exs, Q_LEN, P_LEN, pack_rows=8,
                                    pack_segments=3, cls_id=CLS, sep_id=SEP)
    loss_cfg = LossConfig(n_passages=NPSG)
    model, state = init_state(cfg, plain_b)
    key = jax.random.PRNGKey(7)
    s1, m1 = jax.jit(make_train_step(model, cfg, loss_cfg))(
        state, jax.tree.map(jnp.asarray, plain_b), key)
    s2, m2 = jax.jit(make_packed_train_step(model, cfg, loss_cfg))(
        state, jax.tree.map(jnp.asarray, packed_b), key)
    assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), abs=1e-5)
    jax.tree.map(lambda a, b: _leaf_close(a, b, 1e-5), s1.params, s2.params)


def test_packed_colbert_teacher_margins(rng):
    """Per-query (B, n) teacher margins expand onto the block diagonal
    identically through the packed colbert loss."""
    cfg = tiny_retriever("colbert")
    exs = make_examples(rng)
    plain_b = collate_train(exs, Q_LEN, P_LEN, cls_id=CLS, sep_id=SEP)
    packed_b = collate_train_packed(exs, Q_LEN, P_LEN, pack_rows=8,
                                    pack_segments=3, cls_id=CLS, sep_id=SEP)
    teacher = rng.normal(size=(B, NPSG)).astype(np.float32)
    plain_b["teacher_scores"] = teacher
    packed_b["teacher_scores"] = teacher
    loss_cfg = LossConfig(n_passages=NPSG)
    model, state = init_state(cfg, plain_b)
    key = jax.random.PRNGKey(7)
    _, m1 = jax.jit(make_train_step(model, cfg, loss_cfg))(
        state, jax.tree.map(jnp.asarray, plain_b), key)
    _, m2 = jax.jit(make_packed_train_step(model, cfg, loss_cfg))(
        state, jax.tree.map(jnp.asarray, packed_b), key)
    assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), abs=1e-5)


def test_collate_packed_fallback_degenerate(rng):
    """A plan overflowing pack_rows falls back to one passage per row."""
    exs = make_examples(rng)
    b = collate_train_packed(exs, Q_LEN, P_LEN, pack_rows=1,
                             pack_segments=3, cls_id=CLS, sep_id=SEP)
    pp = b["packed_passage"]
    assert pp["input_ids"].shape == (B * NPSG, P_LEN)
    np.testing.assert_array_equal(
        pp["slot_pos"], np.arange(B * NPSG) * 3
    )
    # every row holds exactly one segment
    assert (pp["segment_ids"].max(axis=1) <= 1).all()


def test_packed_step_rejects_unsupported():
    cfg = tiny_retriever("dhr")
    with pytest.raises(ValueError, match="TCT"):
        make_packed_train_step(
            BiEncoder(cfg), cfg, LossConfig(use_tct_teacher=True)
        )
    cfg = tiny_retriever("agg", skip_mlm=True)
    with pytest.raises(ValueError, match="skip_mlm"):
        make_packed_train_step(BiEncoder(cfg), cfg, LossConfig())


def test_loader_auto_pack_rows(rng):
    from dhr_tpu.data import SamplingConfig, TrainLoader

    groups = []
    for i in range(8):
        ps = [rng.integers(2, VOCAB, int(rng.integers(3, 20))).tolist()
              for _ in range(4)]
        groups.append({
            "query": rng.integers(2, VOCAB, 4).tolist(),
            "positives": ps[:1],
            "negatives": ps[1:],
        })
    cfg = SamplingConfig(n_passages=3, q_max_len=Q_LEN, p_max_len=P_LEN,
                         seed=0, cls_id=CLS, sep_id=SEP)
    loader = TrainLoader(groups, cfg, batch_size=4, pack_passages=True,
                         pack_segments=3, pack_rows_multiple=4)
    batches = list(loader.epoch(0))
    assert batches and all("packed_passage" in b for b in batches)
    assert loader.pack_rows % 4 == 0
    for b in batches:
        assert b["packed_passage"]["input_ids"].shape[0] in (
            loader.pack_rows, 12  # degenerate fallback = num passages
        )


def test_packed_resume_matches_uninterrupted_trajectory(tmp_path, rng):
    """Interrupt + resume under --pack-passages: final params bit-identical
    to the straight run (auto pack_rows derives from epoch-0 batch-0, not
    from the first post-skip batch, so both runs compile the same shapes)."""
    import dataclasses

    from dhr_tpu.data import SamplingConfig
    from dhr_tpu.train.driver import RunConfig, run_training

    groups = []
    for i in range(16):
        ps = [rng.integers(2, VOCAB, int(rng.integers(3, 20))).tolist()
              for _ in range(3)]
        groups.append({
            "query": rng.integers(2, VOCAB, 4).tolist(),
            "positives": ps[:1],
            "negatives": ps[1:],
        })
    cfg = tiny_retriever("dhr")
    loss_cfg = LossConfig(n_passages=2, remove_dims=6)
    opt_cfg = OptimizerConfig(learning_rate=1e-3, total_steps=8)
    sampling = SamplingConfig(n_passages=2, q_max_len=Q_LEN, p_max_len=P_LEN,
                              seed=0, cls_id=CLS, sep_id=SEP)
    run_cfg = RunConfig(num_epochs=2, batch_size=8, save_steps=1,
                        log_steps=2, seed=0, pack_passages=True,
                        pack_segments=3)

    straight = run_training(
        cfg, loss_cfg, opt_cfg,
        dataclasses.replace(run_cfg, ckpt_dir=str(tmp_path / "straight")),
        groups, sampling)
    assert int(jax.device_get(straight.step)) == 4

    resumed_dir = str(tmp_path / "resumed")
    part = run_training(
        cfg, loss_cfg, opt_cfg,
        dataclasses.replace(run_cfg, ckpt_dir=resumed_dir, max_steps=1),
        groups, sampling)
    assert int(jax.device_get(part.step)) == 1
    resumed = run_training(
        cfg, loss_cfg, opt_cfg,
        dataclasses.replace(run_cfg, ckpt_dir=resumed_dir),
        groups, sampling)
    assert int(jax.device_get(resumed.step)) == 4

    sl = jax.tree_util.tree_leaves(jax.device_get(straight.params))
    rl = jax.tree_util.tree_leaves(jax.device_get(resumed.params))
    for a, b in zip(sl, rl):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("family", ["dhr", "colbert"])
def test_run_training_packed_smoke(tmp_path, rng, family):
    """run_training with pack_passages: loss finite, checkpoint written."""
    from dhr_tpu.data import SamplingConfig
    from dhr_tpu.train.driver import RunConfig, run_training

    # sizes divisible by the 8-device test mesh: 8 queries, 16 passages
    groups = []
    for i in range(16):
        ps = [rng.integers(2, VOCAB, int(rng.integers(3, 20))).tolist()
              for _ in range(4)]
        groups.append({
            "query": rng.integers(2, VOCAB, 4).tolist(),
            "positives": ps[:1],
            "negatives": ps[1:],
        })
    cfg = tiny_retriever(family)
    state = run_training(
        cfg,
        LossConfig(n_passages=2, remove_dims=6),
        OptimizerConfig(learning_rate=1e-3, total_steps=4),
        RunConfig(num_epochs=2, batch_size=8, save_steps=100,
                  ckpt_dir=str(tmp_path), resume=False, seed=0,
                  rng_impl="threefry2x32", pack_passages=True,
                  pack_segments=3),
        groups,
        SamplingConfig(n_passages=2, q_max_len=Q_LEN, p_max_len=P_LEN,
                       seed=0, cls_id=CLS, sep_id=SEP),
    )
    assert int(jax.device_get(state.step)) == 4
