"""Tensor parallelism over a 2-D (data, model) mesh.

Beyond-reference capability (the reference is DP-only, SURVEY.md 2.10):
param shardings alone make XLA insert the TP collectives; results must be
numerically identical to the unsharded step.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dhr_tpu.models.retrievers import BiEncoder, RetrieverConfig
from dhr_tpu.models.transformer import EncoderConfig
from dhr_tpu.parallel.tp import shard_params_tp, tp_param_specs
from dhr_tpu.train import LossConfig, TrainState, make_train_step


def tiny(n_heads=4, intermediate=64):
    return RetrieverConfig(
        model_type="dhr",
        encoder=EncoderConfig(
            vocab_size=70, hidden_size=32, num_layers=2, num_heads=n_heads,
            intermediate_size=intermediate, max_position_embeddings=64,
            type_vocab_size=0, dtype=jnp.float32,
            hidden_dropout=0.0, attention_dropout=0.0,
        ),
        add_pooler=True, projection_dim=8, dlr_out_dim=8,
    )


def make_batch(rng, B=8, n=2):
    def block(m, L):
        return {
            "input_ids": jnp.asarray(rng.integers(1, 70, (m, L)), jnp.int32),
            "attention_mask": jnp.ones((m, L), jnp.int32),
        }
    return {"query": block(B, 6), "passage": block(B * n, 8)}


def test_tp_specs_cover_hot_kernels(rng):
    cfg = tiny()
    model = BiEncoder(cfg)
    batch = make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), query=batch["query"],
                        passage=batch["passage"])["params"]
    specs = tp_param_specs(params)
    layer = specs["encoder_q"]["backbone"]["encoder"]["layers_0"]
    assert layer["attention"]["query"]["kernel"] == P(None, "model", None)
    assert layer["attention"]["out"]["kernel"] == P("model", None, None)
    assert layer["ffn_in"]["kernel"] == P(None, "model")
    assert layer["ffn_out"]["kernel"] == P("model", None)
    emb = specs["encoder_q"]["backbone"]["encoder"]["embeddings"]
    assert emb["word"]["embedding"] == P()


def test_tp_train_step_matches_unsharded(rng, eight_devices):
    import optax

    cfg = tiny()
    model = BiEncoder(cfg)
    batch = make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), query=batch["query"],
                        passage=batch["passage"])["params"]
    step = jax.jit(make_train_step(model, cfg,
                                   LossConfig(n_passages=2, remove_dims=6)))
    key = jax.random.PRNGKey(1)

    # unsharded
    s0 = TrainState.create(params, optax.sgd(1e-2))
    s0, m0 = step(s0, batch, key)
    loss0 = float(m0["loss"])

    # 2-D mesh: batch over data, params over model
    mesh = Mesh(np.asarray(eight_devices).reshape(2, 4), ("data", "model"))
    with jax.set_mesh(mesh):
        tp_params = shard_params_tp(params, mesh)
        sharded_batch = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch
        )
        s1 = TrainState.create(tp_params, optax.sgd(1e-2))
        key_r = jax.device_put(key, NamedSharding(mesh, P()))
        s1, m1 = step(s1, sharded_batch, key_r)
        loss1 = float(m1["loss"])

    assert abs(loss0 - loss1) < 1e-4, (loss0, loss1)
    # params after one step match too
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(jax.device_get(b)), atol=1e-4
        ),
        s0.params, s1.params,
    )
    # the hot kernels really are distributed over the model axis
    ffn_kernel = s1.params["encoder_q"]["backbone"]["encoder"]["layers_0"][
        "ffn_in"]["kernel"]
    assert len(ffn_kernel.sharding.device_set) == 8


def test_fsdp_train_step_matches_unsharded(rng, eight_devices):
    import optax

    from dhr_tpu.parallel.tp import shard_params_fsdp

    cfg = tiny()
    model = BiEncoder(cfg)
    batch = make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), query=batch["query"],
                        passage=batch["passage"])["params"]
    step = jax.jit(make_train_step(model, cfg,
                                   LossConfig(n_passages=2, remove_dims=6)))
    key = jax.random.PRNGKey(1)

    s0 = TrainState.create(params, optax.sgd(1e-2))
    s0, m0 = step(s0, batch, key)

    mesh = Mesh(np.asarray(eight_devices), ("data",))
    with jax.set_mesh(mesh):
        fsdp_params = shard_params_fsdp(params, mesh, min_size=64)
        sharded_batch = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch
        )
        s1 = TrainState.create(fsdp_params, optax.sgd(1e-2))
        key_r = jax.device_put(key, NamedSharding(mesh, P()))
        s1, m1 = step(s1, sharded_batch, key_r)

    assert abs(float(m0["loss"]) - float(m1["loss"])) < 1e-4
    # embeddings (70 rows, not divisible by 8) fell back to replication;
    # ffn kernels are genuinely sharded... hidden=32: ffn_in (32, 64):
    # 32 % 8 == 0 -> sharded
    k = s1.params["encoder_q"]["backbone"]["encoder"]["layers_0"]["ffn_in"][
        "kernel"]
    assert len(k.sharding.device_set) == 8
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(jax.device_get(b)), atol=1e-4
        ),
        s0.params, s1.params,
    )


def test_hybrid_mesh_fsdp_dp_train_step(rng, eight_devices):
    """Multi-host recipe: params FSDP-sharded over the inner (ICI) axis,
    batch DP over the collapsed (host, data) axes — DCN carries only grad
    all-reduces. Loss/params must match the unsharded step."""
    import optax

    from dhr_tpu.parallel import make_hybrid_mesh
    from dhr_tpu.parallel.tp import shard_params_fsdp

    cfg = tiny()
    model = BiEncoder(cfg)
    batch = make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), query=batch["query"],
                        passage=batch["passage"])["params"]
    step = jax.jit(make_train_step(model, cfg,
                                   LossConfig(n_passages=2, remove_dims=6)))
    key = jax.random.PRNGKey(1)

    s0 = TrainState.create(params, optax.sgd(1e-2))
    s0, m0 = step(s0, batch, key)

    mesh = make_hybrid_mesh(eight_devices, inner_axis="data", num_hosts=2)
    assert mesh.shape == {"host": 2, "data": 4}
    with jax.set_mesh(mesh):
        # params sharded over the inner axis only: all-gathers stay on ICI
        fsdp_params = shard_params_fsdp(params, mesh, axis="data", min_size=64)
        sharded_batch = jax.tree.map(
            lambda x: jax.device_put(
                x, NamedSharding(mesh, P(("host", "data")))), batch
        )
        s1 = TrainState.create(fsdp_params, optax.sgd(1e-2))
        key_r = jax.device_put(key, NamedSharding(mesh, P()))
        s1, m1 = step(s1, sharded_batch, key_r)

    assert abs(float(m0["loss"]) - float(m1["loss"])) < 1e-4
    k = s1.params["encoder_q"]["backbone"]["encoder"]["layers_0"]["ffn_in"][
        "kernel"]
    assert len(k.sharding.device_set) == 8  # sharded over data, repl over host
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(jax.device_get(b)), atol=1e-4
        ),
        s0.params, s1.params,
    )
