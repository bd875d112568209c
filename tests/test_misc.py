"""Coverage for smaller pieces: optimizer schedule, TASB/KD loader paths,
native fallbacks, mesh helpers."""

import random

import numpy as np
import jax
import jax.numpy as jnp

from dhr_tpu.data import SamplingConfig, TASBSampler, TrainLoader
from dhr_tpu.train.optimizer import (
    OptimizerConfig,
    decay_mask,
    frozen_word_embedding_mask,
    linear_warmup_decay,
)


def test_linear_warmup_decay_shape():
    cfg = OptimizerConfig(learning_rate=1e-3, warmup_steps=10, total_steps=110)
    sched = linear_warmup_decay(cfg)
    assert float(sched(0)) < 1e-4
    assert abs(float(sched(10)) - 1e-3) < 1e-9
    mid = float(sched(60))
    assert 0 < mid < 1e-3
    assert float(sched(110)) < 1e-8


def test_decay_mask_excludes_norms_and_biases():
    params = {
        "layer": {"kernel": np.zeros(1), "bias": np.zeros(1)},
        "layer_norm": {"scale": np.zeros(1)},
        "embeddings": {"word": {"embedding": np.zeros(1)}},
    }
    mask = decay_mask(params)
    assert mask["layer"]["kernel"] is True
    assert mask["layer"]["bias"] is False
    assert mask["layer_norm"]["scale"] is False
    frozen = frozen_word_embedding_mask(params)
    assert frozen["embeddings"]["word"]["embedding"] is True
    assert frozen["layer"]["kernel"] is False


def test_train_loader_tasb_and_kd(rng):
    groups = []
    for i in range(12):
        groups.append({
            "query": [i + 1],
            "positive_pids": ["0", "1"],
            "negative_pids": ["2", "3"],
            "bin_pairs": [[[[0, 0, 1.5]]]],
        })
    from dhr_tpu.data import Corpus

    corpus = Corpus(["0", "1", "2", "3"], [[1], [2], [3], [4]])
    clusters = [{"qidx": [i]} for i in range(12)]
    loader = TrainLoader(
        groups,
        SamplingConfig(n_passages=2, q_max_len=3, p_max_len=3),
        batch_size=4,
        corpus=corpus,
        kd=True,
        tasb=TASBSampler(clusters, clusters_per_batch=4),
    )
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    for b in batches:
        assert b["teacher_scores"].shape == (4, 2)
        np.testing.assert_allclose(b["teacher_scores"][:, 0], 0.0)
        np.testing.assert_allclose(b["teacher_scores"][:, 1], -1.5)


def test_native_python_fallbacks_match(monkeypatch, rng, tmp_path):
    """Force the pure-Python fallbacks and compare against the native lib."""
    import json

    from dhr_tpu import native

    docs = [rng.integers(0, 20, rng.integers(2, 8)).tolist() for _ in range(6)]
    offsets = np.zeros(len(docs) + 1, np.int64)
    np.cumsum([len(d) for d in docs], out=offsets[1:])
    tokens = np.asarray([t for d in docs for t in d], np.int32)

    t1, w1, o1, df1 = native.bm25_csr(tokens, offsets, 20)

    p = tmp_path / "c.jsonl"
    with open(p, "w") as f:
        for i, d in enumerate(docs):
            f.write(json.dumps({"text_id": f"d{i}", "text": d}) + "\n")
    ids_n, tok_n, off_n = native.load_tokenized_corpus_native(str(p))

    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    assert not native.available()
    t2, w2, o2, df2 = native.bm25_csr(tokens, offsets, 20)
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_allclose(w1, w2, rtol=1e-5)
    np.testing.assert_array_equal(df1, df2)
    ids_p, tok_p, off_p = native.load_tokenized_corpus_native(str(p))
    assert ids_p == ids_n
    np.testing.assert_array_equal(tok_p, tok_n)
    np.testing.assert_array_equal(off_p, off_n)

    scores = rng.standard_normal((2, 3, 4)).astype(np.float32)
    idsm = rng.permutation(24).reshape(2, 3, 4).astype(np.int64)
    s_py, i_py = native.merge_topk_shards(scores, idsm, k_out=3)
    monkeypatch.setattr(native, "_tried", False)
    monkeypatch.setattr(native, "_lib", None)
    assert native.available()
    s_c, i_c = native.merge_topk_shards(scores, idsm, k_out=3)
    np.testing.assert_allclose(s_py, s_c, rtol=1e-6)
    np.testing.assert_array_equal(i_py, i_c)


def test_mesh_helpers(eight_devices):
    from dhr_tpu.parallel import make_mesh, pad_rows_to_multiple, row_sharded

    mesh = make_mesh(eight_devices, axis="data")
    assert mesh.shape["data"] == 8
    arr, n = pad_rows_to_multiple(np.ones((10, 3)), 8)
    assert arr.shape == (16, 3) and n == 10
    sharding = row_sharded(mesh)
    x = jax.device_put(jnp.zeros((16, 3)), sharding)
    assert len(x.sharding.device_set) == 8


def test_make_hybrid_mesh_rejects_uneven_host_grouping():
    """A filtered device list whose rows would span processes must raise
    (divisibility alone is not enough — rows must be single-host)."""
    import types

    import pytest

    from dhr_tpu.parallel import make_hybrid_mesh

    def dev(proc, i):
        return types.SimpleNamespace(process_index=proc, id=i)

    devices = [dev(0, i) for i in range(3)] + [dev(1, i) for i in range(5)]
    with pytest.raises(ValueError, match="span processes"):
        make_hybrid_mesh(devices, num_hosts=2)


def test_row_axes_recognizes_renamed_outer_axis(eight_devices):
    """make_hybrid_mesh(host_axis=...) must still row-shard over both axes."""
    import numpy as np

    from jax.sharding import Mesh

    from dhr_tpu.parallel import make_hybrid_mesh, row_axes

    mesh = make_hybrid_mesh(eight_devices, num_hosts=2, host_axis="pod")
    assert mesh.axis_names == ("pod", "index")
    assert row_axes(mesh, "index") == ("pod", "index")
    # 1-D mesh unchanged
    assert row_axes(Mesh(np.asarray(eight_devices), ("index",)), "index") \
        == ("index",)
    # axis missing from the mesh: fall back to the bare axis
    assert row_axes(mesh, "data") == ("data",)


def test_bench_and_entry_modules_import():
    """bench.py / __graft_entry__.py must at least import cleanly on CPU —
    a syntax/import break would otherwise surface only in the driver's
    end-of-round run."""
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in ("bench", "__graft_entry__"):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(repo, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    assert callable(mod.entry) and callable(mod.dryrun_multichip)


def test_row_axes_rejects_inner_axis_on_outer_position(eight_devices):
    """A caller-built (index, host) mesh would route the heavy stage-1
    all-gather over the outer/DCN axis; row_axes must fail loudly."""
    import numpy as np
    import pytest
    from jax.sharding import Mesh

    from dhr_tpu.parallel import row_axes

    bad = Mesh(np.asarray(eight_devices).reshape(4, 2), ("index", "host"))
    with pytest.raises(ValueError, match="outer"):
        row_axes(bad, "index")
