import numpy as np
import jax.numpy as jnp
import pytest

from dhr_tpu.ops import densify, densify_sparse_rows, undensify
from oracle import densify_oracle


@pytest.mark.parametrize("out_dim,remove_dims,vocab", [
    (8, 6, 38),      # k = 4
    (16, 2, 50),     # k = 3
])
def test_densify_matches_oracle(rng, out_dim, remove_dims, vocab):
    B = 3
    x = rng.standard_normal((B, vocab)).astype(np.float32)
    v, i = densify(jnp.asarray(x), out_dim, remove_dims)
    ov, oi = densify_oracle(x, out_dim, remove_dims)
    np.testing.assert_allclose(np.asarray(v), ov, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), oi)


def test_densify_real_wordpiece_config_against_torch(rng):
    """Parity with the reference's torch fold-max on the real 30522 config."""
    torch = pytest.importorskip("torch")
    B, vocab, out_dim, remove = 4, 30522, 768, 570
    x = rng.standard_normal((B, vocab)).astype(np.float32)
    v, i = densify(jnp.asarray(x), out_dim, remove)
    t = torch.from_numpy(x)[:, remove:].view(B, -1, out_dim)
    tv, ti = t.max(1)
    np.testing.assert_allclose(np.asarray(v), tv.numpy(), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), ti.numpy())


def test_densify_tie_breaks_to_first_fold():
    # Two folds hold the identical max -> the lower fold index must win,
    # matching torch.Tensor.max semantics.
    vocab, out_dim, remove = 14, 4, 2  # k = 3
    x = np.zeros((1, vocab), dtype=np.float32)
    x[0, remove + 0 * out_dim + 1] = 5.0  # fold 0, slice 1
    x[0, remove + 2 * out_dim + 1] = 5.0  # fold 2, slice 1
    v, i = densify(jnp.asarray(x), out_dim, remove)
    assert float(v[0, 1]) == 5.0
    assert int(i[0, 1]) == 0


def test_densify_rejects_indivisible():
    with pytest.raises(ValueError):
        densify(jnp.zeros((1, 100)), out_dim=7, remove_dims=3)


def test_undensify_roundtrip_on_collision_free_input(rng):
    vocab, out_dim, remove = 38, 8, 6
    x = np.zeros((2, vocab), dtype=np.float32)
    # one nonzero per slice -> no collisions -> exact roundtrip
    for b in range(2):
        for j in range(out_dim):
            fold = rng.integers(0, 4)
            x[b, remove + fold * out_dim + j] = float(rng.random() + 0.1)
    v, i = densify(jnp.asarray(x), out_dim, remove)
    back = undensify(v, i, vocab, remove)
    np.testing.assert_allclose(np.asarray(back), x, rtol=1e-6)


def test_densify_sparse_rows_matches_dense_path(rng):
    vocab, out_dim, remove = 38, 8, 6
    ids = rng.choice(np.arange(vocab), size=20, replace=False)
    w = rng.random(20).astype(np.float32) + 0.01
    dense = np.zeros((1, vocab), dtype=np.float32)
    dense[0, ids] = w
    v_d, i_d = densify(jnp.asarray(dense), out_dim, remove)
    v_s, i_s, _ = densify_sparse_rows(ids, w, out_dim, remove, vocab)
    np.testing.assert_allclose(v_s, np.asarray(v_d)[0], rtol=1e-6)
    # index comparison only where a value landed (empty slices default to 0
    # in both paths)
    np.testing.assert_array_equal(i_s, np.asarray(i_d)[0] * (v_s > 0))


def test_densify_gradient_flows_to_argmax():
    import jax

    vocab, out_dim, remove = 14, 4, 2
    x = jnp.arange(vocab, dtype=jnp.float32)[None, :]

    def f(x):
        v, _ = densify(x, out_dim, remove)
        return jnp.sum(v)

    g = jax.grad(f)(x)
    # max always lands in the last fold for an increasing ramp
    expected = np.zeros((1, vocab))
    expected[0, remove + 2 * out_dim:] = 1.0
    np.testing.assert_allclose(np.asarray(g), expected)
