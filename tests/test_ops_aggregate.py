import numpy as np
import jax.numpy as jnp
import pytest

from dhr_tpu.ops import aggregate, cal_remove_dim, merge_reps
from oracle import aggregate_oracle, cal_remove_dim_oracle


@pytest.mark.parametrize("dims", [128, 256, 512, 640, 768, 1280])
def test_cal_remove_dim_matches_oracle(dims):
    assert cal_remove_dim(dims) == cal_remove_dim_oracle(dims)


def test_cal_remove_dim_reference_table():
    # reference comment tevatron/Aggretriever/utils.py:5-6
    assert cal_remove_dim(768 * 2) == -198   # full-mode 768
    assert cal_remove_dim(640 * 2) == -198   # full-mode 640
    assert cal_remove_dim(512) == 314
    assert cal_remove_dim(256) == 58
    assert cal_remove_dim(128) == 58
    assert cal_remove_dim(640) == 442


@pytest.mark.parametrize("full", [True, False])
@pytest.mark.parametrize("dim,vocab", [(8, 70), (16, 130), (640, 30522)])
def test_aggregate_matches_oracle(rng, full, dim, vocab):
    if cal_remove_dim(2 * dim if full else dim, vocab) >= 0 or True:
        x = rng.standard_normal((3, vocab)).astype(np.float32)
        got = aggregate(jnp.asarray(x), dim, full=full)
        want = aggregate_oracle(x, dim, full=full)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_sign_competition_tie_goes_negative():
    # pos == neg -> output is -neg (reference uses pos > neg strictly)
    dim, vocab = 4, 16  # width 8, remove = 16 % 8 = 0
    x = np.full((1, vocab), 2.0, dtype=np.float32)
    out = aggregate(jnp.asarray(x), dim, full=True)
    np.testing.assert_allclose(np.asarray(out), -2.0 * np.ones((1, dim)))


def test_merge_reps_concatenates():
    lex = jnp.ones((2, 3), jnp.float32)
    sem = jnp.full((2, 2), 2.0, jnp.float32)
    out = merge_reps(lex, sem)
    assert out.shape == (2, 5)
    np.testing.assert_allclose(np.asarray(out[:, 3:]), 2.0)
