import numpy as np
import jax
import jax.numpy as jnp

from dhr_tpu.train.loss import (
    expand_teacher_margins,
    kl_onehot,
    kl_vs_teacher,
    listwise_gip,
    listwise_ip,
    listwise_maxsim,
    pairwise_maxsim,
    positive_columns,
)


def softmax_np(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def test_kl_onehot_equals_ce(rng):
    B, n = 4, 3
    scores = rng.standard_normal((B, B * n)).astype(np.float32)
    got = float(kl_onehot(jnp.asarray(scores), n))
    labels = np.arange(B) * n
    p = softmax_np(scores)
    want = -np.mean(np.log(p[np.arange(B), labels]))
    assert abs(got - want) < 1e-4


def test_kl_vs_teacher_matches_definition(rng):
    B, M = 3, 9
    s = rng.standard_normal((B, M)).astype(np.float32)
    t = rng.standard_normal((B, M)).astype(np.float32)
    got = float(kl_vs_teacher(jnp.asarray(s), jnp.asarray(t), 0.5))
    ps = softmax_np(s)
    pt = softmax_np(t * 0.5)
    want = np.mean(np.sum(pt * (np.log(pt) - np.log(ps)), axis=-1))
    assert abs(got - want) < 1e-4


def test_expand_teacher_margins(rng):
    B, n, M = 3, 2, 6
    t = rng.standard_normal((B, n)).astype(np.float32)
    out = np.asarray(expand_teacher_margins(jnp.asarray(t), M))
    want = np.full((B, M), -20.0, np.float32)
    for b in range(B):
        want[b, b * n: b * n + n] = t[b]
    np.testing.assert_allclose(out, want)


def test_listwise_gip_matches_manual(rng):
    from oracle import gip_oracle
    from dhr_tpu.ops import densify

    B, n, V, d = 2, 2, 38, 8
    q_lex = rng.random((B, V)).astype(np.float32)
    p_lex = rng.random((B * n, V)).astype(np.float32)
    got = np.asarray(listwise_gip(jnp.asarray(q_lex), jnp.asarray(p_lex), d, 6))
    qv, qi = densify(jnp.asarray(q_lex), d, 6)
    pv, pi = densify(jnp.asarray(p_lex), d, 6)
    want = gip_oracle(np.asarray(qv), np.asarray(qi), np.asarray(pv), np.asarray(pi))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_maxsim(rng):
    B, M, Lq, Lp, D = 2, 3, 4, 5, 8
    q = rng.standard_normal((B, Lq, D)).astype(np.float32)
    p = rng.standard_normal((M, Lp, D)).astype(np.float32)
    got = np.asarray(listwise_maxsim(jnp.asarray(q), jnp.asarray(p)))
    want = np.zeros((B, M))
    for b in range(B):
        for m in range(M):
            sim = q[b] @ p[m].T
            want[b, m] = sim.max(-1).sum()
    np.testing.assert_allclose(got, want, rtol=1e-5)
    got_pair = np.asarray(
        pairwise_maxsim(jnp.asarray(q), jnp.asarray(p[:B]))
    )
    np.testing.assert_allclose(got_pair, np.diag(want[:, :B]), rtol=1e-5)


def test_positive_columns():
    np.testing.assert_array_equal(np.asarray(positive_columns(3, 4)), [0, 4, 8])
