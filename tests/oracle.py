"""Pure-NumPy oracles for the core ops.

Deliberately written as naive per-element loops, independent of the jitted
implementations, so every fast path in dhr_tpu can be checked against
first-principles semantics (reference behavior: tevatron/DHR/utils.py:5-22,
tevatron/Aggretriever/utils.py:8-44, retrieval/gip_retrieval.py:110-126).
"""

import numpy as np


def densify_oracle(x, out_dim, remove_dims):
    x = np.asarray(x, dtype=np.float64)
    B, V = x.shape
    k = (V - remove_dims) // out_dim
    values = np.zeros((B, out_dim))
    indices = np.zeros((B, out_dim), dtype=np.int64)
    for b in range(B):
        for j in range(out_dim):
            best, best_i = -np.inf, 0
            for i in range(k):
                w = x[b, remove_dims + i * out_dim + j]
                if w > best:
                    best, best_i = w, i
            values[b, j] = best
            indices[b, j] = best_i
    return values, indices


def cal_remove_dim_oracle(dims, vocab_size=30522):
    r = vocab_size % dims
    if r > 1000:
        r -= dims
    return r


def aggregate_oracle(x, dim, full=True):
    x = np.asarray(x, dtype=np.float64)
    B, V = x.shape
    if full:
        width = 2 * dim
        r = cal_remove_dim_oracle(width, V)
        if r >= 0:
            y = x[:, r:]
        else:
            y = np.concatenate([x, np.zeros((B, -r))], axis=1)
        folded = y.reshape(B, -1, width)
        tok = folded.max(axis=1)
        out = np.zeros((B, dim))
        for b in range(B):
            for j in range(dim):
                pos, neg = tok[b, 2 * j], tok[b, 2 * j + 1]
                out[b, j] = pos if pos > neg else -neg
        return out
    else:
        r = cal_remove_dim_oracle(dim, V)
        if r >= 0:
            y = x[:, r:]
        else:
            y = np.concatenate([x, np.zeros((B, -r))], axis=1)
        return y.reshape(B, -1, dim).max(axis=1)


def gip_oracle(qv, qi, pv, pi):
    qv, pv = np.asarray(qv, np.float64), np.asarray(pv, np.float64)
    qi, pi = np.asarray(qi), np.asarray(pi)
    B, d = qv.shape
    N = pv.shape[0]
    scores = np.zeros((B, N))
    for b in range(B):
        for n in range(N):
            s = 0.0
            for j in range(d):
                if qi[b, j] == pi[n, j]:
                    s += qv[b, j] * pv[n, j]
            scores[b, n] = s
    return scores
