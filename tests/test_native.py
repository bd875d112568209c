"""C++ host runtime vs pure-Python fallbacks."""

import json

import numpy as np
import pytest

from dhr_tpu import native


def test_native_builds():
    assert native.available(), "g++ build of libdhr_native.so failed"


def test_load_tokenized_corpus_native(tmp_path):
    p = tmp_path / "corpus.jsonl"
    rows = [
        {"text_id": "d0", "text": [1, 2, 3]},
        {"text_id": 42, "text": []},
        {"text_id": "d2", "text": [7]},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    ids, tokens, offsets = native.load_tokenized_corpus_native(str(p))
    assert ids == ["d0", "42", "d2"]
    np.testing.assert_array_equal(tokens, [1, 2, 3, 7])
    np.testing.assert_array_equal(offsets, [0, 3, 3, 4])


def test_native_corpus_matches_python_reader(tmp_path, rng):
    from dhr_tpu.data.examples import load_tokenized_corpus

    p = tmp_path / "c.jsonl"
    with open(p, "w") as f:
        for i in range(50):
            toks = rng.integers(0, 30000, rng.integers(1, 40)).tolist()
            f.write(json.dumps({"text_id": f"doc{i}", "text": toks}) + "\n")
    ids_n, tokens_n, off_n = native.load_tokenized_corpus_native(str(p))
    ids_p, texts_p = load_tokenized_corpus(str(p))
    assert ids_n == ids_p
    flat = [t for doc in texts_p for t in doc]
    np.testing.assert_array_equal(tokens_n, flat)


def test_bm25_csr_matches_python_vectorizer(rng):
    from dhr_tpu.densify_offline import BM25Vectorizer, TermDictionary

    vocab = 30
    docs = [rng.integers(0, vocab, rng.integers(2, 10)).tolist()
            for _ in range(12)]
    offsets = np.zeros(len(docs) + 1, np.int64)
    np.cumsum([len(d) for d in docs], out=offsets[1:])
    tokens = np.asarray([t for d in docs for t in d], np.int32)
    tids, ws, out_off, df = native.bm25_csr(tokens, offsets, vocab)

    # python oracle: TermDictionary over int terms mapped to themselves
    dic = TermDictionary()
    for d in docs:
        dic.add_document([str(t) for t in d])
    dic.build()
    v = BM25Vectorizer(dic)
    for d_i, doc in enumerate(docs):
        vec = v.doc_vector([str(t) for t in doc])
        got = {
            int(t): float(w)
            for t, w in zip(tids[out_off[d_i]: out_off[d_i + 1]],
                            ws[out_off[d_i]: out_off[d_i + 1]])
        }
        want = {int(dic_term): w for dic_term, w in
                ((term, w) for term, w in vec.items())}
        # keys map through the dictionary's sorted-term ids; compare values
        assert len(got) == len(vec)
        np.testing.assert_allclose(
            sorted(got.values()), sorted(vec.values()), rtol=1e-5
        )


def test_densify_csr_matches_scalar_twin(rng):
    from dhr_tpu.ops.densify import densify_sparse_rows

    vocab, out_dim, omission = 38, 8, 6
    docs = []
    for _ in range(10):
        ids = np.sort(rng.choice(np.arange(vocab), 12, replace=False))
        docs.append((ids, rng.random(12).astype(np.float32) + 0.01))
    offsets = np.zeros(len(docs) + 1, np.int64)
    np.cumsum([len(d[0]) for d in docs], out=offsets[1:])
    tids = np.concatenate([d[0] for d in docs]).astype(np.int32)
    ws = np.concatenate([d[1] for d in docs])
    values, indices, collisions = native.densify_csr(
        tids, ws, offsets, omission, out_dim, vocab
    )
    total_c = 0
    for i, (ids, w) in enumerate(docs):
        v, ix, c = densify_sparse_rows(ids, w, out_dim, omission, vocab)
        total_c += c
        np.testing.assert_allclose(values[i], v, rtol=1e-6)
        occupied = v > 0
        np.testing.assert_array_equal(indices[i][occupied], ix[occupied])
    assert collisions == total_c


def test_merge_topk_shards(rng):
    S, B, K = 3, 2, 4
    scores = rng.standard_normal((S, B, K)).astype(np.float32)
    ids = rng.permutation(S * B * K).reshape(S, B, K).astype(np.int64)
    out_s, out_i = native.merge_topk_shards(scores, ids, k_out=5)
    for b in range(B):
        pool = sorted(
            zip(scores[:, b].ravel(), ids[:, b].ravel()),
            key=lambda x: (-x[0], x[1]),
        )[:5]
        np.testing.assert_allclose(out_s[b], [p[0] for p in pool], rtol=1e-6)
        np.testing.assert_array_equal(out_i[b], [p[1] for p in pool])


def test_plan_packing_native_matches_python(rng, monkeypatch):
    """C++ planner == Python planner item for item (FIFO/bisect semantics),
    across degenerate shapes: empty, all-oversize, single-length runs."""
    import dhr_tpu.encode as enc_mod
    from dhr_tpu import native as native_mod

    if not native_mod.available():  # pragma: no cover - compilerless env
        import pytest

        pytest.skip("native library unavailable")

    cases = [
        rng.integers(1, 90, 500).tolist(),        # mixed, some > row_len
        [70] * 17,                                # single length
        [100, 100, 100],                          # all oversize (clipped)
        [],                                       # empty
        rng.integers(1, 12, 64).tolist(),         # many per row (seg cap)
    ]
    for lengths in cases:
        got = enc_mod.plan_packing(lengths, 64, max_segments=4)
        with monkeypatch.context() as m:
            m.setattr(native_mod, "plan_packing_native",
                      lambda *a, **k: None)
            want = enc_mod.plan_packing(lengths, 64, max_segments=4)
        assert len(got) == len(want), lengths[:8]
        for rg, rw in zip(got, want):
            assert [int(i) for i in rg] == list(rw)


def test_so_path_prefers_checkout_build_dir_else_user_cache(monkeypatch):
    """Only a source CHECKOUT (pyproject.toml beside the package) builds
    into build/; any installed layout — including a writable venv
    site-packages — caches under ~/.cache (a build/ dir dropped into
    site-packages would collide with the PyPI 'build' package and
    outlive pip uninstall)."""
    import os

    pkg_parent = os.path.dirname(native._PKG)
    # this repo IS a checkout: pyproject.toml sits beside the package
    assert native._so_path() == os.path.join(
        pkg_parent, "build", "libdhr_native.so")
    # installed layout (no pyproject.toml next to the package): cache dir
    # even though the parent is writable
    monkeypatch.setattr(os.path, "isfile", lambda p: False)
    cached = native._so_path()
    assert cached.endswith(os.path.join(
        ".cache", "dhr_tpu", "libdhr_native.so"))
    assert not cached.startswith(pkg_parent)
    # read-only checkout: cache dir too
    monkeypatch.undo()
    monkeypatch.setattr(os, "access", lambda p, m: False)
    assert native._so_path().endswith(
        os.path.join(".cache", "dhr_tpu", "libdhr_native.so"))
