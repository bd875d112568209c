"""ColBERT full-ranking MaxSim retrieval (retrieval/colbert.full_ranking).

Beyond-reference capability (the reference's ColBERTForInference,
ColBERT/modeling.py:340-442, scores candidate pairs only): exact
end-to-end MaxSim retrieval via a streamed top-k scan.  Pinned against
the all-pairs ``maxsim_listwise`` oracle, including the
pad-to-chunk-boundary and topk-clamp edges, plus the CLI
``colbert-score --full-ranking`` TREC route.
"""

import json

import numpy as np

import jax.numpy as jnp

from dhr_tpu.cli.main import main
from dhr_tpu.retrieval.colbert import full_ranking, maxsim_listwise


def make_reps(rng, n, length, dim=8):
    """Reps with CLS at position 0 and zero-vector padded tails (what
    encode_tokens produces: mask-multiplied token reps)."""
    reps = rng.standard_normal((n, length, dim)).astype(np.float32)
    for i in range(n):
        pad_from = int(rng.integers(2, length + 1))
        reps[i, pad_from:] = 0.0
    return reps


def test_full_ranking_matches_all_pairs_oracle(rng):
    q = make_reps(rng, 7, 5)
    p = make_reps(rng, 37, 9)  # 37 % p_chunk(8) != 0: exercises padding
    oracle = np.asarray(maxsim_listwise(jnp.asarray(q), jnp.asarray(p)))
    want_rows = np.argsort(-oracle, axis=1, kind="stable")

    scores, rows = full_ranking(q, p, topk=37, q_batch=3, p_chunk=8)
    np.testing.assert_allclose(
        scores, np.take_along_axis(oracle, rows, axis=1), rtol=1e-5)
    # ranked set is the true ranking (ties permuted within equal scores)
    np.testing.assert_allclose(
        scores, np.take_along_axis(oracle, want_rows, axis=1),
        rtol=1e-5, atol=1e-5)
    assert scores.shape == (7, 37) and rows.shape == (7, 37)
    # descending
    assert (np.diff(scores, axis=1) <= 1e-6).all()


def test_full_ranking_topk_clamp_and_head_agreement(rng):
    q = make_reps(rng, 4, 4)
    p = make_reps(rng, 16, 6)
    oracle = np.asarray(maxsim_listwise(jnp.asarray(q), jnp.asarray(p)))
    scores, rows = full_ranking(q, p, topk=5, q_batch=16, p_chunk=4)
    assert scores.shape == (4, 5)
    top1 = oracle.argmax(axis=1)
    np.testing.assert_array_equal(rows[:, 0], top1)
    # pad rows (none here) / -inf never surface
    assert np.isfinite(scores).all()


def test_full_ranking_slab_streaming_matches_resident(rng):
    """A plane over the device budget streams in passage slabs; the
    host-side exact merge must reproduce the resident-plane result."""
    q = make_reps(rng, 5, 4)
    p = make_reps(rng, 41, 6)
    want_s, want_r = full_ranking(q, p, topk=9, q_batch=2, p_chunk=4)
    # budget of ~3 chunks worth of rows forces 4 slabs of 12 rows
    got_s, got_r = full_ranking(
        q, p, topk=9, q_batch=2, p_chunk=4,
        max_plane_bytes=12 * p[0].nbytes)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-5, atol=1e-6)
    # same ranked score sequence; row ids equal away from score ties
    ties = np.isclose(want_s[:, 1:], want_s[:, :-1]).any(axis=1)
    np.testing.assert_array_equal(got_r[~ties], want_r[~ties])


def test_cli_full_ranking_rejects_pairs(tmp_path, rng):
    import pytest

    q = make_reps(rng, 2, 4)
    p = make_reps(rng, 6, 6)
    for name, reps, ids in (("q", q, ["q0", "q1"]),
                            ("p", p, [f"d{i}" for i in range(6)])):
        path = tmp_path / f"{name}.npz"
        np.savez(path, token=reps)
        with open(str(path) + ".ids.json", "w") as f:
            json.dump(ids, f)
    pairs = tmp_path / "pairs.tsv"
    pairs.write_text("q0\td0\n")
    with pytest.raises(SystemExit):
        main(["colbert-score", "--full-ranking",
              "--pairs", str(pairs),
              "--query-reps", str(tmp_path / "q.npz"),
              "--passage-reps", str(tmp_path / "p.npz"),
              "--output", str(tmp_path / "run.trec")])


def test_cli_full_ranking_trec(tmp_path, rng):
    q = make_reps(rng, 3, 4)
    p = make_reps(rng, 10, 6)
    for name, reps, ids in (("q", q, [f"q{i}" for i in range(3)]),
                            ("p", p, [f"d{i}" for i in range(10)])):
        path = tmp_path / f"{name}.npz"
        np.savez(path, token=reps)
        with open(str(path) + ".ids.json", "w") as f:
            json.dump(ids, f)
    run = tmp_path / "run.trec"
    main(["colbert-score", "--full-ranking",
          "--query-reps", str(tmp_path / "q.npz"),
          "--passage-reps", str(tmp_path / "p.npz"),
          "--output", str(run), "--topk", "4",
          "--query-batch", "2", "--passage-chunk", "4"])
    lines = [ln.split() for ln in run.read_text().splitlines()]
    assert len(lines) == 3 * 4
    oracle = np.asarray(maxsim_listwise(jnp.asarray(q), jnp.asarray(p)))
    for qi in range(3):
        rows = [ln for ln in lines if ln[0] == f"q{qi}"]
        got_top1 = rows[0][2]
        assert got_top1 == f"d{int(oracle[qi].argmax())}"
