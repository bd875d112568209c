"""Token-level sequence packing: planner invariants + parity vs plain encode.

The packed path must reproduce the plain pad-to-max_len reps document for
document (reference pads one document per row, driver/encode.py via
p_max_len); values match to f32 rounding (XLA reduction-tree grouping shifts
with the document's offset in the row) and densify fold indices match except
on float near-ties.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from dhr_tpu.data.collate import collate_encode, wrap_specials
from dhr_tpu.encode import (
    EncodeConfig,
    Encoder,
    packed_encode_batches,
    plan_packing,
)
from dhr_tpu.models.retrievers import BiEncoder, RetrieverConfig
from dhr_tpu.models.transformer import EncoderConfig

VOCAB = 70
ROW_LEN = 40
CLS, SEP = 1, 0


def test_plan_packing_invariants(rng):
    lengths = rng.integers(3, 55, 200).tolist()  # some exceed ROW_LEN
    rows = plan_packing(lengths, ROW_LEN, max_segments=4)
    seen = [i for row in rows for i in row]
    assert sorted(seen) == list(range(200))  # every item exactly once
    for row in rows:
        assert 1 <= len(row) <= 4
        assert sum(min(lengths[i], ROW_LEN) for i in row) <= ROW_LEN
    # packing actually packs: far fewer rows than items
    assert len(rows) < 200


def test_plan_packing_respects_segment_cap(rng):
    rows = plan_packing([2] * 64, 100, max_segments=3)
    assert all(len(r) == 3 for r in rows[:-1])


def _make_model(model_type, pooling="cls", add_pooler=False, **extra):
    cfg = RetrieverConfig(
        model_type=model_type,
        encoder=EncoderConfig.tiny(vocab_size=VOCAB, dtype=jnp.float32),
        add_pooler=add_pooler,
        projection_dim=4,
        dlr_out_dim=8,
        pooling=pooling,
        **extra,
    )
    model = BiEncoder(cfg)
    b = {
        "input_ids": jnp.zeros((2, 8), jnp.int32),
        "attention_mask": jnp.ones((2, 8), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), query=b, passage=b)["params"]
    return model, params, cfg


def _corpus(rng, n=22):
    ids = [f"d{i}" for i in range(n)]
    toks = [
        rng.integers(2, VOCAB, int(rng.integers(3, ROW_LEN - 4))).tolist()
        for _ in range(n)
    ]
    return ids, toks


def _plain_batches(ids, toks, bs, max_len):
    for start in range(0, len(ids), bs):
        chunk = ids[start:start + bs]
        wrapped = [
            wrap_specials(t, max_len, CLS, SEP)
            for t in toks[start:start + bs]
        ]
        yield collate_encode(chunk, wrapped, max_len)


def _packed_vs_plain(model_type, rng, pooling="cls", add_pooler=False,
                     **extra):
    model, params, cfg = _make_model(model_type, pooling, add_pooler, **extra)
    enc = Encoder(model, params, cfg, EncodeConfig(batch_size=4, remove_dims=6))
    ids, toks = _corpus(rng)

    plain = enc.encode_corpus(_plain_batches(ids, toks, 4, ROW_LEN))
    gen, order = packed_encode_batches(ids, toks, 4, ROW_LEN, 4, CLS, SEP)
    packed = enc.encode_corpus_packed(gen)

    inv = np.argsort(order)
    assert list(packed.docids[inv]) == list(plain.docids)
    np.testing.assert_allclose(
        np.asarray(packed.values, np.float32)[inv],
        np.asarray(plain.values, np.float32),
        atol=2e-4, rtol=1e-3,
    )
    if plain.indices is not None:
        assert (packed.indices[inv] == plain.indices).mean() > 0.98


def test_packed_matches_plain_dhr(rng):
    _packed_vs_plain("dhr", rng, add_pooler=True)


def test_packed_matches_plain_dlr(rng):
    _packed_vs_plain("dlr", rng)


def test_packed_matches_plain_dhr_segfirst(rng):
    # segment-first head order: same values as plain (max over (token, fold)
    # pairs commutes), fold indices deviate only on exact cross-token ties
    _packed_vs_plain("dhr", rng, add_pooler=True, packed_segfirst=True)


def test_packed_matches_plain_dlr_segfirst(rng):
    _packed_vs_plain("dlr", rng, packed_segfirst=True)


def test_packed_matches_plain_dense_cls(rng):
    _packed_vs_plain("dense", rng, pooling="cls")


def test_packed_matches_plain_dense_mean(rng):
    _packed_vs_plain("dense", rng, pooling="mean")


def test_packed_matches_plain_agg_full(rng):
    _packed_vs_plain("agg", rng, add_pooler=True, agg_dim=8)


def test_packed_matches_plain_agg_semi(rng):
    _packed_vs_plain("agg", rng, agg_dim=8, semi_aggregate=True)


def test_packed_rejects_agg_skip_mlm(rng):
    """skip-MLM scatters PAD-position term weights into vocab bucket 0
    (reference applies no attention mask); pad hidden states don't exist
    in packed rows, so parity is impossible and the path must raise."""
    model, params, cfg = _make_model("agg", agg_dim=8, skip_mlm=True)
    enc = Encoder(model, params, cfg, EncodeConfig(batch_size=4, remove_dims=6))
    ids, toks = _corpus(rng, n=4)
    gen, _ = packed_encode_batches(ids, toks, 4, ROW_LEN, 4, CLS, SEP)
    try:
        enc.encode_corpus_packed(gen)
    except ValueError as e:
        assert "skip_mlm" in str(e)
    else:
        raise AssertionError("agg skip_mlm packed encode should raise")


def test_packed_plane_rejects_colbert(rng):
    """colbert must not silently emit packed PLANES (it has no packed-plane
    rep); the error routes users to its token-rep packed path."""
    model, params, cfg = _make_model("colbert")
    enc = Encoder(model, params, cfg, EncodeConfig(batch_size=4, remove_dims=6))
    ids, toks = _corpus(rng, n=4)
    gen, _ = packed_encode_batches(ids, toks, 4, ROW_LEN, 4, CLS, SEP)
    try:
        enc.encode_corpus_packed(gen)
    except ValueError as e:
        assert "encode_tokens_packed" in str(e)
    else:
        raise AssertionError("colbert packed plane encode should raise")


def test_packed_tokens_match_plain_colbert(rng):
    """colbert packed token reps == plain per-document padded reps.

    The head is purely per-token (projection + pad zeroing), so packing only
    changes the transformer call; each document's segment is laid out
    [CLS], t1, ... and the host unpack must restore the exact (N, L, D)
    layout :mod:`dhr_tpu.retrieval.colbert` scores, including zero rows past
    the document's length."""
    model, params, cfg = _make_model("colbert")
    enc = Encoder(model, params, cfg, EncodeConfig(batch_size=4, remove_dims=6))
    ids, toks = _corpus(rng)

    plain, plain_ids = enc.encode_tokens(
        _plain_batches(ids, toks, 4, ROW_LEN), "passage"
    )
    gen, order = packed_encode_batches(ids, toks, 4, ROW_LEN, 4, CLS, SEP)
    packed, packed_ids = enc.encode_tokens_packed(gen, ROW_LEN)

    inv = np.argsort(order)
    assert [packed_ids[i] for i in inv] == list(plain_ids)
    np.testing.assert_allclose(
        np.asarray(packed, np.float32)[inv],
        np.asarray(plain, np.float32),
        atol=2e-4, rtol=1e-3,
    )
    # zero rows past each document's wrapped length survive the unpack
    ln = len(wrap_specials(toks[0], ROW_LEN, CLS, SEP))
    assert np.all(np.asarray(packed)[inv][0, ln:] == 0)

    # MaxSim scores from packed reps == from plain reps
    from dhr_tpu.retrieval.colbert import maxsim_pairwise

    q = plain[:4]  # any reps work as the query side for score parity
    s_plain = np.asarray(maxsim_pairwise(jnp.asarray(q),
                                         jnp.asarray(plain[:4])))
    s_packed = np.asarray(maxsim_pairwise(jnp.asarray(q),
                                          jnp.asarray(packed[inv][:4])))
    np.testing.assert_allclose(s_packed, s_plain, atol=1e-3, rtol=1e-4)


def test_packed_mesh_encode_matches_single_device(rng, eight_devices):
    """Mesh-DP packed encode (rows sharded over devices) == single-device."""
    from dhr_tpu.parallel import make_mesh

    model, params, cfg = _make_model("dhr", add_pooler=True)
    ids, toks = _corpus(rng, n=30)

    enc1 = Encoder(model, params, cfg, EncodeConfig(batch_size=8, remove_dims=6))
    gen1, order1 = packed_encode_batches(ids, toks, 8, ROW_LEN, 4, CLS, SEP)
    p1 = enc1.encode_corpus_packed(gen1)

    mesh = make_mesh(eight_devices, axis="data")
    enc8 = Encoder(model, params, cfg,
                   EncodeConfig(batch_size=8, remove_dims=6), mesh=mesh)
    gen8, order8 = packed_encode_batches(ids, toks, 8, ROW_LEN, 4, CLS, SEP)
    p8 = enc8.encode_corpus_packed(gen8)

    np.testing.assert_array_equal(order1, order8)
    assert list(p1.docids) == list(p8.docids)
    # the sharded program may group f32 reductions differently, moving the
    # final f16 rounding by one ulp on a handful of entries
    np.testing.assert_allclose(
        np.asarray(p1.values, np.float32), np.asarray(p8.values, np.float32),
        atol=1e-3, rtol=0,
    )
    assert (p1.indices == p8.indices).mean() > 0.98


def test_cli_encode_pack_matches_plain(tmp_path, rng):
    """`encode --pack`: same reps/docids as the pad-to-max path."""
    from dhr_tpu.cli.main import main
    from dhr_tpu.data.examples import write_jsonl
    from dhr_tpu.retrieval import PackedIndex

    corpus_rows = [
        {"text_id": f"d{i}",
         "text": rng.integers(2, VOCAB, int(rng.integers(3, 36))).tolist()}
        for i in range(20)
    ]
    corpus_path = str(tmp_path / "corpus.jsonl")
    write_jsonl(corpus_path, corpus_rows)

    common = ["--model", "dhr", "--tiny", "--tiny-vocab", str(VOCAB),
              "--add-pooler", "--projection-dim", "4",
              "--dlr-out-dim", "8", "--remove-dims", "6",
              "--cls-token-id", "1", "--sep-token-id", "0",
              "--q-max-len", "6", "--p-max-len", str(ROW_LEN),
              "--input", corpus_path, "--batch-size", "4"]
    plain, packed = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    main(["encode", *common, "--output", plain])
    main(["encode", *common, "--output", packed, "--pack",
          "--pack-segments", "4"])

    a, b = PackedIndex.load(plain), PackedIndex.load(packed)
    assert list(a.docids) == list(b.docids)
    np.testing.assert_allclose(np.asarray(b.values, np.float32),
                               np.asarray(a.values, np.float32),
                               atol=2e-3, rtol=2e-2)
    assert (a.indices == b.indices).mean() > 0.98


def test_cli_encode_pack_colbert_matches_plain(tmp_path, rng):
    """`encode --pack --model colbert`: same token reps/ids as pad-to-max."""
    from dhr_tpu.cli.main import main
    from dhr_tpu.data.examples import write_jsonl

    corpus_rows = [
        {"text_id": f"d{i}",
         "text": rng.integers(2, VOCAB, int(rng.integers(3, 36))).tolist()}
        for i in range(16)
    ]
    corpus_path = str(tmp_path / "corpus.jsonl")
    write_jsonl(corpus_path, corpus_rows)

    common = ["--model", "colbert", "--tiny", "--tiny-vocab", str(VOCAB),
              "--projection-dim", "4",
              "--cls-token-id", "1", "--sep-token-id", "0",
              "--q-max-len", "6", "--p-max-len", str(ROW_LEN),
              "--input", corpus_path, "--batch-size", "4"]
    plain, packed = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    main(["encode", *common, "--output", plain])
    main(["encode", *common, "--output", packed, "--pack",
          "--pack-segments", "4"])

    a = np.load(plain)["token"]
    b = np.load(packed)["token"]
    with open(plain + ".ids.json") as f:
        ids_a = json.load(f)
    with open(packed + ".ids.json") as f:
        ids_b = json.load(f)
    assert ids_a == ids_b
    assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(b, np.float32),
                               np.asarray(a, np.float32),
                               atol=2e-3, rtol=2e-2)
