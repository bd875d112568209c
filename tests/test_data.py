import json
import random

import numpy as np

from dhr_tpu.data import (
    Corpus,
    SamplingConfig,
    TASBSampler,
    TrainLoader,
    collate_train,
    load_tokenized_corpus,
    pad_token_batch,
    sample_kd_example,
    sample_train_example,
    select_passages,
    write_jsonl,
)


def test_pad_token_batch():
    b = pad_token_batch([[1, 2], [3, 4, 5, 6, 7]], max_len=4, pad_id=0)
    np.testing.assert_array_equal(b["input_ids"],
                                  [[1, 2, 0, 0], [3, 4, 5, 6]])
    np.testing.assert_array_equal(b["attention_mask"],
                                  [[1, 1, 0, 0], [1, 1, 1, 1]])


def test_select_passages_rotation():
    cfg = SamplingConfig(n_passages=3, seed=7)
    positives = ["p0", "p1"]
    negatives = [f"n{i}" for i in range(6)]
    rng = random.Random(0)
    pos_e0, negs_e0 = select_passages(positives, negatives, 5, 0, cfg, rng)
    pos_e1, negs_e1 = select_passages(positives, negatives, 5, 1, cfg, rng)
    # positive rotates with epoch
    assert pos_e0 == positives[(5 + 7 + 0) % 2]
    assert pos_e1 == positives[(5 + 7 + 1) % 2]
    # negatives: deterministic per (item, seed), windows rotate with epoch
    assert len(negs_e0) == 2 and len(negs_e1) == 2
    pool = list(negatives)
    random.Random(5 + 7).shuffle(pool)
    pool = pool * 2
    assert negs_e0 == pool[0:2]
    assert negs_e1 == pool[2:4]


def test_select_passages_few_negatives_resamples():
    cfg = SamplingConfig(n_passages=5, seed=0)
    rng = random.Random(3)
    _, negs = select_passages(["p"], ["n0"], 0, 0, cfg, rng)
    assert negs == ["n0"] * 4


def test_sample_train_example_with_pid_corpus():
    corpus = Corpus([f"d{i}" for i in range(4)], [[i, i + 1] for i in range(4)])
    group = {"query": [9, 9, 9], "positive_pids": [2], "negative_pids": [0, 1]}
    cfg = SamplingConfig(n_passages=2, q_max_len=2, p_max_len=4)
    q, ps, scores = sample_train_example(group, 0, 0, cfg, random.Random(0),
                                         corpus)
    assert q == [9, 9]  # truncated to q_max_len
    assert ps[0] == [2, 3]  # positive text from corpus
    assert scores is None


def test_sample_kd_example_scores_are_neg_margin():
    corpus = Corpus([f"d{i}" for i in range(4)], [[i] for i in range(4)])
    group = {
        "query": [5],
        "positive_pids": [1, 2],
        "negative_pids": [0, 3],
        "bin_pairs": [[[[0, 1, 2.5]]]],  # one bin set, one bin, one pair
    }
    cfg = SamplingConfig(n_passages=2)
    q, ps, scores = sample_kd_example(group, cfg, random.Random(0), corpus)
    assert ps == [[1], [3]]  # pos pid 1, neg pid 3
    assert scores == [-2.5]


def test_collate_train_with_teacher_scores():
    examples = [
        ([1, 2], [[3], [4]], [-1.0]),
        ([5], [[6], [7]], [-2.0]),
    ]
    batch = collate_train(examples, q_max_len=3, p_max_len=2)
    assert batch["query"]["input_ids"].shape == (2, 3)
    assert batch["passage"]["input_ids"].shape == (4, 2)
    np.testing.assert_array_equal(
        batch["teacher_scores"], [[0.0, -1.0], [0.0, -2.0]]
    )


def test_tasb_sampler_same_step_same_clusters():
    clusters = [{"qidx": [i]} for i in range(50)]
    s = TASBSampler(clusters, seed=1, clusters_per_batch=4)
    b1 = s.batch_indices(global_step=3, batch_size=16)
    b2 = s.batch_indices(global_step=3, batch_size=16)
    assert b1 == b2  # deterministic per step
    # items come from at most 4 clusters
    assert len(set(b1)) <= 4


def test_train_loader_epoch(tmp_path):
    groups = [
        {"query": [i], "positives": [[i, i]], "negatives": [[9], [8], [7]]}
        for i in range(10)
    ]
    cfg = SamplingConfig(n_passages=2, q_max_len=4, p_max_len=4)
    loader = TrainLoader(groups, cfg, batch_size=4)
    batches = list(loader.epoch(0))
    assert len(batches) == 2  # drop_last
    for b in batches:
        assert b["query"]["input_ids"].shape == (4, 4)
        assert b["passage"]["input_ids"].shape == (8, 4)
    assert loader.global_step == 2


def test_corpus_jsonl_roundtrip(tmp_path):
    rows = [{"text_id": f"d{i}", "text": [i, i]} for i in range(5)]
    p = str(tmp_path / "corpus.jsonl")
    write_jsonl(p, rows)
    ids, texts = load_tokenized_corpus(p)
    assert ids == [f"d{i}" for i in range(5)]
    assert texts[3] == [3, 3]


class FakeTokenizer:
    def encode(self, text, add_special_tokens=False, max_length=None,
               truncation=True):
        ids = [ord(c) % 97 + 1 for c in text.split()[0]][: max_length or 8]
        return ids or [0]


def test_tokenize_corpus_file(tmp_path):
    from dhr_tpu.data.tokenize import tokenize_corpus_file

    src = tmp_path / "collection.tsv"
    src.write_text("0\thello world\n1\tfoo bar\n")
    out = str(tmp_path / "corpus.json")
    n = tokenize_corpus_file(str(src), out, FakeTokenizer(), max_len=8)
    assert n == 2
    rows = [json.loads(line) for line in open(out)]
    assert rows[0]["text_id"] == "0"
    assert isinstance(rows[0]["text"], list)


def test_build_train_groups(tmp_path):
    from dhr_tpu.data.tokenize import build_train_groups

    queries = {"q1": "hello", "q2": "there"}
    qrels = {"q1": ["p1"], "q2": ["p2"]}
    negatives = {"q1": ["p2", "p1", "p3"], "q2": ["p1"]}
    groups = list(build_train_groups(queries, qrels, negatives,
                                     FakeTokenizer()))
    assert len(groups) == 2
    g1 = next(g for g in groups if g["positive_pids"] == ["p1"])
    assert g1["negative_pids"] == ["p2", "p3"]  # positive filtered out


def test_raw_text_preprocessors():
    from dhr_tpu.data.tokenize import (
        make_corpus_preprocessor,
        make_query_preprocessor,
        make_train_preprocessor,
    )

    tok = FakeTokenizer()
    train = make_train_preprocessor(tok, q_max_len=4, p_max_len=6)
    group = train({
        "query": "hello world",
        "positive_passages": [{"title": "t", "text": "body text"}],
        "negative_passages": ["plain string passage"],
    })
    assert set(group) == {"query", "positives", "negatives"}
    assert all(isinstance(t, int) for t in group["query"])
    q = make_query_preprocessor(tok)({"query_id": "q1", "query": "abc def"})
    assert q["text_id"] == "q1" and isinstance(q["text"], list)
    c = make_corpus_preprocessor(tok)({"docid": "d1", "text": "xyz"})
    assert c["text_id"] == "d1"


def test_plan_length_buckets_properties(rng):
    """plan covers every index once; bucket >= longest member; menu only."""
    from dhr_tpu.encode import plan_length_buckets

    lengths = rng.integers(1, 700, 257).tolist()
    plan, order = plan_length_buckets(lengths, batch_size=16, max_len=512,
                                      allowed=(32, 64, 128, 256, 384, 512))
    seen = np.concatenate([sel for sel, _ in plan])
    assert sorted(seen.tolist()) == list(range(257))
    assert np.array_equal(seen, order)
    menu = {32, 64, 128, 256, 384, 512}
    for sel, blen in plan:
        assert blen in menu
        assert blen >= min(max(lengths[i] for i in sel), 512)
        assert len(sel) <= 16
    # restore: argsort(order) inverts the length sort
    inv = np.argsort(order)
    assert np.array_equal(np.arange(257), order[inv])


def test_plan_length_buckets_max_len_in_menu():
    """max_len not in `allowed` is still always available as the top bucket."""
    from dhr_tpu.encode import plan_length_buckets

    plan, _ = plan_length_buckets([5, 100], batch_size=2, max_len=40,
                                  allowed=(32, 64, 128))
    assert plan[0][1] == 40  # the batch holds the len-100 item, capped at 40
