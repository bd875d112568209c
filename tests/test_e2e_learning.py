"""The full loop learns: train -> encode -> index -> search -> MRR improves.

Synthetic topical corpus: passages draw tokens from one of C topic pools;
queries draw from the same pool as their positive passage.  A trained DHR
model must rank same-topic passages above cross-topic ones, lifting MRR@10
well above the untrained model's.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dhr_tpu.data import SamplingConfig
from dhr_tpu.encode import EncodeConfig, Encoder, iter_batches
from dhr_tpu.eval import mrr_at_k
from dhr_tpu.models.retrievers import BiEncoder, RetrieverConfig
from dhr_tpu.retrieval import DeviceIndex, SearchConfig, Searcher
from dhr_tpu.train import LossConfig, OptimizerConfig
from dhr_tpu.train.driver import RunConfig, run_training
from dhr_tpu.models.transformer import EncoderConfig

VOCAB, REMOVE, DLR = 70, 6, 8
C = 8           # topics
POOL = 8        # tokens per topic pool
N_PSG = 64      # corpus size
L = 10


def make_world(rng):
    pools = [
        rng.choice(np.arange(2, VOCAB), POOL, replace=False) for _ in range(C)
    ]
    psg_topic = np.arange(N_PSG) % C
    passages = np.stack([
        rng.choice(pools[t], L) for t in psg_topic
    ]).astype(np.int32)
    return pools, psg_topic, passages


def make_groups(rng, pools, psg_topic, passages, n=96):
    groups = []
    for _ in range(n):
        t = int(rng.integers(0, C))
        q = rng.choice(pools[t], 6).astype(np.int32)
        pos_ids = np.flatnonzero(psg_topic == t)
        neg_ids = np.flatnonzero(psg_topic != t)
        pos = passages[rng.choice(pos_ids)].tolist()
        negs = [passages[i].tolist() for i in rng.choice(neg_ids, 4)]
        groups.append({"query": q.tolist(), "positives": [pos],
                       "negatives": negs})
    return groups


def retrieval_mrr(params, cfg, rng, pools, psg_topic, passages):
    model = BiEncoder(cfg)
    enc = Encoder(model, params, cfg,
                  EncodeConfig(batch_size=32, remove_dims=REMOVE))
    docids = [f"d{i}" for i in range(N_PSG)]
    mask = np.ones_like(passages)
    packed = enc.encode_corpus(iter_batches(docids, passages, mask, 32))

    n_q = 16
    q_ids = np.stack([
        rng.choice(pools[i % C], 6) for i in range(n_q)
    ]).astype(np.int32)
    qv, qi, qids = enc.encode_queries(
        iter_batches([f"q{i}" for i in range(n_q)], q_ids,
                     np.ones_like(q_ids), 32)
    )
    searcher = Searcher(DeviceIndex.from_packed(packed),
                        SearchConfig(topk=10, mode="gip", query_batch=16))
    results, scores = searcher.search_run(qids, qv, qi)
    qrels = {
        f"q{i}": {f"d{j}": 1 for j in np.flatnonzero(psg_topic == i % C)}
        for i in range(n_q)
    }
    run = {q: dict(zip(results[q], scores[q])) for q in results}
    return mrr_at_k(qrels, run, 10)


@pytest.mark.slow
def test_training_improves_retrieval(rng, tmp_path):
    pools, psg_topic, passages = make_world(rng)
    groups = make_groups(rng, pools, psg_topic, passages)

    cfg = RetrieverConfig(
        model_type="dhr",
        encoder=EncoderConfig.tiny(vocab_size=VOCAB, dtype=jnp.float32,
                                   hidden_dropout=0.0, attention_dropout=0.0),
        add_pooler=True, projection_dim=4, dlr_out_dim=DLR,
    )
    model = BiEncoder(cfg)
    dummy = {"input_ids": jnp.zeros((2, 6), jnp.int32),
             "attention_mask": jnp.ones((2, 6), jnp.int32)}
    init_params = model.init(jax.random.PRNGKey(0), query=dummy,
                             passage=dummy)["params"]

    mrr_before = retrieval_mrr(init_params, cfg, np.random.default_rng(7),
                               pools, psg_topic, passages)

    state = run_training(
        cfg,
        LossConfig(n_passages=5, remove_dims=REMOVE),
        OptimizerConfig(learning_rate=3e-3, total_steps=60,
                        warmup_steps=5),
        RunConfig(num_epochs=10, batch_size=16, save_steps=10_000,
                  log_steps=50, ckpt_dir=None),
        groups,
        SamplingConfig(n_passages=5, q_max_len=6, p_max_len=L),
        init_params=init_params,
    )
    params_after = jax.device_get(state.params)
    mrr_after = retrieval_mrr(params_after, cfg, np.random.default_rng(7),
                              pools, psg_topic, passages)
    assert mrr_after > mrr_before + 0.15, (mrr_before, mrr_after)
    assert mrr_after > 0.5, mrr_after
