"""``python -m dhr_tpu`` — the framework's verbs in one CLI.

Replaces the reference's per-stage entry points with a single typed surface
(reference equivalents in parentheses):

- ``prepare-corpus``  tokenize raw corpus -> JSONL (utils/tokenize_corpus.py)
- ``prepare-train``   MS MARCO tsvs -> train groups (preprocessor_tsv.py)
- ``train``           train a retriever (driver/train.py, driver/jax_train.py)
- ``encode``          corpus/query encoding -> packed planes (driver/encode.py)
- ``densify``         sparse vectors / BM25 -> densified index
                      (densify/output_vector.py + densify_corpus.py + densify_query.py)
- ``index``           merge shards, quantize (retrieval/index.py,
                      retrieval/quantize_index.py)
- ``search``          GIP/IP retrieval -> TREC run (retrieval/gip_retrieval.py,
                      tevatron/faiss_retriever)
- ``merge-runs``      merge shard runs (retrieval/merge.result.py)
- ``eval``            qrels + run -> metrics (pyserini trec_eval operating
                      points; retrieval/rcap_eval.py)
- ``rerank-eval``     candidate-list rerank metrics (driver/eval.py)
- ``colbert-score``   standalone MaxSim scoring of saved token reps
                      (the inference path ColBERTForInference lacks offline)
- ``beir``            zero-shot BEIR harness incl. download + 13-set suite
                      (tevatron/datasets/beir)
- ``beir-preprocess`` BEIR dir -> interchange files (beir/preprocess.py)
- ``serve``           resident HTTP search service (micro-batching,
                      low-latency route, text-in /search_text, hot index
                      reload) — no reference equivalent
- ``info``            environment/device/native diagnostics (one JSON)

Every subcommand also accepts ``--config file.json`` whose keys are the long
option names (CLI flags win).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import sys
import time

import numpy as np

logger = logging.getLogger("dhr_tpu")


def _load_tokenizer(path: str):
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(path)


def _apply_config_file(args: argparse.Namespace,
                       parser: argparse.ArgumentParser) -> argparse.Namespace:
    """Fill args from a JSON file; explicit (non-default) CLI flags win."""
    cfg_path = getattr(args, "config", None)
    if not cfg_path:
        return args
    with open(cfg_path) as f:
        overrides = json.load(f)
    for key, value in overrides.items():
        key = key.replace("-", "_")
        sub = getattr(args, "_subparser", parser)
        if getattr(args, key, None) == sub.get_default(key):
            setattr(args, key, value)
    return args


# ---------------------------------------------------------------- prepare --


def cmd_prepare_corpus(args):
    from dhr_tpu.data.tokenize import tokenize_corpus_file

    tok = _load_tokenizer(args.tokenizer)
    n = tokenize_corpus_file(
        args.input, args.output, tok, max_len=args.max_len, schema=args.schema
    )
    logger.info("tokenized %d docs -> %s", n, args.output)


def cmd_prepare_train(args):
    from dhr_tpu.data.examples import write_jsonl
    from dhr_tpu.data.tokenize import (
        build_train_groups,
        read_negatives_tsv,
        read_qrels_tsv,
        read_queries_tsv,
    )

    tok = _load_tokenizer(args.tokenizer)
    groups = build_train_groups(
        read_queries_tsv(args.queries),
        read_qrels_tsv(args.qrels),
        read_negatives_tsv(args.negatives),
        tok,
        q_max_len=args.q_max_len,
        n_negatives=args.n_negatives,
    )
    write_jsonl(args.output, groups)
    logger.info("wrote train groups -> %s", args.output)


# ------------------------------------------------------------------ train --


def _check_special_ids(args, vocab_size: int) -> None:
    """Out-of-vocab [CLS]/[SEP] ids silently corrupt the embedding lookup
    (XLA clamps/garbage, the loss goes NaN) — fail loudly instead."""
    for name in ("cls_token_id", "sep_token_id"):
        tid = getattr(args, name, None)
        if tid is not None and tid >= vocab_size:
            raise SystemExit(
                f"--{name.replace('_', '-')}={tid} is out of range for "
                f"vocab_size={vocab_size}; pass in-vocab special-token ids "
                "(e.g. --cls-token-id 1 --sep-token-id 2 with --tiny-vocab)"
            )


def _model_cfg_from_args(args):
    import jax.numpy as jnp

    from dhr_tpu.models.retrievers import RetrieverConfig
    from dhr_tpu.models.transformer import EncoderConfig

    if args.model_name_or_path:
        from dhr_tpu.models.hf_io import encoder_config_from_hf

        enc = encoder_config_from_hf(
            args.model_name_or_path,
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        )
    elif args.tiny:
        enc = EncoderConfig.tiny(vocab_size=args.tiny_vocab,
                                 dtype=jnp.float32)
    else:
        enc = EncoderConfig.distilbert_base()
    return RetrieverConfig(
        model_type=args.model,
        encoder=enc,
        untie_encoder=args.untie_encoder,
        add_pooler=args.add_pooler,
        projection_dim=args.projection_dim,
        pooling=args.pooling,
        combine_cls=not args.no_combine_cls,
        dlr_out_dim=args.dlr_out_dim,
        agg_dim=args.agg_dim,
        semi_aggregate=args.semi_aggregate,
        skip_mlm=args.skip_mlm,
    )


def _model_cfg_checked(args):
    cfg = _model_cfg_from_args(args)
    _check_special_ids(args, cfg.encoder.vocab_size)
    return cfg


def _load_init_params(args, model_cfg):
    """Initialize BiEncoder params from an HF checkpoint directory."""
    import jax

    from dhr_tpu.models.hf_io import (
        convert_hf_mlm_to_params,
        load_hf_state_dict,
        load_sidecar_head,
    )
    from dhr_tpu.models.retrievers import BiEncoder

    model = BiEncoder(model_cfg)
    dummy = {
        "input_ids": np.zeros((2, 8), np.int32),
        "attention_mask": np.ones((2, 8), np.int32),
    }
    import jax.numpy as jnp

    jb = jax.tree.map(jnp.asarray, dummy)
    params = model.init(jax.random.PRNGKey(0), query=jb, passage=jb)["params"]
    if not args.model_name_or_path:
        return model, params
    sd = load_hf_state_dict(args.model_name_or_path)
    backbone = convert_hf_mlm_to_params(sd, model_cfg.encoder)
    for side in ["encoder_q"] + (
        ["encoder_p"] if model_cfg.untie_encoder else []
    ):
        if "encoder" in params[side]["backbone"]:
            if backbone.get("mlm") is None:
                raise SystemExit(
                    f"--model {model_cfg.model_type} needs an MLM-headed "
                    f"checkpoint, but {args.model_name_or_path} is "
                    "encoder-only (exported from a dense/skip-MLM/colbert "
                    "run); pass a MaskedLM checkpoint"
                )
            params[side]["backbone"] = backbone
        else:  # TransformerEncoder only (no MLM head in this family)
            params[side]["backbone"] = backbone["encoder"]
    for name, key in (("pooler", "pooler"), ("TermWeightTrans", "term_weight")):
        side_params = load_sidecar_head(args.model_name_or_path, name)
        if side_params is None:
            continue
        if key in params["encoder_q"]:
            params["encoder_q"][key] = {"linear": side_params["q"]}
        if model_cfg.untie_encoder and side_params["p"] is not None and (
            key in params["encoder_p"]
        ):
            params["encoder_p"][key] = {"linear": side_params["p"]}
    return model, params


def _build_teacher(args, student_cfg):
    """ColBERT teacher for TCT distillation (reference driver/train.py:76-101)."""
    import dataclasses

    from dhr_tpu.models.retrievers import BiEncoder

    teacher_cfg = dataclasses.replace(
        student_cfg, model_type="colbert", add_pooler=True,
        untie_encoder=False,
    )
    t_args = argparse.Namespace(**vars(args))
    t_args.model_name_or_path = args.teacher_path
    t_args.model = "colbert"
    teacher, t_params = _load_init_params(t_args, teacher_cfg)

    def teacher_apply(query, passage):
        return teacher.apply({"params": t_params}, query=query,
                             passage=passage, deterministic=True)

    return teacher_apply


def cmd_train(args):
    from dhr_tpu.data import Corpus, SamplingConfig, load_train_groups
    from dhr_tpu.train.driver import RunConfig, run_training
    from dhr_tpu.train.optimizer import OptimizerConfig
    from dhr_tpu.train.step import LossConfig

    model_cfg = _model_cfg_checked(args)
    _, init_params = _load_init_params(args, model_cfg)
    teacher_apply = None
    if args.tct:
        teacher_apply = _build_teacher(args, model_cfg)
    groups = load_train_groups(args.train_path)
    corpus = Corpus.load(args.corpus_path) if args.corpus_path else None
    clusters = None
    if args.query_cluster_path:
        from dhr_tpu.data.examples import read_jsonl

        clusters = list(read_jsonl(args.query_cluster_path))
    steps_per_epoch = max(len(groups) // args.batch_size, 1)
    state = run_training(
        model_cfg,
        LossConfig(n_passages=args.train_n_passages,
                   remove_dims=args.remove_dims,
                   use_tct_teacher=args.tct),
        OptimizerConfig(
            learning_rate=args.learning_rate,
            warmup_steps=args.warmup_steps,
            total_steps=steps_per_epoch * args.num_epochs,
            weight_decay=args.weight_decay,
            freeze_word_embeddings=args.model in ("dhr", "dlr"),
        ),
        RunConfig(
            num_epochs=args.num_epochs,
            max_steps=args.max_steps,
            batch_size=args.batch_size,
            save_steps=args.save_steps,
            log_steps=args.log_steps,
            ckpt_dir=args.output_dir,
            grad_cache=args.grad_cache,
            gc_q_chunks=args.gc_q_chunks,
            gc_p_chunks=args.gc_p_chunks,
            seed=args.seed,
            profile_dir=args.profile_dir,
            metrics_path=args.metrics_path,
            rng_impl=args.rng_impl,
            pack_passages=args.pack_passages,
            pack_segments=args.train_pack_segments,
            pack_rows=args.pack_rows,
        ),
        groups,
        SamplingConfig(
            n_passages=args.train_n_passages,
            q_max_len=args.q_max_len,
            p_max_len=args.p_max_len,
            seed=args.seed,
            cls_id=args.cls_token_id,
            sep_id=args.sep_token_id,
        ),
        corpus=corpus,
        kd=args.kd,
        tasb_clusters=clusters,
        init_params=init_params,
        teacher_apply=teacher_apply,
    )
    # HF-layout export (the reference's save format: save_pretrained +
    # pooler/TermWeightTrans sidecars) so reference tooling can read it;
    # non-MLM families (dense / skip-MLM agg / colbert) export encoder-only
    # checkpoints, which the reference loads via AutoModel
    import jax as _jax

    from dhr_tpu.train.checkpoint import export_hf_checkpoint

    hf_config = None
    if args.model_name_or_path:
        import os

        cfg_path = os.path.join(args.model_name_or_path, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                hf_config = json.load(f)
    export_hf_checkpoint(
        f"{args.output_dir}/export",
        _jax.device_get(state.params),
        model_cfg,
        hf_config=hf_config,
    )
    logger.info("training done; checkpoints in %s", args.output_dir)


# ----------------------------------------------------------------- encode --


def cmd_encode(args):
    import jax.numpy as jnp

    from dhr_tpu.data import load_tokenized_corpus
    from dhr_tpu.data.collate import collate_encode
    from dhr_tpu.encode import EncodeConfig, Encoder

    model_cfg = _model_cfg_checked(args)
    model, params = _load_init_params(args, model_cfg)
    enc = Encoder(
        model, params, model_cfg,
        EncodeConfig(batch_size=args.batch_size,
                     remove_dims=args.remove_dims),
    )
    ids, texts = load_tokenized_corpus(args.input)
    if args.encode_num_shard > 1:
        shard = np.array_split(np.arange(len(ids)), args.encode_num_shard)[
            args.encode_shard_index
        ]
        ids = [ids[i] for i in shard]
        texts = [texts[i] for i in shard]
    max_len = args.q_max_len if args.encode_is_qry else args.p_max_len

    from dhr_tpu.data.collate import wrap_specials

    order = None
    pack = getattr(args, "pack", False)
    if pack:
        # token-level packing: several documents per row, block-diagonal
        # attention; corpus side only (queries are near-uniform short)
        if args.encode_is_qry:
            raise SystemExit("--pack applies to corpus encode only")
        if getattr(args, "length_bucketing", False):
            raise SystemExit("--pack and --length-bucketing are exclusive")
        if model_cfg.model_type == "agg" and model_cfg.skip_mlm:
            # the plain skip-MLM scatter includes pad-position term weights
            # (vocab bucket 0); those rows do not exist packed — see
            # RetrieverEncoder.encode_packed
            raise SystemExit(
                "--pack is not supported for agg with --skip-mlm; "
                "use --length-bucketing"
            )
        from dhr_tpu.encode import packed_encode_batches

        _packed_gen, order = packed_encode_batches(
            ids, texts, args.batch_size, max_len, args.pack_segments,
            args.cls_token_id, args.sep_token_id,
        )

        def batches():
            return _packed_gen
    elif getattr(args, "length_bucketing", False):
        # sort-by-length batches padded to small bucket lengths: same reps
        # (masked positions), a fraction of the pad FLOPs on short-document
        # corpora; outputs are restored to input order below
        from dhr_tpu.encode import bucketed_encode_batches

        _bucketed, order = bucketed_encode_batches(
            ids, texts, args.batch_size, max_len,
            args.cls_token_id, args.sep_token_id,
        )

        def batches():
            return _bucketed
    else:
        def batches():
            for start in range(0, len(ids), args.batch_size):
                chunk_ids = ids[start: start + args.batch_size]
                toks = [
                    wrap_specials(t, max_len, args.cls_token_id,
                                  args.sep_token_id)
                    for t in texts[start: start + args.batch_size]
                ]
                yield collate_encode(chunk_ids, toks, max_len)

    def _restore(*arrays):
        """Undo the length-sort so outputs land in input order."""
        if order is None:
            return arrays
        inv = np.argsort(order)
        return tuple(a[inv] if a is not None else None for a in arrays)

    t_enc0 = time.perf_counter()
    if model_cfg.model_type == "colbert":
        if order is not None and not pack:
            raise SystemExit(
                "--length-bucketing is not supported for colbert: token "
                "reps are (N, L, D) and need one common L (--pack is the "
                "fast path instead)"
            )
        role = "query" if args.encode_is_qry else "passage"
        if pack:
            reps, out_ids = enc.encode_tokens_packed(batches(), max_len)
            inv = np.argsort(order)
            reps = reps[inv]
            out_ids = [out_ids[i] for i in inv]
        else:
            reps, out_ids = enc.encode_tokens(batches(), role)
        np.savez(args.output, token=reps)
        with open(args.output + ".ids.json", "w") as f:
            json.dump(list(map(str, out_ids)), f)
        logger.info(
            "encoded %d %ss -> %s (token reps %s)",
            len(out_ids), role, args.output, reps.shape,
        )
    elif args.encode_is_qry:
        qv, qi, qids = enc.encode_queries(batches())
        qv, qi, qids_arr = _restore(qv, qi, np.asarray(qids, dtype=object))
        np.savez(
            args.output, values=qv,
            **({"indices": qi} if qi is not None else {}),
        )
        with open(args.output + ".qids.json", "w") as f:
            json.dump(list(map(str, qids_arr)), f)
        logger.info("encoded %d queries -> %s", len(qids_arr), args.output)
    else:
        if pack:
            packed = enc.encode_corpus_packed(batches())
        else:
            packed = enc.encode_corpus(batches())
        values, indices, docids = _restore(
            packed.values, packed.indices, packed.docids
        )
        packed = dataclasses.replace(
            packed, values=values, indices=indices, docids=docids
        )
        packed.save(args.output)
        logger.info(
            "encoded %d passages%s -> %s", packed.num_rows,
            f" (packed, <={args.pack_segments} docs/row)" if pack else "",
            args.output,
        )
    enc_wall = time.perf_counter() - t_enc0
    n_enc = len(ids)
    print("DHR_TIMING " + json.dumps({
        "verb": "encode", "items": n_enc,
        "encode_wall_s": round(enc_wall, 3),
        "items_per_s": round(n_enc / max(enc_wall, 1e-9), 1),
    }), file=sys.stderr)


# ---------------------------------------------------------------- densify --


def cmd_densify(args):
    from dhr_tpu.data.examples import load_sparse_vectors
    from dhr_tpu.densify_offline import DensifyConfig, densify_corpus

    cfg = DensifyConfig(model=args.weight_model, out_dim=args.dim)
    index = densify_corpus(
        load_sparse_vectors(args.input), cfg, args.vocab_size,
        batch_size=args.batch_size,
    )
    index.save(args.output)
    logger.info(
        "densified %d docs (%d slice collisions) -> %s",
        index.num_rows, getattr(index, "collisions", -1), args.output,
    )


# ------------------------------------------------------------------ index --


def cmd_index(args):
    from dhr_tpu.retrieval import PackedIndex

    index = PackedIndex.merge_glob(args.inputs, lex_dim=args.lex_dim)
    if args.pq_m:
        index = index.quantize_pq(m=args.pq_m)
    if args.quantize:
        index = index.quantize()
    index.save(args.output)
    logger.info(
        "index: %d rows x %d dims%s -> %s", index.num_rows, index.dim,
        " (int8)" if args.quantize else "", args.output,
    )


# ----------------------------------------------------------------- search --


def cmd_search(args):
    from dhr_tpu.parallel import make_mesh
    from dhr_tpu.retrieval import (
        DeviceIndex,
        PackedIndex,
        SearchConfig,
        Searcher,
        write_run,
    )

    packed = PackedIndex.load(args.index_path)
    if args.total_shard > 1:
        per = packed.num_rows // args.total_shard
        start = per * args.shard
        stop = packed.num_rows if args.shard == args.total_shard - 1 else (
            start + per
        )
        packed = packed.slice_rows(start, stop)
    if args.query_path.endswith((".pt", ".pkl", ".pickle")):
        # reference query pickle: [query_embs, query_arg_idxs, qids]
        # (gip_retrieval.py:263-266)
        import pickle

        with open(args.query_path, "rb") as f:
            qv, qi, qids = pickle.load(f)
        qv = np.asarray(qv, np.float32)
        qi = None if qi is None else np.asarray(qi)
        qids = [str(q) for q in qids]
    else:
        with np.load(args.query_path if args.query_path.endswith(".npz")
                     else args.query_path + ".npz") as z:
            qv = z["values"]
            qi = z["indices"] if "indices" in z.files else None
        with open(args.query_path + ".qids.json") as f:
            qids = json.load(f)

    import jax

    mesh = None
    if args.shard_over_devices and len(jax.devices()) > 1:
        mesh = make_mesh(axis="index")
    device_index = DeviceIndex.from_packed(
        packed, mesh=mesh, value_dtype=_value_dtype(args.value_dtype),
        layout=_resolve_layout(args))
    search_cfg = SearchConfig(
        topk=args.topk,
        mode="pq" if getattr(args, "pqip", False) else (
            "ip" if args.ip else "gip"),
        theta=0.0 if args.brute_force else args.theta,
        rerank=args.rerank,
        agip_topk=args.agip_topk,
        lam=args.lamda,
        max_important_dims=args.max_important_dims,
        query_batch=args.query_batch,
        approx_candidates=not args.exact_candidates,
        candidate_recall=args.candidate_recall,
        candidate_bf16=not args.no_candidate_bf16,
        candidate_slices=args.candidate_slices,
        fused_candidates={"off": False, "on": True,
                          "auto": "auto"}[args.fused_candidates],
        candidate_block=args.candidate_block,
        escalate_pool=args.escalate_pool,
        escalate_margin=args.escalate_margin,
        row_chunk=getattr(args, "row_chunk", 0),
    )
    if getattr(args, "pool_calibrate", None):
        # measure the agip_topk throughput/quality frontier on these
        # queries and print the per-pool table + recommendation as JSON
        from dhr_tpu.retrieval import calibrate_pool

        report = calibrate_pool(
            device_index, search_cfg, qv, qi,
            pools=[int(x) for x in args.pool_calibrate.split(",")],
            overlap_target=args.pool_overlap_target,
            passes=args.pool_passes,
        )
        print(json.dumps(report))
        if args.output:
            with open(args.output, "w") as f:
                json.dump(report, f)
        return
    searcher = Searcher(device_index, search_cfg)
    if getattr(args, "escalate_calibrate", False):
        # measure the small-vs-full pool gap on these queries and print the
        # recommended --escalate-margin (plus the evidence) as JSON
        report = searcher.calibrate_escalation(
            qv, qi, miss_mass_target=args.escalate_miss_mass
        )
        print(json.dumps(report))
        if args.output:
            with open(args.output, "w") as f:
                json.dump(report, f)
        return
    results, scores = searcher.search_run(qids, qv, qi)
    write_run(args.output, results, scores, run_name=args.run_name)
    logger.info("wrote %s (%d queries)", args.output, len(results))
    if searcher.last_timing:
        # machine-readable wall decomposition (compile vs device work) for
        # pipeline harnesses; the stderr prefix is a stable contract
        print("DHR_TIMING " + json.dumps(
            {"verb": "search", **searcher.last_timing}), file=sys.stderr)


def _value_dtype(name: str | None):
    """None keeps DeviceIndex's default (bf16 on-device; int8 stays int8)."""
    if name is None:
        return None
    import jax.numpy as jnp

    return {"bf16": jnp.bfloat16, "f16": jnp.float16, "f32": jnp.float32}[name]


def _resolve_layout(args) -> str:
    """'auto' picks the cheapest plane layout the chosen mode can use:
    ip/pq candidates score row-major (single layout, half the HBM);
    gip needs dim-major, plus row-major only when reranking."""
    choice = getattr(args, "layout", "auto")
    if choice != "auto":
        return choice
    if getattr(args, "pqip", False) or args.ip:
        return "row"
    return "both" if args.rerank else "dim"


def cmd_serve(args):
    from dhr_tpu.parallel import make_mesh
    from dhr_tpu.retrieval import DeviceIndex, PackedIndex, SearchConfig, Searcher

    import jax

    query_encoder = None
    if args.query_encoder:
        # resident text->vector encoder for the /search_text endpoint
        from dhr_tpu.encode import EncodeConfig, Encoder, make_query_encoder

        model_cfg = _model_cfg_checked(args)
        model, params = _load_init_params(args, model_cfg)
        enc = Encoder(
            model, params, model_cfg,
            EncodeConfig(batch_size=args.query_batch,
                         remove_dims=args.remove_dims),
        )
        tok = _load_tokenizer(args.tokenizer or args.model_name_or_path)
        query_encoder = make_query_encoder(
            enc, tok, args.q_max_len, args.cls_token_id, args.sep_token_id
        )

    packed = PackedIndex.load(args.index_path)
    mesh = None
    if args.shard_over_devices and len(jax.devices()) > 1:
        mesh = make_mesh(axis="index")
    searcher = Searcher(
        DeviceIndex.from_packed(packed, mesh=mesh,
                                layout=_resolve_layout(args)),
        SearchConfig(
            topk=args.topk,
            mode="pq" if getattr(args, "pqip", False) else (
                "ip" if args.ip else "gip"),
            theta=0.0 if args.brute_force else args.theta,
            rerank=args.rerank,
            agip_topk=args.agip_topk,
            lam=args.lamda,
            max_important_dims=args.max_important_dims,
            query_batch=args.query_batch,
            approx_candidates=not args.exact_candidates,
            candidate_recall=args.candidate_recall,
            candidate_bf16=not args.no_candidate_bf16,
            candidate_slices=args.candidate_slices,
            fused_candidates={"off": False, "on": True,
                              "auto": "auto"}[args.fused_candidates],
            candidate_block=args.candidate_block,
            escalate_pool=args.escalate_pool,
            escalate_margin=args.escalate_margin,
            row_chunk=getattr(args, "row_chunk", 0),
        ),
    )
    small = None
    if args.micro_batch_ms > 0 and args.low_latency_batch > 0:
        import dataclasses as _dc

        small = Searcher(
            searcher.index,
            _dc.replace(searcher.config,
                        query_batch=args.low_latency_batch),
        )
    index_loader = None
    if args.allow_reload:
        def index_loader(path):
            # same mesh/layout knobs as the boot-time index, so a reload
            # is exactly "the same service over new data"
            return DeviceIndex.from_packed(
                PackedIndex.load(path), mesh=mesh,
                layout=_resolve_layout(args))

    from dhr_tpu.serve import SearchService, serve_service

    service = SearchService(
        searcher, micro_batch_ms=args.micro_batch_ms,
        small_searcher=small, query_encoder=query_encoder,
        max_pending=args.max_pending, index_loader=index_loader,
        reload_token=args.reload_token)
    # this frame lives for the whole serve_forever loop: drop its searcher
    # and host-plane refs so a free_first reload can actually free them
    threaded = args.micro_batch_ms > 0
    del searcher, small, packed
    serve_service(service, host=args.host, port=args.port,
                  threaded=threaded)


def cmd_info(args):
    """Environment/device diagnostics (one JSON object on stdout).

    The first thing to ask for when a deployment misbehaves: what backend
    JAX actually initialized, how many devices it sees, whether the C++
    host runtime compiled or the pure-Python fallbacks are active, and
    where compiled programs are cached.
    """
    import os
    import platform

    import jax

    import dhr_tpu
    from dhr_tpu import native

    devices = jax.devices()
    out = {
        "dhr_tpu": dhr_tpu.__version__,
        "python": platform.python_version(),
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "device_count": len(devices),
        "devices": [str(d) for d in devices[:8]]
        + (["..."] if len(devices) > 8 else []),
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "native_runtime": native.available(),
        "native_so": native._SO if native.available() else None,
        "compile_cache": jax.config.jax_compilation_cache_dir,
    }
    print(json.dumps(out, indent=1))


def cmd_merge_runs(args):
    from dhr_tpu.retrieval import merge_runs

    merge_runs(args.inputs, args.output, topk=args.topk,
               run_name=args.run_name)
    logger.info("merged -> %s", args.output)


# ------------------------------------------------------------------- eval --


def cmd_eval(args):
    from dhr_tpu.eval import (
        evaluate_run,
        mrr_at_k,
        recall_at_k,
        recall_cap_at_k,
        zero_positive_queries,
    )
    from dhr_tpu.retrieval import read_qrels, read_run

    qrels = read_qrels(args.qrels)
    run = read_run(args.run)
    # queries with no positive judgment contribute 0 to our recall metrics
    # where BEIR's published convention is undefined (ZeroDivisionError in
    # the reference); surface the count so cross-paper comparisons are safe
    n_zero = zero_positive_queries(qrels)
    strict = getattr(args, "strict", False)
    if args.rcap:
        out = {f"R_cap@{args.k}": recall_cap_at_k(qrels, run, args.k,
                                                  strict=strict)}
        if n_zero:
            out["zero_positive_queries"] = n_zero
        print(json.dumps(out))
        return
    out = {
        "MRR@10": mrr_at_k(qrels, run, 10),
        "Recall@1000": recall_at_k(qrels, run, 1000, strict=strict),
    }
    out.update(evaluate_run(qrels, run, k_values=(10, 100)))
    if n_zero:
        out["zero_positive_queries"] = n_zero
    print(json.dumps(out, indent=1))


def cmd_rerank_eval(args):
    """Candidate-list rerank evaluation (reference driver/eval.py).

    Input JSONL rows: {"qry_text_id", "qry_text": [ids], "psg_text_id",
    "psg_text": [ids], "rel"} — the EvalDataset schema (reference
    data.py:251-283)."""
    from dhr_tpu.data.examples import read_jsonl
    from dhr_tpu.eval.rerank import evaluate_rerank, make_pair_scorer

    model_cfg = _model_cfg_checked(args)
    model, params = _load_init_params(args, model_cfg)
    scorer = make_pair_scorer(model, params, model_cfg,
                              remove_dims=args.remove_dims)

    def rows():
        for r in read_jsonl(args.input):
            yield (str(r["qry_text_id"]), r["qry_text"],
                   str(r["psg_text_id"]), r["psg_text"], int(r["rel"]))

    out = evaluate_rerank(
        scorer, rows(), q_max_len=args.q_max_len, p_max_len=args.p_max_len,
        batch_size=args.batch_size, max_queries=args.max_queries,
        cls_id=args.cls_token_id, sep_id=args.sep_token_id,
        reference_compat=args.reference_ndcg,
    )
    print(json.dumps(out, indent=1))


def cmd_colbert_score(args):
    """Offline MaxSim scoring of saved ColBERT token reps.

    Closes the reference gap: ColBERTForInference
    (ColBERT/modeling.py:340-442) scores only in-process as a TCT teacher.
    Reads 'encode --model colbert' outputs plus a (qid, pid[, ...]) TSV of
    candidate pairs; writes 'qid<TAB>pid<TAB>score' rows (teacher scores for
    KD binning, or a rerank run via --trec).  With --full-ranking it is
    instead an exact end-to-end MaxSim retriever (every query vs the whole
    passage plane, streamed on device) writing a TREC run — a capability
    the reference lacks (its ColBERT scores candidate pairs only,
    ColBERT/modeling.py:340-442)."""
    from dhr_tpu.retrieval.colbert import full_ranking, score_pairs

    def load_reps(path):
        with np.load(path if path.endswith(".npz") else path + ".npz") as z:
            reps = z["token"]
        with open(path + ".ids.json") as f:
            ids = json.load(f)
        return reps, ids

    q_reps, qids = load_reps(args.query_reps)
    p_reps, pids = load_reps(args.passage_reps)
    if args.full_ranking:
        from dhr_tpu.retrieval.trec import write_run

        # surface conflicting pair-scoring flags instead of silently
        # ignoring them (full-ranking always writes a TREC run and does
        # not read --pairs / --batch-size)
        if args.pairs:
            raise SystemExit(
                "--pairs conflicts with --full-ranking (full ranking "
                "scores every query against the whole passage plane)")
        if args.trec:
            logger.warning(
                "--trec is implied by --full-ranking (always a TREC run)")
        if args.batch_size is not None:
            logger.warning(
                "--batch-size only applies to pair scoring; use "
                "--query-batch / --passage-chunk with --full-ranking")
        scores, rows = full_ranking(
            q_reps, p_reps, topk=args.topk, q_batch=args.query_batch,
            p_chunk=args.passage_chunk,
            max_plane_bytes=int(args.plane_budget_gb * (1 << 30)),
        )
        results = {str(q): [str(pids[int(r)]) for r in rr]
                   for q, rr in zip(qids, rows)}
        score_map = {str(q): [float(s) for s in ss]
                     for q, ss in zip(qids, scores)}
        write_run(args.output, results, score_map, run_name=args.run_name)
        logger.info("full-ranked %d queries over %d passages -> %s",
                    len(qids), len(pids), args.output)
        return
    if not args.pairs:
        raise SystemExit("colbert-score needs --pairs or --full-ranking")
    pairs = []
    with open(args.pairs) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                pairs.append((parts[0], parts[1]))
    scores = score_pairs(q_reps, qids, p_reps, pids, pairs,
                         batch_size=args.batch_size or 256)
    if args.trec:
        from collections import defaultdict

        from dhr_tpu.retrieval.trec import write_run

        by_q = defaultdict(list)
        for (qid, pid), s in zip(pairs, scores):
            by_q[qid].append((pid, float(s)))
        results, score_map = {}, {}
        for qid, rows in by_q.items():
            rows.sort(key=lambda x: -x[1])
            results[qid] = [p for p, _ in rows]
            score_map[qid] = [s for _, s in rows]
        write_run(args.output, results, score_map, run_name=args.run_name)
    else:
        with open(args.output, "w") as f:
            for (qid, pid), s in zip(pairs, scores):
                f.write(f"{qid}\t{pid}\t{s}\n")
    logger.info("scored %d pairs -> %s", len(pairs), args.output)


def cmd_beir_preprocess(args):
    """BEIR dataset dir -> the pipeline's interchange formats
    (reference tevatron/datasets/beir/preprocess.py role): tokenized corpus
    and query JSONL + qrels TSV, feeding encode/search/eval separately."""
    from dhr_tpu.data.examples import write_jsonl
    from dhr_tpu.eval.beir import download_beir_dataset, load_beir_dir

    import os

    dataset_dir = args.dataset_dir
    if not dataset_dir:
        if not args.dataset:
            raise SystemExit("pass --dataset-dir DIR or --dataset NAME")
        dataset_dir = download_beir_dataset(args.dataset, args.download_dir)
    tok = _load_tokenizer(args.tokenizer)
    corpus, queries, qrels = load_beir_dir(dataset_dir, args.split)
    os.makedirs(args.output_dir, exist_ok=True)

    def tokenize(text, max_len):
        ids = tok.encode(text, add_special_tokens=False,
                         max_length=max_len, truncation=True)
        return ids or [0]

    write_jsonl(
        f"{args.output_dir}/corpus.jsonl",
        ({"text_id": d, "text": tokenize(t, args.p_max_len)}
         for d, t in corpus.items()),
    )
    write_jsonl(
        f"{args.output_dir}/queries.jsonl",
        ({"text_id": q, "text": tokenize(t, args.q_max_len)}
         for q, t in queries.items()),
    )
    with open(f"{args.output_dir}/qrels.tsv", "w") as f:
        for qid, docs in qrels.items():
            for docid, rel in docs.items():
                f.write(f"{qid}\t0\t{docid}\t{rel}\n")
    logger.info("wrote corpus/queries/qrels to %s", args.output_dir)


def cmd_beir(args):
    """BEIR zero-shot eval — one local dir, or named dataset(s) fetched from
    the public BEIR bucket (reference preprocess.py:11-43 + the 13-dataset
    loop its README averages over)."""
    from dhr_tpu.encode import EncodeConfig, Encoder
    from dhr_tpu.eval.beir import (
        BEIR_13,
        download_beir_dataset,
        evaluate_beir,
    )
    from dhr_tpu.retrieval import SearchConfig

    if not args.dataset_dir and not args.datasets:
        raise SystemExit("pass --dataset-dir DIR or --datasets name[,name...]")

    model_cfg = _model_cfg_checked(args)
    if getattr(args, "pack", False):
        if getattr(args, "length_bucketing", False):
            raise SystemExit("--pack and --length-bucketing are exclusive")
        if model_cfg.model_type not in ("dense", "dhr", "dlr", "agg") or (
            model_cfg.model_type == "agg" and model_cfg.skip_mlm
        ):
            raise SystemExit(
                f"--pack is not supported for {model_cfg.model_type}"
                f"{' with --skip-mlm' if model_cfg.model_type == 'agg' else ''}"
                "; use --length-bucketing"
            )
    model, params = _load_init_params(args, model_cfg)
    enc = Encoder(
        model, params, model_cfg,
        EncodeConfig(batch_size=args.batch_size,
                     remove_dims=args.remove_dims),
    )
    tok = _load_tokenizer(args.tokenizer or args.model_name_or_path)
    search_cfg = SearchConfig(
        topk=args.topk, mode="ip" if args.ip else "gip",
        theta=args.theta, rerank=args.rerank, agip_topk=args.agip_topk,
        query_batch=args.query_batch,
    )

    def run_one(dataset_dir):
        return evaluate_beir(
            enc, search_cfg, dataset_dir, tok,
            q_max_len=args.q_max_len, p_max_len=args.p_max_len,
            split=args.split, cls_id=args.cls_token_id,
            sep_id=args.sep_token_id,
            length_bucketing=getattr(args, "length_bucketing", False),
            pack=getattr(args, "pack", False),
            pack_segments=getattr(args, "pack_segments", 8),
        )

    if args.dataset_dir:
        print(json.dumps(run_one(args.dataset_dir), indent=1))
        return

    names = (
        list(BEIR_13) if args.datasets == "all"
        else [d.strip() for d in args.datasets.split(",") if d.strip()]
    )
    table = {}
    for name in names:
        try:
            d = download_beir_dataset(name, args.download_dir)
            table[name] = run_one(d)
            logger.info("%s: %s", name, table[name])
        except RuntimeError as e:
            table[name] = {"error": str(e)}
            logger.error("%s failed: %s", name, e)
    done = [v for v in table.values() if "NDCG@10" in v]
    summary = {
        "datasets": table,
        "avg_NDCG@10": (
            sum(v["NDCG@10"] for v in done) / len(done) if done else None
        ),
        "avg_R_cap@100": (
            sum(v["R_cap@100"] for v in done) / len(done) if done else None
        ),
        "num_completed": len(done),
    }
    print(json.dumps(summary, indent=1))


# -------------------------------------------------------------- arg wiring --


def _add_model_args(p):
    p.add_argument("--model", default="dhr",
                   choices=["dense", "dhr", "dlr", "agg", "colbert"])
    p.add_argument("--model-name-or-path", default=None)
    p.add_argument("--untie-encoder", action="store_true")
    p.add_argument("--add-pooler", action="store_true")
    p.add_argument("--projection-dim", type=int, default=128)
    p.add_argument("--pooling", default="cls", choices=["cls", "mean"])
    p.add_argument("--no-combine-cls", action="store_true")
    p.add_argument("--dlr-out-dim", type=int, default=768)
    p.add_argument("--agg-dim", type=int, default=640)
    p.add_argument("--semi-aggregate", action="store_true")
    p.add_argument("--skip-mlm", action="store_true")
    p.add_argument("--remove-dims", type=int, default=570)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--cls-token-id", type=int, default=101)
    p.add_argument("--sep-token-id", type=int, default=102)
    p.add_argument("--tiny", action="store_true",
                   help="random tiny encoder (smoke tests / quickstart)")
    p.add_argument("--tiny-vocab", type=int, default=1024)
    p.add_argument("--q-max-len", type=int, default=32)
    p.add_argument("--p-max-len", type=int, default=128)
    p.add_argument("--config", default=None)


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser("dhr_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("prepare-corpus")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--max-len", type=int, default=512)
    p.add_argument("--schema", default="msmarco-passage")
    p.add_argument("--config", default=None)
    p.set_defaults(_subparser=p, fn=cmd_prepare_corpus)

    p = sub.add_parser("prepare-train")
    p.add_argument("--queries", required=True)
    p.add_argument("--qrels", required=True)
    p.add_argument("--negatives", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--q-max-len", type=int, default=32)
    p.add_argument("--n-negatives", type=int, default=200)
    p.add_argument("--config", default=None)
    p.set_defaults(_subparser=p, fn=cmd_prepare_train)

    p = sub.add_parser("train")
    _add_model_args(p)
    p.add_argument("--train-path", required=True)
    p.add_argument("--corpus-path", default=None)
    p.add_argument("--query-cluster-path", default=None)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--train-n-passages", type=int, default=8)
    p.add_argument("--learning-rate", type=float, default=5e-6)
    p.add_argument("--warmup-steps", type=int, default=2500)
    p.add_argument("--weight-decay", type=float, default=0.01)
    p.add_argument("--num-epochs", type=int, default=1)
    p.add_argument("--max-steps", type=int, default=None,
                   help="stop after this many global steps (HF "
                        "TrainingArguments.max_steps); default epoch-bounded")
    p.add_argument("--save-steps", type=int, default=20000)
    p.add_argument("--log-steps", type=int, default=100)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--kd", action="store_true")
    p.add_argument("--tct", action="store_true",
                   help="distill from an in-graph ColBERT teacher")
    p.add_argument("--teacher-path", default=None,
                   help="HF checkpoint dir for the ColBERT teacher")
    p.add_argument("--pack-passages", action="store_true",
                   help="token-pack the passage tower (several passages per "
                        "p_max_len row, block-diagonal attention): cuts the "
                        "pad FLOPs of sub-p_max_len passages "
                        "(dense/dhr/dlr/agg-MLM; not with --grad-cache/--tct)")
    p.add_argument("--train-pack-segments", type=int, default=4,
                   help="max passages packed into one training row")
    p.add_argument("--pack-rows", type=int, default=None,
                   help="packed passage rows per step (default: auto-sized "
                        "from the first batch's plan +12.5%% headroom)")
    p.add_argument("--grad-cache", action="store_true")
    p.add_argument("--gc-q-chunks", type=int, default=4,
                   help="number of query chunks per grad-cache step (the "
                        "reference's gc_q_chunk_size is a chunk SIZE; this "
                        "is a chunk COUNT: size = batch / chunks)")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace here")
    p.add_argument("--metrics-path", default=None,
                   help="append per-log-interval train metrics JSONL here")
    p.add_argument("--rng-impl", default="rbg",
                   choices=["rbg", "threefry2x32"],
                   help="dropout PRNG: rbg = TPU-native generator (measured "
                        "19%% faster steps); threefry2x32 = cross-platform "
                        "bit-identical streams")
    p.add_argument("--gc-p-chunks", type=int, default=8,
                   help="number of passage chunks per grad-cache step")
    p.set_defaults(_subparser=p, fn=cmd_train)

    p = sub.add_parser("encode")
    _add_model_args(p)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--encode-is-qry", action="store_true")
    p.add_argument("--encode-num-shard", type=int, default=1)
    p.add_argument("--encode-shard-index", type=int, default=0)
    p.add_argument("--length-bucketing", action="store_true",
                   help="sort by length and pad each batch to a small "
                        "bucket length instead of max_len (same reps, "
                        "fewer pad FLOPs on short-document corpora)")
    p.add_argument("--pack", action="store_true",
                   help="token-level sequence packing: several documents "
                        "share one p_max_len row under a block-diagonal "
                        "attention mask (dense/dhr/dlr/agg-MLM corpus encode; "
                        "goes beyond --length-bucketing when documents are "
                        "much shorter than p_max_len)")
    p.add_argument("--pack-segments", type=int, default=8,
                   help="max documents packed into one row")
    p.set_defaults(_subparser=p, fn=cmd_encode)

    p = sub.add_parser("densify")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--weight-model", default="bm25",
                   choices=["bm25", "deepimpact", "unicoil", "splade"])
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--vocab-size", type=int, required=True)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--config", default=None)
    p.set_defaults(_subparser=p, fn=cmd_densify)

    p = sub.add_parser("index")
    p.add_argument("--inputs", required=True, help="glob of shard files")
    p.add_argument("--output", required=True)
    p.add_argument("--lex-dim", type=int, default=None)
    p.add_argument("--quantize", action="store_true")
    p.add_argument("--pq-m", type=int, default=None,
                   help="attach PQ codebooks with m subquantizers "
                        "(reference quantize_index.py PQ64 = 64)")
    p.add_argument("--config", default=None)
    p.set_defaults(_subparser=p, fn=cmd_index)

    p = sub.add_parser("search")
    p.add_argument("--index-path", required=True)
    p.add_argument("--query-path", required=True)
    p.add_argument("--output", default="result.trec")
    p.add_argument("--topk", type=int, default=1000)
    p.add_argument("--theta", type=float, default=0.1)
    p.add_argument("--brute-force", action="store_true")
    p.add_argument("--IP", dest="ip", action="store_true")
    p.add_argument("--PQIP", dest="pqip", action="store_true",
                   help="PQ-code (ADC) candidate generation, like the "
                        "reference's faiss-PQ mode; needs 'index --pq-m'")
    p.add_argument("--rerank", action="store_true")
    p.add_argument("--agip-topk", type=int, default=10000)
    p.add_argument(
        "--value-dtype", default=None, choices=["bf16", "f16", "f32"],
        help="on-device value plane dtype (default: bf16 for float planes, "
             "the TPU-native width; f32 for exact score parity runs)",
    )
    p.add_argument("--lamda", type=float, default=1.0)
    p.add_argument(
        "--max-important-dims", type=int, default=128,
        help="stage-1 scan length for theta mode; queries with more "
             "above-theta dims than this are truncated in stage 1 "
             "(exact again after --rerank)",
    )
    p.add_argument("--query-batch", type=int, default=64)
    p.add_argument("--candidate-recall", type=float, default=0.95,
                   help="approx_max_k recall target for the candidate pool "
                        "(0.85 documented for latency-sensitive serving; "
                        "top-1000 recall 0.9953 at the bench point)")
    p.add_argument("--exact-candidates", action="store_true",
                   help="exact top-k candidate generation instead of "
                        "approx_max_k (slower; candidate recall 1.0)")
    p.add_argument("--no-candidate-bf16", action="store_true",
                   help="keep f32 stage-1 candidate scores (bf16 is the "
                        "default with --rerank; recall measured unchanged)")
    p.add_argument("--candidate-slices", default="auto",
                   help="stratified candidate selection: approx-top-(k/S) "
                        "per column band instead of one global top-k "
                        "(approx_max_k is k-bound; measured 17.3 -> 12.1 ms "
                        "at S=32, pool recall unchanged); 1 disables, "
                        "default auto")
    p.add_argument("--fused-candidates", default="off",
                   choices=["off", "on", "auto"],
                   help="fuse candidate block-reduction into the theta-pass "
                        "kernel (each candidate-block row group reduces to "
                        "its max in VMEM; the (B, N) score plane is never "
                        "written; power-of-two blocks pack the winner id "
                        "into the score's low mantissa bits, so no row-id "
                        "gather). 'auto' = on when the reduced pool "
                        "comfortably covers the candidate count")
    p.add_argument("--escalate-pool", type=int, default=0,
                   help="EXPERIMENTAL two-tier escalation: tier-1 candidate "
                        "pool size (e.g. 2000); queries whose reranked "
                        "topk-th score sits within --escalate-margin of the "
                        "tier-1 stage-1 pool floor re-dispatch at the full "
                        "--agip-topk. 0 disables. Measured on both bench "
                        "distributions the calibrated trigger over-fires "
                        "~3x (docs/design.md); prefer a static --agip-topk "
                        "reduction first and calibrate per corpus")
    p.add_argument("--escalate-margin", type=float, default=0.0,
                   help="escalation trigger margin (see --escalate-pool; "
                        "calibrate with --escalate-calibrate)")
    p.add_argument("--escalate-calibrate", action="store_true",
                   help="instead of searching, measure the small-vs-full "
                        "pool gap on these queries and print the "
                        "recommended --escalate-margin as JSON (requires "
                        "--escalate-pool; margins are corpus-dependent)")
    p.add_argument("--escalate-miss-mass", type=float, default=0.95,
                   help="calibration target: fraction of the missing-row "
                        "mass the escalated queries must cover")
    p.add_argument("--pool-calibrate", default=None,
                   help="instead of searching, sweep these comma-separated "
                        "--agip-topk pool sizes on these queries (e.g. "
                        "'10000,5000,2000') and print per-pool q/s + "
                        "final-top-k overlap vs the largest pool, with the "
                        "smallest pool meeting --pool-overlap-target "
                        "recommended; the pool is the main "
                        "throughput/quality lever of the rerank path "
                        "(docs/design.md) and the right size is "
                        "corpus-dependent")
    p.add_argument("--pool-overlap-target", type=float, default=0.99,
                   help="mean top-k overlap a pool must keep vs the "
                        "largest pool to be recommended")
    p.add_argument("--pool-passes", type=int, default=3,
                   help="timed passes per pool, interleaved round-robin "
                        "so clock drift cancels")
    p.add_argument("--candidate-block", type=int, default=8,
                   help="row-group size for --fused-candidates")
    p.add_argument("--layout", default="auto",
                   choices=["auto", "both", "row", "dim"],
                   help="device plane layout: 'both' row+dim-major "
                        "(gip+rerank), 'row'/'dim' keep one orientation and "
                        "halve index HBM; auto picks from the mode")
    p.add_argument("--row-chunk", type=int, default=0,
                   help="row-chunked stage 1 for --IP with --layout row "
                        "(corpus scales where a (B, N) score plane cannot "
                        "fit next to the index): 0 auto, -1 off, >0 target "
                        "rows per chunk")
    p.add_argument("--total-shard", type=int, default=1)
    p.add_argument("--shard", type=int, default=0)
    p.add_argument("--shard-over-devices", action="store_true")
    p.add_argument("--run-name", default="dhr_tpu")
    p.add_argument("--config", default=None)
    p.set_defaults(_subparser=p, fn=cmd_search)

    p = sub.add_parser("serve")
    _add_model_args(p)
    p.add_argument("--index-path", required=True)
    p.add_argument("--query-encoder", action="store_true",
                   help="load the model and serve POST /search_text "
                        "(raw query strings -> rankings); needs "
                        "--model-name-or-path (+ --tokenizer if separate)")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--topk", type=int, default=1000)
    p.add_argument("--theta", type=float, default=0.3)
    p.add_argument("--brute-force", action="store_true")
    p.add_argument("--IP", dest="ip", action="store_true")
    p.add_argument("--PQIP", dest="pqip", action="store_true",
                   help="PQ-code (ADC) candidate generation, like the "
                        "reference's faiss-PQ mode; needs 'index --pq-m'")
    p.add_argument("--rerank", action="store_true")
    p.add_argument("--agip-topk", type=int, default=10000)
    p.add_argument(
        "--value-dtype", default=None, choices=["bf16", "f16", "f32"],
        help="on-device value plane dtype (default: bf16 for float planes, "
             "the TPU-native width; f32 for exact score parity runs)",
    )
    p.add_argument("--lamda", type=float, default=1.0)
    p.add_argument(
        "--max-important-dims", type=int, default=128,
        help="stage-1 scan length for theta mode; queries with more "
             "above-theta dims than this are truncated in stage 1 "
             "(exact again after --rerank)",
    )
    p.add_argument("--query-batch", type=int, default=64)
    p.add_argument("--candidate-recall", type=float, default=0.95,
                   help="approx_max_k recall target for the candidate pool")
    p.add_argument("--exact-candidates", action="store_true")
    p.add_argument("--no-candidate-bf16", action="store_true")
    p.add_argument("--candidate-slices", default="auto",
                   help="stratified candidate selection (see 'search')")
    p.add_argument("--fused-candidates", default="off",
                   choices=["off", "on", "auto"],
                   help="fused candidate block-reduction "
                        "(see 'search --fused-candidates')")
    p.add_argument("--escalate-pool", type=int, default=0,
                   help="EXPERIMENTAL two-tier escalation: tier-1 candidate "
                        "pool size (e.g. 2000); queries whose reranked "
                        "topk-th score sits within --escalate-margin of the "
                        "tier-1 stage-1 pool floor re-dispatch at the full "
                        "--agip-topk. 0 disables. Measured on both bench "
                        "distributions the calibrated trigger over-fires "
                        "~3x (docs/design.md); prefer a static --agip-topk "
                        "reduction first and calibrate per corpus")
    p.add_argument("--escalate-margin", type=float, default=0.0,
                   help="escalation trigger margin (see --escalate-pool; "
                        "calibration notes in docs/design.md)")
    p.add_argument("--candidate-block", type=int, default=8,
                   help="row-group size for --fused-candidates")
    p.add_argument("--layout", default="auto",
                   choices=["auto", "both", "row", "dim"],
                   help="device plane layout (see 'search --layout')")
    p.add_argument("--row-chunk", type=int, default=0,
                   help="row-chunked IP stage 1 (see 'search --row-chunk')")
    p.add_argument("--shard-over-devices", action="store_true")
    p.add_argument("--micro-batch-ms", type=float, default=0.0,
                   help="> 0: threaded server + device-worker coalescing — "
                        "concurrent requests pool into one padded search "
                        "batch, waiting at most this window for stragglers")
    p.add_argument("--max-pending", type=int, default=0,
                   help="> 0 (with --micro-batch-ms): bound the ingress "
                        "queue; excess requests get HTTP 503 + Retry-After "
                        "instead of buffering without limit")
    p.add_argument("--low-latency-batch", type=int, default=0,
                   help="> 0 (with --micro-batch-ms): also compile a "
                        "small-batch search program over the same index; "
                        "pools that fit it skip the full padded batch "
                        "(lone queries get low latency)")
    p.add_argument("--reload-token", default=None,
                   help="require this value in the X-Reload-Token header "
                        "on /admin/reload; ALWAYS set it when binding a "
                        "non-loopback --host")
    p.add_argument("--allow-reload", action="store_true",
                   help="enable POST /admin/reload {\"index_path\": ...}: "
                        "load a new index and swap it in without "
                        "restarting (in-flight requests finish on the old "
                        "index; needs HBM headroom for both during the "
                        "overlap)")
    p.set_defaults(_subparser=p, fn=cmd_serve)

    p = sub.add_parser("info")
    p.add_argument("--config", default=None)
    p.set_defaults(_subparser=p, fn=cmd_info)

    p = sub.add_parser("merge-runs")
    p.add_argument("--inputs", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--topk", type=int, default=1000)
    p.add_argument("--run-name", default="dhr_tpu")
    p.add_argument("--config", default=None)
    p.set_defaults(_subparser=p, fn=cmd_merge_runs)

    p = sub.add_parser("eval")
    p.add_argument("--qrels", required=True)
    p.add_argument("--run", required=True)
    p.add_argument("--rcap", action="store_true")
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--strict", action="store_true",
                   help="fail (like BEIR's published convention / the "
                        "reference's ZeroDivisionError) when any qrels "
                        "query has no positive judgment, instead of "
                        "counting it as recall 0 and reporting "
                        "zero_positive_queries")
    p.add_argument("--config", default=None)
    p.set_defaults(_subparser=p, fn=cmd_eval)

    p = sub.add_parser("beir-preprocess")
    p.add_argument("--dataset-dir", default=None,
                   help="pre-unzipped BEIR dataset directory")
    p.add_argument("--dataset", default=None,
                   help="BEIR dataset name to download+unzip first "
                        "(reference preprocess.py:11-43)")
    p.add_argument("--download-dir", default="./beir_download")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--q-max-len", type=int, default=512)
    p.add_argument("--p-max-len", type=int, default=512)
    p.add_argument("--config", default=None)
    p.set_defaults(_subparser=p, fn=cmd_beir_preprocess)

    p = sub.add_parser("colbert-score")
    p.add_argument("--query-reps", required=True,
                   help="npz from 'encode --model colbert --encode-is-qry'")
    p.add_argument("--passage-reps", required=True,
                   help="npz from 'encode --model colbert'")
    p.add_argument("--pairs", default=None,
                   help="TSV of qid<TAB>pid candidate pairs "
                   "(omit with --full-ranking)")
    p.add_argument("--full-ranking", action="store_true",
                   help="exact MaxSim retrieval of every query against the "
                   "FULL passage plane (streamed top-k; writes a TREC run); "
                   "beyond the reference, whose ColBERT path scores "
                   "candidate pairs only")
    p.add_argument("--topk", type=int, default=1000,
                   help="results per query with --full-ranking")
    p.add_argument("--query-batch", type=int, default=16,
                   help="queries per device program with --full-ranking")
    p.add_argument("--passage-chunk", type=int, default=512,
                   help="passages per streamed scan slab with --full-ranking")
    p.add_argument("--plane-budget-gb", type=float, default=4.0,
                   help="with --full-ranking: max device-resident token-rep "
                   "plane size; larger planes stream host->device in "
                   "passage slabs with exact host-side top-k merge")
    p.add_argument("--output", required=True)
    p.add_argument("--batch-size", type=int, default=None,
                   help="pairs per device program for pair scoring "
                   "(default 256; not used with --full-ranking)")
    p.add_argument("--trec", action="store_true",
                   help="write a TREC run instead of a scores TSV")
    p.add_argument("--run-name", default="dhr_tpu")
    p.add_argument("--config", default=None)
    p.set_defaults(_subparser=p, fn=cmd_colbert_score)

    p = sub.add_parser("rerank-eval")
    _add_model_args(p)
    p.add_argument("--input", required=True)
    p.add_argument("--max-queries", type=int, default=None)
    p.add_argument(
        "--reference-ndcg", action="store_true",
        help="reference-exact NDCG (binary grading, max(0.3, norm) floor; "
             "tevatron/utils/metrics.py:36-53)",
    )
    p.set_defaults(_subparser=p, fn=cmd_rerank_eval)

    p = sub.add_parser("beir")
    _add_model_args(p)
    p.add_argument("--dataset-dir", default=None,
                   help="pre-unzipped BEIR dataset directory")
    p.add_argument("--datasets", default=None,
                   help="comma-separated BEIR dataset names to download+run, "
                        "or 'all' for the 13-dataset suite")
    p.add_argument("--download-dir", default="./beir_download")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--split", default="test")
    p.add_argument("--topk", type=int, default=1000)
    p.add_argument("--theta", type=float, default=0.0)
    p.add_argument("--IP", dest="ip", action="store_true")
    p.add_argument("--rerank", action="store_true")
    p.add_argument("--agip-topk", type=int, default=10000)
    p.add_argument("--query-batch", type=int, default=64)
    p.add_argument("--length-bucketing", action="store_true",
                   help="bucketed variable-length encode batches (fewer pad "
                        "FLOPs; BEIR results are id-keyed so the length-sort "
                        "order never matters here)")
    p.add_argument("--pack", action="store_true",
                   help="token-level sequence packing for the corpus encode "
                        "(dense/dhr/dlr/agg-MLM; beats --length-bucketing on "
                        "short-document corpora)")
    p.add_argument("--pack-segments", type=int, default=8,
                   help="max documents packed into one row")
    p.set_defaults(_subparser=p, fn=cmd_beir)

    return ap


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )
    # DHR_TPU_PLATFORM=cpu pins the verb to a platform BEFORE any backend
    # initializes.  The JAX_PLATFORMS env var is not enough on hosts whose
    # sitecustomize resets the jax_platforms config after import (observed
    # with TPU-relay setups: a "CPU-only" verb silently grabbed the
    # single-tenant TPU claim); config.update wins over both.
    plat = os.environ.get("DHR_TPU_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    # Persistent compile cache, on by default: pipeline runs invoke several
    # verbs as separate processes and each re-traces the same programs —
    # measured on the 1M rehearsal, the SAME encode verb dropped 4920s ->
    # 1063s once the cache was primed (remote TPU compiles are minutes
    # each).  Users opt out with DHR_TPU_COMPILE_CACHE=0 or override the
    # location by exporting JAX_COMPILATION_CACHE_DIR themselves.
    if os.environ.get("DHR_TPU_COMPILE_CACHE", "1") != "0" and \
            not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        import jax

        if jax.config.jax_compilation_cache_dir is None:  # not already set
            cache_dir = os.path.join(
                os.environ.get("XDG_CACHE_HOME",
                               os.path.expanduser("~/.cache")),
                "dhr_tpu", "jax_cache")
            try:
                os.makedirs(cache_dir, exist_ok=True)
                jax.config.update("jax_compilation_cache_dir", cache_dir)
            except OSError:  # read-only home: run uncached
                pass
    parser = build_parser()
    args = parser.parse_args(argv)
    args = _apply_config_file(args, parser)
    args.fn(args)


if __name__ == "__main__":
    main()
