"""Orbax checkpointing of the full train state + HF-compatible export.

Fixes the reference's gaps: its torch path checkpoints model weights only via
HF Trainer (no optimizer state), its JAX path saves once at the end of
training, and resume is an unimplemented TODO (reference driver/train.py:182,
driver/jax_train.py:284-292).  Here the complete ``TrainState`` (params,
optimizer state, step) is checkpointed and restorable mid-run.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from dhr_tpu.train.state import TrainState


def _state_dir(ckpt_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")


def save_train_state(ckpt_dir: str, state: TrainState) -> str:
    """Save params/opt_state/step under ``ckpt_dir/step_XXXXXXXX``.

    Multi-process safe: with ``jax.process_count() > 1`` the sharded
    ``jax.Array`` leaves are handed to Orbax directly (a collective save —
    every process must call this, as the training loop naturally does;
    ``device_get`` would raise on non-addressable cross-process shards).
    Single-process keeps the host-copy path (snapshot semantics for the
    async checkpointer are identical either way — TrainState is functional,
    the arrays are never mutated).
    """
    step = int(jax.device_get(state.step))
    path = _state_dir(ckpt_dir, step)
    if jax.process_count() > 1:
        params, opt_state = state.params, state.opt_state
    else:
        params = jax.device_get(state.params)
        opt_state = jax.device_get(state.opt_state)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            path,
            {"step": step, "params": params, "opt_state": opt_state},
            force=True,  # the end-of-run save may land on a save_steps step
        )
    return path


class AsyncCheckpointer:
    """Background-thread mid-run saves so training never stalls on IO.

    ``save_train_state`` synchronously downloads params + optimizer moments
    (hundreds of MB at DistilBERT scale — tens of seconds through a slow
    host link) and serializes them; doing that inline stalls the step loop.
    Since ``TrainState`` is functional (every step produces NEW arrays),
    handing the current state to a worker thread is snapshot-safe: the
    thread's ``device_get`` reads arrays the loop will never mutate.

    At most one save is in flight; a new save waits for the previous one
    (keeping at most one stall, and only under save-faster-than-IO misuse).
    Call :meth:`wait` before reading checkpoints or exiting.
    """

    def __init__(self):
        import threading

        self._threading = threading
        self._thread = None
        self._path: str | None = None
        self._error: BaseException | None = None

    def save(self, ckpt_dir: str, state: TrainState) -> None:
        self.wait()  # raises (and clears) any previous save's error

        def run():
            try:
                self._path = save_train_state(ckpt_dir, state)
            except BaseException as e:  # noqa: BLE001 - surfaced on wait()
                self._error = e

        self._thread = self._threading.Thread(target=run, daemon=True)
        self._thread.start()

    def wait(self) -> str | None:
        """Join the in-flight save; returns its path (or raises its error)."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err
        return self._path


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(d.split("_")[1])
        for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and not d.endswith(".tmp")
    ]
    return max(steps) if steps else None


def _abstract_template(tree):
    """Shape/dtype/sharding template: restore lands sharded, in place."""
    def leaf(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return x

    return jax.tree.map(leaf, tree)


def restore_train_state(
    ckpt_dir: str, state: TrainState, step: int | None = None
) -> TrainState:
    """Restore into the (abstract or concrete) ``state`` template.

    Multi-process safe: with ``jax.process_count() > 1`` the template is
    built from each leaf's shape/dtype/**sharding**, so Orbax restores
    every process's shards of the global arrays directly onto their
    devices (a host-copy template would raise on non-addressable shards).
    """
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = _state_dir(ckpt_dir, step)
    if jax.process_count() > 1:
        params_t = _abstract_template(state.params)
        opt_t = _abstract_template(state.opt_state)
    else:
        params_t = jax.device_get(state.params)
        opt_t = jax.device_get(state.opt_state)
    template = {
        "step": int(jax.device_get(state.step)),
        "params": params_t,
        "opt_state": opt_t,
    }
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, template)
    return state.replace(
        step=jax.numpy.asarray(restored["step"], jax.numpy.int32),
        params=restored["params"],
        opt_state=restored["opt_state"],
    )


# --------------------------------------------------------------------------
# HF-compatible model export (reference checkpoint layout, DHR/modeling.py:
# 430-441: encoder save_pretrained + query_model/passage_model subdirs when
# untied + pooler/TermWeightTrans sidecars)
# --------------------------------------------------------------------------


def export_hf_checkpoint(
    out_dir: str,
    params: dict,
    retriever_cfg: Any,
    hf_config: dict | None = None,
    arch: str = "distilbert",
) -> None:
    from dhr_tpu.models.hf_io import convert_params_to_hf_mlm, save_sidecar_head

    os.makedirs(out_dir, exist_ok=True)
    p = params["params"] if "params" in params else params
    enc_q = p["encoder_q"]
    enc_p = p.get("encoder_p")
    untied = enc_p is not None

    enc_cfg = retriever_cfg.encoder
    if hf_config is None:
        # self-contained export: synthesize the HF config from EncoderConfig
        if arch == "distilbert":
            hf_config = {
                "model_type": "distilbert",
                "vocab_size": enc_cfg.vocab_size,
                "dim": enc_cfg.hidden_size,
                "n_layers": enc_cfg.num_layers,
                "n_heads": enc_cfg.num_heads,
                "hidden_dim": enc_cfg.intermediate_size,
                "max_position_embeddings": enc_cfg.max_position_embeddings,
                "dropout": enc_cfg.hidden_dropout,
                "attention_dropout": enc_cfg.attention_dropout,
                "activation": "gelu",
            }
        else:
            hf_config = {
                "model_type": "bert",
                "vocab_size": enc_cfg.vocab_size,
                "hidden_size": enc_cfg.hidden_size,
                "num_hidden_layers": enc_cfg.num_layers,
                "num_attention_heads": enc_cfg.num_heads,
                "intermediate_size": enc_cfg.intermediate_size,
                "max_position_embeddings": enc_cfg.max_position_embeddings,
                "type_vocab_size": enc_cfg.type_vocab_size,
                "layer_norm_eps": enc_cfg.layer_norm_eps,
            }

    def write_encoder(tree, d):
        os.makedirs(d, exist_ok=True)
        backbone = tree["backbone"]
        if "encoder" not in backbone:  # TransformerEncoder without MLM head
            # encoder-only export: the reference's Dense / skip-MLM AGG /
            # ColBERT families load AutoModel from such checkpoints
            backbone = {"encoder": backbone, "mlm": None}
        sd = convert_params_to_hf_mlm(backbone, retriever_cfg.encoder, arch)
        import torch

        torch.save(
            {k: torch.from_numpy(np.asarray(v, np.float32)) for k, v in sd.items()},
            os.path.join(d, "pytorch_model.bin"),
        )
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(hf_config, f, indent=1)

    if untied:
        write_encoder(enc_q, os.path.join(out_dir, "query_model"))
        write_encoder(enc_p, os.path.join(out_dir, "passage_model"))
    else:
        write_encoder(enc_q, out_dir)

    hid = retriever_cfg.encoder.hidden_size
    if "term_weight" in enc_q:
        save_sidecar_head(
            out_dir, "TermWeightTrans",
            enc_q["term_weight"]["linear"],
            enc_p["term_weight"]["linear"] if untied else None,
            input_dim=hid, output_dim=1,
        )
    if "pooler" in enc_q:
        save_sidecar_head(
            out_dir, "pooler",
            enc_q["pooler"]["linear"],
            enc_p["pooler"]["linear"] if untied else None,
            input_dim=hid, output_dim=retriever_cfg.projection_dim,
        )
