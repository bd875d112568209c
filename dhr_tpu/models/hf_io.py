"""HF checkpoint import/export for the dhr_tpu encoder family.

The reference consumes/produces HF ``save_pretrained`` checkpoints (BERT /
DistilBERT MaskedLM weights) plus sidecar head files ``pooler.pt`` /
``TermWeightTrans.pt`` with small JSON configs (reference DHR/modeling.py:
430-441, 486-566).  This module maps those on-disk formats onto the dhr_tpu
param tree and back, so users can:

- load published reference checkpoints (jacklin/DeLADE-CLS-P, DistilBERT-AGG)
  into :class:`dhr_tpu.models.retrievers.BiEncoder`;
- export trained dhr_tpu models in a layout the reference tooling reads.

Weight-name mapping only — no torch compute.  torch is imported lazily and
only needed for ``.bin``/``.pt`` files; ``.safetensors`` uses the safetensors
reader when available.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax.numpy as jnp
import numpy as np

from dhr_tpu.models.transformer import EncoderConfig


# --------------------------------------------------------------------------
# raw state-dict I/O
# --------------------------------------------------------------------------


def load_hf_state_dict(model_dir: str) -> dict[str, np.ndarray]:
    """Load an HF checkpoint directory's tensors as numpy arrays."""
    st_path = os.path.join(model_dir, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        return dict(load_file(st_path))
    bin_path = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.exists(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no model.safetensors / pytorch_model.bin in {model_dir}")


def encoder_config_from_hf(model_dir: str, dtype: Any = jnp.bfloat16) -> EncoderConfig:
    """Build an :class:`EncoderConfig` from an HF ``config.json``."""
    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    model_type = hf.get("model_type", "distilbert")
    if model_type == "distilbert":
        return EncoderConfig(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["dim"],
            num_layers=hf["n_layers"],
            num_heads=hf["n_heads"],
            intermediate_size=hf["hidden_dim"],
            max_position_embeddings=hf["max_position_embeddings"],
            type_vocab_size=0,
            hidden_dropout=hf.get("dropout", 0.1),
            attention_dropout=hf.get("attention_dropout", 0.1),
            dtype=dtype,
        )
    if model_type == "bert":
        return EncoderConfig(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"],
            intermediate_size=hf["intermediate_size"],
            max_position_embeddings=hf["max_position_embeddings"],
            type_vocab_size=hf.get("type_vocab_size", 2),
            layer_norm_eps=hf.get("layer_norm_eps", 1e-12),
            hidden_dropout=hf.get("hidden_dropout_prob", 0.1),
            attention_dropout=hf.get("attention_probs_dropout_prob", 0.1),
            dtype=dtype,
        )
    raise ValueError(f"unsupported HF model_type: {model_type}")


# --------------------------------------------------------------------------
# name mapping: HF torch state dict  <->  dhr_tpu EncoderWithMLM params
# --------------------------------------------------------------------------


def _split_heads(w: np.ndarray, num_heads: int) -> np.ndarray:
    """torch (out=H, in=H) linear weight -> flax DenseGeneral (H, heads, hd)."""
    hidden = w.shape[1]
    return np.ascontiguousarray(w.T).reshape(hidden, num_heads, hidden // num_heads)


def _merge_heads_out(w: np.ndarray, num_heads: int) -> np.ndarray:
    """torch out-proj (H, H) -> flax DenseGeneral axis=(-2,-1) (heads, hd, H)."""
    hidden = w.shape[0]
    return np.ascontiguousarray(w.T).reshape(num_heads, hidden // num_heads, hidden)


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _dense(sd, prefix):
    return {
        "kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T),
        "bias": sd[f"{prefix}.bias"],
    }


def convert_hf_mlm_to_params(
    sd: dict[str, np.ndarray], cfg: EncoderConfig
) -> dict:
    """HF (Distil)BertForMaskedLM state dict -> EncoderWithMLM param tree."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    is_distil = any(k.startswith("distilbert.") for k in sd)
    nh = cfg.num_heads
    if is_distil:
        emb = "distilbert.embeddings"
        embeddings = {
            "word": {"embedding": sd[f"{emb}.word_embeddings.weight"]},
            "position": {"embedding": sd[f"{emb}.position_embeddings.weight"]},
            "layer_norm": _ln(sd, f"{emb}.LayerNorm"),
        }
        layers = {}
        for i in range(cfg.num_layers):
            p = f"distilbert.transformer.layer.{i}"
            layers[f"layers_{i}"] = {
                "attention": {
                    "query": {
                        "kernel": _split_heads(sd[f"{p}.attention.q_lin.weight"], nh),
                        "bias": sd[f"{p}.attention.q_lin.bias"].reshape(
                            nh, -1
                        ),
                    },
                    "key": {
                        "kernel": _split_heads(sd[f"{p}.attention.k_lin.weight"], nh),
                        "bias": sd[f"{p}.attention.k_lin.bias"].reshape(nh, -1),
                    },
                    "value": {
                        "kernel": _split_heads(sd[f"{p}.attention.v_lin.weight"], nh),
                        "bias": sd[f"{p}.attention.v_lin.bias"].reshape(nh, -1),
                    },
                    "out": {
                        "kernel": _merge_heads_out(
                            sd[f"{p}.attention.out_lin.weight"], nh
                        ),
                        "bias": sd[f"{p}.attention.out_lin.bias"],
                    },
                },
                "attn_layer_norm": _ln(sd, f"{p}.sa_layer_norm"),
                "ffn_in": _dense(sd, f"{p}.ffn.lin1"),
                "ffn_out": _dense(sd, f"{p}.ffn.lin2"),
                "ffn_layer_norm": _ln(sd, f"{p}.output_layer_norm"),
            }
        if "vocab_transform.weight" in sd:
            mlm = {
                "transform": _dense(sd, "vocab_transform"),
                "layer_norm": _ln(sd, "vocab_layer_norm"),
                "bias": sd["vocab_projector.bias"],
            }
            _check_tied_projector(
                sd.get("vocab_projector.weight"),
                sd[f"{emb}.word_embeddings.weight"],
            )
        else:  # encoder-only checkpoint (dense / skip-MLM / colbert export)
            mlm = None
    else:
        emb = "bert.embeddings"
        embeddings = {
            "word": {"embedding": sd[f"{emb}.word_embeddings.weight"]},
            "position": {"embedding": sd[f"{emb}.position_embeddings.weight"]},
            "layer_norm": _ln(sd, f"{emb}.LayerNorm"),
        }
        if cfg.type_vocab_size > 0:
            embeddings["token_type"] = {
                "embedding": sd[f"{emb}.token_type_embeddings.weight"]
            }
        layers = {}
        for i in range(cfg.num_layers):
            p = f"bert.encoder.layer.{i}"
            layers[f"layers_{i}"] = {
                "attention": {
                    "query": {
                        "kernel": _split_heads(
                            sd[f"{p}.attention.self.query.weight"], nh
                        ),
                        "bias": sd[f"{p}.attention.self.query.bias"].reshape(nh, -1),
                    },
                    "key": {
                        "kernel": _split_heads(
                            sd[f"{p}.attention.self.key.weight"], nh
                        ),
                        "bias": sd[f"{p}.attention.self.key.bias"].reshape(nh, -1),
                    },
                    "value": {
                        "kernel": _split_heads(
                            sd[f"{p}.attention.self.value.weight"], nh
                        ),
                        "bias": sd[f"{p}.attention.self.value.bias"].reshape(nh, -1),
                    },
                    "out": {
                        "kernel": _merge_heads_out(
                            sd[f"{p}.attention.output.dense.weight"], nh
                        ),
                        "bias": sd[f"{p}.attention.output.dense.bias"],
                    },
                },
                "attn_layer_norm": _ln(sd, f"{p}.attention.output.LayerNorm"),
                "ffn_in": _dense(sd, f"{p}.intermediate.dense"),
                "ffn_out": _dense(sd, f"{p}.output.dense"),
                "ffn_layer_norm": _ln(sd, f"{p}.output.LayerNorm"),
            }
        if "cls.predictions.transform.dense.weight" in sd:
            mlm = {
                "transform": _dense(sd, "cls.predictions.transform.dense"),
                "layer_norm": _ln(sd, "cls.predictions.transform.LayerNorm"),
                "bias": sd["cls.predictions.bias"],
            }
            _check_tied_projector(
                sd.get("cls.predictions.decoder.weight"),
                sd[f"{emb}.word_embeddings.weight"],
            )
        else:  # encoder-only checkpoint (dense / skip-MLM / colbert export)
            mlm = None
    params = {
        "encoder": {"embeddings": embeddings, **layers},
        "mlm": mlm,
    }
    return _to_f32(params)


def convert_params_to_hf_mlm(
    params: dict, cfg: EncoderConfig, arch: str = "distilbert"
) -> dict[str, np.ndarray]:
    """EncoderWithMLM param tree -> HF MaskedLM state dict (numpy).

    ``params["mlm"] is None`` exports an encoder-only checkpoint (the
    reference's Dense / skip-MLM Aggretriever families load ``AutoModel``,
    Aggretriever/modeling.py:503-508) — the MLM head keys are omitted.
    """
    enc = params["encoder"]
    mlm = params["mlm"]
    nh = cfg.num_heads
    hid = cfg.hidden_size
    sd: dict[str, np.ndarray] = {}

    def put_dense(prefix, leaf):
        sd[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(leaf["kernel"]).T)
        sd[f"{prefix}.bias"] = np.asarray(leaf["bias"])

    def put_ln(prefix, leaf):
        sd[f"{prefix}.weight"] = np.asarray(leaf["scale"])
        sd[f"{prefix}.bias"] = np.asarray(leaf["bias"])

    def put_qkv(prefix, leaf):
        k = np.asarray(leaf["kernel"]).reshape(hid, hid)
        sd[f"{prefix}.weight"] = np.ascontiguousarray(k.T)
        sd[f"{prefix}.bias"] = np.asarray(leaf["bias"]).reshape(hid)

    def put_out(prefix, leaf):
        k = np.asarray(leaf["kernel"]).reshape(hid, hid)
        sd[f"{prefix}.weight"] = np.ascontiguousarray(k.T)
        sd[f"{prefix}.bias"] = np.asarray(leaf["bias"])

    word = np.asarray(enc["embeddings"]["word"]["embedding"])
    if arch == "distilbert":
        sd["distilbert.embeddings.word_embeddings.weight"] = word
        sd["distilbert.embeddings.position_embeddings.weight"] = np.asarray(
            enc["embeddings"]["position"]["embedding"]
        )
        put_ln("distilbert.embeddings.LayerNorm", enc["embeddings"]["layer_norm"])
        for i in range(cfg.num_layers):
            L = enc[f"layers_{i}"]
            p = f"distilbert.transformer.layer.{i}"
            put_qkv(f"{p}.attention.q_lin", L["attention"]["query"])
            put_qkv(f"{p}.attention.k_lin", L["attention"]["key"])
            put_qkv(f"{p}.attention.v_lin", L["attention"]["value"])
            put_out(f"{p}.attention.out_lin", L["attention"]["out"])
            put_ln(f"{p}.sa_layer_norm", L["attn_layer_norm"])
            put_dense(f"{p}.ffn.lin1", L["ffn_in"])
            put_dense(f"{p}.ffn.lin2", L["ffn_out"])
            put_ln(f"{p}.output_layer_norm", L["ffn_layer_norm"])
        if mlm is not None:
            put_dense("vocab_transform", mlm["transform"])
            put_ln("vocab_layer_norm", mlm["layer_norm"])
            sd["vocab_projector.weight"] = word  # tied
            sd["vocab_projector.bias"] = np.asarray(mlm["bias"])
    else:
        sd["bert.embeddings.word_embeddings.weight"] = word
        sd["bert.embeddings.position_embeddings.weight"] = np.asarray(
            enc["embeddings"]["position"]["embedding"]
        )
        if "token_type" in enc["embeddings"]:
            sd["bert.embeddings.token_type_embeddings.weight"] = np.asarray(
                enc["embeddings"]["token_type"]["embedding"]
            )
        put_ln("bert.embeddings.LayerNorm", enc["embeddings"]["layer_norm"])
        for i in range(cfg.num_layers):
            L = enc[f"layers_{i}"]
            p = f"bert.encoder.layer.{i}"
            put_qkv(f"{p}.attention.self.query", L["attention"]["query"])
            put_qkv(f"{p}.attention.self.key", L["attention"]["key"])
            put_qkv(f"{p}.attention.self.value", L["attention"]["value"])
            put_out(f"{p}.attention.output.dense", L["attention"]["out"])
            put_ln(f"{p}.attention.output.LayerNorm", L["attn_layer_norm"])
            put_dense(f"{p}.intermediate.dense", L["ffn_in"])
            put_dense(f"{p}.output.dense", L["ffn_out"])
            put_ln(f"{p}.output.LayerNorm", L["ffn_layer_norm"])
        if mlm is not None:
            put_dense("cls.predictions.transform.dense", mlm["transform"])
            put_ln("cls.predictions.transform.LayerNorm", mlm["layer_norm"])
            sd["cls.predictions.decoder.weight"] = word
            sd["cls.predictions.bias"] = np.asarray(mlm["bias"])
    return sd


# --------------------------------------------------------------------------
# sidecar heads: pooler.pt / TermWeightTrans.pt
# --------------------------------------------------------------------------


def load_sidecar_head(model_dir: str, name: str) -> dict | None:
    """Load a reference sidecar head (``{name}.pt`` + ``{name}_config.json``).

    Returns ``{"q": {"kernel", "bias"}, "p": {...} | None, "config": {...}}``
    or None if the sidecar is absent.
    """
    pt = os.path.join(model_dir, f"{name}.pt")
    cfg_path = os.path.join(model_dir, f"{name}_config.json")
    if not (os.path.exists(pt) and os.path.exists(cfg_path)):
        return None
    import torch

    sd = torch.load(pt, map_location="cpu", weights_only=True)
    with open(cfg_path) as f:
        config = json.load(f)
    out = {
        "q": {
            "kernel": np.ascontiguousarray(sd["linear_q.weight"].numpy().T),
            "bias": sd["linear_q.bias"].numpy(),
        },
        "p": None,
        "config": config,
    }
    if not config.get("tied", True) and "linear_p.weight" in sd:
        out["p"] = {
            "kernel": np.ascontiguousarray(sd["linear_p.weight"].numpy().T),
            "bias": sd["linear_p.bias"].numpy(),
        }
    return out


def save_sidecar_head(
    model_dir: str, name: str, q_leaf: dict, p_leaf: dict | None,
    input_dim: int, output_dim: int,
) -> None:
    """Write a sidecar head in the reference's ``.pt`` + JSON layout."""
    import torch

    sd = {
        "linear_q.weight": torch.from_numpy(
            np.ascontiguousarray(np.asarray(q_leaf["kernel"], np.float32).T)
        ),
        "linear_q.bias": torch.from_numpy(np.asarray(q_leaf["bias"], np.float32)),
    }
    tied = p_leaf is None
    if tied:
        # The reference's tied LinearPooler aliases linear_p = linear_q, so
        # its state_dict() contains BOTH key families and its strict
        # load_state_dict requires both (DHR/modeling.py:46-50, 67-68).
        sd["linear_p.weight"] = sd["linear_q.weight"]
        sd["linear_p.bias"] = sd["linear_q.bias"]
    else:
        sd["linear_p.weight"] = torch.from_numpy(
            np.ascontiguousarray(np.asarray(p_leaf["kernel"], np.float32).T)
        )
        sd["linear_p.bias"] = torch.from_numpy(np.asarray(p_leaf["bias"], np.float32))
    torch.save(sd, os.path.join(model_dir, f"{name}.pt"))
    with open(os.path.join(model_dir, f"{name}_config.json"), "w") as f:
        json.dump(
            {"input_dim": input_dim, "output_dim": output_dim, "tied": tied}, f
        )


def _check_tied_projector(projector, word_embeddings) -> None:
    """dhr_tpu ties the MLM projection to the word embeddings; refuse
    checkpoints where they genuinely differ rather than silently dropping
    the projector weights."""
    if projector is None:
        return
    a, b = np.asarray(projector), np.asarray(word_embeddings)
    if a.shape == b.shape and not np.allclose(
        a[:64, :64], b[:64, :64], atol=1e-5
    ):
        raise ValueError(
            "checkpoint has an untied MLM projector; dhr_tpu's encoder ties "
            "it to the word embeddings (pass tie_word_embeddings=False "
            "support is not implemented)"
        )


def _to_f32(tree):
    if tree is None:  # e.g. mlm=None on encoder-only checkpoints
        return None
    if isinstance(tree, dict):
        return {k: _to_f32(v) for k, v in tree.items()}
    return jnp.asarray(np.asarray(tree), jnp.float32)
