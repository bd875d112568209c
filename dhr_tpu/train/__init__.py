"""Training runtime: losses, steps, optimizer, state, checkpointing."""

from dhr_tpu.train.checkpoint import (
    export_hf_checkpoint,
    latest_step,
    restore_train_state,
    save_train_state,
)
from dhr_tpu.train.optimizer import (
    OptimizerConfig,
    decay_mask,
    linear_warmup_decay,
    make_optimizer,
)
from dhr_tpu.train.state import TrainState
from dhr_tpu.train.step import (
    LossConfig,
    compute_loss,
    make_grad_cache_train_step,
    make_packed_train_step,
    make_train_step,
)

__all__ = [
    "LossConfig",
    "OptimizerConfig",
    "TrainState",
    "compute_loss",
    "decay_mask",
    "export_hf_checkpoint",
    "latest_step",
    "linear_warmup_decay",
    "make_grad_cache_train_step",
    "make_optimizer",
    "make_packed_train_step",
    "make_train_step",
    "restore_train_state",
    "save_train_state",
]
