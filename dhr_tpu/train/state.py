"""Train state for the retriever family."""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    """Minimal functional train state (params + optimizer + step).

    Equivalent in role to the reference's ``RetrieverTrainState``
    (tevax/training.py:49-51) but mesh-sharded rather than pmap-replicated,
    and checkpointable mid-run via ``dhr_tpu.train.checkpoint``.
    """

    step: jax.Array
    params: Any
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        if isinstance(params, FrozenDict):
            params = params.unfreeze()
        return cls(
            step=jax.numpy.zeros((), jax.numpy.int32),
            params=params,
            opt_state=tx.init(params),
            tx=tx,
        )

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )
