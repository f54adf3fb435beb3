"""Train state: params + optimizer state + step, as a single pytree.

Replaces the reference's mutable Trainer optimizer bookkeeping
(`xtrainer.py:168-243`) with a functional state threaded through jitted steps.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: Any = struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        if hasattr(self.tx, "fused_apply"):
            # single-pass optimizer (m3p_tpu.train.optim.FusedAdam):
            # params + moments updated in one elementwise pass per leaf
            new_params, new_opt_state = self.tx.fused_apply(
                self.params, self.opt_state, grads, self.step)
        else:
            updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                    self.params)
            new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)


def create_train_state(params, tx) -> TrainState:
    import jax.numpy as jnp

    opt_state = tx.init(params)
    # bf16-param + fp32-master scheme (FusedAdam master=1): the live params
    # GEMMs read are bf16; the fp32 master lives in opt_state
    store_dt = getattr(tx, "param_store_dtype", None)
    if store_dt is not None:
        params = jax.tree.map(lambda p: jnp.asarray(p, store_dt), params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state, tx=tx)
