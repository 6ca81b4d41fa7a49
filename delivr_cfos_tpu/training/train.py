"""BasicUNet training: jit-compiled Adam steps, optionally sharded over a
('dp', 'sp') mesh — data parallel over the batch, spatial parallel over z.

The spatial axis uses plain jit sharding annotations: XLA's SPMD partitioner
inserts the conv halo exchanges over ICI automatically, so the same train
step runs single-chip or across a slice unchanged. The reference has no
training code at all (SURVEY.md §4/§2.4); checkpoints it consumes were
produced externally. This module closes that gap and produces checkpoints
loadable by the inference pipeline (models/convert.py .npz format).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from delivr_cfos_tpu.models.basic_unet import (
    BasicUNetConfig,
    basic_unet_apply,
    init_params,
)
from delivr_cfos_tpu.training.losses import dice_bce_loss


@dataclass(frozen=True)
class TrainConfig:
    model: BasicUNetConfig = BasicUNetConfig()
    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    seed: int = 0


def make_optimizer(cfg: TrainConfig):
    if cfg.weight_decay:
        return optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)
    return optax.adam(cfg.learning_rate)


def make_train_step(cfg: TrainConfig, mesh: Mesh | None = None):
    """Returns (init_state, step) where step(params, opt_state, x, y) →
    (params, opt_state, loss). With a mesh, x/y are sharded (dp, sp) and
    params/opt_state replicated."""
    opt = make_optimizer(cfg)

    def loss_fn(params, x, y):
        logits = basic_unet_apply(params, x, cfg.model)
        return dice_bce_loss(logits, y)

    def step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is not None:
        data_sharding = NamedSharding(mesh, P("dp", "sp", None, None, None))
        repl = NamedSharding(mesh, P())
        step = jax.jit(
            step,
            in_shardings=(repl, repl, data_sharding, data_sharding),
            out_shardings=(repl, repl, repl),
            donate_argnums=(0, 1),
        )
    else:
        step = jax.jit(step, donate_argnums=(0, 1))

    def init_state():
        params = init_params(jax.random.PRNGKey(cfg.seed), cfg.model)
        return params, opt.init(params)

    return init_state, step


def train(
    cfg: TrainConfig,
    batches,
    n_steps: int,
    mesh: Mesh | None = None,
    params=None,
    log_every: int = 50,
):
    """Simple training loop over an (x, y) batch iterator; returns params."""
    init_state, step = make_train_step(cfg, mesh)
    if params is None:
        params, opt_state = init_state()
    else:
        opt_state = make_optimizer(cfg).init(params)
    for i, (x, y) in zip(range(n_steps), batches):
        params, opt_state, loss = step(params, opt_state, jnp.asarray(x), jnp.asarray(y))
        if log_every and (i % log_every == 0 or i == n_steps - 1):
            print(f"step {i}: loss {float(loss):.4f}", flush=True)
    return params
