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


def save_checkpoint(ckpt_dir: str, step: int, params, opt_state) -> str:
    """Orbax training checkpoint (params + optimizer state + step); resumes
    an interrupted run exactly. The inference-side weight format stays
    models/convert.py's .npz (use ``export_npz``)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    path = f"{ckpt_dir}/step_{step:08d}"
    ckptr.save(
        path, {"params": params, "opt_state": opt_state, "step": step}
    )
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(ckpt_dir: str, init_state):
    """Restore the latest orbax checkpoint under ``ckpt_dir``; returns
    (params, opt_state, step) — (fresh init, 0) when none exists."""
    import os

    import orbax.checkpoint as ocp

    params, opt_state = init_state()
    latest = None
    if os.path.isdir(ckpt_dir):
        cands = sorted(
            d for d in os.listdir(ckpt_dir) if d.startswith("step_")
        )
        latest = cands[-1] if cands else None
    if latest is None:
        return params, opt_state, 0
    ckptr = ocp.StandardCheckpointer()
    template = {"params": params, "opt_state": opt_state, "step": 0}
    state = ckptr.restore(f"{ckpt_dir}/{latest}", template)
    return state["params"], state["opt_state"], int(state["step"])


def export_npz(params, path: str) -> str:
    """Write inference-format weights (models/convert.py .npz)."""
    from delivr_cfos_tpu.models.convert import save_params_npz

    save_params_npz(path, params)
    return path


def train(
    cfg: TrainConfig,
    batches,
    n_steps: int,
    mesh: Mesh | None = None,
    params=None,
    log_every: int = 50,
    ckpt_dir: str | None = None,
    ckpt_every: int = 500,
):
    """Training loop over an (x, y) batch iterator; returns params.
    With ``ckpt_dir``, resumes from the latest orbax checkpoint and saves
    every ``ckpt_every`` steps (shard-level analog of the pipeline's
    stage-resume, SURVEY.md §5.4)."""
    init_state, step = make_train_step(cfg, mesh)
    start = 0
    if ckpt_dir is not None and params is None:
        params, opt_state, start = restore_checkpoint(ckpt_dir, init_state)
        if start:
            print(f"resumed from step {start}", flush=True)
    elif params is None:
        params, opt_state = init_state()
    else:
        opt_state = make_optimizer(cfg).init(params)
    for i, (x, y) in zip(range(start, n_steps), batches):
        params, opt_state, loss = step(params, opt_state, jnp.asarray(x), jnp.asarray(y))
        if log_every and (i % log_every == 0 or i == n_steps - 1):
            print(f"step {i}: loss {float(loss):.4f}", flush=True)
        if ckpt_dir is not None and (
            (i + 1) % ckpt_every == 0 or i == n_steps - 1
        ):
            save_checkpoint(ckpt_dir, i + 1, params, opt_state)
    return params
