import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from delivr_cfos_tpu.models.basic_unet import BasicUNetConfig, basic_unet_apply
from delivr_cfos_tpu.parallel.mesh import make_mesh
from delivr_cfos_tpu.training import TrainConfig, dice_bce_loss, make_train_step
from delivr_cfos_tpu.training.data import batch_iterator, list_patch_pairs

pytestmark = pytest.mark.slow  # on-device training loops

TINY = BasicUNetConfig(features=(4, 4, 8, 16, 32, 4))
REF_ROOT = "/root/reference/training_data/cFos"


def _toy_batches(seed=0):
    rng = np.random.default_rng(seed)
    while True:
        x = rng.random((2, 16, 16, 16, 1)).astype(np.float32) * 100
        y = (x > 80).astype(np.float32)
        yield x, y


def test_train_step_reduces_loss():
    cfg = TrainConfig(model=TINY, learning_rate=3e-3)
    init_state, step = make_train_step(cfg)
    params, opt_state = init_state()
    it = _toy_batches()
    x, y = next(it)
    losses = []
    for i in range(12):
        params, opt_state, loss = step(params, opt_state, jnp.asarray(x), jnp.asarray(y))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_train_step_sharded_matches_unsharded_loss():
    cfg = TrainConfig(model=TINY, learning_rate=1e-3)
    mesh = make_mesh({"dp": 2, "sp": 4})
    init_state, sharded_step = make_train_step(cfg, mesh)
    _, plain_step = make_train_step(cfg)
    params, opt_state = init_state()
    params2 = jax.tree_util.tree_map(jnp.copy, params)
    opt_state2 = jax.tree_util.tree_map(jnp.copy, opt_state)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 64, 16, 16, 1)), jnp.float32)
    y = jnp.asarray((rng.random((2, 64, 16, 16, 1)) > 0.9), jnp.float32)
    _, _, loss_sharded = sharded_step(params, opt_state, x, y)
    _, _, loss_plain = plain_step(params2, opt_state2, x, y)
    np.testing.assert_allclose(float(loss_sharded), float(loss_plain), rtol=1e-4)


@pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference training patches unavailable"
)
def test_reference_patch_loader():
    pairs = list_patch_pairs(REF_ROOT)
    assert len(pairs) > 30
    it = batch_iterator(pairs[:2], batch_size=2, crop=(32, 32, 32), seed=0)
    x, y = next(it)
    assert x.shape == (2, 32, 32, 32, 1)
    assert y.shape == x.shape
    assert set(np.unique(y)) <= {0.0, 1.0}
    assert x.max() > 0


MICROGLIA_ROOT = "/root/reference/training_data/microglia"


@pytest.mark.skipif(
    not os.path.isdir(MICROGLIA_ROOT),
    reason="reference microglia patches unavailable",
)
def test_microglia_family_trains():
    """The second model family the reference ships data for
    (training_data/microglia, 160 raw + 160 gt 100³ patches): the loader
    handles its gt coding and one train step runs and reduces loss on the
    real patches."""
    pairs = list_patch_pairs(MICROGLIA_ROOT)
    assert len(pairs) >= 100
    it = batch_iterator(pairs[:4], batch_size=2, crop=(32, 32, 32), seed=1)
    x, y = next(it)
    assert x.shape == (2, 32, 32, 32, 1)
    assert set(np.unique(y)) <= {0.0, 1.0}
    assert y.max() == 1.0  # microglia gt actually has foreground

    cfg = TrainConfig(model=TINY, learning_rate=3e-3)
    init_state, step = make_train_step(cfg)
    params, opt_state = init_state()
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(x), jnp.asarray(y)
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_checkpoint_save_restore_resume(tmp_path):
    """Orbax checkpointing: save mid-run, restore exactly, resume."""
    import numpy as np
    from delivr_cfos_tpu.training.train import (
        TrainConfig,
        make_train_step,
        restore_checkpoint,
        save_checkpoint,
    )
    from delivr_cfos_tpu.models import BasicUNetConfig

    cfg = TrainConfig(model=BasicUNetConfig(features=(2, 2, 4, 8, 16, 2)))
    init_state, step = make_train_step(cfg)
    params, opt_state = init_state()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 16, 16, 16, 1)), jnp.float32)
    y = jnp.asarray((rng.random((1, 16, 16, 16, 1)) > 0.9), jnp.float32)
    params, opt_state, _ = step(params, opt_state, x, y)

    ckpt = str(tmp_path / "ckpts")
    save_checkpoint(ckpt, 1, params, opt_state)
    p2, o2, s = restore_checkpoint(ckpt, init_state)
    assert s == 1
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state steps identically to the in-memory state
    pa, _, la = step(params, opt_state, x, y)
    pb, _, lb = step(p2, o2, x, y)
    assert float(la) == float(lb)


def test_hybrid_mesh_fallback():
    from delivr_cfos_tpu.parallel.mesh import make_hybrid_mesh

    mesh = make_hybrid_mesh()
    assert mesh.axis_names == ("dp", "sp")
    assert mesh.shape["dp"] * mesh.shape["sp"] == len(jax.devices())


def test_hybrid_mesh_two_slices():
    """Forced two-slice layout on the virtual devices: DCN axis outermost."""
    from delivr_cfos_tpu.parallel.mesh import make_hybrid_mesh

    if len(jax.devices()) != 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_hybrid_mesh(n_slices=2)
    assert mesh.axis_names == ("dp", "sp")
    # an EXPLICIT n_slices must be honored even without physical slice
    # topology (virtual CPU mesh): logical (2, 4) layout
    assert mesh.shape["dp"] == 2 and mesh.shape["sp"] == 4
