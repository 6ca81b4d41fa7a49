"""Window packing (models/packing.py): packed block-diagonal model must
reproduce the per-window model exactly (zero off-diagonal weights add
exact zeros; instance-norm statistics are per-channel = per-window)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from delivr_cfos_tpu.models.basic_unet import (
    BasicUNetConfig,
    basic_unet_apply,
    init_params,
)
from delivr_cfos_tpu.models.packing import (
    pack_config,
    pack_params,
    pack_windows,
    unpack_logits,
)

TINY = (4, 4, 8, 16, 32, 4)


@pytest.mark.parametrize("G", [2, 4])
def test_packed_model_matches_per_window(G):
    cfg = BasicUNetConfig(features=TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(
        np.random.default_rng(0).random((G * 2, 16, 16, 16, 1)), jnp.float32
    )
    ref = basic_unet_apply(params, x, cfg)

    pp = pack_params(params, G)
    pc = pack_config(cfg, G)
    got = unpack_logits(basic_unet_apply(pp, pack_windows(x, G), pc), G)

    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pack_unpack_roundtrip():
    x = jnp.asarray(np.random.default_rng(1).random((8, 4, 4, 4, 1)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(unpack_logits(pack_windows(x, 4), 4)), np.asarray(x)
    )


def test_auto_batch_size_bounds():
    from delivr_cfos_tpu.engine.sliding_window import auto_batch_size

    cfg = BasicUNetConfig()
    b = auto_batch_size((96, 96, 64), cfg)
    assert 1 <= b <= 32
    assert b & (b - 1) == 0  # power of two
    # a huge resident volume shrinks the batch
    b_small = auto_batch_size((96, 96, 64), cfg, volume_bytes=14 * 2**30)
    assert b_small <= b


class _FakeDevice:
    def __init__(self, stats):
        self._stats = stats

    def memory_stats(self):
        return self._stats


def test_auto_batch_size_telemetry_regimes():
    """VERDICT r4 item 9: dead telemetry (axon zeroes memory_stats) keeps
    the 16 GB assumption + measured-safe cap 32; live telemetry sizes from
    the REPORTED HBM and may exceed 32 (bounded at 256)."""
    from delivr_cfos_tpu.engine.sliding_window import auto_batch_size

    cfg = BasicUNetConfig()
    roi = (96, 96, 64)

    dead = auto_batch_size(roi, cfg, device=_FakeDevice({"bytes_limit": 0}))
    dead2 = auto_batch_size(roi, cfg, device=_FakeDevice({}))
    assert dead == dead2 and 1 <= dead <= 32

    # a 95 GB chip (v5p-class) with working telemetry lifts the cap
    big = auto_batch_size(
        roi, cfg, device=_FakeDevice({"bytes_limit": 95 * 2**30})
    )
    assert big > 32 and big <= 256 and big & (big - 1) == 0

    # live telemetry on a 16 GB chip must agree with the dead-telemetry
    # assumption (same budget, same cap region)
    live16 = auto_batch_size(
        roi, cfg, device=_FakeDevice({"bytes_limit": 16 * 2**30})
    )
    assert live16 == dead

    # a raising device falls back to the conservative regime
    class _Boom:
        def memory_stats(self):
            raise RuntimeError("no telemetry")

    assert auto_batch_size(roi, cfg, device=_Boom()) == dead
