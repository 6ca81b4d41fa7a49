import numpy as np
import pytest

import jax
import jax.numpy as jnp

from delivr_cfos_tpu.models import (
    BasicUNetConfig,
    basic_unet_apply,
    init_params,
    load_torch_checkpoint,
    torch_state_dict_to_params,
)
from delivr_cfos_tpu.models.basic_unet import param_count

torch = pytest.importorskip("torch")
from torch_basicunet import TorchBasicUNet  # noqa: E402

SMALL_FEATURES = (8, 8, 16, 32, 64, 8)


def _randomized_torch_model(features=SMALL_FEATURES, seed=0):
    torch.manual_seed(seed)
    model = TorchBasicUNet(features=features)
    # randomize norm affine params too so the converter mapping is exercised
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "adn.N" in name:
                p.copy_(torch.rand_like(p) * 0.5 + 0.75)
    model.eval()
    return model


def _run_both(model, shape_zyx, features):
    x = torch.rand(1, 1, *shape_zyx) * 1000.0
    with torch.no_grad():
        ref = model(x).numpy()  # NCDHW
    params = torch_state_dict_to_params(model.state_dict())
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))  # → NDHWC
    cfg = BasicUNetConfig(features=features)
    out = np.asarray(basic_unet_apply(params, xj, cfg)).transpose(0, 4, 1, 2, 3)
    return ref, out


def test_matches_torch_reference_even_shape():
    model = _randomized_torch_model()
    ref, out = _run_both(model, (32, 32, 16), SMALL_FEATURES)
    assert ref.shape == out.shape
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_matches_torch_reference_odd_shape():
    """Odd spatial sizes exercise the replicate-pad path in UpCat."""
    model = _randomized_torch_model(seed=1)
    ref, out = _run_both(model, (35, 37, 18), SMALL_FEATURES)
    assert ref.shape == out.shape
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_dataparallel_prefix_and_tar_checkpoint(tmp_path):
    model = _randomized_torch_model(seed=2)
    wrapped = {"state_dict": {f"module.{k}": v for k, v in model.state_dict().items()}}
    p = str(tmp_path / "weights.tar")
    torch.save(wrapped, p)
    params = load_torch_checkpoint(p)
    x = torch.rand(1, 1, 32, 32, 16) * 500.0
    with torch.no_grad():
        ref = model(x).numpy()
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    out = np.asarray(
        basic_unet_apply(params, xj, BasicUNetConfig(features=SMALL_FEATURES))
    ).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_model_state_key_variant(tmp_path):
    model = _randomized_torch_model(seed=3)
    p = str(tmp_path / "legacy.tar")
    torch.save({"model_state": model.state_dict()}, p)
    params = load_torch_checkpoint(p)
    assert "conv_0" in params and "upcat_1" in params


def test_full_size_param_count():
    """Full feature set must match MONAI BasicUNet's parameter count."""
    params = init_params(jax.random.PRNGKey(0))
    ours = param_count(params)
    theirs = sum(p.numel() for p in TorchBasicUNet().parameters())
    assert ours == theirs


def test_jit_compiles_and_is_deterministic():
    cfg = BasicUNetConfig(features=SMALL_FEATURES)
    params = init_params(jax.random.PRNGKey(0), cfg)
    fn = jax.jit(lambda p, x: basic_unet_apply(p, x, cfg))
    x = jnp.asarray(np.random.default_rng(0).random((1, 16, 16, 16, 1)), jnp.float32)
    a = np.asarray(fn(params, x))
    b = np.asarray(fn(params, x))
    np.testing.assert_array_equal(a, b)


def test_bfloat16_compute_close_to_f32():
    cfg32 = BasicUNetConfig(features=SMALL_FEATURES)
    cfg16 = BasicUNetConfig(features=SMALL_FEATURES, compute_dtype=jnp.bfloat16)
    params = init_params(jax.random.PRNGKey(0), cfg32)
    x = jnp.asarray(np.random.default_rng(1).random((1, 16, 16, 16, 1)), jnp.float32)
    y32 = np.asarray(basic_unet_apply(params, x, cfg32), np.float32)
    y16 = np.asarray(basic_unet_apply(params, x, cfg16), np.float32)
    # logits agree loosely; sigmoid-threshold decisions agree except near 0
    assert np.abs(y32 - y16).mean() < 0.1


def test_deconv_lowerings_equivalent():
    """conv_transpose lowering == matmul+interleave lowering (same op,
    different emitters; PERF.md)."""
    import numpy as np
    from delivr_cfos_tpu.models.basic_unet import _deconv2x, _deconv2x_matmul

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 4, 5, 3, 6)).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((6, 4, 2, 2, 2)) * 0.3).astype(np.float32)
    )
    b = jnp.asarray(rng.standard_normal(4).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(_deconv2x(x, w, b)),
        np.asarray(_deconv2x_matmul(x, w, b)),
        atol=2e-6,
    )
