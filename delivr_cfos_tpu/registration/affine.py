"""Multi-resolution affine registration as JAX optimization.

Replaces mBrainAligner's ``global_registration`` binary (reference:
automate_mBrainaligner.py:29-56, invoked with ``-p r+f+n``). Instead of the
reference's feature/RANSAC pipeline we directly optimize the 12 affine
parameters with Adam against a masked NCC similarity on an image pyramid —
a formulation that is one fused XLA computation per step (warp + NCC +
gradients), running entirely on device.

Convention: the affine maps **fixed** voxel coords → **moving** voxel coords
(the resampling direction). For the pipeline, fixed = the downsampled masked
brain and moving = the atlas template, so cell centroids (which live in brain
space) map directly through the affine into atlas space — no numerical
inversion is ever needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from delivr_cfos_tpu.ops.resample import block_mean_downsample
from delivr_cfos_tpu.registration.warp import (
    affine_apply,
    fixed_grid,
    inside_weight,
    moments_init,
    sample_volume,
    scan_chunk_for,
)


def masked_ncc(a: jnp.ndarray, b: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted normalized cross-correlation (higher = better)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    ma = jnp.sum(a * w) / wsum
    mb = jnp.sum(b * w) / wsum
    da = (a - ma) * w
    db = (b - mb) * w
    num = jnp.sum(da * db)
    den = jnp.sqrt(jnp.sum(da * da) * jnp.sum(db * db)) + 1e-6
    return num / den


def masked_mi(
    a: jnp.ndarray, b: jnp.ndarray, w: jnp.ndarray, n_bins: int = 32
) -> jnp.ndarray:
    """Differentiable mutual information via soft (Parzen/linear) binning
    (higher = better). NCC only models LINEAR intensity relationships;
    brain-autofluorescence ↔ atlas-average-template alignment is
    cross-modality-ish, which is why mBrainAligner's global stage offers
    feature/landmark modes. Soft-histogram MI handles any intensity
    mapping and stays end-to-end differentiable for the Adam optimizer.
    """
    wf = w.ravel()
    wsum = jnp.maximum(jnp.sum(wf), 1e-6)

    def bin_coords(x):
        x = x.ravel()
        lo = jnp.min(x)
        hi = jnp.max(x)
        u = (x - lo) / jnp.maximum(hi - lo, 1e-6) * (n_bins - 1)
        i = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, n_bins - 2)
        f = u - i.astype(jnp.float32)
        return i, f

    ia, fa = bin_coords(a)
    ib, fb = bin_coords(b)
    # partial-volume joint histogram: each sample splits bilinearly over a
    # 2×2 bin patch (one scatter-add per corner; gradients flow through the
    # fractional weights) — O(N) memory, full-resolution friendly
    joint = jnp.zeros((n_bins * n_bins,), jnp.float32)
    for da, wa in ((0, 1.0 - fa), (1, fa)):
        for db, wb in ((0, 1.0 - fb), (1, fb)):
            joint = joint.at[(ia + da) * n_bins + (ib + db)].add(wa * wb * wf)
    joint = joint.reshape(n_bins, n_bins) / wsum
    pa_m = jnp.sum(joint, axis=1)
    pb_m = jnp.sum(joint, axis=0)
    eps = 1e-10
    return jnp.sum(
        joint * (jnp.log(joint + eps) - jnp.log(pa_m[:, None] * pb_m[None, :] + eps))
    )


def similarity_fn(name: str):
    """'ncc' (linear intensity relation) or 'mi' (any relation)."""
    if name == "mi":
        return masked_mi
    if name == "ncc":
        return masked_ncc
    raise ValueError(f"unknown similarity {name!r} (use 'ncc' or 'mi')")


def sample_coords(key, shape, n_samples: int) -> jnp.ndarray:
    """(~n_samples, 3) continuous fixed-space coordinates: a jittered
    lattice (stratified sampling — each of ~n_samples volume cells
    contributes exactly one uniform point per step). Off-grid like
    elastix's random-coordinate sampler, but with far lower estimator
    variance for spatially-local parameters: a B-spline control point's
    support always receives its share of samples, whereas i.i.d.-uniform
    draws leave it with Poisson-count noise on ~5 samples at production
    sizes (measured to stall MI-FFD recovery — PERF.md r4).

    ``shape``/``n_samples`` are trace-time constants; the lattice layout is
    Python/numpy, only the jitter is traced."""
    dims = np.asarray(shape, np.float64)
    scale = (n_samples / dims.prod()) ** (1.0 / 3.0)
    counts = np.maximum(1, np.round(dims * scale).astype(int))
    grids = np.meshgrid(*[np.arange(c) for c in counts], indexing="ij")
    base = jnp.asarray(
        np.stack(grids, axis=-1).reshape(-1, 3).astype(np.float32)
    )
    pitch = jnp.asarray((dims / counts).astype(np.float32))
    u = jax.random.uniform(key, base.shape, jnp.float32)
    return jnp.minimum(
        (base + u) * pitch, jnp.asarray((dims - 1.0).astype(np.float32))
    )


@partial(jax.jit, static_argnames=("n_steps", "similarity", "n_samples"),
         donate_argnames=())
def _optimize_level(fixed, moving, affine0, opt_state0, lr, n_steps,
                    similarity="ncc", n_samples=0, key=None):
    fshape = fixed.shape
    sim = similarity_fn(similarity)

    if n_samples:
        # stochastic similarity (elastix-style random coordinate subset,
        # fresh draw per step): each Adam step sees an unbiased ~n_samples
        # estimate of the dense similarity — O(n_samples) instead of
        # O(n_voxels) per step
        def loss_fn(affine, coords_f):
            fixed_vals = sample_volume(fixed, coords_f)
            coords = affine_apply(affine, coords_f)
            warped = sample_volume(moving, coords)
            w = inside_weight(coords, moving.shape)
            return -sim(warped, fixed_vals, w)

        xs = jax.random.split(key, n_steps)
    else:
        grid = fixed_grid(fshape)

        def loss_fn(affine, _):
            coords = affine_apply(affine, grid)
            warped = sample_volume(moving, coords)
            w = inside_weight(coords, moving.shape)
            return -sim(warped, fixed, w)

        xs = None

    opt = optax.adam(lr)

    def step(carry, x):
        affine, opt_state = carry
        coords_f = sample_coords(x, fshape, n_samples) if n_samples else None
        loss, g = jax.value_and_grad(loss_fn)(affine, coords_f)
        updates, opt_state = opt.update(g, opt_state)
        affine = optax.apply_updates(affine, updates)
        return (affine, opt_state), loss

    (affine, opt_state), losses = jax.lax.scan(
        step, (affine0, opt_state0), xs, length=n_steps
    )
    return affine, opt_state, losses


# Scan segmentation: the remote TPU worker crashes executing any single
# compiled program running ~2 min+ of similarity-grad steps; segments with
# a per-segment loss readback run the identical step sequence (bit-equal
# carried affine/adam state). The segment length is voxel-proportional —
# see registration/warp.py::scan_chunk_for (shared with bspline.py).
_AFFINE_SCAN_CHUNK = 50  # upper cap; scan_chunk_for shrinks it for big volumes


def _pyramid(vol: np.ndarray, level: int) -> jnp.ndarray:
    if level == 1:
        return jnp.asarray(vol, jnp.float32)
    f = (level, level, level)
    return block_mean_downsample(jnp.asarray(vol), f)


def register_affine_multistart(
    fixed: np.ndarray,
    moving: np.ndarray,
    flips=((), (0,), (1,), (2,), (1, 2)),
    coarse_level: int = 4,
    coarse_iters: int = 150,
    **kwargs,
):
    """Orientation-robust affine: race several axis-flip initializations at
    the coarsest pyramid level, then run the full multi-resolution schedule
    from the winner.

    Gradient descent from the moments init cannot escape a mirrored or
    grossly rotated acquisition (different scanners mount brains
    differently); mBrainAligner's global stage covers this with
    RANSAC/feature matching (reference automate_mBrainaligner.py:29-56
    ``-p r+f+n``). Each candidate init is the moments affine composed with
    a flip of the given fixed axes about the volume center.

    Returns ((3, 4) affine, final score, winning flip tuple).
    """
    fixed = np.asarray(fixed, np.float32)
    moving = np.asarray(moving, np.float32)
    base = moments_init(fixed, moving)
    candidates = []
    for flip in flips:
        F = np.eye(4)
        for ax in flip:
            F[ax, ax] = -1.0
            F[ax, 3] = fixed.shape[ax] - 1.0
        init = (np.concatenate([base, [[0, 0, 0, 1]]]) @ F)[:3].astype(
            np.float32
        )
        aff, score = register_affine(
            fixed,
            moving,
            levels=(coarse_level,),
            iters=(coarse_iters,),
            lrs=(0.02,),
            init=init,
            **{
                k: v
                for k, v in kwargs.items()
                if k in ("similarity", "n_samples", "seed")
            },
        )
        candidates.append((score, flip, aff))
    score, flip, aff = max(candidates, key=lambda c: c[0])
    final_aff, final_score = register_affine(
        fixed, moving, init=aff, **kwargs
    )
    return final_aff, final_score, flip


def register_affine(
    fixed: np.ndarray,
    moving: np.ndarray,
    levels=(4, 2, 1),
    iters=(300, 150, 80),
    lrs=(0.02, 0.01, 0.004),
    init: np.ndarray | None = None,
    verbose: bool = False,
    similarity: str = "ncc",
    n_samples: int = 0,
    seed: int = 0,
):
    """Returns ((3, 4) affine fixed→moving at full resolution, final score).

    The affine parameters are optimized per pyramid level in that level's
    voxel coordinates, then rescaled: if F_l = F/s, M_l = M/s then
    A_l = S⁻¹ A S with S = diag(s) ⇒ linear part is scale-invariant and the
    translation scales by s.

    ``n_samples > 0`` switches each gradient step to a stochastic
    similarity over that many fresh uniform random fixed-space coordinates
    (elastix-style): O(n_samples) per step instead of O(n_voxels) —
    hundreds of times faster at production volume sizes, at the cost of
    gradient noise Adam absorbs. The reported final score is always a
    DENSE similarity evaluation of the returned affine (comparable across
    runs and to the dense path). 0 = dense gradients (default).
    """
    fixed = np.asarray(fixed, np.float32)
    moving = np.asarray(moving, np.float32)
    if init is None:
        init = moments_init(fixed, moving)
    affine = jnp.asarray(init, jnp.float32)
    base_key = jax.random.PRNGKey(seed)

    final_ncc = None
    for li, (level, n_iter, lr) in enumerate(zip(levels, iters, lrs)):
        f_l = _pyramid(fixed, level)
        m_l = _pyramid(moving, level)
        # sampling only pays where the grid is big; small pyramid levels
        # keep dense gradients. Two guards, both deliberate: (a) the 64×
        # size bar — sampling a small grid saves nothing; (b) the COARSEST
        # level of any schedule is always dense regardless of volume size,
        # because it does the orientation-critical work (the multistart
        # flip race scores there) — sampled-MI noise at that level picked a
        # wrong flip at Allen scale, and a size-relative bar alone would
        # re-enter that regime on brains bigger than the measured 9.6 MVox
        # (PERF.md r4). Sampling only the expensive fine levels kept
        # recovery acceptance-equal.
        ns = (
            n_samples
            if (n_samples and li > 0 and f_l.size > 64 * n_samples)
            else 0
        )
        # move translation into level coords
        aff_l = affine.at[:, 3].set(affine[:, 3] / level)
        opt_state = optax.adam(lr).init(aff_l)
        done = 0
        chunk = scan_chunk_for(ns if ns else f_l.size, _AFFINE_SCAN_CHUNK)
        while done < n_iter:
            n = min(chunk, n_iter - done)
            seg_key = jax.random.fold_in(
                jax.random.fold_in(base_key, li), done
            )
            aff_l, opt_state, losses = _optimize_level(
                f_l, m_l, aff_l, opt_state, lr, n, similarity=similarity,
                n_samples=ns, key=seg_key,
            )
            # scalar readback bounds the in-flight program (axon rig: see
            # _AFFINE_SCAN_CHUNK) and synchronizes the segment
            final_ncc = -float(losses[-1])
            done += n
        if ns:
            final_ncc = float(dense_score(f_l, m_l, aff_l, similarity))
        affine = aff_l.at[:, 3].set(aff_l[:, 3] * level)
        if verbose:
            print(f"[affine] level {level}: NCC {final_ncc:.4f}")
    return np.asarray(affine), final_ncc


@partial(jax.jit, static_argnames=("similarity",))
def dense_score(fixed, moving, affine, similarity="ncc"):
    """Dense (full-grid) similarity of ``affine`` on a fixed/moving pair —
    the score the stochastic path reports so scores stay comparable."""
    grid = fixed_grid(fixed.shape)
    coords = affine_apply(affine, grid)
    warped = sample_volume(moving, coords)
    w = inside_weight(coords, moving.shape)
    return similarity_fn(similarity)(warped, fixed, w)
