"""Bisect the production-size affine MI crash (round 4): at Allen-50um
shape (228, 160, 264) the remote TPU worker crashes inside
register_affine's full-res level even with 50-step scan segments.
Probes _optimize_level directly with increasing n_steps at level 1 and
level 2 to find the survivable envelope.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp
import optax

from delivr_cfos_tpu.ops.resample import block_mean_downsample
from delivr_cfos_tpu.registration.affine import _optimize_level
from delivr_cfos_tpu.registration.warp import moments_init

SHAPE = (228, 160, 264)


def main():
    rng = np.random.default_rng(0)
    moving = np.load("/tmp/s4_atlas_cache.npy").astype(np.float32)
    fixed = (moving + rng.normal(0, 4.0, SHAPE)).astype(np.float32)
    init = moments_init(fixed, moving)

    for level in (2, 1):
        if level == 1:
            f_l = jnp.asarray(fixed)
            m_l = jnp.asarray(moving)
        else:
            f_l = block_mean_downsample(jnp.asarray(fixed), (level,) * 3)
            m_l = block_mean_downsample(jnp.asarray(moving), (level,) * 3)
        f_l.block_until_ready()
        print(f"level {level} shape {f_l.shape}", flush=True)
        aff = jnp.asarray(init, jnp.float32)
        opt_state = optax.adam(0.004).init(aff)
        for n in (1, 2, 5, 10, 25, 50):
            t0 = time.time()
            aff, opt_state, losses = _optimize_level(
                f_l, m_l, aff, opt_state, 0.004, n, similarity="mi"
            )
            v = float(losses[-1])
            print(
                f"  level {level} n={n}: {time.time()-t0:.1f}s loss {v:.4f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
