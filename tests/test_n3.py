"""Non-octree branching factors (N=3): the reference supports N >= 2 but
only ever exercises N=2; these keep the N-generic paths honest."""

import jax
import jax.numpy as jnp
import numpy as np

import svox_t_tpu as st
from svox_t_tpu.ops.query import query
from svox_t_tpu.ops.reference_renderer import volume_render_oracle
from svox_t_tpu.ops.render import volume_render

from helpers import build_tree, make_rays


def test_n3_query_render_grads(rng):
    t, feats, centers = build_tree(
        rng, N=3, data_dim=4, depth_limit=3, n_random_refines=1
    )
    vals, _, data_ids = query(
        t._spec(), feats, jnp.asarray(centers, jnp.float32), True
    )
    np.testing.assert_allclose(np.asarray(vals), np.asarray(feats))

    rays = make_rays(rng, 48)
    opt = st.VolumeRenderer(t)._get_options(False)
    spec = t._spec()
    out_t = volume_render(spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt)
    out_o = volume_render_oracle(
        spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_o), atol=1e-6)

    baked = t._baked_spec()
    out_b = volume_render(baked, feats, rays.origins, rays.dirs, rays.viewdirs, opt)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_b), atol=3e-6)

    def loss(f, sp):
        return jnp.sum(
            volume_render(sp, f, rays.origins, rays.dirs, rays.viewdirs, opt) ** 2
        )

    g1 = np.asarray(jax.grad(lambda f: loss(f, spec))(feats))
    g2 = np.asarray(
        jax.grad(
            lambda f: jnp.sum(
                volume_render_oracle(
                    spec, f, rays.origins, rays.dirs, rays.viewdirs, opt
                )
                ** 2
            )
        )(feats)
    )
    scale = np.abs(g2).max() + 1e-8
    np.testing.assert_allclose(g1 / scale, g2 / scale, atol=3e-5)


def test_n3_lengths_and_corners(rng):
    t, feats, centers = build_tree(rng, N=3, depth_limit=2, n_random_refines=0)
    # N=3 depth-0 leaves have local side 1/3 (the reference's hardcoded
    # 2^-(d+1) would say 1/2)
    L = t[:].lengths_local
    d = t[:].depths
    np.testing.assert_allclose(L, 3.0 ** (-(d.astype(np.float32)) - 1.0))
    # corners land on 1/3 lattice
    c = t[:].corners_local
    np.testing.assert_allclose(c * 9, np.round(c * 9), atol=1e-5)
