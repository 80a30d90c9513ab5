"""Dense-grid max-weight accumulation — PlenOctrees' conversion/pruning
utility (parity: grid_weight_render, rt_kernel.cu:1240-1344, 1454-1478).

For every camera ray, marches a dense (reso^3) sigma grid and records per
voxel (a) the maximum compositing weight any ray gave it and (b) how many
ray samples hit it. The CUDA `atomicMax`/`atomicAdd` become deterministic
XLA scatter-max / scatter-add.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.spec import CameraSpec, RenderOptions
from .render import _chunked_carry, cam2world_rays, world2ndc
from .traversal import clamp_coord, dda_unit, get_delta_scale, world2tree


def grid_weight_render(
    data: jax.Array,
    cam: CameraSpec,
    opt: RenderOptions,
    offset: jax.Array,
    scaling: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """:param data: (reso, reso, reso) density grid
    :return: (grid_weight (reso,reso,reso) max weights,
              grid_hit (reso,reso,reso) hit counts)

    Rays march in chunks (opt.chunk_size) with independent loop exits —
    the same batch-synchrony fix as the main renderer; the accumulation
    grids are the chunk-scan carry."""
    reso = data.shape[0]
    origins, dirs = cam2world_rays(cam.c2w, cam.width, cam.height, cam.fx, cam.fy)
    if opt.ndc_width >= 0:
        dirs, origins = world2ndc(opt, dirs, origins)

    dtype = origins.dtype
    flat_data = data.reshape(-1)
    n_cells = reso ** 3

    def single(origins_, dirs_, grids):
        o = world2tree(origins_, offset, scaling)
        d, delta_scale = get_delta_scale(scaling, dirs_)
        invdir = 1.0 / (d + 1e-9)
        tmin, tmax = dda_unit(o, invdir)
        hit = jnp.logical_not(jnp.logical_or(tmax < 0, tmin > tmax))
        B = origins_.shape[0]

        def cond(carry):
            step, t, L, active, gw, gh = carry
            return jnp.logical_and(step < opt.max_steps, jnp.any(active))

        def body(carry):
            step, t, L, active, gw, gh = carry
            pos = clamp_coord(o + t[:, None] * d) * reso
            uvw = jnp.minimum(jnp.floor(pos), reso - 1).astype(jnp.int32)
            frac = pos - uvw
            node = (uvw[:, 0] * reso + uvw[:, 1]) * reso + uvw[:, 2]
            sub_tmin, sub_tmax = dda_unit(frac, invdir)
            delta_t = (sub_tmax - sub_tmin) / reso + opt.step_size
            sigma = flat_data[node]
            contrib = jnp.logical_and(active, sigma > opt.sigma_thresh)
            att = jnp.exp(-delta_t * delta_scale * sigma)
            weight = L * (1.0 - att)
            L = jnp.where(contrib, L * att, L)
            scat = jnp.where(contrib, node, n_cells)
            gw = gw.at[scat].max(jnp.where(contrib, weight, 0.0), mode="drop")
            gh = gh.at[scat].add(jnp.where(contrib, 1.0, 0.0), mode="drop")
            t = t + delta_t
            active = jnp.logical_and(active, t < tmax)
            return step + 1, t, L, active, gw, gh

        gw0, gh0 = grids
        init = (
            jnp.zeros((), jnp.int32),
            tmin,
            jnp.ones((B,), dtype),
            hit,
            gw0,
            gh0,
        )
        _, _, _, _, gw, gh = jax.lax.while_loop(cond, body, init)
        return gw, gh

    gw, gh = _chunked_carry(
        single,
        opt,
        (origins, dirs),
        (jnp.zeros((n_cells,), dtype), jnp.zeros((n_cells,), dtype)),
        fills=(1e9, 1.0),
    )
    return gw.reshape(reso, reso, reso), gh.reshape(reso, reso, reso)
