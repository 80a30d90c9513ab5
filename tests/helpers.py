"""Shared test utilities: random tree builders and ray generators."""

import jax
import jax.numpy as jnp
import numpy as np

import svox_t_tpu as st


def build_tree(
    rng,
    N=2,
    data_dim=4,
    depth_limit=4,
    data_format="RGBA",
    n_random_refines=2,
    extra_data=None,
    sigma_scale=10.0,
    occupy=None,
):
    """Random irregular tree with features attached to every leaf.

    Returns (tree, features) where features has one row per leaf and the
    index table points at them via construct_tree on leaf centers.

    ``occupy``: optional predicate over (L, 3) world leaf centers
    returning a bool mask — only those leaves get data pointers (the
    rest stay genuinely empty, sentinel index). Features then have one
    row per OCCUPIED leaf.
    """
    t = st.N3Tree(
        N=N, data_dim=data_dim, depth_limit=depth_limit,
        data_format=data_format, extra_data=extra_data,
    )
    t.refine(repeats=1)
    for _ in range(n_random_refines):
        n = t.n_leaves
        sel_idx = rng.choice(n, size=max(1, n // 3), replace=False)
        leaves = t._all_leaves()[np.sort(sel_idx)]
        t.refine(sel=tuple(leaves.T), leaf_node=leaves)

    centers_local = t[:].corners_local + 0.5 * t[:].lengths_local[:, None]
    centers_world = np.asarray(
        jax.device_get(t.tree2world(jnp.asarray(centers_local)))
    )
    if occupy is not None:
        centers_world = centers_world[occupy(centers_world)]
    t.construct_tree(centers_world)
    M = centers_world.shape[0]
    feats = rng.randn(M, data_dim).astype(np.float32) * 0.5
    feats[:, -1] = np.abs(feats[:, -1]) * sigma_scale
    return t, jnp.asarray(feats), centers_world


def make_rays(rng, B=128, toward_center=True):
    """Rays from random points on a sphere of radius 2 around (.5,.5,.5),
    pointing at jittered targets inside the cube — mostly hits, some
    near-misses."""
    phi = rng.rand(B) * 2 * np.pi
    costh = rng.rand(B) * 2 - 1
    sinth = np.sqrt(1 - costh ** 2)
    origins = 0.5 + 2.0 * np.stack(
        [sinth * np.cos(phi), sinth * np.sin(phi), costh], -1
    )
    targets = 0.5 + (rng.rand(B, 3) - 0.5) * (1.2 if toward_center else 6.0)
    dirs = targets - origins
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = origins.astype(np.float32)
    dirs = dirs.astype(np.float32)
    return st.Rays(jnp.asarray(origins), jnp.asarray(dirs), jnp.asarray(dirs))
