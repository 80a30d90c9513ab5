"""Synthetic benchmark scenes: procedurally built octrees with
PlenOctree-like occupancy statistics (sparse shell geometry, SH9
appearance). Construction is pure NumPy breadth-first — no device ops,
no jit compiles — so scene setup costs seconds, not minutes."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

import svox_t_tpu as st
from svox_t_tpu.utils.spec import DATA_SENTINEL


def build_shell_tree(
    depth: int = 7,
    data_format: str = "SH9",
    data_dim: int = 28,
    radius: float = 0.30,
    thickness_vox: float = 1.5,
    seed: int = 0,
    N: int = 2,
):
    """Octree refined around a spherical shell |r - R| < eps — a stand-in
    for a NeRF-synthetic object surface (sparse: O(surface) leaves).

    Returns (tree, features): tree structure built directly in NumPy
    (child/parent_depth/data arrays), features one row per occupied leaf.
    """
    rng = np.random.RandomState(seed)
    fine = 0.5 ** depth

    def shell_hit(centers: np.ndarray, cell_size: float) -> np.ndarray:
        d = np.linalg.norm(centers - 0.5, axis=-1)
        tol = cell_size * np.sqrt(3) * 0.5 + thickness_vox * fine
        return np.abs(d - radius) < tol

    N3 = N ** 3
    u, v, w = np.meshgrid(np.arange(N), np.arange(N), np.arange(N), indexing="ij")
    uvw = np.stack([u.ravel(), v.ravel(), w.ravel()], -1)  # (N^3, 3)

    # Breadth-first construction. Node 0 = root at depth 0.
    child_rows = [np.zeros((1, N3), np.int32)]
    parent_rows = [np.zeros((1, 2), np.int32)]
    # frontier: nodes created at current level: (node_id, corner in [0,1))
    frontier_ids = np.array([0], np.int64)
    frontier_corners = np.zeros((1, 3), np.float64)
    n_nodes = 1
    leaf_cells = []  # (node_id, cell_idx, center, size) of occupied leaves

    for level in range(depth):
        cell = 0.5 ** (level + 1)
        n = len(frontier_ids)
        centers = (
            frontier_corners[:, None, :] + (uvw[None] + 0.5) * cell
        ).reshape(-1, 3)
        hit = shell_hit(centers, cell)
        subdivide = hit if level < depth - 1 else np.zeros_like(hit)
        # occupied leaves at the last level (or hit cells we stop at)
        occupied = hit & ~subdivide
        node_of = np.repeat(frontier_ids, N3)
        cell_of = np.tile(np.arange(N3), n)
        if occupied.any():
            leaf_cells.append(
                (node_of[occupied], cell_of[occupied], centers[occupied])
            )
        k = int(subdivide.sum())
        if k == 0:
            frontier_ids = np.array([], np.int64)
            break
        new_ids = n_nodes + np.arange(k)
        ch = np.zeros((n, N3), np.int32)
        ch.reshape(-1)[subdivide] = (new_ids - node_of[subdivide]).astype(np.int32)
        child_rows.append(ch)  # rows align with this level's frontier_ids
        pr = np.zeros((k, 2), np.int32)
        pr[:, 0] = (
            (node_of[subdivide] * N + uvw[cell_of[subdivide], 0]) * N
            + uvw[cell_of[subdivide], 1]
        ) * N + uvw[cell_of[subdivide], 2]
        pr[:, 1] = level + 1
        parent_rows.append(pr)
        frontier_ids = new_ids
        frontier_corners = (
            np.repeat(frontier_corners, N3, axis=0) + uvw[np.tile(np.arange(N3), n)] * cell
        )[subdivide]
        n_nodes += k

    # Assemble child table: level-0 block is the root row; each level's
    # `ch` block holds the rows OF the previous frontier.
    child = np.zeros((n_nodes, N3), np.int32)
    pdepth = np.zeros((n_nodes, 2), np.int32)
    row0 = 0
    # parent_rows[i] are the parent/depth entries for nodes created at level i.
    offs = 0
    for pr in parent_rows:
        pdepth[offs : offs + len(pr)] = pr
        offs += len(pr)
    # child blocks: block i (i>=1) holds rows of the frontier at level i-1,
    # which are nodes [start_i, start_i + len(block)).
    starts = np.cumsum([0] + [len(p) for p in parent_rows[:-1]])
    for i, ch in enumerate(child_rows[1:]):
        s = starts[i]
        child[s : s + len(ch)] = ch

    data = np.full((n_nodes, N3), DATA_SENTINEL, np.int32)
    if leaf_cells:
        nodes = np.concatenate([c[0] for c in leaf_cells])
        cells = np.concatenate([c[1] for c in leaf_cells])
        centers = np.concatenate([c[2] for c in leaf_cells])
        data[nodes, cells] = np.arange(len(nodes), dtype=np.int32)
        M = len(nodes)
    else:
        centers = np.zeros((0, 3))
        M = 0

    t = st.N3Tree(N=N, data_dim=data_dim, depth_limit=depth, data_format=data_format)
    t._child = child.reshape(n_nodes, N, N, N)
    t._data = data.reshape(n_nodes, N, N, N, 1)
    t._parent_depth = pdepth
    t._n_internal = n_nodes
    t.filled = n_nodes
    t._invalidate()

    feats = (rng.randn(M, data_dim) * 0.3).astype(np.float32)
    feats[:, -1] = np.abs(rng.randn(M)).astype(np.float32) * 30.0 + 10.0
    return t, jnp.asarray(feats)


def build_opaque_tree(depth: int = 7, data_format: str = "SH9",
                      data_dim: int = 28, radius: float = 0.30,
                      seed: int = 0, N: int = 2, sigma: float = 400.0):
    """Shell scene with near-opaque surface densities — the workload
    where the reference's `fast` mode (early ray termination,
    renderer.py:428-433) pays: rays stop at the first surface crossing
    instead of marching through to the far side."""
    t, feats = build_shell_tree(
        depth=depth, data_format=data_format, data_dim=data_dim,
        radius=radius, seed=seed, N=N,
    )
    feats = feats.at[:, -1].set(sigma)
    return t, feats


def orbit_camera(theta: float = 0.5, phi: float = 0.4, dist: float = 2.2):
    """c2w matrix orbiting the unit-cube center, looking at it."""
    eye = 0.5 + dist * np.array(
        [np.cos(theta) * np.cos(phi), np.sin(theta) * np.cos(phi), np.sin(phi)]
    )
    fwd = 0.5 - eye
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0] = right
    c2w[:3, 1] = up
    c2w[:3, 2] = -fwd
    c2w[:3, 3] = eye
    return c2w
