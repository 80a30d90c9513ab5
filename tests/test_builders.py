"""tree_from_occupancy: dense-volume -> octree construction (the
p2v -> tree pipeline's structural step)."""

import jax
import jax.numpy as jnp
import numpy as np

import svox_t_tpu as st
from svox_t_tpu.ops.query import query


def test_tree_from_occupancy_roundtrip(rng):
    R = 16  # depth 4
    occ = np.zeros((R, R, R), bool)
    pts_idx = rng.randint(0, R, (60, 3))
    occ[pts_idx[:, 0], pts_idx[:, 1], pts_idx[:, 2]] = True

    tree, n_occ = st.tree_from_occupancy(occ, data_dim=4)
    assert n_occ == int(occ.sum())
    assert tree.depth_limit == 4

    # every occupied voxel center must resolve to a distinct feature row,
    # every empty voxel to the sentinel
    feats = jnp.asarray(rng.randn(n_occ, 4).astype(np.float32))
    spec = tree._spec()
    grid = (np.stack(np.meshgrid(*[np.arange(R)] * 3, indexing="ij"), -1)
            .reshape(-1, 3) + 0.5) / R
    vals, node_ids, data_ids = query(
        spec, feats, jnp.asarray(grid, jnp.float32), True
    )
    data_ids = np.asarray(data_ids)
    occ_flat = occ.reshape(-1)
    assert (data_ids[occ_flat] < n_occ).all()
    assert (data_ids[~occ_flat] >= n_occ).all()
    assert len(np.unique(data_ids[occ_flat])) == n_occ

    # occupied-cell values come back as the matching feature rows
    np.testing.assert_allclose(
        np.asarray(vals)[occ_flat],
        np.asarray(feats)[data_ids[occ_flat]],
    )


def test_tree_from_occupancy_renders(rng):
    R = 32
    x, y, z = np.meshgrid(*[np.arange(R)] * 3, indexing="ij")
    r = np.sqrt((x - R / 2) ** 2 + (y - R / 2) ** 2 + (z - R / 2) ** 2)
    occ = np.abs(r - R * 0.3) < 1.5
    tree, n_occ = st.tree_from_occupancy(occ, data_dim=4)
    feats = np.abs(rng.randn(n_occ, 4)).astype(np.float32)
    feats[:, -1] *= 20
    rdr = st.VolumeRenderer(tree)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.5, 0.5, 2.5]
    img = np.asarray(rdr.render_persp(jnp.asarray(feats), c2w, 48, 48, fx=48.0))
    assert np.isfinite(img).all()
    assert img[..., -1].max() > 0.3  # the shell is visible


def test_p2v_to_tree_pipeline(rng):
    """voxelize -> threshold -> tree_from_occupancy -> construct_tree."""
    pts = (rng.rand(300, 3) * 0.5 + 0.25).astype(np.float32)
    dens = np.ones((300, 1), np.float32)
    vol = np.asarray(st.voxelize(
        jnp.asarray(pts), jnp.asarray(dens), [0, 0, 0], [1, 1, 1], 32, 0.02, 0.05
    ))[..., 0]
    occ = vol > 0.2
    tree, n_occ = st.tree_from_occupancy(occ, data_dim=4)
    assert n_occ == int(occ.sum()) and n_occ > 0
    tree.construct_tree(jnp.asarray(pts))
    spec = tree._spec()
    feats = jnp.asarray(rng.randn(300, 4).astype(np.float32))
    vals, _, data_ids = query(spec, feats, jnp.asarray(pts), True)
    # each point lands in an occupied voxel and reads back its own row
    # (modulo collisions where several points share a voxel)
    data_ids = np.asarray(data_ids)
    assert (data_ids < 300).all()
    same = data_ids == np.arange(300)
    assert same.mean() > 0.5
