"""Tree-core unit tests: construction, refine, pack/unpack, corners,
persistence, frontier ops — against hand-computed small trees
(SURVEY.md §4 test strategy, stage S1)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import svox_t_tpu as st
from svox_t_tpu.ops.traversal import descend, pack_index, unpack_index

from helpers import build_tree


def test_initial_tree():
    t = st.N3Tree(N=2, data_dim=4)
    assert t.n_internal == 1
    assert t.n_leaves == 8
    assert t.child.shape == (1, 2, 2, 2)
    assert t.data.shape == (1, 2, 2, 2, 1)
    assert (np.asarray(t.data) == st.DATA_SENTINEL).all()


def test_init_refine_reserve():
    t = st.N3Tree(N=2, data_dim=4, init_refine=1)
    # root + 8 children internal nodes
    assert t.n_internal == 9
    assert t.n_leaves == 64


def test_pack_unpack_roundtrip(rng):
    N = 3
    txyz = np.stack(
        [rng.randint(0, 50, 100), *(rng.randint(0, N, 100) for _ in range(3))], -1
    ).astype(np.int32)
    packed = pack_index(jnp.asarray(txyz), N)
    unpacked = unpack_index(packed, N)
    np.testing.assert_array_equal(np.asarray(unpacked), txyz)


def test_refine_structure():
    t = st.N3Tree(N=2, data_dim=4, depth_limit=3)
    t._refine_at(0, (0, 0, 0))
    assert t.n_internal == 2
    # child offset of cell (0,0,0) points to node 1
    assert t.child[0, 0, 0, 0] == 1
    assert t.parent_depth[1, 1] == 1  # depth
    # parent packed id of node 1 = pack(0,0,0,0) = 0
    assert t.parent_depth[1, 0] == 0
    assert t.n_leaves == 7 + 8


def test_refine_depth_limit():
    t = st.N3Tree(N=2, data_dim=4, depth_limit=1)
    t.refine()  # all leaves -> depth 1 nodes
    before = t.n_internal
    t.refine()  # all at depth_limit, nothing to do
    assert t.n_internal == before


def test_descend_hand_tree():
    """Hand-computed: refine cell (0,0,0); check descent results."""
    t = st.N3Tree(N=2, data_dim=4, depth_limit=3)
    t._refine_at(0, (0, 0, 0))
    spec = t._spec()
    pts = jnp.asarray(
        [
            [0.1, 0.1, 0.1],   # inside refined cell -> node 1 cell (0,0,0), depth 2
            [0.9, 0.9, 0.9],   # root-level leaf (1,1,1)
            [0.1, 0.6, 0.1],   # root-level leaf (0,1,0)
        ],
        jnp.float32,
    )
    leaf = descend(spec, pts)
    cube = np.asarray(leaf.cube_sz)
    assert cube[0] == 4.0 and cube[1] == 2.0 and cube[2] == 2.0
    node = np.asarray(unpack_index(leaf.node_flat, 2))
    np.testing.assert_array_equal(node[1], [0, 1, 1, 1])
    np.testing.assert_array_equal(node[2], [0, 0, 1, 0])
    assert node[0][0] == 1  # inside node 1
    # fractional coords of point 0: 0.1 * 2 = 0.2 -> cell 0 frac 0.2;
    # *2 = 0.4 -> cell 0, frac 0.4
    np.testing.assert_allclose(np.asarray(leaf.frac)[0], [0.4, 0.4, 0.4], atol=1e-5)


def test_corners_match_descent(rng):
    t, feats, centers = build_tree(rng, depth_limit=4)
    view = t[:]
    corners = view.corners_local
    lengths = view.lengths_local
    # every leaf's center must descend back to that leaf
    centers_local = corners + 0.5 * lengths[:, None]
    spec = t._spec()
    leaf = descend(spec, jnp.asarray(centers_local, jnp.float32))
    ln = view._leaf_node
    expected_flat = (
        (ln[:, 0] * t.N + ln[:, 1]) * t.N + ln[:, 2]
    ) * t.N + ln[:, 3]
    np.testing.assert_array_equal(np.asarray(leaf.node_flat), expected_flat)
    # cube_sz consistency: lengths_local == 1/cube_sz
    np.testing.assert_allclose(
        np.asarray(leaf.cube_sz), 1.0 / lengths, rtol=1e-6
    )


def test_world_transforms():
    t = st.N3Tree(radius=2.0, center=[1.0, 1.0, 1.0])
    pts = jnp.asarray([[1.0, 1.0, 1.0], [3.0, -1.0, 1.0]], jnp.float32)
    tree_pts = np.asarray(t.world2tree(pts))
    np.testing.assert_allclose(tree_pts, [[0.5, 0.5, 0.5], [1.0, 0.0, 0.5]], atol=1e-6)
    back = np.asarray(t.tree2world(jnp.asarray(tree_pts)))
    np.testing.assert_allclose(back, np.asarray(pts), atol=1e-6)


def test_save_load_roundtrip(tmp_path, rng):
    t, feats, centers = build_tree(rng, data_dim=7, data_format="SH1")
    t.features = feats
    p = os.path.join(tmp_path, "tree.npz")
    t.save(p)
    t2 = st.N3Tree.load(p)
    assert t2.N == t.N and t2.data_dim == t.data_dim
    assert t2.n_internal == t.n_internal
    np.testing.assert_array_equal(t2.child, t.child)
    np.testing.assert_array_equal(np.asarray(t2.data), np.asarray(t.data))
    np.testing.assert_allclose(t2.invradius, t.invradius)
    np.testing.assert_allclose(
        np.asarray(t2.features), np.asarray(t.features)
    )
    assert repr(t2.data_format) == repr(t.data_format)


def test_load_legacy_svox_float_data(tmp_path, rng):
    """Upstream-svox npz with float leaf features in `data`."""
    t = st.N3Tree(N=2, data_dim=4)
    raw = rng.rand(1, 2, 2, 2, 4).astype(np.float16)
    p = os.path.join(tmp_path, "legacy.npz")
    np.savez(
        p,
        data_dim=4,
        child=t.child,
        parent_depth=t.parent_depth,
        n_internal=1,
        invradius=1.0,
        offset=np.full(3, 0.0, np.float32),
        depth_limit=4,
        geom_resize_fact=1.5,
        data=raw,
    )
    t2 = st.N3Tree.load(p)
    assert t2.features.shape == (8, 4)
    np.testing.assert_allclose(
        np.asarray(t2.features), raw.reshape(-1, 4).astype(np.float32)
    )
    # identity index table
    np.testing.assert_array_equal(
        np.asarray(t2.data).ravel(), np.arange(8)
    )


def test_frontier_and_merge(rng):
    t, feats, centers = build_tree(rng, n_random_refines=1)
    t.features = feats
    frontier = t._frontier
    assert len(frontier) > 0
    # all frontier nodes have all-leaf children
    for nid in frontier:
        assert (t.child[nid] == 0).all()
    n_leaves_before = t.n_leaves
    n_merge = min(2, len(frontier))
    assert t.merge(np.arange(n_merge))
    # each merged parent cell became a leaf; the freed nodes' cells remain
    # counted until shrink_to_fit (same garbage-until-shrink contract as
    # the reference, svox.py:352-389)
    assert t.n_leaves == n_leaves_before + n_merge
    assert t._n_free > 0
    # shrink defrags: freed nodes' N^3 cells disappear
    cap_before = t.capacity
    assert t.shrink_to_fit()
    assert t.capacity < cap_before
    assert t._n_free == 0
    assert t.n_leaves == n_leaves_before + n_merge - n_merge * t.N ** 3


def test_shrink_preserves_structure(rng):
    t, feats, centers = build_tree(rng, n_random_refines=1)
    t.features = feats
    spec = t._spec()
    pts = jnp.asarray(rng.rand(50, 3).astype(np.float32))
    v1, n1, d1 = st.ops.query.query(spec, feats, pts, True)
    t.merge(np.arange(1))
    t.shrink_to_fit()
    v2, n2, d2 = st.ops.query.query(t._spec(), feats, pts, True)
    # data ids of points not under the merged node are unchanged
    d1, d2 = np.asarray(d1), np.asarray(d2)
    unchanged = d2 == d1
    assert unchanged.mean() > 0.5


def test_view_indexing(rng):
    t, feats, centers = build_tree(rng)
    t.features = feats
    n = t.n_leaves
    # int key
    v = t[0]
    assert v.values.shape == (t.data_dim,)
    # slice
    v = t[: n // 2]
    assert v.values.shape == (n // 2, t.data_dim)
    # point key
    v = t[jnp.asarray(centers[:5], jnp.float32)]
    assert v.unique_leaf_node is not None
    # unique-leaf order is sorted by packed id; compare as row sets
    got = np.asarray(v.values)
    want = np.asarray(feats[:5])
    got = got[np.lexsort(got.T)]
    want = want[np.lexsort(want.T)]
    np.testing.assert_allclose(got, want)
    # depth/lengths consistency: lengths = 2^-(d+1)/invradius
    d = t[:].depths
    L = t[:].lengths
    np.testing.assert_allclose(
        L, (2.0 ** (-d.astype(np.float32) - 1))[:, None] / t.invradius, rtol=1e-6
    )


def test_view_set_and_inplace(rng):
    t, feats, centers = build_tree(rng)
    t.features = feats
    view = t[:4]
    newvals = np.ones((4, t.data_dim), np.float32) * 3.0
    view.set(newvals)
    np.testing.assert_allclose(np.asarray(t[:4].values), newvals)
    t[:4].clamp_(max=1.0)
    assert float(np.asarray(t[:4].values).max()) <= 1.0
    t.relu_()
    assert float(np.asarray(t[:].values).min()) >= 0.0


def test_view_set_channel_key(rng):
    """Channel-key writes: scalar broadcast, per-leaf vector, and slice
    of channels — device scatter, other channels untouched."""
    t, feats, centers = build_tree(rng)
    t.features = feats
    before = np.asarray(t[:].values).copy()
    n = before.shape[0]

    # scalar into one channel
    t[:, 1].set(7.5)
    after = np.asarray(t[:].values)
    np.testing.assert_allclose(after[:, 1], 7.5)
    np.testing.assert_allclose(after[:, 0], before[:, 0])
    np.testing.assert_allclose(after[:, 2:], before[:, 2:])

    # per-leaf vector into one channel
    vec = np.linspace(0.0, 1.0, n).astype(np.float32)
    t[:, 2].set(vec)
    after = np.asarray(t[:].values)
    np.testing.assert_allclose(after[:, 2], vec, atol=1e-6)
    np.testing.assert_allclose(after[:, 1], 7.5)

    # block into a channel slice
    blk = np.stack([vec, 2 * vec], axis=1)
    t[:, 0:2].set(blk)
    after = np.asarray(t[:].values)
    np.testing.assert_allclose(after[:, 0:2], blk, atol=1e-6)
    np.testing.assert_allclose(after[:, 2], vec, atol=1e-6)


def test_view_invalidation(rng):
    t, feats, centers = build_tree(rng)
    view = t[:]
    t.refine()
    with pytest.raises(RuntimeError):
        _ = view.values


def test_repr_and_len(rng):
    t, _, _ = build_tree(rng)
    assert "N3Tree" in repr(t)
    assert len(t) == t.n_leaves
    assert t.shape == (t.n_leaves, t.data_dim)
    assert t.numel() == t.n_leaves * t.data_dim


def test_view_xyz_tuple_key(rng):
    """tree[x, y, z] float-tuple point indexing (helpers.py:45-52 parity)."""
    t, feats, centers = build_tree(rng)
    t.features = feats
    c = centers[0]
    v = t[float(c[0]), float(c[1]), float(c[2])]
    vals = np.asarray(v.values)
    np.testing.assert_allclose(vals.reshape(-1, t.data_dim)[0], np.asarray(feats[0]))


def test_view_local_index(rng):
    """tree[LocalIndex(points)] uses tree-space coordinates."""
    t, feats, centers = build_tree(rng)
    t.features = feats
    local = np.asarray(jax.device_get(t.world2tree(jnp.asarray(centers[:4]))))
    v = t[st.LocalIndex(jnp.asarray(local, jnp.float32))]
    got = np.asarray(v.values)
    want = np.asarray(feats[:4])
    got = got[np.lexsort(got.T)]
    want = want[np.lexsort(want.T)]
    np.testing.assert_allclose(got, want)


def test_shrink_defrag_parent_links(rng):
    """Regression: packed parent ids must shift by par_shift * N^3 on
    defragmentation (the reference subtracts the raw node shift,
    corrupting parent links — svox.py:627)."""
    t = st.N3Tree(N=2, data_dim=4, depth_limit=5)
    t.refine()                       # nodes 1..8 (depth 1)
    t._refine_at(1, (0, 0, 0))       # node 9
    t._refine_at(2, (0, 0, 0))       # node 10
    t._refine_at(10, (0, 0, 0))      # node 11, parent packed = pack(10,0,0,0)
    corners_before = {
        tuple(map(int, row)): np.asarray(c)
        for row, c in zip(t._all_leaves(), np.asarray(
            jax.device_get(t._calc_corners(jnp.asarray(t._all_leaves(), jnp.int32)))
        ))
    }
    # free node 9 (its parent cell becomes a leaf), then defrag
    t.merge(np.asarray([0]))  # merge the first frontier node
    freed = int(t._n_free)
    assert freed == 1
    t.shrink_to_fit()
    # every surviving leaf's corner must be unchanged
    leaves_after = t._all_leaves()
    corners_after = np.asarray(jax.device_get(
        t._calc_corners(jnp.asarray(leaves_after, jnp.int32))
    ))
    # match leaves by corner set: corners before (minus merged subtree)
    # must be a superset of corners after
    before_set = {tuple(np.round(c, 6)) for c in corners_before.values()}
    for c in corners_after:
        assert tuple(np.round(c, 6)) in before_set, c
    # parent links must be internally consistent: child links round-trip
    pd = t.parent_depth
    for nid in range(1, t.n_internal):
        parent = t._unpack_index_np(np.asarray([pd[nid, 0]]))[0]
        pn, px, py, pz = map(int, parent)
        assert t.child[pn, px, py, pz] == nid - pn, (nid, parent)


def test_deep_refine_beyond_depth_limit_respected(rng):
    """Regression: repeats>1 must honor depth_limit, and descent must
    still resolve trees whose actual depth was (historically) deeper."""
    t = st.N3Tree(N=2, data_dim=4, depth_limit=1)
    t.refine(repeats=3)
    assert int(t.parent_depth[: t.n_internal, 1].max()) <= t.depth_limit
    # and a legitimately deep tree still queries correctly
    t2 = st.N3Tree(N=2, data_dim=4, depth_limit=4)
    t2.refine(repeats=3)  # all leaves at depth 3
    centers = t2[:].corners_local + 0.5 * t2[:].lengths_local[:, None]
    world = np.asarray(jax.device_get(t2.tree2world(jnp.asarray(centers))))
    t2.construct_tree(world)
    M = world.shape[0]
    feats = jnp.asarray(rng.randn(M, 4).astype(np.float32))
    vals, _, data_ids = st.ops.query.query(
        t2._spec(), feats, jnp.asarray(world, jnp.float32), True
    )
    np.testing.assert_array_equal(np.asarray(data_ids), np.arange(M))


def test_refine_invalidates_on_partial_repeats(rng):
    """refine(repeats=2) where only the first repeat refines (depth
    limit) must still drop cached specs — stale caches silently render
    the pre-refine structure."""
    t = st.N3Tree(N=2, data_dim=4, depth_limit=2)
    t.refine()  # depth-1 children
    _ = t._spec()  # populate the cache
    n0 = t.n_leaves
    resized = t.refine(repeats=2)  # repeat 0 refines to the limit; 1 no-ops
    assert t.n_leaves > n0
    spec = t._spec()
    assert int(spec.n_internal) == t.n_internal


def test_view_tensor_conveniences(rng):
    """Tensor-style conveniences on the view (parity: the reference
    redirects item/size/dim/numel and clamp/relu/sigmoid etc. to the
    underlying values — helpers.py:340-360)."""
    t, feats, _ = build_tree(rng, data_dim=4)
    t.features = feats
    v = t[:]
    n = len(v)
    assert v.size() == (n, 4) and v.size(0) == n and v.size(1) == 4
    assert v.dim() == 2 and v.numel() == n * 4
    vals = np.asarray(jax.device_get(v.values))
    np.testing.assert_allclose(
        np.asarray(jax.device_get(v.clamp(-0.1, 0.1))),
        np.clip(vals, -0.1, 0.1), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(v.clamp_min(0.0))),
        np.maximum(vals, 0.0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(v.clamp_max(0.0))),
        np.minimum(vals, 0.0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(v.relu())), np.maximum(vals, 0.0),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(v.sigmoid())), 1 / (1 + np.exp(-vals)),
        rtol=1e-5)
    # values_local: working alias (the reference's own tree.values_local
    # redirect targets a view attribute that does not exist there)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(t.values_local)), vals)
    # non-mutating: the pool is untouched
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(t[:].values)), vals)
    # item() on a single scalar selection
    one = t[0, 0]
    assert isinstance(one.item(), float)
