"""Baked-structure and chunked-march parity tests: the fast paths must
reproduce the tree-walk path bit-for-bit (or to float-rounding) on random
trees, including gradients, weight accumulation, and aux renders."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import svox_t_tpu as st
from svox_t_tpu.ops import bake as bake_ops
from svox_t_tpu.ops.query import construct_tree
from svox_t_tpu.ops.render import (volume_render,
                                   volume_render_with_weight_accum)
from svox_t_tpu.ops.render_aux import (motion_feature_render, motion_render,
                                       opacity_render, render_depth)

from helpers import build_tree, make_rays


@pytest.fixture(scope="module")
def scene():
    rng = np.random.RandomState(7)
    t, feats, centers = build_tree(rng, data_dim=13, data_format="SH4",
                                   depth_limit=5, n_random_refines=3)
    return t, feats, centers, rng


def _opts(t, **kw):
    r = st.VolumeRenderer(t)
    opt = r._get_options(False)
    return dataclasses.replace(opt, **kw)


def test_baked_lookup_matches_descend(scene):
    t, feats, centers, rng = scene
    from svox_t_tpu.ops.traversal import descend

    baked = t._baked_spec()
    spec = t._spec()
    pts = jnp.asarray(rng.rand(500, 3).astype(np.float32))
    leaf = descend(spec, pts)
    di, cube, frac, cell = bake_ops.lookup(baked, pts)
    valid_tree = np.asarray(leaf.data_idx) < feats.shape[0]
    valid_baked = np.asarray(di) < feats.shape[0]
    np.testing.assert_array_equal(valid_tree, valid_baked)
    np.testing.assert_array_equal(
        np.asarray(leaf.data_idx)[valid_tree], np.asarray(di)[valid_baked]
    )
    np.testing.assert_allclose(np.asarray(leaf.cube_sz), np.asarray(cube))
    np.testing.assert_allclose(np.asarray(leaf.frac), np.asarray(frac), atol=2e-5)


def test_baked_render_parity(scene):
    t, feats, centers, rng = scene
    rays = make_rays(rng, 64)
    opt = _opts(t)
    spec = t._spec()
    baked = t._baked_spec()
    out_t = volume_render(spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt)
    out_b = volume_render(baked, feats, rays.origins, rays.dirs, rays.viewdirs, opt)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_b), atol=2e-6)


def test_baked_grad_parity(scene):
    t, feats, centers, rng = scene
    rays = make_rays(rng, 48)
    opt = _opts(t)
    spec = t._spec()
    baked = t._baked_spec()

    def loss(f, sp):
        out = volume_render(sp, f, rays.origins, rays.dirs, rays.viewdirs, opt)
        return jnp.sum(out ** 2)

    g_t = np.asarray(jax.grad(loss)(feats, spec))
    g_b = np.asarray(jax.grad(loss)(feats, baked))
    np.testing.assert_allclose(g_t, g_b, atol=3e-5)


def test_chunked_render_parity(scene):
    t, feats, centers, rng = scene
    rays = make_rays(rng, 100)  # not divisible by chunk -> padding path
    spec = t._spec()
    opt_full = _opts(t, chunk_size=0)
    opt_chunk = _opts(t, chunk_size=16)
    a = volume_render(spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt_full)
    b = volume_render(spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt_chunk)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_chunked_grad_parity(scene):
    t, feats, centers, rng = scene
    rays = make_rays(rng, 100)
    spec = t._spec()
    opt_full = _opts(t, chunk_size=0)
    opt_chunk = _opts(t, chunk_size=16)

    def loss(f, o):
        out = volume_render(spec, f, rays.origins, rays.dirs, rays.viewdirs, o)
        return jnp.sum(out ** 2)

    g1 = np.asarray(jax.grad(lambda f: loss(f, opt_full))(feats))
    g2 = np.asarray(jax.grad(lambda f: loss(f, opt_chunk))(feats))
    np.testing.assert_allclose(g1, g2, atol=2e-5)


def test_chunked_weight_accum_parity(scene):
    t, feats, centers, rng = scene
    rays = make_rays(rng, 100)
    spec = t._spec()
    opt_full = _opts(t, chunk_size=0)
    opt_chunk = _opts(t, chunk_size=16)
    out1, w1 = volume_render_with_weight_accum(
        spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt_full
    )
    out2, w2 = volume_render_with_weight_accum(
        spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt_chunk
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-5)


def test_baked_weight_accum_parity(scene):
    t, feats, centers, rng = scene
    rays = make_rays(rng, 64)
    opt = _opts(t)
    spec = t._spec()
    baked = t._baked_spec()
    _, w1 = volume_render_with_weight_accum(
        spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    _, w2 = volume_render_with_weight_accum(
        baked, feats, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-5)


def test_chunked_aux_parity(scene):
    t, feats, centers, rng = scene
    rays = make_rays(rng, 100)
    spec = t._spec()
    opt_full = _opts(t, chunk_size=0)
    opt_chunk = _opts(t, chunk_size=16)
    for fn in (opacity_render, render_depth):
        a = fn(spec, feats, rays.origins, rays.dirs, opt_full)
        b = fn(spec, feats, rays.origins, rays.dirs, opt_chunk)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_baked_refresh_after_construct(scene):
    t, feats, centers, rng = scene
    spec = t._spec()
    baked0 = t._baked_spec()
    # re-point with permuted cloud; refresh must equal a fresh bake
    perm = rng.permutation(centers.shape[0])
    new_data = construct_tree(spec, jnp.asarray(centers[perm]))
    refreshed = bake_ops.refresh(baked0, new_data)
    spec2 = spec.with_(data_flat=new_data)
    fresh = bake_ops.bake(spec2)
    np.testing.assert_array_equal(np.asarray(refreshed.top), np.asarray(fresh.top))
    np.testing.assert_array_equal(
        np.asarray(refreshed.brick), np.asarray(fresh.brick)
    )


def test_renderer_backend_api(scene):
    t, feats, centers, rng = scene
    rays = make_rays(rng, 32)
    out_tree = st.VolumeRenderer(t, backend="tree")(feats, rays)
    out_baked = st.VolumeRenderer(t, backend="baked")(feats, rays)
    np.testing.assert_allclose(
        np.asarray(out_tree), np.asarray(out_baked), atol=2e-6
    )


def test_baked_transformation_matrices(scene):
    t, feats, centers, rng = scene
    rays = make_rays(rng, 32)
    M = feats.shape[0]
    rot = np.eye(4, dtype=np.float32)
    rot[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    tmats = jnp.asarray(np.tile(rot, (M, 1, 1)))
    out_tree = st.VolumeRenderer(t, backend="tree")(
        feats, rays, transformation_matrices=tmats
    )
    out_baked = st.VolumeRenderer(t, backend="baked")(
        feats, rays, transformation_matrices=tmats
    )
    np.testing.assert_allclose(
        np.asarray(out_tree), np.asarray(out_baked), atol=2e-6
    )


@pytest.mark.parametrize("interp", [0, 1])
def test_aux_backend_interp_parity(scene, interp):
    """Every aux entry point must agree between the tree walk and the
    baked backend, in nearest AND trilinear (interp) modes — including
    motion_feature_render, which historically only had a tree path."""
    t, feats, centers, rng = scene
    rays = make_rays(rng, 64)
    opt = _opts(t, interp=interp)
    M = feats.shape[0]
    # joints in extra_data for motion_render; LBS tables for mf render
    joints = np.asarray(rng.rand(5, 3), np.float32)
    t2 = t.partial()
    t2.extra_data = joints
    t2._invalidate_spec()
    spec = t2._spec()
    baked = t2._baked_spec()

    for fn in (opacity_render, render_depth):
        a = fn(spec, feats, rays.origins, rays.dirs, opt)
        b = fn(baked, feats, rays.origins, rays.dirs, opt)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5,
            err_msg=f"{fn.__name__} interp={interp}",
        )

    mt = motion_render(spec, feats, rays.origins, rays.dirs, opt)
    mb = motion_render(baked, feats, rays.origins, rays.dirs, opt)
    for x, y in zip(mt, mb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=1e-5,
            err_msg=f"motion_render interp={interp}",
        )

    n_bones, jdim, J = 3, 6, 5
    sw = jnp.asarray(np.abs(rng.rand(M, n_bones)).astype(np.float32))
    ji = jnp.asarray(rng.randint(0, J, size=(M, n_bones)).astype(np.int32))
    jf = jnp.asarray(rng.randn(J, jdim).astype(np.float32))
    spec_mf = t2._spec(skinning_weights=sw, joint_index=ji)
    baked_mf = dataclasses.replace(baked, skinning_weights=sw, joint_index=ji)
    a = motion_feature_render(
        spec_mf, jf, feats, rays.origins, rays.dirs, opt
    )
    b = motion_feature_render(
        baked_mf, jf, feats, rays.origins, rays.dirs, opt
    )
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5,
        err_msg=f"motion_feature_render interp={interp}",
    )
    ga = jax.grad(lambda j: jnp.sum(motion_feature_render(
        spec_mf, j, feats, rays.origins, rays.dirs, opt) ** 2))(jf)
    gb = jax.grad(lambda j: jnp.sum(motion_feature_render(
        baked_mf, j, feats, rays.origins, rays.dirs, opt) ** 2))(jf)
    np.testing.assert_allclose(
        np.asarray(ga), np.asarray(gb), atol=1e-4,
        err_msg=f"motion_feature_render grad interp={interp}",
    )


def test_mf_render_baked_backend_api(scene):
    """VolumeRenderer(backend='baked').motion_feature_render must route
    through the baked spec and equal the tree backend."""
    t, feats, centers, rng = scene
    rays = make_rays(rng, 32)
    M = feats.shape[0]
    n_bones, jdim, J = 3, 6, 4
    sw = jnp.asarray(np.abs(rng.rand(M, n_bones)).astype(np.float32))
    ji = jnp.asarray(rng.randint(0, J, size=(M, n_bones)).astype(np.int32))
    jf = jnp.asarray(rng.randn(J, jdim).astype(np.float32))
    out_t = st.VolumeRenderer(t, backend="tree").motion_feature_render(
        feats, jf, sw, ji, rays
    )
    out_b = st.VolumeRenderer(t, backend="baked").motion_feature_render(
        feats, jf, sw, ji, rays
    )
    np.testing.assert_allclose(
        np.asarray(out_t), np.asarray(out_b), atol=1e-5
    )


def test_baked_brick_path_parity(scene):
    """Force brick_levels > 0 (small top) and check lookup + render +
    gradient parity with the tree walk — covers the two-gather brick
    path that dense-top scenes (depth <= 8) never touch."""
    t, feats, centers, rng = scene
    from svox_t_tpu.ops.traversal import descend

    spec = t._spec()
    baked = bake_ops.bake(spec, top_levels=2)  # R=4; everything deeper -> bricks
    assert baked.brick_levels > 0
    assert baked.brick.size > baked.B ** 3  # bricks actually allocated

    pts = jnp.asarray(rng.rand(400, 3).astype(np.float32))
    leaf = descend(spec, pts)
    di, cube, frac, cell = bake_ops.lookup(baked, pts)
    M = feats.shape[0]
    vt = np.asarray(leaf.data_idx) < M
    vb = np.asarray(di) < M
    np.testing.assert_array_equal(vt, vb)
    np.testing.assert_array_equal(
        np.asarray(leaf.data_idx)[vt], np.asarray(di)[vb]
    )
    np.testing.assert_allclose(np.asarray(leaf.cube_sz), np.asarray(cube))

    # per-axis variant must agree with the stacked one
    di2, cube2, fx, fy, fz, cell2 = bake_ops.lookup_xyz(
        baked, pts[:, 0], pts[:, 1], pts[:, 2]
    )
    np.testing.assert_array_equal(np.asarray(di), np.asarray(di2))
    np.testing.assert_array_equal(np.asarray(cell), np.asarray(cell2))

    rays = make_rays(rng, 48)
    opt = _opts(t)
    out_tree = volume_render(
        spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    out_brick = volume_render(
        baked, feats, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    np.testing.assert_allclose(
        np.asarray(out_brick), np.asarray(out_tree), atol=1e-6
    )

    g_tree = jax.grad(lambda f: jnp.sum(volume_render(
        spec, f, rays.origins, rays.dirs, rays.viewdirs, opt)))(feats)
    g_brick = jax.grad(lambda f: jnp.sum(volume_render(
        baked, f, rays.origins, rays.dirs, rays.viewdirs, opt)))(feats)
    scale = float(jnp.abs(g_tree).max()) + 1e-8
    np.testing.assert_allclose(
        np.asarray(g_brick) / scale, np.asarray(g_tree) / scale, atol=3e-6
    )


def test_baked_deep_tree_bricks(rng):
    """Depth-10 tree (chain refinement past the dense-top limit):
    the bake must pick brick_levels >= 1 automatically and stay exact."""
    from svox_t_tpu.ops.traversal import descend

    t, feats, centers = build_tree(
        rng, depth_limit=10, n_random_refines=0
    )
    # refine one leaf chain down to depth 10
    for _ in range(9):
        leaves = t._all_leaves()
        deepest = leaves[-1:]
        t.refine(sel=tuple(deepest.T), leaf_node=deepest)
    centers_local = t[:].corners_local + 0.5 * t[:].lengths_local[:, None]
    centers_world = np.asarray(
        jax.device_get(t.tree2world(jnp.asarray(centers_local)))
    )
    t.construct_tree(centers_world)
    M = centers_world.shape[0]
    feats = jnp.asarray(rng.randn(M, 4).astype(np.float32))

    spec = t._spec()
    baked = t._baked_spec()
    # depth 10 exceeds the dense-top cap (2**18 cells for D >= 9 ->
    # top_levels = 6 for N = 2), so fine levels land in bricks
    assert baked.brick_levels >= 1

    pts = jnp.asarray(
        np.clip(centers_local + rng.randn(*centers_local.shape) * 1e-4,
                0, 1 - 1e-6).astype(np.float32)
    )
    leaf = descend(spec, pts)
    di, cube, frac, cell = bake_ops.lookup(baked, pts)
    np.testing.assert_array_equal(
        np.asarray(leaf.data_idx), np.asarray(di)
    )
    np.testing.assert_allclose(np.asarray(leaf.cube_sz), np.asarray(cube))


def test_occupied_aabb_cull_exact(rng):
    """The baked occupied-AABB ray cull must be invisible in outputs:
    rays missing the (small, off-center) occupied box get exactly the
    background, everything else matches the tree walk — forward, grads,
    and aux renders."""
    t, feats, centers = build_tree(rng, depth_limit=4, n_random_refines=2)
    # clear the helper's full pointing (stale rows count as occupied —
    # the bake is conservative), then occupy only a corner
    from svox_t_tpu.utils.spec import DATA_SENTINEL
    t.data[:] = DATA_SENTINEL
    t._invalidate_spec()
    sub = centers[np.all(centers < 0.4, axis=1)]
    if len(sub) < 4:
        sub = centers[:8]
    t.construct_tree(sub)
    feats_sub = jnp.asarray(
        np.abs(np.random.RandomState(3).randn(len(sub), 4)).astype(np.float32) * 8
    )
    spec = t._spec()
    baked = t._baked_spec()
    assert baked.aabb_lo is not None
    lo, hi = np.asarray(baked.aabb_lo), np.asarray(baked.aabb_hi)
    assert (hi - lo).max() < 1.0  # genuinely smaller than the cube

    rays = make_rays(rng, 96)
    opt = _opts(t)
    out_tree = volume_render(
        spec, feats_sub, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    out_baked = volume_render(
        baked, feats_sub, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    np.testing.assert_allclose(
        np.asarray(out_baked), np.asarray(out_tree), atol=1e-6
    )
    g_tree = jax.grad(lambda f: jnp.sum(volume_render(
        spec, f, rays.origins, rays.dirs, rays.viewdirs, opt)))(feats_sub)
    g_baked = jax.grad(lambda f: jnp.sum(volume_render(
        baked, f, rays.origins, rays.dirs, rays.viewdirs, opt)))(feats_sub)
    np.testing.assert_allclose(
        np.asarray(g_baked), np.asarray(g_tree), atol=1e-5
    )
    op_t = opacity_render(spec, feats_sub, rays.origins, rays.dirs, opt)
    op_b = opacity_render(baked, feats_sub, rays.origins, rays.dirs, opt)
    np.testing.assert_allclose(np.asarray(op_b), np.asarray(op_t), atol=1e-6)
    d_t = render_depth(spec, feats_sub, rays.origins, rays.dirs, opt)
    d_b = render_depth(baked, feats_sub, rays.origins, rays.dirs, opt)
    np.testing.assert_allclose(np.asarray(d_b), np.asarray(d_t), atol=1e-6)


def test_occupied_aabb_cull_interp_parity(rng):
    """With trilinear interp, occupied corner cells bleed sigma up to
    half a cell OUTSIDE the occupied box, so the cull must not clamp at
    the box exit (regression: culling with interp=1 dropped
    boundary-skin contributions on partially occupied trees)."""
    t, feats, centers = build_tree(rng, depth_limit=4, n_random_refines=2)
    from svox_t_tpu.utils.spec import DATA_SENTINEL
    t.data[:] = DATA_SENTINEL
    t._invalidate_spec()
    sub = centers[np.all(centers < 0.4, axis=1)]
    if len(sub) < 4:
        sub = centers[:8]
    t.construct_tree(sub)
    feats_sub = jnp.asarray(
        np.abs(np.random.RandomState(3).randn(len(sub), 4)).astype(np.float32) * 8
    )
    spec = t._spec()
    baked = t._baked_spec()
    lo, hi = np.asarray(baked.aabb_lo), np.asarray(baked.aabb_hi)
    assert (hi - lo).max() < 1.0  # genuinely smaller than the cube

    rays = make_rays(rng, 256)
    opt = _opts(t, interp=1)
    out_tree = volume_render(
        spec, feats_sub, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    out_baked = volume_render(
        baked, feats_sub, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    np.testing.assert_allclose(
        np.asarray(out_baked), np.asarray(out_tree), atol=1e-5
    )
    g_tree = jax.grad(lambda f: jnp.sum(volume_render(
        spec, f, rays.origins, rays.dirs, rays.viewdirs, opt) ** 2))(feats_sub)
    g_baked = jax.grad(lambda f: jnp.sum(volume_render(
        baked, f, rays.origins, rays.dirs, rays.viewdirs, opt) ** 2))(feats_sub)
    np.testing.assert_allclose(
        np.asarray(g_baked), np.asarray(g_tree), atol=1e-4
    )


def test_empty_tree_inverted_box_culls(rng):
    """An all-empty tree bakes an inverted 'null box'; the cull must
    treat it as empty (all-background), not as the full cube (the slab
    test alone is order-agnostic — regression for the validity gate)."""
    t, feats, centers = build_tree(rng, depth_limit=3, n_random_refines=1)
    from svox_t_tpu.utils.spec import DATA_SENTINEL
    t.data[:] = DATA_SENTINEL
    t._invalidate_spec()
    baked = t._baked_spec()
    lo, hi = np.asarray(baked.aabb_lo), np.asarray(baked.aabb_hi)
    assert (lo > hi).any()  # the null-box encoding
    rays = make_rays(rng, 32)
    opt = _opts(t)
    out = np.asarray(volume_render(
        baked, jnp.zeros((0, 4), jnp.float32),
        rays.origins, rays.dirs, rays.viewdirs, opt,
    ))
    expect = np.concatenate(
        [np.full((32, 3), opt.background_brightness, np.float32),
         np.zeros((32, 1), np.float32)], axis=1,
    )
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_aabb_union_after_repoint(rng):
    """construct_tree with points OUTSIDE the old occupied box must
    expand the cull box (union) so the new cells render."""
    t, feats, centers = build_tree(rng, depth_limit=4, n_random_refines=2)
    from svox_t_tpu.utils.spec import DATA_SENTINEL
    t.data[:] = DATA_SENTINEL
    t._invalidate_spec()
    corner = centers[np.all(centers < 0.4, axis=1)]
    if len(corner) < 2:
        corner = centers[:4]
    t.construct_tree(corner)
    _ = t._baked_spec()  # bake with the small box
    far = centers[np.all(centers > 0.6, axis=1)]
    if len(far) < 2:
        far = centers[-4:]
    t.construct_tree(far)  # refresh must expand the box
    baked = t._baked_spec()
    feats_far = jnp.asarray(
        np.abs(np.random.RandomState(4).randn(len(far), 4)).astype(np.float32) * 8
    )
    spec = t._spec()
    rays = make_rays(rng, 64)
    opt = _opts(t)
    out_tree = volume_render(
        spec, feats_far, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    out_baked = volume_render(
        baked, feats_far, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    np.testing.assert_allclose(
        np.asarray(out_baked), np.asarray(out_tree), atol=1e-6
    )
    assert float(jnp.abs(out_tree[:, -1]).max()) > 0  # something rendered


def test_three_stage_bake_parity(rng):
    """Three-stage bake (top -> mid bricks -> fine bricks) must be
    bit-equal to the tree walk: lookups, render, grads, and on-device
    refresh after re-pointing."""
    t, feats, centers = build_tree(rng, depth_limit=8, n_random_refines=5)
    spec = t._spec()
    baked = bake_ops.bake(spec, top_levels=3, mid_levels=2)
    assert baked.mid is not None and baked.mid_levels == 2
    from svox_t_tpu.ops.traversal import descend

    pts = jnp.asarray(rng.rand(1500, 3).astype(np.float32))
    leaf = descend(spec, pts)
    di, cube, frac, cell = bake_ops.lookup(baked, pts)
    M = feats.shape[0]
    vt = np.asarray(leaf.data_idx) < M
    np.testing.assert_array_equal(vt, np.asarray(di) < M)
    np.testing.assert_array_equal(
        np.asarray(leaf.data_idx)[vt], np.asarray(di)[vt]
    )
    np.testing.assert_allclose(np.asarray(leaf.cube_sz), np.asarray(cube))

    rays = make_rays(rng, 64)
    opt = _opts(t)
    a = volume_render(spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt)
    b = volume_render(baked, feats, rays.origins, rays.dirs, rays.viewdirs, opt)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)

    g_t = jax.grad(lambda f: jnp.sum(volume_render(
        spec, f, rays.origins, rays.dirs, rays.viewdirs, opt) ** 2))(feats)
    g_b = jax.grad(lambda f: jnp.sum(volume_render(
        baked, f, rays.origins, rays.dirs, rays.viewdirs, opt) ** 2))(feats)
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_b), atol=3e-5)

    perm = rng.permutation(centers.shape[0])
    nd = construct_tree(spec, jnp.asarray(centers[perm]))
    refreshed = bake_ops.refresh(baked, nd)
    fresh = bake_ops.bake(spec.with_(data_flat=nd), top_levels=3, mid_levels=2)
    for name in ("top", "mid", "brick"):
        np.testing.assert_array_equal(
            np.asarray(getattr(refreshed, name)),
            np.asarray(getattr(fresh, name)),
        )


def test_auto_mid_levels_for_very_deep_tree(rng):
    """Depth >= 10 trees automatically get a mid stage (fine bricks are
    capped at 3 levels) and stay parity-exact with the tree walk."""
    t = st.N3Tree(N=2, data_dim=4, depth_limit=10)
    t.refine(repeats=1)
    # drill one branch down to depth 10
    for _ in range(9):
        leaves = t._all_leaves()
        depths = t.parent_depth[leaves[:, 0], 1]
        pick = leaves[np.argmax(depths)][None]
        t.refine(sel=tuple(pick.T), leaf_node=pick)
    assert int(t.max_depth) >= 9
    centers = np.asarray(jax.device_get(t.tree2world(jnp.asarray(
        t[:].corners_local + 0.5 * t[:].lengths_local[:, None]))))
    t.construct_tree(centers)
    feats = jnp.asarray(
        np.abs(np.random.RandomState(8).randn(len(centers), 4)).astype(
            np.float32) * 8
    )
    baked = t._baked_spec()
    assert baked.brick_levels <= 3
    assert baked.mid_levels >= 1
    rays = make_rays(rng, 48)
    opt = _opts(t)
    a = volume_render(
        t._spec(), feats, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    b = volume_render(
        baked, feats, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_baked_brick_boundary_nonpow2():
    """Cell-boundary-ulp points on an N=3 bricked bake: every stage index
    must derive from ONE finest-grid floor (lookup/lookup_xyz in
    ops/bake.py). Independent per-stage float products can round to
    different sides of a boundary for non-power-of-two N (e.g.
    float32(0.18518518) * 81 floors one cell while * 2187 floors the
    other), so the subcell (mod Bk) wraps into the wrong end of a brick
    and the returned row belongs to a NON-adjacent leaf (measured: 29/324
    trigger points on the pre-fix code, rows a full coarse cell away).

    Since the non-pow2 lookup now derives its floors from the SAME
    per-level chain as ops.traversal.descend (_descend_chain), the
    contract is full bit-parity: data_idx must equal descend's on the
    trigger points themselves, and the in-leaf fractions/cube sizes must
    match descend's remainders exactly.

    Trigger values are float32 lattice points k/3^d whose products
    against two stage resolutions round to different sides — found by
    exhaustive scan; plain k/G boundary sweeps at R=9/G=243 have NO such
    values, which is why a generic sweep cannot catch this."""
    from svox_t_tpu.ops.traversal import descend

    triggers = np.array(
        [0.18518518, 0.37037036, 0.38271603, 0.7407407,
         0.48148146, 0.9629629], np.float32
    )
    t = st.N3Tree(N=3, data_dim=4, depth_limit=6)
    t.refine(repeats=2)  # full depth 2
    prng = np.random.RandomState(3)
    pts = []
    for v in triggers:
        for ulp in (np.nextafter(v, 0), v, np.nextafter(v, 1)):
            for axis in range(3):
                for _ in range(2):
                    q = prng.rand(3).astype(np.float32) * 0.8 + 0.1
                    q[axis] = ulp
                    pts.append(q)
    pts = np.array(pts, np.float32)
    # refine both neighbor regions of each trigger plane to depth 6
    shifted = [pts + d / 2187.0 for d in (-1.0, 1.0)]
    refine_at = np.clip(np.concatenate([pts] + shifted), 1e-4, 1 - 1e-4)
    feats0 = jnp.zeros((1, 4), jnp.float32)
    for _ in range(4):  # depth 2 -> 6
        leaf = np.asarray(t.forward(
            feats0, jnp.asarray(refine_at), world=False, want_leaf_node=True
        )[-1])
        t.refine(sel=tuple(leaf.T), leaf_node=leaf)
    centers_local = t[:].corners_local + 0.5 * t[:].lengths_local[:, None]
    t.construct_tree(np.asarray(jax.device_get(
        t.tree2world(jnp.asarray(centers_local)))))
    spec = t._spec()

    for top_levels, mid_levels in [(3, 0), (2, 2)]:
        baked = bake_ops.bake(spec, top_levels=top_levels,
                              mid_levels=mid_levels or None)
        assert baked.brick_levels > 0

        di, cube, frac, cell = bake_ops.lookup(baked, jnp.asarray(pts))
        di2, cube2, fx2, fy2, fz2, _ = bake_ops.lookup_xyz(
            baked, jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]),
            jnp.asarray(pts[:, 2])
        )
        np.testing.assert_array_equal(np.asarray(di), np.asarray(di2))
        np.testing.assert_array_equal(np.asarray(cube), np.asarray(cube2))
        np.testing.assert_array_equal(
            np.asarray(frac), np.stack(
                [np.asarray(fx2), np.asarray(fy2), np.asarray(fz2)], axis=-1
            )
        )

        # Full bit-parity with the tree walk ON the boundary points.
        ref = descend(spec, jnp.asarray(pts))
        np.testing.assert_array_equal(np.asarray(di), np.asarray(ref.data_idx))
        np.testing.assert_array_equal(
            np.asarray(cube), np.asarray(ref.cube_sz))
        np.testing.assert_array_equal(np.asarray(frac), np.asarray(ref.frac))


def test_nonpow2_render_backend_bitparity():
    """End-to-end render parity for N=3: baked backend must equal the
    tree walk EXACTLY (bitwise), not just to tolerance. The one-shot
    `p * cube_sz` fraction rounds differently than descend's per-level
    chain for non-power-of-two N (~1 ulp on 89% of positions), and the
    march's sequential t-chain amplifies those ulps into ~7e-3 output
    drift — caught live by the verify drive, invisible to atol tests."""
    rng = np.random.RandomState(11)
    t, feats, centers = build_tree(rng, N=3, data_dim=4, depth_limit=4,
                                   n_random_refines=2)
    rays = make_rays(rng, 96)
    a = st.VolumeRenderer(t, backend="baked")(feats, rays)
    b = st.VolumeRenderer(t, backend="tree")(feats, rays)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # gradients through both backends agree too
    spec, baked = t._spec(), t._baked_spec()
    opt = _opts(t)

    def loss(f, sp):
        out = volume_render(sp, f, rays.origins, rays.dirs, rays.viewdirs, opt)
        return jnp.sum(out ** 2)

    g_t = np.asarray(jax.grad(loss)(feats, spec))
    g_b = np.asarray(jax.grad(loss)(feats, baked))
    np.testing.assert_allclose(g_t, g_b, atol=3e-5)
