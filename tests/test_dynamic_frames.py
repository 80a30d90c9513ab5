"""Fused dynamic frame loop (`render_dynamic_frames`): one scanned
dispatch must equal the eager per-frame pipeline
(warp_vertices -> tree.construct_tree -> forward with per-voxel
view-direction rotation) exactly, including the carried index table and
cull-box union."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import svox_t_tpu as st


@pytest.fixture()
def scene():
    rng = np.random.RandomState(3)
    Q = 500
    pts = (0.5 + 0.15 * rng.randn(Q, 3)).astype(np.float32)
    pts = np.clip(pts, 0.2, 0.8)
    feats = np.concatenate(
        [rng.rand(Q, 3), 6.0 + rng.rand(Q, 1)], axis=1
    ).astype(np.float32)
    sw = np.stack([1.0 - pts[:, 2], pts[:, 2]], axis=1).astype(np.float32)
    ji = np.tile(np.array([0, 1], np.int32), (Q, 1))
    tree = st.N3Tree(N=2, data_dim=4, depth_limit=4)
    tree.refine(repeats=3)
    return tree, pts, jnp.asarray(feats), sw, ji, rng


def _poses(T):
    out = []
    for i in range(T):
        a = 0.5 * np.sin(2 * np.pi * i / max(T, 1))
        c, s = np.cos(a), np.sin(a)
        rot = np.array(
            [[c, -s, 0, 0.05 * i], [s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
            np.float32,
        )
        out.append(np.stack([np.eye(4, dtype=np.float32), rot]))
    return np.stack(out)  # (T, 2, 4, 4)


def _rays(rng, B=48):
    phi = rng.rand(B) * 2 * np.pi
    costh = rng.rand(B) * 2 - 1
    sinth = np.sqrt(1 - costh ** 2)
    o = 0.5 + 2.0 * np.stack(
        [sinth * np.cos(phi), sinth * np.sin(phi), costh], -1
    )
    d = (0.5 + (rng.rand(B, 3) - 0.5) * 0.8) - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = o.astype(np.float32), d.astype(np.float32)
    return st.Rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(d))


def _eager_frames(tree, renderer, feats, poses, src_pose, pts, sw, ji, rays):
    outs = []
    for k in range(poses.shape[0]):
        T = st.get_transformation_matrix(
            jnp.asarray(src_pose), jnp.asarray(poses[k])
        )
        warped, mats = st.warp_vertices(
            T, jnp.asarray(pts), jnp.asarray(sw), jnp.asarray(ji)
        )
        tree.construct_tree(warped)
        f = feats[k] if feats.ndim == 3 else feats
        outs.append(
            np.asarray(renderer(f, rays, transformation_matrices=mats))
        )
    return np.stack(outs)


@pytest.mark.parametrize("backend", ["baked", "tree"])
def test_fused_matches_eager(scene, backend):
    tree, pts, feats, sw, ji, rng = scene
    poses = _poses(3)
    src_pose = _poses(1)[0] * 0 + np.stack(
        [np.eye(4, dtype=np.float32)] * 2
    )
    rays = _rays(rng)

    r = st.VolumeRenderer(tree, backend=backend)
    fused = np.asarray(
        r.render_dynamic_frames(
            feats, poses, src_pose, pts, sw, ji, rays=rays
        )
    )
    data_after_fused = np.asarray(jax.device_get(tree._data)).copy()

    # Fresh identical tree for the eager loop.
    tree2 = st.N3Tree(N=2, data_dim=4, depth_limit=4)
    tree2.refine(repeats=3)
    r2 = st.VolumeRenderer(tree2, backend=backend)
    eager = _eager_frames(tree2, r2, feats, poses, src_pose, pts, sw, ji, rays)

    np.testing.assert_allclose(fused, eager, atol=1e-6)
    # update_tree leaves the tree pointed at the LAST frame, like eager.
    np.testing.assert_array_equal(
        data_after_fused, np.asarray(jax.device_get(tree2._data))
    )


def test_fused_per_frame_features_and_no_update(scene):
    tree, pts, feats, sw, ji, rng = scene
    poses = _poses(2)
    src_pose = np.stack([np.eye(4, dtype=np.float32)] * 2)
    rays = _rays(rng, 32)
    stack = jnp.stack([feats, feats * 1.1])

    r = st.VolumeRenderer(tree)
    data_before = np.asarray(jax.device_get(tree._data)).copy()
    fused = np.asarray(
        r.render_dynamic_frames(
            stack, poses, src_pose, pts, sw, ji, rays=rays,
            update_tree=False,
        )
    )
    np.testing.assert_array_equal(
        data_before, np.asarray(jax.device_get(tree._data))
    )

    tree2 = st.N3Tree(N=2, data_dim=4, depth_limit=4)
    tree2.refine(repeats=3)
    r2 = st.VolumeRenderer(tree2)
    eager = _eager_frames(
        tree2, r2, np.asarray(stack), poses, src_pose, pts, sw, ji, rays
    )
    np.testing.assert_allclose(fused, eager, atol=1e-6)


def test_fused_camera_path(scene):
    tree, pts, feats, sw, ji, rng = scene
    poses = _poses(2)
    src_pose = np.stack([np.eye(4, dtype=np.float32)] * 2)
    W = H = 20
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.5, 0.5, 2.2]
    c2w2 = np.stack([c2w, c2w])
    c2w2[1, :3, 3] = [0.42, 0.58, 2.2]

    r = st.VolumeRenderer(tree)
    fused = np.asarray(
        r.render_dynamic_frames(
            feats, poses, src_pose, pts, sw, ji, c2w=c2w2,
            width=W, height=H, fx=26.0,
        )
    )
    assert fused.shape == (2, H, W, 4)

    tree2 = st.N3Tree(N=2, data_dim=4, depth_limit=4)
    tree2.refine(repeats=3)
    r2 = st.VolumeRenderer(tree2)
    outs = []
    for k in range(2):
        T = st.get_transformation_matrix(
            jnp.asarray(src_pose), jnp.asarray(poses[k])
        )
        warped, mats = st.warp_vertices(
            T, jnp.asarray(pts), jnp.asarray(sw), jnp.asarray(ji)
        )
        tree2.construct_tree(warped)
        # eager render_persp has no tmats plumbing; render rays directly
        from svox_t_tpu.models.renderer import _tile_perm
        from svox_t_tpu.ops.render import cam2world_rays

        o, d = cam2world_rays(jnp.asarray(c2w2[k]), W, H, 26.0, 26.0)
        perm, inv = _tile_perm(W, H, max(8, int(np.sqrt(r2.chunk_size))))
        rays = st.Rays(o[perm], d[perm], d[perm])
        out = np.asarray(r2(feats, rays, transformation_matrices=mats))
        outs.append(out[np.asarray(inv)].reshape(H, W, -1))
    np.testing.assert_allclose(fused, np.stack(outs), atol=1e-6)


def test_fused_differentiable_wrt_feature_stack(scene):
    """Feature gradients flow through the fused scan to every frame
    (structure re-pointing is non-differentiable by design — the
    reference's render backward also emits feature grads only)."""
    tree, pts, feats, sw, ji, rng = scene
    poses = _poses(2)
    src_pose = np.stack([np.eye(4, dtype=np.float32)] * 2)
    rays = _rays(rng, 24)
    r = st.VolumeRenderer(tree)
    stack = jnp.stack([feats, feats * 1.05])

    def loss(s):
        outs = r.render_dynamic_frames(
            s, poses, src_pose, pts, sw, ji, rays=rays, update_tree=False
        )
        return jnp.sum(outs ** 2)

    g = np.asarray(jax.grad(loss)(stack))
    assert g.shape == stack.shape
    assert np.all(np.isfinite(g))
    assert np.abs(g).sum() > 0
    # Matches the eager per-frame gradient.
    tree2 = st.N3Tree(N=2, data_dim=4, depth_limit=4)
    tree2.refine(repeats=3)
    r2 = st.VolumeRenderer(tree2)
    for k in range(2):
        T = st.get_transformation_matrix(
            jnp.asarray(src_pose), jnp.asarray(poses[k])
        )
        warped, mats = st.warp_vertices(
            T, jnp.asarray(pts), jnp.asarray(sw), jnp.asarray(ji)
        )
        tree2.construct_tree(warped)

        def loss_k(f, mats=mats):
            return jnp.sum(r2(f, rays, transformation_matrices=mats) ** 2)

        gk = np.asarray(jax.grad(loss_k)(stack[k]))
        np.testing.assert_allclose(g[k], gk, atol=2e-5)


def test_fused_with_depth_matches_eager(scene):
    """with_depth returns the per-frame first-hit depth maps the aux
    pass produces on the eager loop's re-pointed tree."""
    tree, pts, feats, sw, ji, rng = scene
    poses = _poses(2)
    src_pose = np.stack([np.eye(4, dtype=np.float32)] * 2)
    rays = _rays(rng, 32)
    r = st.VolumeRenderer(tree)

    colors, depths = r.render_dynamic_frames(
        feats, poses, src_pose, pts, sw, ji, rays=rays, with_depth=True
    )
    colors, depths = np.asarray(colors), np.asarray(depths)
    assert depths.shape == (2, 32, 1)

    tree2 = st.N3Tree(N=2, data_dim=4, depth_limit=4)
    tree2.refine(repeats=3)
    r2 = st.VolumeRenderer(tree2)
    for k in range(2):
        T = st.get_transformation_matrix(
            jnp.asarray(src_pose), jnp.asarray(poses[k])
        )
        warped, mats = st.warp_vertices(
            T, jnp.asarray(pts), jnp.asarray(sw), jnp.asarray(ji)
        )
        tree2.construct_tree(warped)
        np.testing.assert_allclose(
            colors[k],
            np.asarray(r2(feats, rays, transformation_matrices=mats)),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            depths[k], np.asarray(r2.render_depth(feats, rays)), atol=1e-6
        )


def test_union_schedule_bit_identical(scene):
    """schedule='union' (cost plan on the animation's UNION occupancy)
    is a pure permutation: outputs equal schedule='tile' bitwise, and
    the plan caches on (camera x animation x structure)."""
    tree, pts, feats, sw, ji, rng = scene
    poses = _poses(3)
    src_pose = np.stack([np.eye(4, dtype=np.float32)] * 2)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.5, 0.5, 2.5]

    r = st.VolumeRenderer(tree)
    base = np.asarray(
        r.render_dynamic_frames(
            feats, poses, src_pose, pts, sw, ji, c2w=c2w, width=24,
            height=24, fx=26.0, update_tree=False, schedule="tile",
        )
    )
    planned = np.asarray(
        r.render_dynamic_frames(
            feats, poses, src_pose, pts, sw, ji, c2w=c2w, width=24,
            height=24, fx=26.0, update_tree=False, schedule="union",
        )
    )
    np.testing.assert_array_equal(planned, base)
    # plan cached: second call reuses it (same key)
    n_plans = len(r._plan_cache)
    _ = r.render_dynamic_frames(
        feats, poses, src_pose, pts, sw, ji, c2w=c2w, width=24,
        height=24, fx=26.0, update_tree=False, schedule="union",
    )
    assert len(r._plan_cache) == n_plans
