"""Data-indirect (cell-indexed) tapes: the dynamic-regime serving path.

A tape recorded against the UNION occupancy of an animation must replay
every frame of `render_dynamic_frames` — surviving each frame's
`construct_tree` re-point — bit-identically with ``compact=False`` and
to the compaction regroup license (~1e-7) with the default compaction.
Guards split the STRUCTURE axis (stale -> raise) from the DATA axis
(free — that is the point of indirection).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import svox_t_tpu as st
from svox_t_tpu.ops import tape as tape_ops


@pytest.fixture()
def scene():
    rng = np.random.RandomState(7)
    Q = 400
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


def _fresh_tree(depth=3, data_dim=4, data_format="RGBA"):
    t = st.N3Tree(N=2, data_dim=data_dim, depth_limit=depth + 1,
                  data_format=data_format)
    t.refine(repeats=depth)
    return t


def _poses(T):
    out = []
    for i in range(T):
        a = 0.45 * np.sin(2 * np.pi * i / max(T, 1))
        c, s = np.cos(a), np.sin(a)
        rot = np.array(
            [[c, -s, 0, 0.04 * i], [s, c, 0, 0], [0, 0, 1, 0],
             [0, 0, 0, 1]],
            np.float32,
        )
        out.append(np.stack([np.eye(4, dtype=np.float32), rot]))
    return np.stack(out)


_SRC = np.stack([np.eye(4, dtype=np.float32)] * 2)


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


@pytest.mark.parametrize("backend", ["baked", "tree"])
def test_dynamic_tape_bitwise_vs_fused(scene, backend):
    """compact=False replay is BITWISE equal to the fused march loop:
    samples past a frame's own occupancy/box are exact att == 1 no-ops."""
    tree, pts, feats, sw, ji, rng = scene
    poses = _poses(3)
    rays = _rays(rng)
    r = st.VolumeRenderer(tree, backend=backend)
    fused = np.asarray(
        r.render_dynamic_frames(
            feats, poses, _SRC, pts, sw, ji, rays=rays, update_tree=False
        )
    )
    taped = np.asarray(
        r.render_dynamic_tape_frames(
            feats, poses, _SRC, pts, sw, ji, rays=rays, update_tree=False,
            compact=False,
        )
    )
    np.testing.assert_array_equal(taped, fused)


def test_dynamic_tape_compact_close_and_update_tree(scene):
    tree, pts, feats, sw, ji, rng = scene
    poses = _poses(3)
    rays = _rays(rng)
    r = st.VolumeRenderer(tree)
    fused = np.asarray(
        r.render_dynamic_frames(
            feats, poses, _SRC, pts, sw, ji, rays=rays, update_tree=False
        )
    )
    data_before = np.asarray(jax.device_get(tree._data)).copy()
    taped = np.asarray(
        r.render_dynamic_tape_frames(
            feats, poses, _SRC, pts, sw, ji, rays=rays, update_tree=True
        )
    )
    np.testing.assert_allclose(taped, fused, atol=2e-6)
    # update_tree leaves the tree pointed at the LAST frame, like the
    # fused loop / eager sequence.
    tree2 = _fresh_tree()
    r2 = st.VolumeRenderer(tree2)
    r2.render_dynamic_frames(
        feats, poses, _SRC, pts, sw, ji, rays=rays, update_tree=True
    )
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(tree._data)),
        np.asarray(jax.device_get(tree2._data)),
    )
    assert not np.array_equal(
        data_before, np.asarray(jax.device_get(tree._data))
    )


def test_dynamic_tape_persp_bitwise(scene):
    tree, pts, feats, sw, ji, rng = scene
    poses = _poses(2)
    W = H = 20
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.5, 0.5, 2.2]
    r = st.VolumeRenderer(tree)
    fused = np.asarray(
        r.render_dynamic_frames(
            feats, poses, _SRC, pts, sw, ji, c2w=c2w, width=W, height=H,
            fx=26.0, update_tree=False,
        )
    )
    taped = np.asarray(
        r.render_dynamic_tape_frames(
            feats, poses, _SRC, pts, sw, ji, c2w=c2w, width=W, height=H,
            fx=26.0, update_tree=False, compact=False,
        )
    )
    assert taped.shape == fused.shape == (2, H, W, 4)
    np.testing.assert_array_equal(taped, fused)
    # The record is cached: a second call replays without re-recording.
    n_keys = len(r._tape_cache)
    taped2 = np.asarray(
        r.render_dynamic_tape_frames(
            feats * 1.1, poses, _SRC, pts, sw, ji, c2w=c2w, width=W,
            height=H, fx=26.0, update_tree=False, compact=False,
        )
    )
    assert len(r._tape_cache) == n_keys
    assert not np.array_equal(taped2, taped)


def test_dynamic_tape_sh_rotation_and_frame_stack(scene):
    """Per-voxel view-direction rotation (the Artemis animated-voxel
    semantics) resolves through the per-frame data index; per-frame
    feature stacks scan alongside."""
    _, pts, _, sw, ji, rng = scene
    Q = pts.shape[0]
    tree = _fresh_tree(data_dim=13, data_format="SH4")
    feats = np.concatenate(
        [rng.randn(Q, 12) * 0.4, 6.0 + rng.rand(Q, 1)], axis=1
    ).astype(np.float32)
    stack = jnp.stack([jnp.asarray(feats), jnp.asarray(feats) * 1.07])
    poses = _poses(2)
    rays = _rays(rng, 32)
    r = st.VolumeRenderer(tree)
    fused = np.asarray(
        r.render_dynamic_frames(
            stack, poses, _SRC, pts, sw, ji, rays=rays, update_tree=False
        )
    )
    taped = np.asarray(
        r.render_dynamic_tape_frames(
            stack, poses, _SRC, pts, sw, ji, rays=rays, update_tree=False,
            compact=False,
        )
    )
    np.testing.assert_array_equal(taped, fused)


def test_dynamic_tape_fast_thresholds(scene):
    """fast=True replay (thresholds are replay-time radiometry) matches
    the fused loop running the same thresholds with occupancy-driven
    geometry moves disabled (the tape contract)."""
    tree, pts, feats, sw, ji, rng = scene
    poses = _poses(2)
    rays = _rays(rng)
    r = st.VolumeRenderer(tree)
    r.box_advance = 0
    r.skip_boxes = 0
    fused = np.asarray(
        r.render_dynamic_frames(
            feats, poses, _SRC, pts, sw, ji, rays=rays, update_tree=False,
            fast=True,
        )
    )
    taped = np.asarray(
        r.render_dynamic_tape_frames(
            feats, poses, _SRC, pts, sw, ji, rays=rays, update_tree=False,
            fast=True, compact=False,
        )
    )
    np.testing.assert_array_equal(taped, fused)


def test_dynamic_tape_grad_matches_fused(scene):
    tree, pts, feats, sw, ji, rng = scene
    poses = _poses(2)
    rays = _rays(rng, 24)
    r = st.VolumeRenderer(tree)
    stack = jnp.stack([feats, feats * 1.05])

    def loss_fused(s):
        outs = r.render_dynamic_frames(
            s, poses, _SRC, pts, sw, ji, rays=rays, update_tree=False
        )
        return jnp.sum(outs ** 2)

    def loss_tape(s):
        outs = r.render_dynamic_tape_frames(
            s, poses, _SRC, pts, sw, ji, rays=rays, update_tree=False
        )
        return jnp.sum(outs ** 2)

    gf = np.asarray(jax.grad(loss_fused)(stack))
    gt = np.asarray(jax.grad(loss_tape)(stack))
    assert np.abs(gt).sum() > 0
    np.testing.assert_allclose(gt, gf, atol=3e-5)


def test_dynamic_tape_guards(scene):
    tree, pts, feats, sw, ji, rng = scene
    poses = _poses(2)
    rays = _rays(rng, 32)
    r = st.VolumeRenderer(tree)
    tape = r.record_dynamic_rays(rays, poses, _SRC, pts, sw, ji)
    assert tape.indirect
    opt = r._dyn_geom_options(False)
    table = tape_ops.pack_index_table(tree._spec().data_flat)

    # DATA-version changes are free: any same-length table replays.
    out = tape_ops.replay_render(
        tape, feats, opt, tree._spec(), index_table=table
    )
    assert np.isfinite(np.asarray(out)).all()

    # Indirect tape without a table.
    with pytest.raises(ValueError, match="index_table"):
        tape_ops.replay_render(tape, feats, opt, tree._spec())

    # STRUCTURE-version change: a differently-sized cell space raises.
    bad = tape_ops.pack_index_table(
        jnp.concatenate([tree._spec().data_flat] * 2)
    )
    with pytest.raises(ValueError, match="STRUCTURE"):
        tape_ops.replay_render(
            tape, feats, opt, tree._spec(), index_table=bad
        )

    # Pool-row mismatch still raises (the union occupancy split).
    with pytest.raises(ValueError, match="re-record"):
        tape_ops.replay_render(
            tape, jnp.zeros((feats.shape[0] + 5, 4)), opt, tree._spec(),
            index_table=table,
        )

    # A plain tape refuses an index table.
    plain = r.record_rays(rays, features=feats)
    with pytest.raises(ValueError, match="indirect"):
        tape_ops.replay_render(
            plain, feats, r._get_options(False), r._render_spec(),
            index_table=table,
        )

    # Occupancy-driven geometry cannot be recorded indirect.
    with pytest.raises(ValueError, match="exact geometry"):
        tape_ops.record_tape(
            r._render_spec(), feats.shape[0], rays.origins, rays.dirs,
            rays.viewdirs,
            dataclasses.replace(opt, box_advance=1), indirect=True,
        )


def test_dynamic_tape_weight_accum(scene):
    """Weight accumulation through an indirect replay uses the recorded
    tree-cell ids — matches the fused render's accumulation per frame."""
    tree, pts, feats, sw, ji, rng = scene
    poses = _poses(1)
    rays = _rays(rng, 32)
    r = st.VolumeRenderer(tree)
    tape = r.record_dynamic_rays(rays, poses, _SRC, pts, sw, ji,
                                 compact=False)
    opt = r._dyn_geom_options(False)

    # Point a fresh tree at frame 0 and compare weight accumulation.
    T = st.get_transformation_matrix(jnp.asarray(_SRC),
                                     jnp.asarray(poses[0]))
    warped, _ = st.warp_vertices(T, jnp.asarray(pts), jnp.asarray(sw),
                                 jnp.asarray(ji))
    tree.construct_tree(warped)
    spec = r._render_spec()
    from svox_t_tpu.ops import render as render_ops

    _, wa_march = render_ops.volume_render_with_weight_accum(
        spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    table = tape_ops.pack_index_table(tree._spec().data_flat)
    _, wa_tape = tape_ops.replay_render_weighted(
        tape, feats, opt, tree._spec(), index_table=table
    )
    # Both accumulate per flat TREE cell (the march translates baked
    # cells through src_map; the recorder stored them translated).
    np.testing.assert_allclose(
        np.asarray(wa_tape), np.asarray(wa_march), atol=1e-5
    )


@pytest.mark.parametrize("compact", [False, True])
def test_dynamic_tape_deep_tree(compact):
    """Deep-structure dynamic serving (round-5 verdict #6): a depth-6
    tree (3-stage bake, brick atlas) animated by construct_tree
    re-points replays through the cell-indexed tape bitwise
    (compact=False) / to the compaction license — the same contract as
    the shallow scenes, across the deep bake's multi-stage lookup."""
    rng = np.random.RandomState(5)
    Q = 300
    # Cloud on a small sphere; occupancy grid = dilated union of the
    # animated cloud (64^3 -> depth-6 leaves).
    pts = (0.5 + 0.18 * rng.randn(Q, 3)).astype(np.float32)
    pts = np.clip(pts, 0.15, 0.85)
    res = 64
    occ = np.zeros((res, res, res), bool)
    ijk = np.clip((pts * res).astype(int), 0, res - 1)
    occ[ijk[:, 0], ijk[:, 1], ijk[:, 2]] = True
    # dilate generously so warped frames stay in refined cells
    for ax in range(3):
        for sh in (-2, -1, 1, 2):
            occ |= np.roll(occ, sh, axis=ax)
    tree, _ = st.tree_from_occupancy(occ, data_dim=4)
    assert tree.depth_limit >= 6
    feats = jnp.asarray(np.concatenate(
        [rng.rand(Q, 3), 6.0 + rng.rand(Q, 1)], axis=1
    ).astype(np.float32))
    sw = np.stack([1.0 - pts[:, 2], pts[:, 2]], axis=1).astype(np.float32)
    ji = np.tile(np.array([0, 1], np.int32), (Q, 1))
    poses = _poses(3)
    rays = _rays(rng, 40)
    r = st.VolumeRenderer(tree)
    fused = np.asarray(
        r.render_dynamic_frames(
            feats, poses, _SRC, pts, sw, ji, rays=rays, update_tree=False
        )
    )
    taped = np.asarray(
        r.render_dynamic_tape_frames(
            feats, poses, _SRC, pts, sw, ji, rays=rays,
            update_tree=False, compact=compact,
        )
    )
    if compact:
        np.testing.assert_allclose(taped, fused, atol=2e-6)
    else:
        np.testing.assert_array_equal(taped, fused)
    # the animation actually renders something
    assert (np.abs(np.asarray(fused)[..., :-1] - 1.0) > 1e-3).any()
