"""Depth replay from recorded tapes (`record_t` / `replay_depth`).

Contract: a tape recorded with ``record_t=True`` stores each sample's
march parameter t (pure structure), and `replay_depth` reproduces
`ops.render_aux.render_depth` — the first over-threshold RESIDENT
sample's t x delta_scale — BITWISE, compacted or not (compaction drops
only empty samples, which can never be selected), and per frame through
a data-indirect tape under `construct_tree` re-pointing (exact
geometry: the t-chain does not depend on occupancy).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import svox_t_tpu as st
from svox_t_tpu.ops import render_aux as aux_ops
from svox_t_tpu.ops import tape as tape_ops

from helpers import build_tree, make_rays


def _shell_occupy(c):
    r = np.linalg.norm(c - 0.5, axis=-1)
    return (r > 0.22) & (r < 0.42)


@pytest.fixture
def rng():
    return np.random.RandomState(11)


def _scene(rng):
    t, feats, _ = build_tree(
        rng, N=2, data_dim=28, depth_limit=5, n_random_refines=2,
        data_format="SH9", occupy=_shell_occupy,
    )
    return t, feats


@pytest.mark.parametrize("compact", [False, True])
@pytest.mark.parametrize("fast", [False, True])
def test_depth_replay_matches_march(rng, compact, fast):
    """replay_depth == render_depth bitwise, any layout/geometry (the
    selected sample's t was recorded from the march's own chain)."""
    t, feats = _scene(rng)
    rays = make_rays(rng, 257)
    r = st.VolumeRenderer(t)
    opt = dataclasses.replace(r._get_options(fast), chunk_size=64)
    spec = t._baked_spec()
    ref = np.asarray(
        aux_ops.render_depth(spec, feats, rays.origins, rays.dirs, opt)
    )
    tp = tape_ops.record_tape(
        spec, feats.shape[0], rays.origins, rays.dirs, rays.viewdirs,
        opt, compact=compact, record_t=True,
    )
    out = np.asarray(tape_ops.replay_depth(tp, feats, opt, spec))
    assert out.shape == ref.shape
    np.testing.assert_array_equal(out, ref)
    assert (out > 0).any()  # the shell is actually hit


def test_depth_requires_record_t(rng):
    t, feats = _scene(rng)
    rays = make_rays(rng, 64)
    r = st.VolumeRenderer(t)
    opt = dataclasses.replace(r._get_options(False), chunk_size=64)
    spec = t._baked_spec()
    tp = tape_ops.record_tape(
        spec, feats.shape[0], rays.origins, rays.dirs, rays.viewdirs,
        opt,
    )
    with pytest.raises(ValueError, match="record_t"):
        tape_ops.replay_depth(tp, feats, opt, spec)


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


def _dyn_rays(rng, B=48):
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
@pytest.mark.parametrize("compact", [False, True])
def test_dynamic_depth_matches_fused(backend, compact):
    """with_depth through the data-indirect tape == the fused march
    loop's per-frame depth, bitwise (exact geometry: sample t does not
    depend on occupancy, and only resident samples can be selected).
    compact=True (the shipped default) holds too: the compaction sort
    demotes only union-empty samples, and any frame's first hit is
    union-resident — it can never be dropped or reordered past."""
    rng = np.random.RandomState(7)
    Q = 400
    pts = (0.5 + 0.15 * rng.randn(Q, 3)).astype(np.float32)
    pts = np.clip(pts, 0.2, 0.8)
    feats = jnp.asarray(
        np.concatenate(
            [rng.rand(Q, 3), 6.0 + rng.rand(Q, 1)], axis=1
        ).astype(np.float32)
    )
    sw = np.stack([1.0 - pts[:, 2], pts[:, 2]], axis=1).astype(np.float32)
    ji = np.tile(np.array([0, 1], np.int32), (Q, 1))
    tree = st.N3Tree(N=2, data_dim=4, depth_limit=4)
    tree.refine(repeats=3)
    src = np.stack([np.eye(4, dtype=np.float32)] * 2)
    poses = _poses(3)
    rays = _dyn_rays(rng)
    r = st.VolumeRenderer(tree, backend=backend)
    _, fused_d = r.render_dynamic_frames(
        feats, poses, src, pts, sw, ji, rays=rays, update_tree=False,
        with_depth=True,
    )
    taped_c, taped_d = r.render_dynamic_tape_frames(
        feats, poses, src, pts, sw, ji, rays=rays, update_tree=False,
        compact=compact, with_depth=True,
    )
    assert taped_d.shape == np.asarray(fused_d).shape
    np.testing.assert_array_equal(np.asarray(taped_d),
                                  np.asarray(fused_d))
    assert (np.asarray(taped_d) > 0).any()


def test_record_persp_record_t_and_superset_cache(rng):
    """record_persp plumbs record_t (persp depth replay is reachable
    through the public recorder), and a cached record_t=True tape — a
    strict superset — serves a later record_t=False request without
    re-recording."""
    t, feats = _scene(rng)
    r = st.VolumeRenderer(t)
    # Identity rotation = camera looks along world -z; from above the
    # cube it sees the shell.
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.5, 0.5, 2.5]
    W = H = 32
    tp = r.record_persp(c2w, W, H, fx=W * 1.1, features=feats,
                        record_t=True)
    assert tp.tval is not None
    opt = r._get_options(False)
    spec = t._baked_spec()
    depth = np.asarray(
        tape_ops.replay_depth(tp, feats, opt, spec)
    ).reshape(H, W)
    origins, dirs = st.ops.render.cam2world_rays(
        jnp.asarray(c2w), W, H, W * 1.1, W * 1.1
    )
    # The march's own depth shifts ~1e-7 between chunk shapes (the
    # documented cross-program ulp class); at C=64 it bit-matches the
    # replay for ANY record chunk size (probed) — pin that pairing.
    ref = np.asarray(
        aux_ops.render_depth(spec, feats, origins, dirs,
                             dataclasses.replace(opt, chunk_size=64))
    ).reshape(H, W)
    np.testing.assert_array_equal(depth, ref)
    assert (depth > 0).any()  # the camera actually hits the shell
    # superset cache: the record_t=False request returns the SAME tape
    tp2 = r.record_persp(c2w, W, H, fx=W * 1.1, features=feats)
    assert tp2 is tp
