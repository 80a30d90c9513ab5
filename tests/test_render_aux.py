"""Aux renders: opacity (+ sigma-only VJP), depth, motion first-hit, and
motion-feature LBS rendering (+ corrected VJP)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import svox_t_tpu as st
from svox_t_tpu.ops.render import volume_render
from svox_t_tpu.ops.render_aux import (motion_feature_render, motion_render,
                                       opacity_render, render_depth)

from helpers import build_tree, make_rays


def _setup(rng, **kw):
    t, feats, centers = build_tree(rng, **kw)
    r = st.VolumeRenderer(t)
    return t, feats, r, centers


def test_opacity_matches_full_render_alpha(rng):
    t, feats, r, _ = _setup(rng)
    rays = make_rays(rng, 64)
    opt = r._get_options(False)
    spec = t._spec()
    alpha_full = np.asarray(
        volume_render(spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt)
    )[:, -1]
    op = np.asarray(opacity_render(spec, feats, rays.origins, rays.dirs, opt))[:, 0]
    np.testing.assert_allclose(op, alpha_full, atol=1e-6)


def test_opacity_grad_matches_full_render_alpha_grad(rng):
    """The sigma-only VJP must equal the full render's alpha-channel
    gradient (the reference routes opacity backward through the full
    kernel — both reduce to the same formula; SURVEY.md K16)."""
    t, feats, r, _ = _setup(rng)
    rays = make_rays(rng, 32)
    opt = r._get_options(False)
    spec = t._spec()

    def loss_op(f):
        return jnp.sum(opacity_render(spec, f, rays.origins, rays.dirs, opt))

    def loss_alpha(f):
        out = volume_render(spec, f, rays.origins, rays.dirs, rays.viewdirs, opt)
        return jnp.sum(out[:, -1])

    g1 = np.asarray(jax.grad(loss_op)(feats))
    g2 = np.asarray(jax.grad(loss_alpha)(feats))
    np.testing.assert_allclose(g1, g2, atol=1e-5)


def test_opacity_grad_finite_difference(rng):
    t, feats, r, _ = _setup(rng, n_random_refines=0)
    rays = make_rays(rng, 8)
    opt = r._get_options(False)
    spec = t._spec()

    def loss(f):
        return jnp.sum(opacity_render(spec, f, rays.origins, rays.dirs, opt))

    g = np.asarray(jax.grad(loss)(feats))
    f0 = np.asarray(feats)
    for i in [0, 3, 6]:
        eps = 1e-2
        fp = f0.copy(); fp[i, -1] += eps
        fm = f0.copy(); fm[i, -1] -= eps
        fd = (float(loss(jnp.asarray(fp))) - float(loss(jnp.asarray(fm)))) / (2 * eps)
        assert abs(fd - g[i, -1]) < 5e-3 + 0.05 * abs(fd)


def test_depth_positive_on_hits(rng):
    t, feats, r, _ = _setup(rng, sigma_scale=30.0)
    rays = make_rays(rng, 64)
    d = np.asarray(r.render_depth(feats, rays))[:, 0]
    assert (d > 0).any()
    assert (d >= 0).all()
    # depth of a straight-on ray from distance 2 to the cube face ~ >= 1.5
    origins = jnp.asarray(np.array([[0.5, 0.5, 2.5]], np.float32))
    dirs = jnp.asarray(np.array([[0.0, 0.0, -1.0]], np.float32))
    d1 = float(np.asarray(r.render_depth(feats, st.Rays(origins, dirs, dirs)))[0, 0])
    if d1 > 0:
        assert 1.4 < d1 < 3.6


def test_motion_render_outputs(rng):
    joints = np.array([[0.5, 0.5, 0.5], [0.0, 0.0, 0.0]], np.float32)
    t, feats, r, _ = _setup(rng, extra_data=joints, sigma_scale=30.0)
    rays = make_rays(rng, 32)
    mf, depth, hp, didx = r.motion_render(feats, rays)
    mf, depth, hp, didx = map(np.asarray, (mf, depth, hp, didx))
    assert mf.shape == (32, 2) and depth.shape == (32, 1)
    assert hp.shape == (32, 3) and didx.shape == (32, 1)
    hits = depth[:, 0] > 0
    assert hits.any()
    # motion feature = distance from hit point to each joint
    want = np.linalg.norm(hp[hits][:, None, :] - joints[None], axis=-1)
    np.testing.assert_allclose(mf[hits], want, atol=1e-5)
    # hit points are inside the volume
    assert (hp[hits] >= -1e-3).all() and (hp[hits] <= 1 + 1e-3).all()


@pytest.mark.parametrize("backend", ["baked", "tree"])
def test_motion_render_compat_hit_point(rng, backend):
    """RenderOptions.compat_hit_point reproduces the reference's quirky
    hit point: the world transform applied to the LEAF-LOCAL FRACTION
    (common.cuh:77-87 rewrites `pos` destructively before
    rt_kernel.cu:756-774) instead of the sample position — pinned here
    for both behaviors so Artemis-trained downstreams get drop-in
    parity on request."""
    joints = np.array([[0.5, 0.5, 0.5], [0.0, 0.0, 0.0]], np.float32)
    t, feats, r, _ = _setup(rng, extra_data=joints, sigma_scale=30.0)
    r.backend = backend
    rays = make_rays(rng, 32)
    mf0, depth0, hp0, didx0 = map(
        np.asarray, r.motion_render(feats, rays)
    )
    r.compat_hit_point = 1
    mfc, depthc, hpc, didxc = map(
        np.asarray, r.motion_render(feats, rays)
    )
    hits = depth0[:, 0] > 0
    assert hits.any()
    # Hit detection, depth, and data_idx are unaffected by the quirk.
    np.testing.assert_array_equal(depthc, depth0)
    np.testing.assert_array_equal(didxc, didx0)
    # The quirky point is tree2world(in-leaf fraction): recompute the
    # expected value by descending the true hit positions.
    from svox_t_tpu.ops.traversal import descend, world2tree

    spec = t._spec()
    pos_tree = np.asarray(
        world2tree(jnp.asarray(hp0), spec.offset, spec.scaling)
    )
    frac = np.asarray(descend(spec, jnp.asarray(pos_tree)).frac)
    want = np.asarray(
        t.tree2world(jnp.asarray(frac))
    )
    np.testing.assert_allclose(hpc[hits], want[hits], atol=1e-5)
    # ... and differs from the true sample point (the quirk is real).
    assert np.abs(hpc[hits] - hp0[hits]).max() > 1e-3
    # Joint distances flow from the quirky point.
    wantd = np.linalg.norm(hpc[hits][:, None, :] - joints[None], axis=-1)
    np.testing.assert_allclose(mfc[hits], wantd, atol=1e-5)


def test_motion_render_requires_extra_data(rng):
    t, feats, r, _ = _setup(rng)
    rays = make_rays(rng, 4)
    with pytest.raises(AssertionError):
        r.motion_render(feats, rays)


def _mf_setup(rng, J=3, nb=2, K=5):
    t, feats, r, centers = _setup(rng)
    M = feats.shape[0]
    jf = jnp.asarray(rng.randn(J, K).astype(np.float32))
    sw = jnp.asarray(np.abs(rng.rand(M, nb)).astype(np.float32))
    ji = jnp.asarray(rng.randint(0, J, (M, nb)).astype(np.int32))
    return t, feats, r, jf, sw, ji


def test_motion_feature_render_forward(rng):
    t, feats, r, jf, sw, ji = _mf_setup(rng)
    rays = make_rays(rng, 32)
    out = np.asarray(r.motion_feature_render(feats, jf, sw, ji, rays))
    assert out.shape == (32, jf.shape[1])
    assert np.isfinite(out).all()
    # miss rays output zeros (rt_kernel.cu:912-918)
    origins = jnp.asarray(np.full((4, 3), 5.0, np.float32))
    dirs = jnp.asarray(np.tile(np.array([[0, 0, 1]], np.float32), (4, 1)))
    out_miss = np.asarray(
        r.motion_feature_render(feats, jf, sw, ji, st.Rays(origins, dirs, dirs))
    )
    np.testing.assert_allclose(out_miss, 0.0)


def test_motion_feature_oracle(rng):
    """Independent check: uniform skinning to a single joint makes the
    blended feature = sw_total * jf[j]; compare against the color render
    with RGBA sigmoid... simpler: scan-based manual recomputation via the
    full volume render with a crafted feature pool is impractical —
    instead verify against an all-ones-weight analytic case."""
    t, feats, r, _ = _setup(rng)
    M = feats.shape[0]
    J, K = 2, 4
    jf = jnp.asarray(np.array([[0.3, -0.2, 0.1, 0.4], [0, 0, 0, 0]], np.float32))
    sw = jnp.ones((M, 1), jnp.float32)
    ji = jnp.zeros((M, 1), jnp.int32)
    rays = make_rays(rng, 16)
    out = np.asarray(r.motion_feature_render(feats, jf, sw, ji, rays))
    # Every contributing sample blends to exactly jf[0], so out =
    # sum(w_i)*sigmoid(jf[0]) + L_end*bg = alpha*sigmoid(jf[0]) + (1-alpha)*bg
    opt = r._get_options(False)
    spec = t._spec()
    alpha = np.asarray(
        volume_render(spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt)
    )[:, -1:]
    hit = alpha[:, 0] >= 0  # all rays; miss rays have alpha 0 but out 0 too
    s = 1 / (1 + np.exp(-np.asarray(jf[0])))
    want = alpha * s[None, :] + (1 - alpha) * 1.0
    # miss rays: out zeros, want = bg -> restrict to hitting rays
    hits = alpha[:, 0] > 0
    np.testing.assert_allclose(out[hits], want[hits], atol=1e-5)


def test_motion_feature_grad_finite_difference(rng):
    t, feats, r, jf, sw, ji = _mf_setup(rng, J=2, nb=2, K=3)
    rays = make_rays(rng, 16)

    def loss(j):
        return jnp.sum(r.motion_feature_render(feats, j, sw, ji, rays))

    g = np.asarray(jax.grad(loss)(jf))
    assert np.abs(g).sum() > 0
    j0 = np.asarray(jf)
    for (i, k) in [(0, 0), (1, 2)]:
        eps = 1e-2
        jp = j0.copy(); jp[i, k] += eps
        jm = j0.copy(); jm[i, k] -= eps
        fd = (float(loss(jnp.asarray(jp))) - float(loss(jnp.asarray(jm)))) / (2 * eps)
        assert abs(fd - g[i, k]) < 5e-3 + 0.05 * abs(fd), (i, k, fd, g[i, k])


def _partial_tree(rng, M_feats=4):
    """Partially occupied tree: only leaves near the low corner hold
    points, so trilinear sigma bleeds into EMPTY boundary leaves."""
    import dataclasses

    from svox_t_tpu.utils.spec import DATA_SENTINEL

    t, feats, centers = build_tree(rng, depth_limit=4, n_random_refines=2)
    t.data[:] = DATA_SENTINEL
    t._invalidate_spec()
    sub = centers[np.all(centers < 0.45, axis=1)]
    if len(sub) < 4:
        sub = centers[:8]
    t.construct_tree(sub)
    M = len(sub)
    feats_sub = jnp.asarray(
        np.abs(np.random.RandomState(5).randn(M, M_feats)).astype(np.float32) * 6
    )
    opt = dataclasses.replace(
        st.VolumeRenderer(t)._get_options(False), interp=1
    )
    return t, feats_sub, M, opt


def _corner_rays(rng, B):
    """Rays from outside aimed at the occupied low-corner region."""
    origins = (rng.rand(B, 3).astype(np.float32) - 0.5) * 0.6 + np.array(
        [1.8, 1.8, 1.8], np.float32
    )
    target = np.array([0.25, 0.25, 0.25], np.float32)
    dirs = target[None] - origins
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return st.Rays(jnp.asarray(origins), jnp.asarray(dirs), jnp.asarray(dirs))


def test_mf_interp_attenuation_matches_main_renderer(rng):
    """Under interp, the LBS pass's transmittance chain must equal the
    main renderer's: boundary-skin samples (trilinear sigma in an EMPTY
    leaf) attenuate light even though they contribute no LBS features.
    With joint features driven to sigmoid ~ 0, the LBS output reduces to
    L_end * bg, which must match (1 - alpha) * bg from volume_render.
    (Before the fix the skin was excluded from the chain and L_end came
    out too large.)"""
    from svox_t_tpu.ops.render_aux import motion_feature_render

    t, feats_sub, M, opt = _partial_tree(rng)
    rays = _corner_rays(rng, 48)
    n_bones, jdim, J = 2, 4, 3
    sw = jnp.asarray(np.abs(rng.rand(M, n_bones)).astype(np.float32))
    ji = jnp.asarray(rng.randint(0, J, size=(M, n_bones)).astype(np.int32))
    jf = jnp.full((J, jdim), -40.0, jnp.float32)  # sigmoid ~ 0
    spec = t._spec(skinning_weights=sw, joint_index=ji)
    out = np.asarray(motion_feature_render(
        spec, jf, feats_sub, rays.origins, rays.dirs, opt
    ))
    alpha = np.asarray(volume_render(
        spec, feats_sub, rays.origins, rays.dirs, rays.viewdirs, opt
    ))[:, -1]
    hits = alpha > 1e-4
    assert hits.any()
    want = np.broadcast_to(
        (1.0 - alpha[hits])[:, None] * opt.background_brightness,
        out[hits].shape,
    )
    np.testing.assert_allclose(out[hits], want, atol=1e-5)


def test_depth_interp_hits_boundary_skin(rng):
    """Under interp the visible surface starts where trilinear sigma
    first exceeds the threshold — possibly inside an EMPTY boundary
    leaf. render_depth must report that skin time (consistent with the
    color render's alpha) while motion_render's data_idx stays a
    RESIDENT row (< n_features)."""
    import dataclasses

    t, feats_sub, M, opt = _partial_tree(rng)
    rays = _corner_rays(rng, 64)
    spec = t._spec()
    opt_nearest = dataclasses.replace(opt, interp=0)
    d_i = np.asarray(render_depth(
        spec, feats_sub, rays.origins, rays.dirs, opt
    ))[:, 0]
    d_n = np.asarray(render_depth(
        spec, feats_sub, rays.origins, rays.dirs, opt_nearest
    ))[:, 0]
    both = (d_i > 0) & (d_n > 0)
    assert both.any()
    # The interp surface can only be at-or-before the nearest-mode one
    # (trilinear sigma bleeds outward; sample chains are identical).
    assert (d_i[both] <= d_n[both] + 1e-5).all()
    # ... and for rays whose first over-threshold sample is boundary
    # skin, strictly before.
    assert (d_i[both] < d_n[both] - 1e-4).any()
    # data_idx from the motion pass is always a resident row.
    joints = np.array([[0.25, 0.25, 0.25]], np.float32)
    t.extra_data = jnp.asarray(joints)
    spec_j = t._spec()
    from svox_t_tpu.ops.render_aux import motion_render

    mf, depth, hp, didx = map(np.asarray, motion_render(
        spec_j, feats_sub, rays.origins, rays.dirs, opt
    ))
    found = depth[:, 0] > 0
    assert found.any()
    assert (didx[found, 0] < M).all()


def test_mf_interp_grad_fd_partially_occupied(rng):
    """Regression: under interp, boundary samples whose own leaf is
    EMPTY (trilinear sigma bleeds in from occupied corners) must not
    contribute — the LBS tables are per-point, so they have no data.
    Previously the forward composited a phantom sigmoid(0)=0.5 and the
    backward scattered spurious rows into joint 0. Verified by finite
    differences on a partially occupied tree."""
    import dataclasses

    from helpers import build_tree, make_rays
    from svox_t_tpu.ops.render_aux import motion_feature_render
    from svox_t_tpu.utils.spec import DATA_SENTINEL

    t, feats, centers = build_tree(rng, depth_limit=4, n_random_refines=2)
    t.data[:] = DATA_SENTINEL
    t._invalidate_spec()
    sub = centers[np.all(centers < 0.45, axis=1)]
    if len(sub) < 4:
        sub = centers[:8]
    t.construct_tree(sub)
    M = len(sub)
    feats_sub = jnp.asarray(
        np.abs(np.random.RandomState(5).randn(M, 4)).astype(np.float32) * 6
    )
    n_bones, jdim, J = 2, 4, 3
    sw = jnp.asarray(np.abs(rng.rand(M, n_bones)).astype(np.float32))
    ji = jnp.asarray(rng.randint(0, J, size=(M, n_bones)).astype(np.int32))
    jf0 = np.asarray(rng.randn(J, jdim).astype(np.float32))
    spec = t._spec(skinning_weights=sw, joint_index=ji)
    opt = dataclasses.replace(
        st.VolumeRenderer(t)._get_options(False), interp=1
    )
    rays = make_rays(rng, 48)

    def loss(jf):
        return jnp.sum(motion_feature_render(
            spec, jf, feats_sub, rays.origins, rays.dirs, opt) ** 2)

    g = np.asarray(jax.grad(loss)(jnp.asarray(jf0)))
    assert np.isfinite(g).all()
    checked = 0
    flat = np.argsort(-np.abs(g).ravel())
    for k in flat[:4]:
        i, c = divmod(int(k), jdim)
        eps = 1e-2
        fp = jf0.copy(); fp[i, c] += eps
        fm = jf0.copy(); fm[i, c] -= eps
        fd = (float(loss(jnp.asarray(fp))) - float(loss(jnp.asarray(fm)))) / (2 * eps)
        assert abs(fd - g[i, c]) < 5e-3 + 0.05 * abs(fd), (i, c, fd, g[i, c])
        checked += 1
    assert checked == 4


def test_bwd_sizing_applies_to_aux_backward(rng):
    """bwd_round_size/bwd_chunk_size (spec.py) must reach EVERY backward
    march — opacity and motion-feature too, not just the main render —
    with gradients equal up to scatter-accumulation order."""
    from svox_t_tpu.ops.render_aux import opacity_render

    t, feats, _ = build_tree(rng, depth_limit=4, n_random_refines=2)
    rays = make_rays(rng, B=128)
    opt = st.RenderOptions(step_size=2e-3, format=0, basis_dim=1,
                           max_steps=200)
    opt_b = dataclasses.replace(opt, bwd_round_size=8, bwd_chunk_size=64)

    def g(o):
        return jax.grad(lambda f: jnp.sum(opacity_render(
            t._spec(f), f, rays.origins, rays.dirs, o)))(feats)

    np.testing.assert_allclose(
        np.asarray(g(opt)), np.asarray(g(opt_b)), atol=1e-6
    )


def test_mf_cull_miss_semantics_partial_tree(rng):
    """motion_feature_render on a PARTIALLY occupied tree: the baked
    backend's occupied-AABB cull may only clamp, never reclassify a
    cube-hit ray as a miss — this pass outputs 0 for cube misses but
    BACKGROUND for contribution-free marches (rt_kernel.cu:912-918), so
    box-miss rays must still compose bg. Tree walk (no box) is the
    reference behavior."""
    t, feats, _ = build_tree(
        rng, depth_limit=4, n_random_refines=2,
        occupy=lambda c: c[:, 0] < 0.45,
    )
    M = feats.shape[0]
    n_bones, jdim, J = 2, 3, 3
    rs = np.random.RandomState(0)
    sw = jnp.asarray(np.abs(rs.rand(M, n_bones)).astype(np.float32))
    ji = jnp.asarray(rs.randint(0, J, size=(M, n_bones)).astype(np.int32))
    jf = jnp.asarray(rs.randn(J, jdim).astype(np.float32))
    spec = t._spec(skinning_weights=sw, joint_index=ji)
    baked = t._baked_spec(skinning_weights=sw, joint_index=ji)
    assert baked.aabb_lo is not None
    opt = st.VolumeRenderer(t)._get_options(False)
    # rays aimed at the EMPTY half: cube hits, box misses
    o = np.tile(np.array([0.9, 0.5, -0.6], np.float32), (64, 1))
    o[:, 1] += 0.2 * rs.rand(64) - 0.1
    d = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (64, 1))
    a = np.asarray(motion_feature_render(
        spec, jf, feats, jnp.asarray(o), jnp.asarray(d), opt))
    b = np.asarray(motion_feature_render(
        baked, jf, feats, jnp.asarray(o), jnp.asarray(d), opt))
    np.testing.assert_array_equal(a, b)
    # and these rays DO compose background, not zero
    assert np.abs(a).max() > 0.5


def test_aux_backward_bf16_pool(rng):
    """bf16 feature pools (a supported configuration of the main render)
    must also differentiate through the aux passes: the cotangents must
    come back in the primal dtypes."""
    from svox_t_tpu.ops.render_aux import opacity_render

    t, feats, _ = build_tree(rng, depth_limit=3, n_random_refines=1)
    rays = make_rays(rng, B=64)
    opt = st.RenderOptions(step_size=2e-3, format=0, basis_dim=1,
                           max_steps=128)
    fb = feats.astype(jnp.bfloat16)
    g = jax.grad(lambda f: jnp.sum(opacity_render(
        t._spec(), f, rays.origins, rays.dirs, opt).astype(jnp.float32)))(fb)
    assert g.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(g.astype(jnp.float32)).all())

    M = feats.shape[0]
    rs = np.random.RandomState(0)
    sw = jnp.asarray(np.abs(rs.rand(M, 2)).astype(np.float32))
    ji = jnp.asarray(rs.randint(0, 3, size=(M, 2)).astype(np.int32))
    jf = jnp.asarray(rs.randn(3, 4)).astype(jnp.bfloat16)
    spec = t._spec(skinning_weights=sw, joint_index=ji)
    gj = jax.grad(lambda j: jnp.sum(motion_feature_render(
        spec, j, feats, rays.origins, rays.dirs, opt
    ).astype(jnp.float32)))(jf)
    assert gj.dtype == jnp.bfloat16
