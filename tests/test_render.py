"""Volume-render correctness: production while-loop forward vs the
scan-based oracle, custom two-pass VJP vs autodiff, finite differences,
and the radiometry edge cases (miss rays, fast mode, early stop,
weight accumulation, per-voxel view-dir rotation, NDC)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import svox_t_tpu as st
from svox_t_tpu.ops.reference_renderer import volume_render_oracle
from svox_t_tpu.ops.render import (cam2world_rays, volume_render,
                                   volume_render_with_weight_accum)

from helpers import build_tree, make_rays


def _setup(rng, data_format="RGBA", data_dim=4, **kw):
    t, feats, centers = build_tree(
        rng, data_dim=data_dim, data_format=data_format, **kw
    )
    r = st.VolumeRenderer(t)
    return t, feats, r


@pytest.mark.parametrize(
    "data_format,data_dim",
    [("RGBA", 4), ("SH1", 4), ("SH4", 13), ("SH9", 28)],
)
def test_forward_matches_oracle(rng, data_format, data_dim):
    t, feats, r = _setup(rng, data_format, data_dim)
    rays = make_rays(rng, 64)
    opt = r._get_options(False)
    spec = t._spec()
    out = volume_render(spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt)
    ref = volume_render_oracle(
        spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    # alpha in [0, 1]; some rays must actually hit
    alpha = np.asarray(out)[:, -1]
    assert alpha.min() >= 0 and alpha.max() <= 1 + 1e-6
    assert (alpha > 0.1).any()


@pytest.mark.parametrize("data_format,data_dim", [("RGBA", 4), ("SH4", 13)])
def test_backward_matches_autodiff(rng, data_format, data_dim):
    t, feats, r = _setup(rng, data_format, data_dim)
    rays = make_rays(rng, 48)
    opt = r._get_options(False)
    spec = t._spec()
    gmat = jnp.asarray(rng.randn(48, np.asarray(
        volume_render(spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt)
    ).shape[1]).astype(np.float32))

    def loss_prod(f):
        out = volume_render(spec, f, rays.origins, rays.dirs, rays.viewdirs, opt)
        return jnp.sum(out * gmat)

    def loss_oracle(f):
        out = volume_render_oracle(
            spec, f, rays.origins, rays.dirs, rays.viewdirs, opt
        )
        return jnp.sum(out * gmat)

    g1 = np.asarray(jax.grad(loss_prod)(feats))
    g2 = np.asarray(jax.grad(loss_oracle)(feats))
    scale = np.abs(g2).max() + 1e-8
    np.testing.assert_allclose(g1 / scale, g2 / scale, atol=3e-5)


def test_backward_finite_difference(rng):
    """Direct FD check of the custom VJP on a few feature entries."""
    t, feats, r = _setup(rng, "RGBA", 4, n_random_refines=0)
    rays = make_rays(rng, 16)
    opt = r._get_options(False)
    spec = t._spec()

    def loss(f):
        out = volume_render(spec, f, rays.origins, rays.dirs, rays.viewdirs, opt)
        return jnp.sum(out)

    g = np.asarray(jax.grad(loss)(feats))
    f0 = np.asarray(feats)
    idx = [(0, 0), (1, 3), (5, 2), (7, 3)]
    for (i, j) in idx:
        eps = 1e-2
        fp = f0.copy(); fp[i, j] += eps
        fm = f0.copy(); fm[i, j] -= eps
        fd = (float(loss(jnp.asarray(fp))) - float(loss(jnp.asarray(fm)))) / (2 * eps)
        assert abs(fd - g[i, j]) < 5e-3 + 0.05 * abs(fd), (i, j, fd, g[i, j])


def test_miss_rays_background(rng):
    t, feats, r = _setup(rng)
    B = 8
    origins = jnp.asarray(np.full((B, 3), 5.0, np.float32))
    dirs = jnp.asarray(np.tile(np.array([[0, 0, 1]], np.float32), (B, 1)))
    out = np.asarray(r(feats, st.Rays(origins, dirs, dirs)))
    np.testing.assert_allclose(out[:, :-1], 1.0)
    np.testing.assert_allclose(out[:, -1], 0.0)


def test_background_brightness(rng):
    t, feats, _ = _setup(rng)
    r = st.VolumeRenderer(t, background_brightness=0.25)
    B = 4
    origins = jnp.asarray(np.full((B, 3), 5.0, np.float32))
    dirs = jnp.asarray(np.tile(np.array([[0, 0, 1]], np.float32), (B, 1)))
    out = np.asarray(r(feats, st.Rays(origins, dirs, dirs)))
    np.testing.assert_allclose(out[:, :-1], 0.25)


def test_fast_mode_close(rng):
    t, feats, r = _setup(rng, sigma_scale=30.0)
    rays = make_rays(rng, 64)
    exact = np.asarray(r(feats, rays))
    fast = np.asarray(r(feats, rays, fast=True))
    assert np.abs(exact - fast).max() < 0.05


def test_early_stop_renormalization(rng):
    """With a huge stop_thresh every hitting ray stops on its first
    contributing sample; out = renormalized single-sample color."""
    t, feats, r = _setup(rng, sigma_scale=50.0)
    r.stop_thresh = 0.9  # attribute override (renderer.py:435-438 parity)
    rays = make_rays(rng, 32)
    out = np.asarray(r(feats, rays))
    hit = out[:, -1] > 0
    # stopped rays: colors sum to sigmoid values scaled by 1/(1-L): each
    # color channel equals sigmoid(first sample) exactly
    assert hit.any()
    assert np.isfinite(out).all()
    # alpha = 1 - L <= 1
    assert out[:, -1].max() <= 1.0 + 1e-6


def test_sigma_thresh_skips(rng):
    """All sigmas below threshold -> pure background."""
    t, feats, r = _setup(rng, sigma_scale=0.0)
    feats = feats.at[:, -1].set(1e-3)
    r.sigma_thresh = 1.0
    rays = make_rays(rng, 16)
    out = np.asarray(r(feats, rays))
    np.testing.assert_allclose(out[:, :-1], 1.0, atol=1e-6)
    np.testing.assert_allclose(out[:, -1], 0.0, atol=1e-6)


def test_weight_accum(rng):
    t, feats, r = _setup(rng)
    rays = make_rays(rng, 64)
    out_plain = np.asarray(r(feats, rays))
    with t.accumulate_weights() as acc:
        out = np.asarray(r(feats, rays))
    np.testing.assert_allclose(out, out_plain, atol=1e-6)
    w = acc()
    assert w.shape[0] == t.n_leaves
    assert w.sum() > 0
    # total accumulated weight ~= sum over rays of (1 - final transmittance)
    # (exact when no early stop)
    np.testing.assert_allclose(w.sum(), out[:, -1].sum(), rtol=1e-4)


def test_transformation_matrices_rotation(rng):
    """Identity matrices are a no-op; a 90° rotation must equal rendering
    with rotated viewdirs (for a basis window > deg 0)."""
    t, feats, r = _setup(rng, "SH4", 13)
    rays = make_rays(rng, 32)
    M = feats.shape[0]
    eye = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (M, 1, 1)))
    out_eye = np.asarray(r(feats, rays, transformation_matrices=eye))
    out_plain = np.asarray(r(feats, rays))
    np.testing.assert_allclose(out_eye, out_plain, atol=1e-6)

    rot = np.eye(4, dtype=np.float32)
    rot[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    rots = jnp.asarray(np.tile(rot, (M, 1, 1)))
    out_rot = np.asarray(r(feats, rays, transformation_matrices=rots))
    vd = np.asarray(rays.viewdirs)
    vd_rot = vd @ rot[:3, :3].T
    rays_rot = st.Rays(rays.origins, rays.dirs, jnp.asarray(vd_rot))
    out_ref = np.asarray(r(feats, rays_rot))
    np.testing.assert_allclose(out_rot, out_ref, atol=1e-5)


def test_min_max_comp_window(rng):
    """Restricting to component 0 only must equal zeroing the higher SH
    coefficients."""
    t, feats, _ = _setup(rng, "SH4", 13)
    rays = make_rays(rng, 32)
    r_win = st.VolumeRenderer(t, min_comp=0, max_comp=0)
    out_win = np.asarray(r_win(feats, rays))
    feats_zeroed = np.asarray(feats).copy()
    for c in range(3):
        feats_zeroed[:, c * 4 + 1 : c * 4 + 4] = 0.0
    r_full = st.VolumeRenderer(t)
    out_ref = np.asarray(r_full(jnp.asarray(feats_zeroed), rays))
    np.testing.assert_allclose(out_win, out_ref, atol=1e-6)


def test_render_persp_shape_and_consistency(rng):
    t, feats, r = _setup(rng)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.5, 0.5, 3.0]
    c2w[:3, :3] = np.diag([1.0, 1.0, 1.0])
    img = np.asarray(r.render_persp(feats, c2w, width=20, height=16, fx=20.0))
    assert img.shape == (16, 20, 4)
    # center pixel looks at the volume -> should have alpha > 0
    assert img[8, 10, -1] > 0
    # matches the per-ray path on the same rays
    from svox_t_tpu.ops.render import cam2world_rays

    origins, dirs = cam2world_rays(c2w, 20, 16, 20.0, 20.0)
    out = np.asarray(r(feats, st.Rays(origins, dirs, dirs)))
    np.testing.assert_allclose(img.reshape(-1, 4), out, atol=1e-6)


def test_render_persp_grad(rng):
    t, feats, r = _setup(rng)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.5, 0.5, 3.0]

    def loss(f):
        return jnp.mean(r.render_persp(f, c2w, width=10, height=10, fx=10.0))

    g = np.asarray(jax.grad(loss)(feats))
    assert np.isfinite(g).all() and np.abs(g).sum() > 0


def test_ndc_rendering_runs(rng):
    t, feats, _ = _setup(rng)
    r = st.VolumeRenderer(t, ndc=st.NDCConfig(width=20, height=20, focal=10.0))
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.5, 0.5, 0.2]
    img = np.asarray(r.render_persp(feats, c2w, width=10, height=10, fx=10.0))
    assert np.isfinite(img).all()


def test_ndc_march_matches_anchored_oracle(rng):
    """Numeric anchor for the in-march NDC path (world2ndc wiring in
    `_persp_jit`; reference semantics rt_kernel.cu:1169-1190): the image
    kernel (a) warps dir/origin with the NDC projection, (b) NORMALIZES
    the warped dir, and (c) evaluates the SH basis on the PRE-NDC world
    direction. Pins `ops/render.world2ndc` to the anchored standalone
    `convert_to_ndc` (itself reference-anchored in
    test_reference_anchor.py) and the full render to the oracle on
    pre-converted rays."""
    t, feats, _ = _setup(rng, "SH1", 4)
    ndc = st.NDCConfig(width=20, height=20, focal=10.0)
    r = st.VolumeRenderer(t, ndc=ndc)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.5, 0.5, 0.2]
    W = H = 12
    img = np.asarray(
        r.render_persp(feats, c2w, width=W, height=H, fx=12.0)
    ).reshape(W * H, -1)

    origins, dirs = cam2world_rays(jnp.asarray(c2w), W, H, 12.0, 12.0)
    vdirs = dirs  # basis dirs are the PRE-NDC world dirs
    opt = r._get_options(False)

    # (1) world2ndc == anchored convert_to_ndc + dir normalization.
    nd_d, nd_o = st.ops.render.world2ndc(opt, dirs, origins)
    ref_o, ref_d = st.convert_to_ndc(
        origins, dirs, ndc.focal, ndc.width, ndc.height
    )
    ref_d = ref_d / jnp.linalg.norm(ref_d, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(nd_o), np.asarray(ref_o),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(nd_d), np.asarray(ref_d),
                               atol=1e-6)

    # (2) render_persp with NDCConfig == oracle on the pre-converted rays.
    # render_persp fuses cam2world_rays+world2ndc into its dispatch; the
    # standalone path rounds differently by ulps, and the NDC divisions
    # amplify that on a few boundary pixels (docs/PERFORMANCE.md
    # "Cross-program caveat") — so a small fraction of elements may
    # deviate at the 1e-3 level. Wiring drift (post-NDC vdirs, missing
    # dir normalization, warp-order changes) perturbs EVERY content
    # pixel grossly and fails both gates below.
    ref = np.asarray(
        volume_render_oracle(t._spec(), feats, ref_o, ref_d, vdirs, opt)
    )
    diff = np.abs(img - ref)
    assert diff.max() < 5e-3, diff.max()
    assert (diff > 1e-5).mean() < 0.05, (diff > 1e-5).mean()
    # the comparison must not be vacuous: some rays hit real content
    assert img[:, -1].max() > 0.05


def test_empty_feature_pool(rng):
    t, feats, r = _setup(rng)
    rays = make_rays(rng, 8)
    out = np.asarray(r(jnp.zeros((0, 4), jnp.float32), rays))
    np.testing.assert_allclose(out[:, :-1], 1.0)
    np.testing.assert_allclose(out[:, -1], 0.0)


@pytest.mark.parametrize("round_size", [1, 3, 8])
def test_round_size_invariance(rng, round_size):
    """The round-based march must be invariant to round_size (up to XLA
    fusion-order float rounding), including a ragged max_steps (not a
    multiple of the round), for both forward and the hand-written VJP."""
    import dataclasses

    t, feats, r = _setup(rng, "SH1", 4)
    rays = make_rays(rng, 32)
    spec = t._spec()
    opt = dataclasses.replace(
        r._get_options(False), max_steps=50, round_size=round_size
    )
    opt_ref = dataclasses.replace(opt, round_size=1)

    out = volume_render(spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt)
    ref = volume_render(
        spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt_ref
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def loss(f, o):
        return jnp.sum(
            volume_render(spec, f, rays.origins, rays.dirs, rays.viewdirs, o)
        )

    g = np.asarray(jax.grad(loss)(feats, opt))
    g_ref = np.asarray(jax.grad(loss)(feats, opt_ref))
    scale = np.abs(g_ref).max() + 1e-8
    np.testing.assert_allclose(g / scale, g_ref / scale, atol=3e-6)


def test_max_steps_exact(rng):
    """A march takes AT MOST max_steps samples — production must equal
    the scan oracle (which takes exactly max_steps) even when the cap
    truncates rays mid-march and is not a multiple of the round size."""
    import dataclasses

    from svox_t_tpu.ops.reference_renderer import volume_render_oracle

    t, feats, r = _setup(rng)
    rays = make_rays(rng, 32)
    spec = t._spec()
    for cap in (1, 3, 7):
        opt = dataclasses.replace(r._get_options(False), max_steps=cap)
        out = volume_render(
            spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt
        )
        ref = volume_render_oracle(
            spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-6, err_msg=f"cap={cap}"
        )


@pytest.mark.parametrize("data_format,data_dim", [("RGBA", 4), ("SH4", 13)])
def test_fast_mode_forward_oracle_parity(rng, data_format, data_dim):
    """fast=True (sigma_thresh = stop_thresh = 1e-2) must match the scan
    oracle EXACTLY with the same thresholds — covers the early-stop
    renormalization branch (rt_kernel.cu:313-319)."""
    t, feats, r = _setup(rng, data_format, data_dim, sigma_scale=40.0)
    rays = make_rays(rng, 64)
    spec = t._spec()
    opt = r._get_options(True)
    out = volume_render(spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt)
    ref = volume_render_oracle(
        spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    # the early-stop branch must actually fire for this to test anything
    assert (np.asarray(out)[:, -1] > 1.0 - opt.stop_thresh - 1e-6).any()


def test_early_stop_renormalization_oracle(rng):
    """Aggressive stop_thresh: production forward == oracle exactly,
    renormalization branch exercised (alpha pinned at 1 - L_stop)."""
    t, feats, r = _setup(rng, sigma_scale=50.0)
    r.stop_thresh = 0.5
    r.sigma_thresh = 0.0
    rays = make_rays(rng, 32)
    spec = t._spec()
    opt = r._get_options(False)
    out = volume_render(spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt)
    ref = volume_render_oracle(
        spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    assert (np.asarray(out)[:, -1] >= 0.5 - 1e-6).any()


@pytest.mark.parametrize("data_format,data_dim", [("RGBA", 4), ("SH4", 13)])
def test_backward_thresholded_matches_oracle(rng, data_format, data_dim):
    """The thresholded (fast-mode) backward: production two-pass round
    march vs the independent scan-based backward oracle implementing the
    reference's asymmetric rules (rt_kernel.cu:364-494)."""
    from svox_t_tpu.ops.reference_renderer import (
        volume_render_backward_oracle)
    from svox_t_tpu.ops.render import volume_render_backward

    t, feats, r = _setup(rng, data_format, data_dim, sigma_scale=40.0)
    rays = make_rays(rng, 48)
    spec = t._spec()
    opt = r._get_options(True)  # sigma_thresh = stop_thresh = 1e-2
    gmat = jnp.asarray(rng.randn(48, 4 if data_format == "RGBA" else 4).astype(
        np.float32))
    g1 = np.asarray(
        volume_render_backward(
            spec, feats, rays.origins, rays.dirs, rays.viewdirs, gmat, opt
        )
    )
    g2 = np.asarray(
        volume_render_backward_oracle(
            spec, feats, rays.origins, rays.dirs, rays.viewdirs, gmat, opt
        )
    )
    scale = np.abs(g2).max() + 1e-8
    np.testing.assert_allclose(g1 / scale, g2 / scale, atol=3e-6)


def test_backward_thresholded_path_fd(rng):
    """With epsilon thresholds the thresholded CODE PATH (two-pass round
    march) runs but its semantics coincide with the exact gradient —
    check against autodiff through the forward oracle and FD."""
    from svox_t_tpu.ops.reference_renderer import volume_render_oracle

    t, feats, r = _setup(rng, "RGBA", 4, sigma_scale=10.0)
    r.sigma_thresh = 1e-9
    r.stop_thresh = 1e-9
    rays = make_rays(rng, 24)
    spec = t._spec()
    opt = r._get_options(False)
    assert opt.sigma_thresh > 0  # the thresholded path compiles in

    def loss_prod(f):
        return jnp.sum(
            volume_render(spec, f, rays.origins, rays.dirs, rays.viewdirs, opt)
        )

    def loss_oracle(f):
        return jnp.sum(
            volume_render_oracle(
                spec, f, rays.origins, rays.dirs, rays.viewdirs, opt
            )
        )

    g1 = np.asarray(jax.grad(loss_prod)(feats))
    g2 = np.asarray(jax.grad(loss_oracle)(feats))
    scale = np.abs(g2).max() + 1e-8
    np.testing.assert_allclose(g1 / scale, g2 / scale, atol=3e-5)
    f0 = np.asarray(feats)
    for (i, j) in [(0, 0), (3, 3)]:
        eps = 1e-2
        fp = f0.copy(); fp[i, j] += eps
        fm = f0.copy(); fm[i, j] -= eps
        fd = (float(loss_prod(jnp.asarray(fp))) -
              float(loss_prod(jnp.asarray(fm)))) / (2 * eps)
        assert abs(fd - g1[i, j]) < 5e-3 + 0.05 * abs(fd)


@pytest.mark.parametrize("data_format,data_dim", [("RGBA", 4), ("SH4", 13)])
def test_trilinear_matches_oracle(rng, data_format, data_dim):
    """interp=trilinear: production round march vs the scan oracle (same
    interpolation helper, independent march/compositing machinery)."""
    import dataclasses

    t, feats, r = _setup(rng, data_format, data_dim)
    rays = make_rays(rng, 48)
    spec = t._spec()
    opt = dataclasses.replace(r._get_options(False), interp=1)
    out = volume_render(spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt)
    ref = volume_render_oracle(
        spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # trilinear must differ from nearest on a non-constant pool
    out_nearest = volume_render(
        spec, feats, rays.origins, rays.dirs, rays.viewdirs,
        dataclasses.replace(opt, interp=0),
    )
    assert np.abs(np.asarray(out) - np.asarray(out_nearest)).max() > 1e-4


def test_trilinear_constant_pool_equals_nearest(rng):
    """With identical feature rows everywhere (and all leaves occupied),
    trilinear interpolation is exact: sum of weights = 1."""
    import dataclasses

    t, feats, r = _setup(rng, "RGBA", 4, n_random_refines=0)
    const = jnp.tile(jnp.asarray([[0.3, -0.2, 0.8, 12.0]], jnp.float32),
                     (feats.shape[0], 1))
    rays = make_rays(rng, 24)
    spec = t._spec()
    opt0 = r._get_options(False)
    opt1 = dataclasses.replace(opt0, interp=1)
    out0 = volume_render(spec, const, rays.origins, rays.dirs, rays.viewdirs, opt0)
    out1 = volume_render(spec, const, rays.origins, rays.dirs, rays.viewdirs, opt1)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0), atol=2e-5)


def test_trilinear_grad_matches_autodiff(rng):
    """Trilinear custom VJP (8-corner weighted scatter) vs autodiff
    through the interp oracle."""
    import dataclasses

    t, feats, r = _setup(rng, "RGBA", 4)
    rays = make_rays(rng, 32)
    spec = t._spec()
    opt = dataclasses.replace(r._get_options(False), interp=1)

    def loss_prod(f):
        return jnp.sum(
            volume_render(spec, f, rays.origins, rays.dirs, rays.viewdirs, opt)
        )

    def loss_oracle(f):
        return jnp.sum(
            volume_render_oracle(
                spec, f, rays.origins, rays.dirs, rays.viewdirs, opt
            )
        )

    g1 = np.asarray(jax.grad(loss_prod)(feats))
    g2 = np.asarray(jax.grad(loss_oracle)(feats))
    scale = np.abs(g2).max() + 1e-8
    np.testing.assert_allclose(g1 / scale, g2 / scale, atol=3e-5)


def test_render_persp_weight_accum(rng):
    t, feats, r = _setup(rng)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.5, 0.5, 3.0]
    img_plain = np.asarray(r.render_persp(feats, c2w, width=12, height=12, fx=12.0))
    with t.accumulate_weights() as acc:
        img = np.asarray(r.render_persp(feats, c2w, width=12, height=12, fx=12.0))
    np.testing.assert_allclose(img, img_plain, atol=1e-6)
    w = acc()
    assert w.sum() > 0
    np.testing.assert_allclose(w.sum(), img[..., -1].sum(), rtol=1e-4)


def test_scatter_add_compact_branches(rng):
    """All three branches of the compacting scatter (skip / compact /
    full fallback) must produce the exact dense scatter result."""
    from svox_t_tpu.ops.render import _scatter_add_compact

    M, D, T = 50, 6, 512
    grad0 = jnp.zeros((M, D), jnp.float32)
    rows = jnp.asarray(rng.randn(T, D).astype(np.float32))

    def dense(sidx):
        ref = np.zeros((M, D), np.float32)
        for i, j in enumerate(np.asarray(sidx)):
            if j < M:
                ref[j] += np.asarray(rows)[i]
        return ref

    # skip: nothing contributes
    sidx = jnp.full((T,), M, jnp.int32)
    out = _scatter_add_compact(grad0, sidx, rows, M)
    np.testing.assert_array_equal(np.asarray(out), 0.0)

    # compact: a few contributors (duplicates included)
    s = np.full((T,), M, np.int32)
    s[[3, 10, 77, 100, 101]] = [5, 5, 0, 49, 5]
    out = _scatter_add_compact(grad0, jnp.asarray(s), rows, M)
    np.testing.assert_allclose(np.asarray(out), dense(s), atol=1e-6)

    # full fallback: everything contributes (count > cap)
    s = rng.randint(0, M, T).astype(np.int32)
    out = _scatter_add_compact(grad0, jnp.asarray(s), rows, M)
    np.testing.assert_allclose(np.asarray(out), dense(s), atol=1e-5)

    # 1-D rows (sigma-gradient path)
    rows1 = jnp.asarray(rng.randn(T).astype(np.float32))
    g1 = jnp.zeros((M,), jnp.float32)
    s = np.full((T,), M, np.int32)
    s[:10] = np.arange(10)
    out = _scatter_add_compact(g1, jnp.asarray(s), rows1, M)
    ref = np.zeros((M,), np.float32)
    ref[:10] = np.asarray(rows1)[:10]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_bf16_feature_pool(rng):
    """bf16 feature pools (halved gather-table bytes for big scenes):
    forward within bf16 tolerance of f32, gradients flow and come back
    in the pool dtype."""
    t, feats, r = _setup(rng, "SH1", 4)
    rays = make_rays(rng, 32)
    spec = t._spec()
    opt = r._get_options(False)
    out32 = np.asarray(
        volume_render(spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt)
    )
    f16 = feats.astype(jnp.bfloat16)
    out16 = np.asarray(
        volume_render(spec, f16, rays.origins, rays.dirs, rays.viewdirs, opt)
    ).astype(np.float32)
    assert np.abs(out16 - out32).max() < 0.05

    g = jax.grad(
        lambda f: jnp.sum(
            volume_render(spec, f, rays.origins, rays.dirs, rays.viewdirs, opt)
        )
    )(f16)
    assert g.dtype == jnp.bfloat16
    g32 = np.asarray(jax.grad(
        lambda f: jnp.sum(
            volume_render(spec, f, rays.origins, rays.dirs, rays.viewdirs, opt)
        )
    )(feats))
    scale = np.abs(g32).max() + 1e-8
    assert np.abs(np.asarray(g).astype(np.float32) - g32).max() / scale < 0.05


def test_trilinear_baked_backend_parity(rng):
    """Trilinear on the BAKED backend (the production default): corner
    lookups through _baked_lookup_xyz must match the tree-walk spec for
    forward AND the 8-corner gradient scatter, including a bricked bake."""
    import dataclasses

    from svox_t_tpu.ops import bake as bake_ops

    t, feats, r = _setup(rng, "SH1", 4)
    rays = make_rays(rng, 32)
    spec = t._spec()
    opt = dataclasses.replace(r._get_options(False), interp=1)
    out_tree = volume_render(
        spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    for baked in (t._baked_spec(), bake_ops.bake(spec, top_levels=2)):
        out_baked = volume_render(
            baked, feats, rays.origins, rays.dirs, rays.viewdirs, opt
        )
        np.testing.assert_allclose(
            np.asarray(out_baked), np.asarray(out_tree), atol=1e-5
        )
        g_tree = jax.grad(lambda f: jnp.sum(volume_render(
            spec, f, rays.origins, rays.dirs, rays.viewdirs, opt)))(feats)
        g_baked = jax.grad(lambda f, b=baked: jnp.sum(volume_render(
            b, f, rays.origins, rays.dirs, rays.viewdirs, opt)))(feats)
        scale = float(jnp.abs(g_tree).max()) + 1e-8
        np.testing.assert_allclose(
            np.asarray(g_baked) / scale, np.asarray(g_tree) / scale,
            atol=1e-5,
        )


def test_opacity_trilinear_grad(rng):
    """Interp-aware opacity VJP: gradients flow to corner cells and
    match finite differences."""
    import dataclasses

    from svox_t_tpu.ops.render_aux import opacity_render

    t, feats, r = _setup(rng, "RGBA", 4, n_random_refines=0)
    rays = make_rays(rng, 12)
    spec = t._spec()
    opt = dataclasses.replace(r._get_options(False), interp=1)

    def loss(f):
        return jnp.sum(opacity_render(spec, f, rays.origins, rays.dirs, opt))

    g = np.asarray(jax.grad(loss)(feats))
    assert np.isfinite(g).all()
    # only the sigma channel receives gradient
    np.testing.assert_array_equal(g[:, :-1], 0.0)
    f0 = np.asarray(feats)
    checked = 0
    order = np.argsort(-np.abs(g[:, -1]))
    for i in order[:3]:
        eps = 1e-2
        fp = f0.copy(); fp[i, -1] += eps
        fm = f0.copy(); fm[i, -1] -= eps
        fd = (float(loss(jnp.asarray(fp))) - float(loss(jnp.asarray(fm)))) / (2 * eps)
        assert abs(fd - g[i, -1]) < 5e-3 + 0.05 * abs(fd), (i, fd, g[i, -1])
        checked += 1
    assert checked == 3


def test_grad_tape_matches_ladder(rng):
    """The global gradient tape (grad_tape_rows > 0) must produce the
    SAME gradients as the per-round tiered scatter at any capacity —
    including spill-heavy tiny capacities."""
    import dataclasses

    t, feats, r = _setup(rng, "SH4", 13)
    rays = make_rays(rng, 150)
    spec = t._baked_spec()
    opt0 = r._get_options(False)

    def loss(f, opt):
        return jnp.sum(
            volume_render(
                spec, f, rays.origins, rays.dirs, rays.viewdirs, opt
            ) ** 2
        )

    g0 = np.asarray(jax.grad(lambda f: loss(f, opt0))(feats))
    for cap in (1 << 15, 512, 64):
        opt1 = dataclasses.replace(opt0, grad_tape_rows=cap)
        g1 = np.asarray(jax.grad(lambda f: loss(f, opt1))(feats))
        np.testing.assert_allclose(g1, g0, atol=2e-5, err_msg=f"cap={cap}")


def test_box_advance_fast_only_semantics(rng):
    """box_advance skips the provably-empty approach to the occupied
    box: fast-mode outputs move only within the fast-accuracy envelope,
    miss rays are unchanged, and exact mode (box_advance=0) is
    untouched by the presence of the option."""
    import dataclasses

    t, feats, r = _setup(rng, "RGBA", 4, sigma_scale=20.0)
    rays = make_rays(rng, 128)
    baked = t._baked_spec()
    opt_fast = r._get_options(True)
    assert opt_fast.box_advance == 1  # fast mode enables it
    opt_fast0 = dataclasses.replace(opt_fast, box_advance=0)
    a = np.asarray(volume_render(
        baked, feats, rays.origins, rays.dirs, rays.viewdirs, opt_fast0))
    b = np.asarray(volume_render(
        baked, feats, rays.origins, rays.dirs, rays.viewdirs, opt_fast))
    # bounded divergence (the fast license), not equality
    assert np.abs(a - b).max() < 0.05
    # rays that never hit (background, alpha 0) must be identical
    miss = a[:, -1] == 0.0
    assert miss.any()
    np.testing.assert_array_equal(a[miss], b[miss])
    # exact options keep box_advance off
    assert r._get_options(False).box_advance == 0


def test_box_advance_bwd_consistent(rng):
    """The backward re-march must advance tmin exactly like the forward
    (same opt): gradients stay finite-difference-consistent under
    box_advance."""
    import dataclasses

    t, feats, r = _setup(rng, "RGBA", 4, sigma_scale=5.0)
    rays = make_rays(rng, 32)
    baked = t._baked_spec()
    opt = dataclasses.replace(
        r._get_options(False), box_advance=1
    )

    def loss(f):
        return jnp.sum(volume_render(
            baked, f, rays.origins, rays.dirs, rays.viewdirs, opt))

    g = np.asarray(jax.grad(loss)(feats))
    assert np.isfinite(g).all()
    f0 = np.asarray(feats)
    order = np.argsort(-np.abs(g).max(axis=1))
    checked = 0
    for i in order[:3]:
        for c in (0, f0.shape[1] - 1):
            eps = 1e-2
            fp = f0.copy(); fp[i, c] += eps
            fm = f0.copy(); fm[i, c] -= eps
            fd = (float(loss(jnp.asarray(fp))) -
                  float(loss(jnp.asarray(fm)))) / (2 * eps)
            assert abs(fd - g[i, c]) < 5e-3 + 0.05 * abs(fd), (i, c, fd, g[i, c])
            checked += 1
    assert checked == 6


def test_quantized_pool_render(rng):
    """int8 affine-quantized pools: outputs within quantization error of
    the f32 pool, across main/opacity/depth entry points and backends;
    differentiating the graph does not crash (zero feature cotangent)."""
    t, feats, r = _setup(rng, "SH4", 13)
    rays = make_rays(rng, 96)
    qf = st.quantize_features(feats)
    assert qf.q.dtype == jnp.int8

    out_f = np.asarray(r(feats, rays))
    out_q = np.asarray(r(qf, rays))
    assert np.abs(out_f - out_q).max() < 0.05

    # backend parity with the same quantized pool
    out_tree = np.asarray(st.VolumeRenderer(t, backend="tree")(qf, rays))
    np.testing.assert_allclose(out_q, out_tree, atol=2e-5)

    op_f = np.asarray(r.opacity_render(feats, rays))
    op_q = np.asarray(r.opacity_render(qf, rays))
    assert np.abs(op_f - op_q).max() < 0.05
    d_f = np.asarray(r.render_depth(feats, rays))
    d_q = np.asarray(r.render_depth(qf, rays))
    # first-hit depth can jump a whole leaf where sigma sits near the
    # threshold; just require most rays agree
    assert (np.abs(d_f - d_q) < 1e-4).mean() > 0.9

    # grads through the quantized pool: structure-preserving zeros
    from svox_t_tpu.ops.render import volume_render
    spec = t._baked_spec()
    opt = r._get_options(False)

    def f(q):
        qq = st.QuantizedFeatures(q, qf.scale, qf.zero)
        return jnp.sum(volume_render(
            spec, qq, rays.origins, rays.dirs, rays.viewdirs, opt))

    g = jax.grad(lambda s: jnp.sum(volume_render(
        spec, st.QuantizedFeatures(qf.q, s, qf.zero),
        rays.origins, rays.dirs, rays.viewdirs, opt)))(qf.scale)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_two_phase_straggler_march_bit_exact(rng):
    """straggler_rounds (two-phase compacted march) is a pure SCHEDULE
    change: outputs and gradients bit-match the single-phase march in
    every mode/backend; weight accumulation matches to scatter-order
    rounding."""
    import dataclasses

    t, feats, r = _setup(rng, "SH1", 4)
    rays = make_rays(rng, 1536)
    origins, dirs = rays.origins, rays.dirs
    for fast in (False, True):
        for backend in ("baked", "tree"):
            spec = t._baked_spec() if backend == "baked" else t._spec()
            opt0 = dataclasses.replace(
                r._get_options(fast), chunk_size=256
            )
            out0 = volume_render(spec, feats, origins, dirs, dirs, opt0)
            for sr in (1, 3):
                opt1 = dataclasses.replace(opt0, straggler_rounds=sr)
                out1 = volume_render(spec, feats, origins, dirs, dirs, opt1)
                np.testing.assert_array_equal(
                    np.asarray(out1), np.asarray(out0),
                    err_msg=f"fast={fast} backend={backend} sr={sr}",
                )
    spec = t._baked_spec()
    opt0 = dataclasses.replace(r._get_options(False), chunk_size=256)
    opt1 = dataclasses.replace(opt0, straggler_rounds=2)
    g0 = jax.grad(
        lambda f: jnp.sum(volume_render(spec, f, origins, dirs, dirs, opt0))
    )(feats)
    g1 = jax.grad(
        lambda f: jnp.sum(volume_render(spec, f, origins, dirs, dirs, opt1))
    )(feats)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g0))
    o0, w0 = volume_render_with_weight_accum(
        spec, feats, origins, dirs, dirs, opt0
    )
    o1, w1 = volume_render_with_weight_accum(
        spec, feats, origins, dirs, dirs, opt1
    )
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o0))
    np.testing.assert_allclose(
        np.asarray(w1), np.asarray(w0), atol=1e-5
    )


def test_two_phase_straggler_overflow_generations(rng):
    """When stragglers exceed the compaction buffer (B/8 rays), the
    generation loop finishes them in further passes — still bit-exact."""
    import dataclasses

    t, feats, r = _setup(rng, "RGBA", 4)
    # Tiny chunks make nearly every ray a straggler at cap 1.
    rays = make_rays(rng, 2048)
    origins, dirs = rays.origins, rays.dirs
    opt0 = dataclasses.replace(r._get_options(False), chunk_size=128)
    opt1 = dataclasses.replace(opt0, straggler_rounds=1)
    spec = t._baked_spec()
    out0 = volume_render(spec, feats, origins, dirs, dirs, opt0)
    out1 = volume_render(spec, feats, origins, dirs, dirs, opt1)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out0))


def test_cost_schedule_bit_exact(rng):
    """render_persp(schedule='cost') is a pure ray reorder: bit-identical
    image, cached plan reused, plain rays plan round-trips."""
    t, feats, r = _setup(rng, "SH1", 4)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 2.5
    for fast in (False, True):
        img0 = r.render_persp(feats, c2w, 48, 40, 60.0, fast=fast)
        img1 = r.render_persp(feats, c2w, 48, 40, 60.0, fast=fast,
                              schedule="cost")
        np.testing.assert_array_equal(np.asarray(img1), np.asarray(img0))
    assert len(r._plan_cache) == 2
    # plan_rays round-trip on a raw batch
    rays = make_rays(rng, 512)
    perm, inv = r.plan_rays(rays)
    out0 = r(feats, rays)
    permuted = st.Rays(rays.origins[perm], rays.dirs[perm],
                       rays.viewdirs[perm])
    out1 = np.asarray(r(feats, permuted))[inv]
    np.testing.assert_array_equal(out1, np.asarray(out0))


def test_cost_plan_invalidated_by_repointing(rng):
    """construct_tree (occupancy re-pointing) must invalidate cached
    cost plans: the plan cache keys on tree._occ_ver."""
    t, feats, r = _setup(rng, "RGBA", 4)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 2.5
    p1, _ = r.plan_persp(c2w, 32, 24, 40.0)
    assert len(r._plan_cache) == 1
    centers = np.asarray(jax.device_get(t.tree2world(jnp.asarray(
        t[:].corners_local + 0.5 * t[:].lengths_local[:, None]))))
    t.construct_tree(centers[: max(4, len(centers) // 2)])
    p2, _ = r.plan_persp(c2w, 32, 24, 40.0)
    assert len(r._plan_cache) == 2  # new key -> re-planned
    # outputs stay bit-exact under the new plan
    img0 = r.render_persp(feats, c2w, 32, 24, 40.0)
    img1 = r.render_persp(feats, c2w, 32, 24, 40.0, schedule="cost")
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img0))


def test_cost_plan_cache_fifo_eviction(rng):
    """The plan cache evicts its OLDEST entry past the cap instead of
    clearing wholesale — a >32-pose camera orbit must keep recent plans
    cached (each rebuild costs a pre-march dispatch + host argsort)."""
    t, feats, r = _setup(rng, "RGBA", 4)
    c2w = np.eye(4, dtype=np.float32)
    keys = []
    for i in range(35):
        c2w_i = c2w.copy()
        c2w_i[2, 3] = 2.0 + 0.01 * i
        r.plan_persp(c2w_i, 16, 12, 20.0)
        keys.append(next(reversed(r._plan_cache)))
    assert len(r._plan_cache) == 33  # cap + the latest insert
    assert keys[-1] in r._plan_cache       # newest retained
    assert keys[-2] in r._plan_cache       # recent neighbors retained
    assert keys[0] not in r._plan_cache    # oldest evicted
    assert keys[1] not in r._plan_cache


def test_dynamic_frames_rejects_cost_schedule_with_rays(rng):
    """schedule='cost' with a raw ray batch has no camera to plan
    against; the API must refuse rather than silently render in caller
    order (use plan_rays + schedule='tile' instead)."""
    t, feats, r = _setup(rng, "RGBA", 4)
    rays = make_rays(rng, 64)
    dummy_pose = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1, 1))
    with pytest.raises(ValueError, match="plan_rays"):
        r.render_dynamic_frames(
            feats, dummy_pose, dummy_pose[0],
            np.zeros((4, 3), np.float32), np.ones((4, 1), np.float32),
            np.zeros((4, 1), np.int32), rays=rays, schedule="cost",
        )
