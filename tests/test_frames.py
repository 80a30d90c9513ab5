"""Frame-stack rendering API: T frames in one dispatch via lax.scan.

`render_frames` / `render_persp_frames` must be exactly per-frame calls
of `forward` / `render_persp` (same march, same options), stacked —
including per-frame transformation matrices and per-frame cameras — and
differentiable through the whole stack.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import svox_t_tpu as st

from helpers import build_tree, make_rays


@pytest.fixture()
def rng():
    return np.random.RandomState(7)


def _frame_stack(rng, feats, T=3):
    base = np.asarray(feats)
    stack = np.stack(
        [base * (1.0 + 0.05 * k) + 0.01 * k for k in range(T)]
    ).astype(np.float32)
    return jnp.asarray(stack)


def test_render_frames_matches_per_frame(rng):
    t, feats, _ = build_tree(rng, data_format="SH1", data_dim=13)
    r = st.VolumeRenderer(t)
    rays = make_rays(rng, 40)
    stack = _frame_stack(rng, feats)

    outs = np.asarray(r.render_frames(stack, rays))
    assert outs.shape[0] == stack.shape[0]
    for k in range(stack.shape[0]):
        single = np.asarray(r(stack[k], rays))
        np.testing.assert_allclose(outs[k], single, atol=1e-6)


def test_render_frames_with_tmats_matches_per_frame(rng):
    t, feats, _ = build_tree(rng, data_format="SH1", data_dim=13)
    r = st.VolumeRenderer(t)
    rays = make_rays(rng, 24)
    stack = _frame_stack(rng, feats)
    T, M = stack.shape[0], stack.shape[1]

    # Per-frame per-voxel rotations: small random rotations about z.
    ang = rng.rand(T, M).astype(np.float32) * 0.6
    c, s = np.cos(ang), np.sin(ang)
    tms = np.zeros((T, M, 4, 4), np.float32)
    tms[..., 0, 0] = c
    tms[..., 0, 1] = -s
    tms[..., 1, 0] = s
    tms[..., 1, 1] = c
    tms[..., 2, 2] = 1.0
    tms[..., 3, 3] = 1.0

    outs = np.asarray(r.render_frames(stack, rays, tms))
    for k in range(T):
        single = np.asarray(
            r(stack[k], rays, transformation_matrices=jnp.asarray(tms[k]))
        )
        np.testing.assert_allclose(outs[k], single, atol=1e-6)


def test_render_persp_frames_fixed_and_orbit_camera(rng):
    t, feats, _ = build_tree(rng)
    r = st.VolumeRenderer(t)
    stack = _frame_stack(rng, feats, T=2)
    W = H = 24
    fx = 30.0

    # Identity rotation looks along -z (cam2world_rays convention):
    # camera above the cube at z=2.5 looks straight at it.
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.5, 0.5, 2.5]

    # Fixed camera
    outs = np.asarray(r.render_persp_frames(stack, c2w, W, H, fx))
    assert outs.shape == (2, H, W, 4)  # RGBA: 3 colors + alpha
    for k in range(2):
        single = np.asarray(r.render_persp(stack[k], c2w, W, H, fx))
        np.testing.assert_allclose(outs[k], single, atol=1e-6)

    # Per-frame cameras (tiny orbit)
    c2w2 = np.stack([c2w, c2w])
    c2w2[1, :3, 3] = [0.45, 0.55, 2.5]
    outs2 = np.asarray(r.render_persp_frames(stack, c2w2, W, H, fx))
    for k in range(2):
        single = np.asarray(r.render_persp(stack[k], c2w2[k], W, H, fx))
        np.testing.assert_allclose(outs2[k], single, atol=1e-6)


def test_render_frames_differentiable(rng):
    """Gradients flow to every frame of the stack and equal the
    per-frame gradients of the same scalar loss."""
    t, feats, _ = build_tree(rng)
    r = st.VolumeRenderer(t)
    rays = make_rays(rng, 24)
    stack = _frame_stack(rng, feats)

    def loss_stack(s):
        return jnp.sum(r.render_frames(s, rays) ** 2)

    g = np.asarray(jax.grad(loss_stack)(stack))
    assert g.shape == stack.shape
    for k in range(stack.shape[0]):
        def loss_one(f):
            return jnp.sum(r(f, rays) ** 2)

        gk = np.asarray(jax.grad(loss_one)(stack[k]))
        np.testing.assert_allclose(g[k], gk, atol=3e-5)


def test_frames_cost_schedule_bit_exact(rng):
    """schedule='cost' on the frame-stack and fused dynamic paths is a
    pure ray reorder — bit-identical to tile order."""
    import numpy as np
    from helpers import build_tree

    t, feats, centers = build_tree(rng)
    t.features = feats
    r = st.VolumeRenderer(t)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 2.5
    ff = jnp.stack([feats, feats * 1.1])
    a = r.render_persp_frames(ff, c2w, 32, 24, 40.0)
    b = r.render_persp_frames(ff, c2w, 32, 24, 40.0, schedule="cost")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    Q = centers.shape[0]
    sw = np.ones((Q, 1), np.float32)
    ji = np.zeros((Q, 1), np.int32)
    poses = np.stack([np.stack([np.eye(4, dtype=np.float32)])] * 2)
    src = np.stack([np.eye(4, dtype=np.float32)])
    kw = dict(width=32, height=24, fx=40.0, update_tree=False)
    o1 = r.render_dynamic_frames(feats, poses, src, centers, sw, ji,
                                 c2w=c2w, **kw)
    o2 = r.render_dynamic_frames(feats, poses, src, centers, sw, ji,
                                 c2w=c2w, schedule="cost", **kw)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
