"""SH/SG basis evaluation, LBS warping, and p2v voxelization tests."""

import jax
import jax.numpy as jnp
import numpy as np

import svox_t_tpu as st
from svox_t_tpu.ops.sh import C0, C1, C2, eval_basis, eval_sh, eval_sh_bases
from svox_t_tpu.utils.spec import FORMAT_SG, FORMAT_SH


def _unit_dirs(rng, n):
    d = rng.randn(n, 3).astype(np.float32)
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


def test_sh_bases_deg2_analytic(rng):
    dirs = _unit_dirs(rng, 10)
    out = np.asarray(eval_sh_bases(2, jnp.asarray(dirs)))
    x, y, z = dirs.T
    np.testing.assert_allclose(out[:, 0], C0, atol=1e-6)
    np.testing.assert_allclose(out[:, 1], -C1 * y, atol=1e-6)
    np.testing.assert_allclose(out[:, 2], C1 * z, atol=1e-6)
    np.testing.assert_allclose(out[:, 3], -C1 * x, atol=1e-6)
    np.testing.assert_allclose(out[:, 4], C2[0] * x * y, atol=1e-6)
    np.testing.assert_allclose(
        out[:, 6], C2[2] * (2 * z * z - x * x - y * y), atol=1e-6
    )


def test_eval_sh_equals_bases_dot(rng):
    dirs = _unit_dirs(rng, 8)
    sh = rng.randn(8, 3, 16).astype(np.float32)
    v1 = np.asarray(eval_sh(3, jnp.asarray(sh), jnp.asarray(dirs)))
    bases = np.asarray(eval_sh_bases(3, jnp.asarray(dirs)))
    v2 = (sh * bases[:, None, :]).sum(-1)
    np.testing.assert_allclose(v1, v2, atol=1e-5)


def test_sh_orthonormality(rng):
    """Monte-Carlo: SH bases are orthonormal over the sphere."""
    rng2 = np.random.RandomState(7)
    dirs = _unit_dirs(rng2, 200000)
    b = np.asarray(eval_sh_bases(2, jnp.asarray(dirs)))
    gram = 4 * np.pi * (b[:, :, None] * b[:, None, :]).mean(0)
    np.testing.assert_allclose(gram, np.eye(9), atol=0.05)


def test_sg_basis(rng):
    dirs = _unit_dirs(rng, 6)
    extra = rng.randn(4, 4).astype(np.float32)
    out = np.asarray(
        eval_basis(FORMAT_SG, 4, jnp.asarray(dirs), jnp.asarray(extra))
    )
    for i in range(4):
        lam, mu = extra[i, 0], extra[i, 1:4]
        want = np.exp(lam * (dirs @ mu - 1)) / 4
        np.testing.assert_allclose(out[:, i], want, rtol=2e-5)


def test_warp_vertices_identity(rng):
    Q, J, nb = 20, 3, 2
    T = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (J, 1, 1)))
    pts = jnp.asarray(rng.rand(Q, 3).astype(np.float32))
    sw = jnp.asarray(rng.rand(Q, nb).astype(np.float32))
    sw = sw / sw.sum(1, keepdims=True)
    ji = jnp.asarray(rng.randint(0, J, (Q, nb)).astype(np.int32))
    warped, mats = st.warp_vertices(T, pts, sw, ji)
    np.testing.assert_allclose(np.asarray(warped), np.asarray(pts), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mats), np.tile(np.eye(4), (Q, 1, 1)), atol=1e-6
    )


def test_warp_vertices_translation_blend(rng):
    """Two joints translating oppositely; blended translation = weighted."""
    Q = 10
    T = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    T[0, 0, 3] = 1.0
    T[1, 0, 3] = -1.0
    pts = rng.rand(Q, 3).astype(np.float32)
    sw = np.stack([np.full(Q, 0.25), np.full(Q, 0.75)], -1).astype(np.float32)
    ji = np.tile(np.array([0, 1], np.int32), (Q, 1))
    warped, mats = st.warp_vertices(
        jnp.asarray(T), jnp.asarray(pts), jnp.asarray(sw), jnp.asarray(ji)
    )
    want = pts.copy()
    want[:, 0] += 0.25 * 1.0 + 0.75 * (-1.0)
    np.testing.assert_allclose(np.asarray(warped), want, atol=1e-6)


def test_warp_negative_weights_skipped(rng):
    """Reference skips skinning weights <= 0 (svox_kernel.cu:140)."""
    Q = 4
    T = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    T[1] *= 100  # would blow up if not skipped
    pts = rng.rand(Q, 3).astype(np.float32)
    sw = np.stack([np.ones(Q), -np.ones(Q)], -1).astype(np.float32)
    ji = np.tile(np.array([0, 1], np.int32), (Q, 1))
    warped, _ = st.warp_vertices(
        jnp.asarray(T), jnp.asarray(pts), jnp.asarray(sw), jnp.asarray(ji)
    )
    np.testing.assert_allclose(np.asarray(warped), pts, atol=1e-6)


def test_warp_grads(rng):
    Q, J, nb = 8, 2, 2
    T = jnp.asarray(
        np.tile(np.eye(4, dtype=np.float32), (J, 1, 1))
        + rng.randn(J, 4, 4).astype(np.float32) * 0.01
    )
    pts = jnp.asarray(rng.rand(Q, 3).astype(np.float32))
    sw = jnp.asarray(rng.rand(Q, nb).astype(np.float32))
    ji = jnp.asarray(rng.randint(0, J, (Q, nb)).astype(np.int32))

    def loss(T_, pts_, sw_):
        w, m = st.warp_vertices(T_, pts_, sw_, ji)
        return jnp.sum(w ** 2) + jnp.sum(m)

    gT, gp, gs = jax.grad(loss, argnums=(0, 1, 2))(T, pts, sw)
    for g, x, name in [(gT, T, "T"), (gp, pts, "pts"), (gs, sw, "sw")]:
        g = np.asarray(g)
        eps = 1e-3
        x0 = np.asarray(x)
        it = np.unravel_index(np.argmax(np.abs(g)), g.shape)
        xp = x0.copy(); xp[it] += eps
        xm = x0.copy(); xm[it] -= eps
        args = {"T": (jnp.asarray(xp), pts, sw), "pts": (T, jnp.asarray(xp), sw),
                "sw": (T, pts, jnp.asarray(xp))}[name]
        argsm = {"T": (jnp.asarray(xm), pts, sw), "pts": (T, jnp.asarray(xm), sw),
                 "sw": (T, pts, jnp.asarray(xm))}[name]
        fd = (float(loss(*args)) - float(loss(*argsm))) / (2 * eps)
        assert abs(fd - g[it]) < 1e-2 + 0.02 * abs(fd), (name, fd, g[it])


def test_blend_transformation_matrix(rng):
    Q, J, nb = 6, 2, 2
    T = jnp.asarray(rng.randn(J, 4, 4).astype(np.float32))
    sw = jnp.asarray(rng.rand(Q, nb).astype(np.float32))
    ji = jnp.asarray(rng.randint(0, J, (Q, nb)).astype(np.int32))
    m = st.blend_transformation_matrix(T, sw, ji)
    _, m2 = st.warp_vertices(T, jnp.zeros((Q, 3)), sw, ji)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m)[:, 3], [[0, 0, 0, 1]] * Q, atol=0)


def test_get_transformation_matrix(rng):
    src = jnp.asarray(np.eye(4, dtype=np.float32) + rng.randn(4, 4).astype(np.float32) * 0.1)
    tgt = jnp.asarray(np.eye(4, dtype=np.float32) + rng.randn(4, 4).astype(np.float32) * 0.1)
    T = st.get_transformation_matrix(src, tgt)
    np.testing.assert_allclose(
        np.asarray(T @ src), np.asarray(tgt), atol=1e-5
    )


# ---------------------------------------------------------------------------
# p2v
# ---------------------------------------------------------------------------


def _p2v_naive(points, features, corner, size, n, kr, cr):
    """Dense reference: evaluate every voxel against every point."""
    vs = np.asarray(size, np.float32) / (n - 1)
    corner = np.asarray(corner, np.float32)
    grid = np.zeros((n, n, n, 1), np.float32)
    coords = np.stack(
        np.meshgrid(np.arange(n), np.arange(n), np.arange(n), indexing="ij"), -1
    )
    centers = coords * vs + corner
    for p, f in zip(points, features[:, -1]):
        # replicate the reference's clamped index window
        lo = np.clip(np.floor((p - cr - corner) / vs), 0, n - 1).astype(int)
        hi = np.clip(np.ceil((p + cr - corner) / vs), 0, n - 1).astype(int)
        sub = centers[lo[0]:hi[0] + 1, lo[1]:hi[1] + 1, lo[2]:hi[2] + 1]
        r = np.linalg.norm(sub - p, axis=-1)
        w = np.exp(-(r ** 2) / (2 * kr * kr)) * (r <= cr)
        grid[lo[0]:hi[0] + 1, lo[1]:hi[1] + 1, lo[2]:hi[2] + 1, 0] += w * f
    return grid


def test_p2v_matches_naive(rng):
    pts = rng.rand(40, 3).astype(np.float32)
    feats = np.abs(rng.rand(40, 2)).astype(np.float32)
    n, kr, cr = 16, 0.08, 0.15
    out = np.asarray(
        st.voxelize(jnp.asarray(pts), jnp.asarray(feats), [0, 0, 0], [1, 1, 1], n, kr, cr)
    )
    want = _p2v_naive(pts, feats, [0, 0, 0], [1, 1, 1], n, kr, cr)
    np.testing.assert_allclose(out, want, atol=1e-4)


def test_p2v_grads(rng):
    pts = jnp.asarray(rng.rand(10, 3).astype(np.float32))
    feats = jnp.asarray(np.abs(rng.rand(10, 1)).astype(np.float32))

    def loss(p, f):
        # kr << cr so the hard r<=cr cutoff carries ~exp(-12.5) weight —
        # keeps the finite-difference probe off the discontinuity.
        v = st.voxelize(p, f, [0, 0, 0], [1, 1, 1], 8, 0.08, 0.4)
        return jnp.sum(v ** 2)

    gp, gf = jax.grad(loss, argnums=(0, 1))(pts, feats)
    gp, gf = np.asarray(gp), np.asarray(gf)
    assert np.isfinite(gp).all() and np.isfinite(gf).all()
    p0, f0 = np.asarray(pts), np.asarray(feats)
    eps = 1e-3
    for (i, j) in [(0, 0), (3, 2)]:
        pp = p0.copy(); pp[i, j] += eps
        pm = p0.copy(); pm[i, j] -= eps
        fd = (float(loss(jnp.asarray(pp), feats)) - float(loss(jnp.asarray(pm), feats))) / (2 * eps)
        assert abs(fd - gp[i, j]) < 1e-2 + 0.05 * abs(fd)
    fp = f0.copy(); fp[2, 0] += eps
    fm = f0.copy(); fm[2, 0] -= eps
    fd = (float(loss(pts, jnp.asarray(fp))) - float(loss(pts, jnp.asarray(fm)))) / (2 * eps)
    assert abs(fd - gf[2, 0]) < 1e-2 + 0.05 * abs(fd)


def test_p2v_point_outside_volume(rng):
    """A point far outside deposits nothing (its window voxels are all
    beyond conv_radius)."""
    pts = jnp.asarray(np.array([[10.0, 10.0, 10.0]], np.float32))
    feats = jnp.ones((1, 1), jnp.float32)
    out = np.asarray(st.voxelize(pts, feats, [0, 0, 0], [1, 1, 1], 8, 0.1, 0.2))
    np.testing.assert_allclose(out, 0.0)
