"""SG / ASG rendering end-to-end: the basis formats beyond SH must render
and differentiate (the reference ships ASG untested — rt_kernel.cu:120;
here it gets coverage)."""

import jax
import jax.numpy as jnp
import numpy as np

import svox_t_tpu as st
from svox_t_tpu.ops.reference_renderer import volume_render_oracle
from svox_t_tpu.ops.render import volume_render
from svox_t_tpu.ops.sh import eval_basis
from svox_t_tpu.utils.spec import FORMAT_ASG

from helpers import build_tree, make_rays


def _unit(rng, n):
    d = rng.randn(n, 3).astype(np.float32)
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


def test_asg_basis_analytic(rng):
    dirs = _unit(rng, 5)
    # rows: [a, b, x(3), y(3), z(3)]
    extra = rng.randn(2, 11).astype(np.float32)
    extra[:, 0:2] = np.abs(extra[:, 0:2])
    out = np.asarray(eval_basis(FORMAT_ASG, 2, jnp.asarray(dirs), jnp.asarray(extra)))
    for i in range(2):
        a, b = extra[i, 0], extra[i, 1]
        xax, yax, zax = extra[i, 2:5], extra[i, 5:8], extra[i, 8:11]
        s = dirs @ zax
        dx = dirs @ xax
        dy = dirs @ yax
        want = s * np.exp(-a * dx ** 2 - b * dy ** 2) / 2
        np.testing.assert_allclose(out[:, i], want, rtol=1e-4, atol=1e-6)


def _render_with_format(rng, fmt, basis_dim, extra_rows):
    data_dim = 3 * basis_dim + 1
    extra = rng.randn(basis_dim, extra_rows).astype(np.float32)
    if fmt == "ASG":
        extra[:, 0:2] = np.abs(extra[:, 0:2]) + 0.5
    else:
        extra[:, 0] = np.abs(extra[:, 0]) + 0.5
    t, feats, centers = build_tree(
        rng,
        data_dim=data_dim,
        data_format=f"{fmt}{basis_dim}",
        extra_data=extra,
        n_random_refines=1,
    )
    r = st.VolumeRenderer(t)
    rays = make_rays(rng, 32)
    opt = r._get_options(False)
    spec = t._spec()
    out = volume_render(spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt)
    ref = volume_render_oracle(
        spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def loss(f):
        return jnp.sum(
            volume_render(spec, f, rays.origins, rays.dirs, rays.viewdirs, opt) ** 2
        )

    def loss_oracle(f):
        return jnp.sum(
            volume_render_oracle(
                spec, f, rays.origins, rays.dirs, rays.viewdirs, opt
            ) ** 2
        )

    g1 = np.asarray(jax.grad(loss)(feats))
    g2 = np.asarray(jax.grad(loss_oracle)(feats))
    scale = np.abs(g2).max() + 1e-8
    np.testing.assert_allclose(g1 / scale, g2 / scale, atol=3e-5)
    return np.asarray(out)


def test_sg_render_and_grads(rng):
    out = _render_with_format(rng, "SG", 4, 4)
    assert np.isfinite(out).all()


def test_asg_render_and_grads(rng):
    out = _render_with_format(rng, "ASG", 2, 11)
    assert np.isfinite(out).all()
