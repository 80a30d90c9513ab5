"""Slow, trivially-correct scan-based renderer — the numerical oracle.

This mirrors the semantics of `ops/render.py` (and therefore the reference
CUDA `trace_ray`, rt_kernel.cu:221-328) but uses a fixed-length
`lax.scan`, so it is **reverse-mode differentiable by plain autodiff**.
Tests compare:
  * its forward output against the production while-loop forward,
  * its `jax.grad` against the production hand-written two-pass VJP.

Under default options (sigma_thresh=0, stop_thresh=0) no early stops
occur and backward's `sigma > 0` condition coincides with forward's, so
the autodiff gradient of this oracle equals the reference CUDA backward
exactly (see ops/render.py parity notes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.spec import FORMAT_RGBA, RenderOptions, TreeSpec, get_out_data_dim
from .render import _basis_window, _colors, _ray_setup, _sample, _step_basis
from .sh import eval_basis


def volume_render_oracle(
    spec: TreeSpec,
    features: jax.Array,
    origins: jax.Array,
    dirs: jax.Array,
    vdirs: jax.Array,
    opt: RenderOptions,
) -> jax.Array:
    """Scan-based forward render, (B, n_color+1). Differentiable wrt
    `features` by autodiff."""
    B = origins.shape[0]
    D = features.shape[1]
    n_color = get_out_data_dim(opt.format, opt.basis_dim, D) - 1
    dtype = origins.dtype

    o, d, invdir, delta_scale, tmin, tmax, hit = _ray_setup(spec, origins, dirs)

    from .render import _gather_interp, _pack_features

    # Packed once outside the scan (padding/reshaping the pool inside
    # the loop body would materialize it every step).
    features_t = _pack_features(features)

    if opt.format != FORMAT_RGBA:
        window = jnp.asarray(_basis_window(opt))
        base_basis = eval_basis(opt.format, opt.basis_dim, vdirs, spec.extra_data) * window
    else:
        window = None
        base_basis = None

    def step(carry, _):
        t, L, out_c, alpha, active, stopped = carry
        leaf, feat, delta_t, sigma, valid, idx = _sample(
            spec, features_t, o, d, invdir, t, opt.step_size
        )
        if opt.interp:
            pos = o + t[:, None] * d
            feat, sigma2, _ = _gather_interp(
                spec, features_t,
                pos[:, 0][None], pos[:, 1][None], pos[:, 2][None],
                leaf.cube_sz[None], features.dtype,
            )
            sigma = sigma2[0]
        contrib = jnp.logical_and(active, sigma > opt.sigma_thresh)
        att = jnp.exp(-delta_t * delta_scale * sigma)
        weight = L * (1.0 - att)
        basis_step = _step_basis(spec, opt, vdirs, idx, base_basis, window)
        s = _colors(feat, basis_step, opt, n_color)
        out_c = out_c + jnp.where(contrib[:, None], weight[:, None] * s, 0.0)
        newL = jnp.where(contrib, L * att, L)

        stop_now = jnp.logical_and(contrib, newL <= opt.stop_thresh)
        scale = 1.0 / (1.0 - newL)
        out_c = jnp.where(stop_now[:, None], out_c * scale[:, None], out_c)
        alpha = jnp.where(stop_now, 1.0 - newL, alpha)
        stopped = jnp.logical_or(stopped, stop_now)

        t = t + delta_t
        active = jnp.logical_and(
            active, jnp.logical_and(jnp.logical_not(stop_now), t < tmax)
        )
        return (t, newL, out_c, alpha, active, stopped), None

    init = (
        tmin,
        jnp.ones((B,), dtype),
        jnp.zeros((B, n_color), dtype),
        jnp.zeros((B,), dtype),
        hit,
        jnp.zeros((B,), bool),
    )
    (t, L, out_c, alpha, active, stopped), _ = jax.lax.scan(
        step, init, None, length=opt.max_steps
    )

    bg = opt.background_brightness
    out_c = jnp.where(
        hit[:, None],
        jnp.where(stopped[:, None], out_c, out_c + (L * bg)[:, None]),
        jnp.full((B, n_color), bg, dtype),
    )
    alpha = jnp.where(hit, jnp.where(stopped, alpha, 1.0 - L), 0.0)
    return jnp.concatenate([out_c, alpha[:, None]], axis=-1)


def volume_render_backward_oracle(
    spec: TreeSpec,
    features: jax.Array,
    origins: jax.Array,
    dirs: jax.Array,
    vdirs: jax.Array,
    grad_out: jax.Array,
    opt: RenderOptions,
) -> jax.Array:
    """Scan-based oracle for the hand-written backward's *thresholded*
    semantics (parity: rt_kernel.cu:330-496): two literal per-sample
    re-march passes where contribution gates on ``sigma > 0`` regardless
    of ``sigma_thresh`` and the forward's early stop / renormalization is
    ignored — the reference's deliberate forward/backward asymmetry.

    Independent of the production round/tape machinery in ops/render.py
    (one sample per scan step, one scatter per sample); used to validate
    the fast-mode (`sigma_thresh = stop_thresh = 1e-2`) gradient path,
    which autodiff through the forward oracle cannot check (the true
    gradient of the thresholded forward differs by construction).
    """
    from .render import _grad_rows  # shared row math, tested separately

    B = origins.shape[0]
    M, D = features.shape
    n_color = get_out_data_dim(opt.format, opt.basis_dim, D) - 1
    n_cc = n_color * opt.basis_dim if opt.format != FORMAT_RGBA else n_color
    dtype = origins.dtype

    o, d, invdir, delta_scale, tmin, tmax, hit = _ray_setup(spec, origins, dirs)
    if opt.format != FORMAT_RGBA:
        window = jnp.asarray(_basis_window(opt))
        base_basis = eval_basis(opt.format, opt.basis_dim, vdirs, spec.extra_data) * window
    else:
        window = None
        base_basis = None
    g_color = grad_out[:, :n_color]
    g_alpha = grad_out[:, n_color]

    def pass1(carry, _):
        t, L, accum, grad_c = carry
        active = jnp.logical_and(hit, t < tmax)
        leaf, feat, delta_t, sigma, valid, idx = _sample(
            spec, features, o, d, invdir, t, opt.step_size
        )
        contrib = jnp.logical_and(active, sigma > 0.0)
        att = jnp.exp(-delta_t * sigma * delta_scale)
        weight = L * (1.0 - att)
        basis_step = _step_basis(spec, opt, vdirs, idx, base_basis, window)
        rows, total_color = _grad_rows(opt, feat, basis_step, weight, g_color, n_color)
        grad_c = grad_c.at[jnp.where(contrib, idx, M)].add(rows, mode="drop")
        L = jnp.where(contrib, L * att, L)
        accum = accum + jnp.where(contrib, weight * total_color, 0.0)
        return (t + delta_t, L, accum, grad_c), None

    (t, L_ray, accum, grad_c), _ = jax.lax.scan(
        pass1,
        (tmin, jnp.ones((B,), dtype), jnp.zeros((B,), dtype),
         jnp.zeros((M, n_cc), dtype)),
        None,
        length=opt.max_steps,
    )
    accum = accum + L_ray * opt.background_brightness * jnp.sum(g_color, axis=-1)

    def pass2(carry, _):
        t, L, acc, grad_s = carry
        active = jnp.logical_and(hit, t < tmax)
        leaf, feat, delta_t, sigma, valid, idx = _sample(
            spec, features, o, d, invdir, t, opt.step_size
        )
        contrib = jnp.logical_and(active, sigma > 0.0)
        att = jnp.exp(-delta_t * sigma * delta_scale)
        weight = L * (1.0 - att)
        basis_step = _step_basis(spec, opt, vdirs, idx, base_basis, window)
        s = _colors(feat, basis_step, opt, n_color)
        total_color = jnp.sum(s * g_color, axis=-1)
        newL = jnp.where(contrib, L * att, L)
        new_acc = acc - jnp.where(contrib, weight * total_color, 0.0)
        g_sigma = delta_t * delta_scale * (total_color * newL - new_acc) + (
            delta_t * delta_scale * g_alpha * L_ray
        )
        grad_s = grad_s.at[jnp.where(contrib, idx, M)].add(
            jnp.where(contrib, g_sigma, 0.0), mode="drop"
        )
        return (t + delta_t, newL, new_acc, grad_s), None

    (t, L, acc, grad_s), _ = jax.lax.scan(
        pass2,
        (tmin, jnp.ones((B,), dtype), accum, jnp.zeros((M,), dtype)),
        None,
        length=opt.max_steps,
    )
    grad_f = jnp.zeros((M, D), dtype)
    grad_f = grad_f.at[:, :n_cc].set(grad_c)
    grad_f = grad_f.at[:, D - 1].add(grad_s)
    return grad_f
