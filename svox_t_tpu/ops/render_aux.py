"""Auxiliary render passes: opacity, depth, first-hit motion features, and
volumetric LBS motion-feature rendering. All passes march in ray chunks
(see ops/render.py chunking) so each chunk's loop exits independently.

Parity targets in the reference:
  * opacity_render fwd: rt_kernel.cu:499-560 (+ its backward, which the
    reference routes through the full color backward — both reduce to the
    clean sigma-only VJP implemented here; see rt_kernel.cu:1593-1616 and
    SURVEY.md K16);
  * render_depth: rt_kernel.cu:781-834;
  * motion_render (first-hit joints-distance features / depth / hit point
    / leaf id): rt_kernel.cu:698-778;
  * motion_feature_render fwd: rt_kernel.cu:885-980; its backward here
    fixes the reference's uninitialized-buffer / wrong-index bugs
    (rt_kernel.cu:1035,1051,1056 — see SURVEY.md K14) and computes the
    mathematically correct scatter.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.spec import RenderOptions, TreeSpec
from .render import (_chunked_carry, _chunked_outputs, _pack_features,
                     _ray_setup, _sample, _zero_cotangent)
from .sh import _PREC
from .traversal import tree2world


# ---------------------------------------------------------------------------
# Opacity
# ---------------------------------------------------------------------------


def _opacity_fwd_impl(spec, features, origins, dirs, opt):
    features_t = _pack_features(features)
    def single(origins_, dirs_):
        B = origins_.shape[0]
        dtype = origins_.dtype
        o, d, invdir, delta_scale, tmin, tmax, hit = _ray_setup(
            spec, origins_, dirs_
        )

        def cond(carry):
            step, t, L, active, stopped, alpha = carry
            return jnp.logical_and(step < opt.max_steps, jnp.any(active))

        def body(carry):
            step, t, L, active, stopped, alpha = carry
            leaf, feat, delta_t, sigma, valid, idx = _sample(
                spec, features_t, o, d, invdir, t, opt.step_size
            )
            contrib = jnp.logical_and(active, sigma > opt.sigma_thresh)
            att = jnp.exp(-delta_t * delta_scale * sigma)
            newL = jnp.where(contrib, L * att, L)
            stop_now = jnp.logical_and(contrib, newL <= opt.stop_thresh)
            alpha = jnp.where(stop_now, 1.0 - newL, alpha)
            stopped = jnp.logical_or(stopped, stop_now)
            t = t + delta_t
            active = jnp.logical_and(
                active, jnp.logical_and(jnp.logical_not(stop_now), t < tmax)
            )
            return step + 1, t, newL, active, stopped, alpha

        init = (
            jnp.zeros((), jnp.int32),
            tmin,
            jnp.ones((B,), dtype),
            hit,
            jnp.zeros((B,), bool),
            jnp.zeros((B,), dtype),
        )
        _, _, L, _, stopped, alpha = jax.lax.while_loop(cond, body, init)
        alpha = jnp.where(hit, jnp.where(stopped, alpha, 1.0 - L), 0.0)
        return alpha[:, None]

    out, _ = _chunked_outputs(single, opt, (origins, dirs))
    return out


def _opacity_bwd_impl(spec, features, origins, dirs, grad_out, opt):
    """Clean sigma-only VJP: grad_sigma_i = delta_t * delta_scale * g *
    L_ray, where L_ray is the final transmittance over samples with
    sigma > 0 (equivalent to both reference backward paths; see module
    docstring)."""
    M, D = features.shape
    features_t = _pack_features(features)

    def single(origins_, dirs_, grad_out_, grad_f):
        B = origins_.shape[0]
        dtype = origins_.dtype
        o, d, invdir, delta_scale, tmin, tmax, hit = _ray_setup(
            spec, origins_, dirs_
        )
        g = grad_out_[:, 0]

        # Pass A: final transmittance with the backward's sigma > 0 rule.
        def condA(carry):
            step, t, L = carry
            return jnp.logical_and(
                step < opt.max_steps, jnp.any(jnp.logical_and(hit, t < tmax))
            )

        def bodyA(carry):
            step, t, L = carry
            active = jnp.logical_and(hit, t < tmax)
            leaf, feat, delta_t, sigma, valid, idx = _sample(
                spec, features_t, o, d, invdir, t, opt.step_size
            )
            contrib = jnp.logical_and(active, sigma > 0.0)
            att = jnp.exp(-delta_t * sigma * delta_scale)
            L = jnp.where(contrib, L * att, L)
            return step + 1, t + delta_t, L

        _, _, L_ray = jax.lax.while_loop(
            condA, bodyA, (jnp.zeros((), jnp.int32), tmin, jnp.ones((B,), dtype))
        )

        # Pass B: scatter sigma grads.
        def condB(carry):
            step, t, gf = carry
            return jnp.logical_and(
                step < opt.max_steps, jnp.any(jnp.logical_and(hit, t < tmax))
            )

        def bodyB(carry):
            step, t, gf = carry
            active = jnp.logical_and(hit, t < tmax)
            leaf, feat, delta_t, sigma, valid, idx = _sample(
                spec, features_t, o, d, invdir, t, opt.step_size
            )
            contrib = jnp.logical_and(active, sigma > 0.0)
            g_sigma = delta_t * delta_scale * g * L_ray
            scat_idx = jnp.where(contrib, idx, M)
            gf = gf.at[scat_idx, D - 1].add(
                jnp.where(contrib, g_sigma, 0.0), mode="drop"
            )
            return step + 1, t + delta_t, gf

        _, _, grad_f = jax.lax.while_loop(
            condB, bodyB, (jnp.zeros((), jnp.int32), tmin, grad_f)
        )
        return grad_f

    return _chunked_carry(
        single,
        opt,
        (origins, dirs, grad_out),
        jnp.zeros((M, D), origins.dtype),
        fills=(1e9, 1.0, 0.0),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def opacity_render(spec, features, origins, dirs, opt: RenderOptions):
    """Alpha-only march, (B, 1) = 1 - transmittance (rt_kernel.cu:499-560)."""
    return _opacity_fwd_impl(spec, features, origins, dirs, opt)


def _op_fwd(spec, features, origins, dirs, opt):
    out = _opacity_fwd_impl(spec, features, origins, dirs, opt)
    return out, (spec, features, origins, dirs)


def _op_bwd(opt, res, g):
    spec, features, origins, dirs = res
    grad_features = _opacity_bwd_impl(spec, features, origins, dirs, g, opt)
    return (
        _zero_cotangent(spec),
        grad_features,
        jnp.zeros_like(origins),
        jnp.zeros_like(dirs),
    )


opacity_render.defvjp(_op_fwd, _op_bwd)


# ---------------------------------------------------------------------------
# First-hit passes: depth & motion features
# ---------------------------------------------------------------------------


def _first_hit(spec, features, origins, dirs, opt):
    """March until sigma > sigma_thresh; returns (found (B,), t_hit (B,),
    pos_tree (B,3), data_idx (B,), delta_scale (B,))."""
    features_t = _pack_features(features)

    def single(origins_, dirs_):
        B = origins_.shape[0]
        dtype = origins_.dtype
        o, d, invdir, delta_scale, tmin, tmax, hit = _ray_setup(
            spec, origins_, dirs_
        )

        def cond(carry):
            step, t, active, found, t_hit, pos_hit, idx_hit = carry
            return jnp.logical_and(step < opt.max_steps, jnp.any(active))

        def body(carry):
            step, t, active, found, t_hit, pos_hit, idx_hit = carry
            pos = o + t[:, None] * d
            leaf, feat, delta_t, sigma, valid, idx = _sample(
                spec, features_t, o, d, invdir, t, opt.step_size
            )
            hit_now = jnp.logical_and(active, sigma > opt.sigma_thresh)
            # NOTE: the hit position recorded by the reference is the
            # clamped in-tree sample point transformed back to world space
            # (rt_kernel.cu:756-761); we record the unclamped sample
            # position, identical for points inside the volume.
            t_hit = jnp.where(hit_now, t, t_hit)
            pos_hit = jnp.where(hit_now[:, None], pos, pos_hit)
            idx_hit = jnp.where(hit_now, leaf.data_idx, idx_hit)
            found = jnp.logical_or(found, hit_now)
            t = t + delta_t
            active = jnp.logical_and(
                active, jnp.logical_and(jnp.logical_not(hit_now), t < tmax)
            )
            return step + 1, t, active, found, t_hit, pos_hit, idx_hit

        init = (
            jnp.zeros((), jnp.int32),
            tmin,
            hit,
            jnp.zeros((B,), bool),
            jnp.zeros((B,), dtype),
            jnp.zeros((B, 3), dtype),
            jnp.zeros((B,), jnp.int32),
        )
        _, _, _, found, t_hit, pos_hit, idx_hit = jax.lax.while_loop(
            cond, body, init
        )
        return found, t_hit, pos_hit, idx_hit, delta_scale

    out, _ = _chunked_outputs(single, opt, (origins, dirs))
    return out


def render_depth(spec, features, origins, dirs, opt: RenderOptions):
    """First-hit depth `t * delta_scale`, (B, 1); 0 if no hit
    (rt_kernel.cu:781-834)."""
    found, t_hit, _, _, delta_scale = _first_hit(spec, features, origins, dirs, opt)
    depth = jnp.where(found, t_hit * delta_scale, 0.0)
    return depth[:, None]


def motion_render(
    spec, features, origins, dirs, opt: RenderOptions
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """First-hit skeleton-distance features (rt_kernel.cu:698-778).

    :return: (motion_feature (B, n_joints), depth (B,1),
              hit_point world (B,3), data_idx (B,1) int32)

    ``spec.extra_data`` rows hold joint positions (first 3 columns).
    """
    assert spec.extra_data is not None, "motion_render needs extra_data joints"
    found, t_hit, pos_hit, idx_hit, delta_scale = _first_hit(
        spec, features, origins, dirs, opt
    )
    world = tree2world(pos_hit, spec.offset, spec.scaling)
    world = jnp.where(found[:, None], world, 0.0)
    joints = spec.extra_data[:, :3]  # (J, 3)
    dist = jnp.linalg.norm(world[:, None, :] - joints[None, :, :], axis=-1)
    motion = jnp.where(found[:, None], dist, 0.0)
    depth = jnp.where(found, t_hit * delta_scale, 0.0)[:, None]
    data_idx = jnp.where(found, idx_hit, 0)[:, None]
    return motion, depth, world, data_idx


# ---------------------------------------------------------------------------
# Volumetric LBS motion-feature rendering
# ---------------------------------------------------------------------------


def _mf_blend(spec, joint_features, idx, valid, out_dim):
    """Per-sample LBS blend of joint features (rt_kernel.cu:953-959).

    :return: (B, out_dim) pre-sigmoid blended features.
    """
    sw = spec.skinning_weights[idx]        # (B, n_bones)
    jidx = spec.joint_index[idx]           # (B, n_bones)
    jf = joint_features[jidx][..., :out_dim]  # (B, n_bones, out_dim)
    w = jnp.where(jnp.logical_and(sw > 0, valid[:, None]), sw, 0.0)
    return jnp.einsum("bn,bnk->bk", w, jf, precision=_PREC)


def _motion_feature_fwd_impl(spec, joint_features, features, origins, dirs, opt):
    out_dim = joint_features.shape[1]
    features_t = _pack_features(features)

    def single(origins_, dirs_):
        B = origins_.shape[0]
        dtype = origins_.dtype
        o, d, invdir, delta_scale, tmin, tmax, hit = _ray_setup(
            spec, origins_, dirs_
        )

        def cond(carry):
            step, t, L, out, active, stopped = carry
            return jnp.logical_and(step < opt.max_steps, jnp.any(active))

        def body(carry):
            step, t, L, out, active, stopped = carry
            leaf, feat, delta_t, sigma, valid, idx = _sample(
                spec, features_t, o, d, invdir, t, opt.step_size
            )
            contrib = jnp.logical_and(active, sigma > opt.sigma_thresh)
            att = jnp.exp(-delta_t * delta_scale * sigma)
            weight = L * (1.0 - att)
            blended = _mf_blend(spec, joint_features, idx, valid, out_dim)
            s = jax.nn.sigmoid(blended)
            out = out + jnp.where(contrib[:, None], weight[:, None] * s, 0.0)
            newL = jnp.where(contrib, L * att, L)
            stop_now = jnp.logical_and(contrib, newL <= opt.stop_thresh)
            scale = 1.0 / (1.0 - newL)
            out = jnp.where(stop_now[:, None], out * scale[:, None], out)
            stopped = jnp.logical_or(stopped, stop_now)
            t = t + delta_t
            active = jnp.logical_and(
                active, jnp.logical_and(jnp.logical_not(stop_now), t < tmax)
            )
            return step + 1, t, newL, out, active, stopped

        init = (
            jnp.zeros((), jnp.int32),
            tmin,
            jnp.ones((B,), dtype),
            jnp.zeros((B, out_dim), dtype),
            hit,
            jnp.zeros((B,), bool),
        )
        _, _, L, out, _, stopped = jax.lax.while_loop(cond, body, init)
        bg = opt.background_brightness
        # Miss rays output zeros (NOT background) — rt_kernel.cu:912-918.
        out = jnp.where(
            hit[:, None],
            jnp.where(stopped[:, None], out, out + (L * bg)[:, None]),
            0.0,
        )
        return out

    out, _ = _chunked_outputs(single, opt, (origins, dirs))
    return out


def _motion_feature_bwd_impl(spec, joint_features, features, origins, dirs, grad_out, opt):
    """Single re-march scattering grads into joint_features rows via
    skinning weights. This is the *corrected* version of
    rt_kernel.cu:982-1065 (the reference reads an uninitialized buffer and
    scatters with a wrong index; SURVEY.md K14)."""
    J, K = joint_features.shape
    features_t = _pack_features(features)

    def single(origins_, dirs_, grad_out_, grad_jf):
        B = origins_.shape[0]
        dtype = origins_.dtype
        o, d, invdir, delta_scale, tmin, tmax, hit = _ray_setup(
            spec, origins_, dirs_
        )

        def cond(carry):
            step, t, L, gjf = carry
            return jnp.logical_and(
                step < opt.max_steps, jnp.any(jnp.logical_and(hit, t < tmax))
            )

        def body(carry):
            step, t, L, gjf = carry
            active = jnp.logical_and(hit, t < tmax)
            leaf, feat, delta_t, sigma, valid, idx = _sample(
                spec, features_t, o, d, invdir, t, opt.step_size
            )
            contrib = jnp.logical_and(active, sigma > 0.0)
            att = jnp.exp(-delta_t * sigma * delta_scale)
            weight = L * (1.0 - att)

            blended = _mf_blend(spec, joint_features, idx, valid, K)
            s = jax.nn.sigmoid(blended)
            g_blend = weight[:, None] * s * (1.0 - s) * grad_out_  # (B, K)

            sw = spec.skinning_weights[idx]
            jidx = spec.joint_index[idx]
            bone_ok = jnp.logical_and(sw > 0, contrib[:, None])
            rows = jnp.where(
                bone_ok[:, :, None], sw[:, :, None] * g_blend[:, None, :], 0.0
            )
            scat = jnp.where(bone_ok, jidx, J).reshape(-1)
            gjf = gjf.at[scat].add(rows.reshape(-1, K), mode="drop")

            L = jnp.where(contrib, L * att, L)
            return step + 1, t + delta_t, L, gjf

        init = (jnp.zeros((), jnp.int32), tmin, jnp.ones((B,), dtype), grad_jf)
        _, _, _, grad_jf = jax.lax.while_loop(cond, body, init)
        return grad_jf

    return _chunked_carry(
        single,
        opt,
        (origins, dirs, grad_out),
        jnp.zeros((J, K), origins.dtype),
        fills=(1e9, 1.0, 0.0),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def motion_feature_render(spec, joint_features, features, origins, dirs, opt):
    """Volumetric LBS-feature render, differentiable wrt `joint_features`
    (parity: renderer.py:384-396 → rt_kernel.cu:885-1107).

    :return: (B, joint_feature_dim)
    """
    return _motion_feature_fwd_impl(spec, joint_features, features, origins, dirs, opt)


def _mf_fwd(spec, joint_features, features, origins, dirs, opt):
    out = _motion_feature_fwd_impl(spec, joint_features, features, origins, dirs, opt)
    return out, (spec, joint_features, features, origins, dirs)


def _mf_bwd(opt, res, g):
    spec, joint_features, features, origins, dirs = res
    grad_jf = _motion_feature_bwd_impl(
        spec, joint_features, features, origins, dirs, g, opt
    )
    return (
        _zero_cotangent(spec),
        grad_jf,
        jnp.zeros_like(features),
        jnp.zeros_like(origins),
        jnp.zeros_like(dirs),
    )


motion_feature_render.defvjp(_mf_fwd, _mf_bwd)
