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
    mathematically correct scatter FOR stop_thresh == 0: like the
    reference backward (rt_kernel.cu:1015-1065 marches to tmax with no
    stop handling), it ignores early termination, so under fast options
    (stop_thresh > 0) the grads omit the forward's 1/(1-L_stop)
    renormalization and post-stop truncation. Train with exact options.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.spec import RenderOptions, TreeSpec
from .render import (_chunked_carry, _chunked_outputs, _clip_to_occupied,
                     _scatter_to_local,
                     _march_round, _round_sigma,
                     _pool_view, _pvary_like, _ray_setup,
                     _scatter_add_compact, _volume_render_fwd_impl,
                     _zero_cotangent, apply_bwd_sizing)
from .sh import _PREC
from .traversal import tree2world


# ---------------------------------------------------------------------------
# Opacity
# ---------------------------------------------------------------------------


def _opacity_fwd_impl(spec, features, origins, dirs, opt):
    """Alpha-only march. The main renderer's alpha channel has exactly
    the opacity semantics (1 - transmittance, early-stop pinning, miss
    rays -> 0), so the forward reuses the round-based march wholesale —
    the color math it also computes is a small fraction of a round."""
    out, _ = _volume_render_fwd_impl(
        spec, features, origins, dirs, dirs, opt, False
    )
    return out[:, -1:]


def _opacity_bwd_impl(spec, features, origins, dirs, grad_out, opt,
                      out_res=None):
    """Clean sigma-only VJP: grad_sigma_i = delta_t * delta_scale * g *
    L_ray, where L_ray is the final transmittance over samples with
    sigma > 0 (equivalent to both reference backward paths; see module
    docstring). Round-based march; in exact mode L_ray comes from the
    saved forward output (1 - alpha) and the re-march count drops to one.
    Gradient rows scatter through the tiered compact scatter."""
    opt = apply_bwd_sizing(opt)
    Mloc, D = features.shape  # this device's rows (== global unsharded)
    features_t = _pool_view(features, opt, spec)
    M = features_t.M  # GLOBAL valid-row bound
    K = max(1, opt.round_size)

    def _to_local(sidx):
        return _scatter_to_local(sidx, features_t, Mloc, opt)
    single_pass = (
        opt.sigma_thresh == 0.0 and opt.stop_thresh <= 0.0
        and out_res is not None
    )

    def single(origins_, dirs_, grad_out_, out_res_, grad_s):
        B = origins_.shape[0]
        dtype = origins_.dtype
        o, d, invdir, delta_scale, tmin, tmax, hit = _ray_setup(
            spec, origins_, dirs_
        )
        tmin, tmax, hit = _clip_to_occupied(
            spec, o, invdir, tmin, tmax, hit, opt.interp, opt.box_advance
        )
        oxyz = (o[:, 0], o[:, 1], o[:, 2])
        dxyz = (d[:, 0], d[:, 1], d[:, 2])
        ivxyz = (invdir[:, 0], invdir[:, 1], invdir[:, 2])
        g = grad_out_[:, 0]

        def march(step0, t):
            active = jnp.logical_and(hit, t < tmax)
            idx, dt, valid, _, t_at, cube, t_end, _ = _march_round(
                spec, opt, oxyz, dxyz, ivxyz, tmax, step0, t, active
            )
            # Interp mode mirrors the forward: interpolated sigma gates
            # the contribution; gradients flow to the 8 corner cells.
            _, sigma, corners = _round_sigma(
                spec, features_t, opt, oxyz, dxyz, t_at, cube, idx, dtype
            )
            gi_flat = (jnp.where(idx < M, idx, 0) if M else idx).reshape(-1)
            contrib = jnp.logical_and(valid, sigma > 0.0)
            return idx, dt, contrib, sigma, gi_flat, corners, t_end

        def cond(carry):
            step0, t = carry[0], carry[1]
            return jnp.logical_and(
                step0 < opt.max_steps,
                jnp.any(jnp.logical_and(hit, t < tmax)),
            )

        if single_pass:
            L_ray = 1.0 - out_res_[:, 0]
        else:
            # Pass A: final transmittance under the backward's sigma > 0
            # rule.
            def bodyA(carry):
                step0, t, L = carry
                idx, dt, contrib, sigma, _, _, t_end = march(step0, t)
                att_eff = jnp.where(
                    contrib, jnp.exp(-dt * delta_scale[None] * sigma), 1.0
                )
                return step0 + K, t_end, L * jnp.prod(att_eff, axis=0)

            _, _, L_ray = jax.lax.while_loop(
                cond, bodyA,
                (jnp.zeros((), jnp.int32), tmin,
                 _pvary_like(jnp.ones((B,), dtype), origins_)),
            )

        # Pass B: scatter sigma grads (g_sigma has no per-sample feature
        # dependence beyond the contribution gate).
        def bodyB(carry):
            step0, t, gs = carry
            idx, dt, contrib, sigma, gi_flat, corners, t_end = march(step0, t)
            g_sigma = dt * delta_scale[None] * (g * L_ray)[None]
            vals = jnp.where(contrib, g_sigma, 0.0).reshape(-1)
            if corners is None:
                sidx = jnp.where(contrib.reshape(-1), gi_flat, M)
                gs = _scatter_add_compact(gs, _to_local(sidx), vals, Mloc)
            else:
                cf = contrib.reshape(-1)
                sidxs, vs = [], []
                for idx_c, w in corners:
                    icf = idx_c.reshape(-1)
                    ok = jnp.logical_and(cf, icf < M)
                    sidxs.append(jnp.where(ok, icf, M))
                    vs.append(w.reshape(-1) * vals)
                gs = _scatter_add_compact(
                    gs, _to_local(jnp.concatenate(sidxs)),
                    jnp.concatenate(vs), Mloc
                )
            return step0 + K, t_end, gs

        _, _, grad_s = jax.lax.while_loop(
            cond, bodyB, (jnp.zeros((), jnp.int32), tmin, grad_s)
        )
        return grad_s

    if out_res is None:
        out_res = jnp.zeros_like(grad_out)
    grad_s = _chunked_carry(
        single,
        opt,
        (origins, dirs, grad_out, out_res),
        _pvary_like(jnp.zeros((Mloc,), origins.dtype), origins,
                    features_t.table),
        fills=(1e9, 1.0, 0.0, 0.0),
    )
    if opt.ray_axis is not None:
        grad_s = jax.lax.psum(grad_s, opt.ray_axis)  # see render._cast
    # Cotangent must match the primal dtype (bf16 pools composite and
    # differentiate in f32; see render._cast) — custom_vjp rejects a
    # mismatched bwd output.
    grad_f = jnp.zeros((Mloc, D), origins.dtype)
    return grad_f.at[:, D - 1].set(grad_s).astype(features.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def opacity_render(spec, features, origins, dirs, opt: RenderOptions):
    """Alpha-only march, (B, 1) = 1 - transmittance (rt_kernel.cu:499-560)."""
    return _opacity_fwd_impl(spec, features, origins, dirs, opt)


def _op_fwd(spec, features, origins, dirs, opt):
    out = _opacity_fwd_impl(spec, features, origins, dirs, opt)
    return out, (spec, features, origins, dirs, out)


def _op_bwd(opt, res, g):
    spec, features, origins, dirs, out = res
    from .render import QuantizedFeatures
    if isinstance(features, QuantizedFeatures):
        grad_features = _zero_cotangent(features)
    else:
        grad_features = _opacity_bwd_impl(
            spec, features, origins, dirs, g, opt, out_res=out
        )
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
    pos_tree (B,3), data_idx (B,), delta_scale (B,)).

    Under interp, t_hit is recorded at the FIRST over-threshold sample
    (which may be boundary skin in an empty leaf — where the main
    renderer's alpha registers the surface) while data_idx comes from
    the first over-threshold RESIDENT sample; `found` requires the
    latter. The two notions coincide in nearest mode — EXCEPT for the
    pathological sigma_thresh < 0, where empty-leaf sigma (masked to 0)
    also exceeds the threshold: the reference then 'hits' the very
    first sample of the march (rt_kernel.cu:829-836) while this pass
    keeps requiring a resident leaf for `found`/data_idx (a sentinel
    data_idx would index per-point tables out of range). Deliberate
    divergence; thresholds are expected >= 0.

    Round-based: per round, the first contributing sample per ray is
    selected with a prefix mask (hit position recomputed from t_hit
    after the loop — pos = o + t*d exactly)."""
    features_t = _pool_view(features, opt, spec)
    M = features_t.M
    K = max(1, opt.round_size)

    def single(origins_, dirs_):
        B = origins_.shape[0]
        dtype = origins_.dtype
        o, d, invdir, delta_scale, tmin, tmax, hit = _ray_setup(
            spec, origins_, dirs_
        )
        tmin, tmax, hit = _clip_to_occupied(
            spec, o, invdir, tmin, tmax, hit, opt.interp, opt.box_advance
        )
        oxyz = (o[:, 0], o[:, 1], o[:, 2])
        dxyz = (d[:, 0], d[:, 1], d[:, 2])
        ivxyz = (invdir[:, 0], invdir[:, 1], invdir[:, 2])

        def cond(carry):
            step0 = carry[0]
            active = carry[2]
            return jnp.logical_and(step0 < opt.max_steps, jnp.any(active))

        def body(carry):
            step0, t, active, found_t, found_i, t_hit, idx_hit = carry
            idx, dt, valid, _, t_at, cube, t_end, act_end = _march_round(
                spec, opt, oxyz, dxyz, ivxyz, tmax, step0, t, active,
                want_pos=True,
            )
            # Trilinear density gates the hit in interp mode, mirroring
            # the main renderer's interp semantics.
            _, sigma, _ = _round_sigma(
                spec, features_t, opt, oxyz, dxyz, t_at, cube, idx, dtype
            )
            # Two hit notions that coincide in nearest mode (empty-leaf
            # sigma is masked to 0) but split under interp:
            #   * `over` — first sample whose trilinear sigma exceeds the
            #     threshold. Under interp that can sit in an EMPTY
            #     boundary leaf (density bleeding from occupied corners):
            #     this is where the main renderer's alpha registers the
            #     visible surface, so t_hit records it.
            #   * `resident` — first such sample in a RESIDENT leaf
            #     (idx < M): supplies data_idx, since consumers index
            #     per-point tables with it and the empty sentinel
            #     (>= n_features) would read garbage.
            over = jnp.logical_and(valid, sigma > opt.sigma_thresh)
            resident = jnp.logical_and(over, idx < M)
            first_t = jnp.logical_and(
                over, (jnp.cumsum(over, axis=0) - over) == 0
            )
            any_t = jnp.any(first_t, axis=0)
            t_sel = jnp.sum(jnp.where(first_t, t_at, 0.0), axis=0)
            newly_t = jnp.logical_and(any_t, jnp.logical_not(found_t))
            t_hit = jnp.where(newly_t, t_sel, t_hit)
            found_t = jnp.logical_or(found_t, any_t)
            first_i = jnp.logical_and(
                resident, (jnp.cumsum(resident, axis=0) - resident) == 0
            )
            any_i = jnp.any(first_i, axis=0)
            i_sel = jnp.sum(jnp.where(first_i, idx, 0), axis=0)
            newly_i = jnp.logical_and(any_i, jnp.logical_not(found_i))
            idx_hit = jnp.where(newly_i, i_sel, idx_hit)
            found_i = jnp.logical_or(found_i, any_i)
            # March until the resident sample is found: a ray that only
            # ever grazes boundary skin (found_t without found_i by
            # march end) counts as a miss — no per-point row exists to
            # report for it.
            active = jnp.logical_and(act_end, jnp.logical_not(found_i))
            return step0 + K, t_end, active, found_t, found_i, t_hit, idx_hit

        init = (
            jnp.zeros((), jnp.int32),
            tmin,
            hit,
            _pvary_like(jnp.zeros((B,), bool), origins_),
            _pvary_like(jnp.zeros((B,), bool), origins_),
            _pvary_like(jnp.zeros((B,), dtype), origins_),
            _pvary_like(jnp.zeros((B,), jnp.int32), origins_),
        )
        _, _, _, _, found, t_hit, idx_hit = jax.lax.while_loop(
            cond, body, init
        )
        # NOTE (deliberate divergence, like K14): the reference's
        # query_single_from_root destructively rewrites `pos` to the
        # in-leaf FRACTIONAL coordinate (common.cuh:77-87) before
        # rt_kernel.cu:756-774 world-transforms it, so the reference's
        # hit_point (and the joint distances derived from it) are
        # computed from leaf-local fractions, not the sample point.
        # We record the actual in-tree sample position — the sensible
        # semantics — so outputs systematically differ from the CUDA
        # build on hit rays.
        pos_hit = jnp.where(
            found[:, None], o + t_hit[:, None] * d, 0.0
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

    ``opt.compat_hit_point`` reproduces the reference's leaf-local-
    fraction hit point (common.cuh:77-87 destructively rewrites `pos`
    before the world transform at rt_kernel.cu:756-774) — off by
    default; see RenderOptions.compat_hit_point.
    """
    assert spec.extra_data is not None, "motion_render needs extra_data joints"
    found, t_hit, pos_hit, idx_hit, delta_scale = _first_hit(
        spec, features, origins, dirs, opt
    )
    if opt.compat_hit_point:
        # One extra structure lookup at the hit positions recovers the
        # in-leaf fraction the reference feeds its world transform.
        from .bake import BakedTree
        from .bake import lookup as _baked_lookup
        from .traversal import descend

        if isinstance(spec, BakedTree):
            _, _, frac, _ = _baked_lookup(spec, pos_hit)
        else:
            frac = descend(spec, pos_hit).frac
        pos_hit = jnp.where(found[:, None], frac, 0.0)
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

    :return: (blended (B, out_dim) pre-sigmoid, sw (B, n_bones),
              jidx (B, n_bones)) — the per-sample skinning tables are
    returned so callers in march loops never gather them twice.
    """
    sw = spec.skinning_weights[idx]        # (B, n_bones)
    jidx = spec.joint_index[idx]           # (B, n_bones)
    jf = joint_features[jidx][..., :out_dim]  # (B, n_bones, out_dim)
    w = jnp.where(jnp.logical_and(sw > 0, valid[:, None]), sw, 0.0)
    return jnp.einsum("bn,bnk->bk", w, jf, precision=_PREC), sw, jidx


def _motion_feature_fwd_impl(spec, joint_features, features, origins, dirs, opt):
    out_dim = joint_features.shape[1]
    features_t = _pool_view(features, opt, spec)
    M = features_t.M
    K = max(1, opt.round_size)
    can_stop = opt.stop_thresh > 0.0

    def single(origins_, dirs_):
        B = origins_.shape[0]
        dtype = origins_.dtype
        o, d, invdir, delta_scale, tmin, tmax, hit = _ray_setup(
            spec, origins_, dirs_
        )
        # Clamps only — `hit` must stay the CUBE test here: this pass
        # outputs ZERO for cube misses but BACKGROUND for cube-hit rays
        # whose march contributes nothing (rt_kernel.cu:912-918), so a
        # ray that misses the occupied AABB may not be reclassified as a
        # miss (it marches zero-to-few provably empty samples and
        # composes bg — exactly the uncull'd result).
        tmin, tmax, _hit_box = _clip_to_occupied(
            spec, o, invdir, tmin, tmax, hit, opt.interp, opt.box_advance
        )
        oxyz = (o[:, 0], o[:, 1], o[:, 2])
        dxyz = (d[:, 0], d[:, 1], d[:, 2])
        ivxyz = (invdir[:, 0], invdir[:, 1], invdir[:, 2])

        def cond(carry):
            step0 = carry[0]
            active = carry[4]
            return jnp.logical_and(step0 < opt.max_steps, jnp.any(active))

        def body(carry):
            step0, t, L, out, active, stopped = carry
            idx, dt, valid, _, t_at, cube, t_end, act_end = _march_round(
                spec, opt, oxyz, dxyz, ivxyz, tmax, step0, t, active
            )
            # Interp: trilinear density (main-renderer semantics); the
            # LBS blend stays nearest-leaf — skinning rows are per-point
            # attributes (rt_kernel.cu:937-938 gathers them per leaf).
            _, sigma, _ = _round_sigma(
                spec, features_t, opt, oxyz, dxyz, t_at, cube, idx, dtype
            )
            gi_flat = (jnp.where(idx < M, idx, 0) if M else idx).reshape(-1)
            # Attenuation follows the MAIN renderer's chain (valid &
            # sigma > thresh — under interp the boundary skin extincts
            # light exactly as volume_render's alpha does). The feature
            # CONTRIBUTION additionally requires a RESIDENT leaf
            # (idx < M): the LBS tables are per-point, so an
            # empty-boundary sample has no data to blend — without the
            # gate it would composite a phantom sigmoid(0) = 0.5. Both
            # gates coincide in nearest mode (empty-leaf sigma is
            # already masked to 0).
            # PARITY-CRITICAL duplicate of the render.py phase-2
            # compositing chain (att/cumprod/stop_first/renorm), with
            # only the resident gate added. Any change to the stop
            # semantics there MUST be mirrored here and in the two
            # backward chains (_opacity_bwd_impl, _motion_feature_bwd) —
            # the cross-pass equality tests are the tripwire.
            att_gate = jnp.logical_and(valid, sigma > opt.sigma_thresh)
            contrib0 = jnp.logical_and(att_gate, idx < M)
            att = jnp.exp(-dt * delta_scale[None] * sigma)
            att_eff = jnp.where(att_gate, att, 1.0)
            cp = jnp.cumprod(att_eff, axis=0)
            L_after = L[None] * cp
            if can_stop:
                stop0 = jnp.logical_and(att_gate, L_after <= opt.stop_thresh)
                before = (jnp.cumsum(stop0, axis=0) - stop0) == 0
                contrib = jnp.logical_and(contrib0, before)
                stop_first = jnp.logical_and(stop0, before)
            else:
                contrib = contrib0
            L_before = L[None] * jnp.concatenate(
                [jnp.ones((1, B), dtype), cp[:-1]], axis=0
            )
            weight = jnp.where(contrib, L_before * (1.0 - att), 0.0)

            blended, _, _ = _mf_blend(
                spec, joint_features, gi_flat, (idx < M).reshape(-1), out_dim
            )
            s = jax.nn.sigmoid(blended).reshape(K, B, out_dim)
            out = out + jnp.sum(weight[:, :, None] * s, axis=0)

            active = act_end
            if can_stop:
                stop_any = jnp.any(stop_first, axis=0)
                L_stop = jnp.sum(jnp.where(stop_first, L_after, 0.0), axis=0)
                newL = jnp.where(stop_any, L_stop, L * cp[-1])
                scale = 1.0 / (1.0 - L_stop)
                out = jnp.where(stop_any[:, None], out * scale[:, None], out)
                stopped = jnp.logical_or(stopped, stop_any)
                active = jnp.logical_and(active, jnp.logical_not(stop_any))
            else:
                newL = L * cp[-1]
            return step0 + K, t_end, newL, out, active, stopped

        init = (
            jnp.zeros((), jnp.int32),
            tmin,
            _pvary_like(jnp.ones((B,), dtype), origins_),
            _pvary_like(jnp.zeros((B, out_dim), dtype), origins_),
            hit,
            _pvary_like(
                jnp.zeros((B,), bool) if can_stop else jnp.zeros((1,), bool),
                origins_,
            ),
        )
        _, _, L, out, _, stopped = jax.lax.while_loop(cond, body, init)
        bg = opt.background_brightness
        # Miss rays output zeros (NOT background) — rt_kernel.cu:912-918.
        if can_stop:
            out = jnp.where(
                hit[:, None],
                jnp.where(stopped[:, None], out, out + (L * bg)[:, None]),
                0.0,
            )
        else:
            out = jnp.where(hit[:, None], out + (L * bg)[:, None], 0.0)
        return out

    out, _ = _chunked_outputs(single, opt, (origins, dirs))
    return out


def _motion_feature_bwd_impl(spec, joint_features, features, origins, dirs, grad_out, opt):
    """Single re-march scattering grads into joint_features rows via
    skinning weights. This is the *corrected* version of
    rt_kernel.cu:982-1065 (the reference reads an uninitialized buffer and
    scatters with a wrong index; SURVEY.md K14). Round-based: one tiered
    compact scatter of (sample x bone) rows per round."""
    opt = apply_bwd_sizing(opt)
    J, Kd = joint_features.shape
    features_t = _pool_view(features, opt, spec)
    M = features_t.M
    K = max(1, opt.round_size)

    def single(origins_, dirs_, grad_out_, grad_jf):
        B = origins_.shape[0]
        dtype = origins_.dtype
        o, d, invdir, delta_scale, tmin, tmax, hit = _ray_setup(
            spec, origins_, dirs_
        )
        # Clamps only (see the forward): hit stays the cube test.
        tmin, tmax, _hit_box = _clip_to_occupied(
            spec, o, invdir, tmin, tmax, hit, opt.interp, opt.box_advance
        )
        oxyz = (o[:, 0], o[:, 1], o[:, 2])
        dxyz = (d[:, 0], d[:, 1], d[:, 2])
        ivxyz = (invdir[:, 0], invdir[:, 1], invdir[:, 2])

        def cond(carry):
            step0, t = carry[0], carry[1]
            return jnp.logical_and(
                step0 < opt.max_steps,
                jnp.any(jnp.logical_and(hit, t < tmax)),
            )

        def body(carry):
            step0, t, L, gjf = carry
            active = jnp.logical_and(hit, t < tmax)
            idx, dt, valid, _, t_at, cube, t_end, _ = _march_round(
                spec, opt, oxyz, dxyz, ivxyz, tmax, step0, t, active
            )
            _, sigma, _ = _round_sigma(
                spec, features_t, opt, oxyz, dxyz, t_at, cube, idx, dtype
            )
            gi_flat = (jnp.where(idx < M, idx, 0) if M else idx).reshape(-1)
            # Mirror the forward's split gates (see
            # _motion_feature_fwd_impl): the attenuation chain includes
            # empty-boundary interp samples, but they have no per-point
            # LBS data, contribute nothing in the forward, and must
            # receive no gradient rows here. (sigma > 0 rather than
            # sigma_thresh, and NO early-stop handling — both are the
            # reference backward's conventions (rt_kernel.cu:1015-1065);
            # exact for stop_thresh == 0, approximate under fast
            # options. See the module docstring.)
            att_gate = jnp.logical_and(valid, sigma > 0.0)
            contrib = jnp.logical_and(att_gate, idx < M)
            att = jnp.exp(-dt * sigma * delta_scale[None])
            att_eff = jnp.where(att_gate, att, 1.0)
            cp = jnp.cumprod(att_eff, axis=0)
            L_before = L[None] * jnp.concatenate(
                [jnp.ones((1, B), dtype), cp[:-1]], axis=0
            )
            weight = L_before * (1.0 - att)

            blended, sw, jidx = _mf_blend(
                spec, joint_features, gi_flat, (idx < M).reshape(-1), Kd
            )
            s = jax.nn.sigmoid(blended)  # (K*B, Kd)
            g_blend = (
                weight.reshape(-1)[:, None] * s * (1.0 - s)
                * jnp.tile(grad_out_, (K, 1))
            )
            bone_ok = jnp.logical_and(sw > 0, contrib.reshape(-1)[:, None])
            rows = (sw[:, :, None] * g_blend[:, None, :]).reshape(-1, Kd)
            scat = jnp.where(bone_ok, jidx, J).reshape(-1)
            gjf = _scatter_add_compact(gjf, scat, rows, J)
            return step0 + K, t_end, L * cp[-1], gjf

        init = (
            jnp.zeros((), jnp.int32), tmin,
            _pvary_like(jnp.ones((B,), dtype), origins_), grad_jf,
        )
        _, _, _, grad_jf = jax.lax.while_loop(cond, body, init)
        return grad_jf

    gjf = _chunked_carry(
        single,
        opt,
        (origins, dirs, grad_out),
        _pvary_like(jnp.zeros((J, Kd), origins.dtype), origins),
        fills=(1e9, 1.0, 0.0),
    )
    if opt.ray_axis is not None:
        gjf = jax.lax.psum(gjf, opt.ray_axis)  # see render._cast
    # Cotangent dtype must match the joint_features primal (see the
    # opacity backward's cast).
    return gjf.astype(joint_features.dtype)


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
        _zero_cotangent(features),
        jnp.zeros_like(origins),
        jnp.zeros_like(dirs),
    )


motion_feature_render.defvjp(_mf_fwd, _mf_bwd)
