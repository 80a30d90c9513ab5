"""Precomputed ray schedules — cost-ordered chunking.

The march processes rays in fixed chunks whose while-loop exits when the
chunk's SLOWEST ray finishes, so mixed-cost chunks burn straggler
rounds: on the 800^2 headline scenes the sum of chunk round-maxima runs
1.6-1.9x above the per-ray ideal even with tile-coherent ordering
(benchmarks/probe_twophase.py). Reordering rays by a precomputed
per-ray cost makes chunks cost-HOMOGENEOUS and recovers nearly the
whole gap — measured sustained: fast 23.2 -> 29.7 Mrays/s, opaque-fast
38.1 -> 45.5, exact 15.9 -> 17.7 (benchmarks/probe_costorder.py).

Contrast with the reference: a CUDA SIMT renderer gets this for free
(warps retire independently; the hardware scheduler backfills); the
TPU-native equivalent is a PRECOMPUTED schedule, amortized across
frames exactly like the bake. Correctness is unaffected by schedule
quality: per-ray outputs are independent of chunk membership, so any
permutation renders bit-identically (only the weight-accumulation
scatter ORDER changes — ~1 ulp). A plan therefore never goes wrong,
only stale: re-plan when the camera or the scene structure changes
enough to matter.

The cost model is the march's own structure walk (no radiometry): steps
to the clipped tmax honoring the options' cull/advance/skip-box flags,
with an occupancy-count proxy for early termination when stop_thresh is
set. One fused pre-march dispatch + one host argsort (~10 ms at 640k).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.spec import RenderOptions

# Early-termination proxy: with stop_thresh set, a ray is assumed to
# retire after this many OCCUPIED samples (opaque scenes retire in 1-3;
# translucent ones march on — underestimating only degrades schedule
# quality, never correctness).
_STOP_OCC = 3


@functools.partial(
    jax.jit,
    static_argnames=("skip_base", "stop_occ", "n_rows", "step_size",
                     "max_steps", "interp", "box_advance"),
)
def march_cost(
    spec,
    origins: jax.Array,
    dirs: jax.Array,
    skip_base: int,
    stop_occ: bool,
    n_rows: int,
    step_size: float,
    max_steps: int,
    interp: int = 0,
    box_advance: int = 0,
) -> jax.Array:
    """Per-ray structure-march step count (B,) int32 — the schedule's
    cost metric. Mirrors the production march's phase-1 walk (same
    lookup, same cull/advance flags) without any radiometry."""
    from .render import _clip_to_occupied, _lookup_leaf_xyz, _ray_setup

    o, d, invdir, _, tmin, tmax, hit = _ray_setup(spec, origins, dirs)
    tmin, tmax, hit = _clip_to_occupied(
        spec, o, invdir, tmin, tmax, hit, interp, box_advance
    )
    oxyz = (o[:, 0], o[:, 1], o[:, 2])
    dxyz = (d[:, 0], d[:, 1], d[:, 2])
    ivxyz = (invdir[:, 0], invdir[:, 1], invdir[:, 2])

    def body(carry):
        t, act, n, nocc = carry
        didx, dt, _, _ = _lookup_leaf_xyz(
            spec, oxyz, dxyz, ivxyz, t, step_size, skip_base
        )
        occ = jnp.logical_and(act, didx < n_rows)
        nocc = nocc + occ.astype(jnp.int32)
        t = jnp.where(act, t + dt, t)
        n = n + act.astype(jnp.int32)
        act = jnp.logical_and(act, t < tmax)
        if stop_occ:
            act = jnp.logical_and(act, nocc < _STOP_OCC)
        return t, act, n, nocc

    t0 = jnp.where(hit, tmin, jnp.inf)
    act0 = jnp.logical_and(hit, t0 < tmax)
    z = jnp.zeros_like(t0, dtype=jnp.int32)
    _, _, n, _ = jax.lax.while_loop(
        lambda c: jnp.logical_and(jnp.any(c[1]), jnp.max(c[2]) < max_steps),
        body,
        (t0, act0, z, z),
    )
    return n


def cost_order(spec, origins, dirs, opt: RenderOptions, n_rows: int):
    """Stable cost-sorted ray permutation (host int32 (B,)).

    Stability preserves the input (e.g. tile-coherent) order within
    equal-cost classes, keeping spatial gather locality."""
    skip_base = int(getattr(spec, "skip_base", 0) or 0) if opt.skip_boxes else 0
    n = np.asarray(
        march_cost(
            spec, origins, dirs, skip_base, opt.stop_thresh > 0.0,
            int(n_rows), float(opt.step_size), int(opt.max_steps),
            int(opt.interp), int(opt.box_advance),
        )
    )
    return np.argsort(n, kind="stable").astype(np.int32)
