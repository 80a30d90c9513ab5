#!/usr/bin/env python
"""Probe: cost-sorted ray scheduling.

Chunk-straggler waste exists because image-tile chunks mix cheap and
expensive rays (sum of chunk maxima 1022 vs ideal 572 rounds on the
fast shell; 360 vs 191 opaque — probe_twophase.py). Reordering rays by
a precomputed per-ray cost makes chunks cost-homogeneous, so every
chunk's while-loop exits near its mean — the schedule is computed ONCE
per (camera, structure) outside the render dispatch, like the existing
tile permutation, and per-ray outputs are order-independent (bit-exact).

Measures sustained fwd ms for tile order vs cost order in exact / fast /
opaque-fast, plus the one-time cost of the structure-only pre-march and
host argsort.
"""
import dataclasses, functools, json, os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import jax, jax.numpy as jnp, numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import svox_t_tpu as st
from benchmarks.scenes import build_shell_tree, build_opaque_tree, orbit_camera
from benchmarks.probe_twophase_run import sustained_ms, W, H
from svox_t_tpu.models.renderer import _tile_perm
from svox_t_tpu.ops.render import (cam2world_rays, _ray_setup,
                                   _clip_to_occupied, _lookup_leaf_xyz)

K = 4
C = 1024


@functools.partial(jax.jit, static_argnames=("skip_base", "stop_at_hit", "M"))
def steps_per_ray(spec, o_in, d_in, skip_base, stop_at_hit, M):
    o, d, invdir, dscale, tmin, tmax, hit = _ray_setup(spec, o_in, d_in)
    tmin, tmax, hit = _clip_to_occupied(spec, o, invdir, tmin, tmax, hit, 0, 1)
    oxyz = (o[:, 0], o[:, 1], o[:, 2])
    dxyz = (d[:, 0], d[:, 1], d[:, 2])
    ivxyz = (invdir[:, 0], invdir[:, 1], invdir[:, 2])

    def body(carry):
        t, act, n, nocc = carry
        didx, dt, _, _ = _lookup_leaf_xyz(
            spec, oxyz, dxyz, ivxyz, t, 1e-3, skip_base)
        occ = jnp.logical_and(act, didx < M)
        nocc2 = nocc + occ.astype(jnp.int32)
        t2 = jnp.where(act, t + dt, t)
        n2 = n + act.astype(jnp.int32)
        act2 = jnp.logical_and(act, t2 < tmax)
        if stop_at_hit:
            act2 = jnp.logical_and(act2, nocc2 < 3)
        return t2, act2, n2, nocc2

    t0 = jnp.where(hit, tmin, jnp.inf)
    act0 = jnp.logical_and(hit, t0 < tmax)
    z = jnp.zeros_like(t0, dtype=jnp.int32)
    _, _, n, _ = jax.lax.while_loop(
        lambda c: jnp.logical_and(jnp.any(c[1]), jnp.max(c[2]) < 1024),
        body, (t0, act0, z, z))
    return n


def main():
    c2w = orbit_camera()
    origins0, dirs0 = cam2world_rays(c2w, W, H, fx=W * 1.1, fy=W * 1.1)
    perm, _ = _tile_perm(W, H, 32)
    origins0, dirs0 = origins0[perm], dirs0[perm]
    n_rays = origins0.shape[0]

    tree, feats = build_shell_tree(depth=7, data_format="SH9", data_dim=28)
    baked = tree._baked_spec()
    otree, ofeats = build_opaque_tree(depth=7, data_format="SH9", data_dim=28)
    obaked = otree._baked_spec()
    r = st.VolumeRenderer(tree, step_size=1e-3)

    res = {}
    for mode, sp, ft, fast, stop in (
        ("exact", baked, feats, False, False),
        ("fast", baked, feats, True, False),
        ("opaque_fast", obaked, ofeats, True, True),
    ):
        opt = r._get_options(fast)
        t0 = time.time()
        n = np.asarray(steps_per_ray(
            sp, origins0, dirs0, int(sp.skip_base) if fast else 0, stop,
            int(ft.shape[0] if hasattr(ft, "shape") else ft.q.shape[0])))
        cost_ms = (time.time() - t0) * 1e3
        t0 = time.time()
        order = np.argsort(n, kind="stable")
        sort_ms = (time.time() - t0) * 1e3
        o_s, d_s = origins0[order], dirs0[order]
        rounds_tile = int(np.ceil(
            np.ceil(n / K).reshape(-1, C).max(axis=1)).sum())
        rounds_sorted = int(np.ceil(
            np.ceil(n[order] / K).reshape(-1, C).max(axis=1)).sum())
        ms_tile = sustained_ms(sp, ft, origins0, dirs0, opt)
        ms_sorted = sustained_ms(sp, ft, o_s, d_s, opt)
        res[mode] = {
            "ms_tile": round(ms_tile, 1), "ms_sorted": round(ms_sorted, 1),
            "mrays_tile": round(n_rays / ms_tile / 1e3, 2),
            "mrays_sorted": round(n_rays / ms_sorted / 1e3, 2),
            "rounds_tile": rounds_tile, "rounds_sorted": rounds_sorted,
            "plan_premarch_ms": round(cost_ms, 1),
            "plan_sort_ms": round(sort_ms, 1),
        }
        print(json.dumps({mode: res[mode]}), file=sys.stderr, flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
