#!/usr/bin/env python
"""Probe: would a two-phase straggler march pay?

Plan under test: cap every chunk's while-march at R_A rounds (phase A),
then COMPACT all still-active rays across the whole batch into dense
chunks and finish them (phase B). The t-chain resumes from carried
state, so this is EXACT. The win is bounded by the chunk-straggler slot
waste (~1.6-2x); the cost is one global cumsum + state gather/scatter.

This probe reuses the structure-march step counter from probe_slots and
simulates the schedule host-side for a sweep of R_A: reports phase-A +
phase-B chunk rounds vs the current single-phase rounds, per mode
(exact shell, fast shell, opaque-fast). Compaction order preserves the
tile order (stable), so phase-B chunks keep the measured coherence.

Run on the TPU: python benchmarks/probe_twophase.py
"""
import functools, json, os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import jax, jax.numpy as jnp, numpy as np

K = 4
C = 1024


def two_phase_rounds(n_steps: np.ndarray, r_a: int):
    """Simulate: per-chunk cap r_a, then stable-compact stragglers."""
    r = np.ceil(n_steps / K).astype(np.int64)          # rounds needed/ray
    chunks = r.reshape(-1, C)
    phase_a = np.minimum(chunks.max(axis=1), r_a).sum()
    rem = np.maximum(r - r_a, 0)
    strag = rem[rem > 0]                                # stable order
    n_strag = strag.size
    if n_strag == 0:
        return int(phase_a), 0, 0
    pad = (-n_strag) % C
    strag = np.pad(strag, (0, pad))
    phase_b = strag.reshape(-1, C).max(axis=1).sum()
    return int(phase_a), int(phase_b), int(n_strag)


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import svox_t_tpu as st
    from benchmarks.scenes import build_shell_tree, build_opaque_tree, orbit_camera
    from svox_t_tpu.models.renderer import _tile_perm
    from svox_t_tpu.ops.render import (
        cam2world_rays, _ray_setup, _clip_to_occupied, _lookup_leaf_xyz)

    W = H = 800
    MAXS = 1024

    @functools.partial(jax.jit,
                       static_argnames=("skip_base", "stop_at_hit", "M"))
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
        t, act, n, nocc = jax.lax.while_loop(
            lambda c: jnp.logical_and(jnp.any(c[1]), jnp.max(c[2]) < MAXS),
            body, (t0, act0, z, z))
        return n, nocc

    res = {}
    for scene, builder, stop in [("shell", build_shell_tree, False),
                                 ("opaque", build_opaque_tree, True)]:
        tree, feats = builder(depth=7, data_format="SH9", data_dim=28)
        baked = tree._baked_spec()
        c2w = orbit_camera()
        origins, dirs = cam2world_rays(c2w, W, H, fx=W*1.1, fy=W*1.1)
        perm, _ = _tile_perm(W, H, 32)
        origins, dirs = origins[perm], dirs[perm]
        sb = int(baked.skip_base)
        n, _ = steps_per_ray(baked, origins, dirs, sb, stop,
                             int(feats.shape[0]))
        n = np.asarray(n)
        r = np.ceil(n / K).astype(np.int64)
        base = int(r.reshape(-1, C).max(axis=1).sum())
        ideal = int(np.ceil(r.sum() / C))
        entry = {"base_rounds": base, "ideal_rounds": ideal,
                 "mean_steps": round(float(n.mean()), 2),
                 "p95_steps": int(np.percentile(n, 95)),
                 "max_steps": int(n.max())}
        for r_a in (1, 2, 3, 4, 6, 8):
            pa, pb, ns = two_phase_rounds(n, r_a)
            entry[f"ra{r_a}"] = {
                "rounds": pa + pb, "phase_a": pa, "phase_b": pb,
                "stragglers": ns,
                "speedup_bound": round(base / max(pa + pb, 1), 2),
            }
        res[scene] = entry
        print(json.dumps({scene: entry}), file=sys.stderr, flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
