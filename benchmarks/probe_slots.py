#!/usr/bin/env python
"""Probe: fast-mode slot statistics on the headline/opaque scenes.

Counts, per ray, the structure-march steps actually taken (terminating
at the occupied-box tmax clamp and, opaque proxy, at the first occupied
sample + margin), with and without skip-box decode. The per-chunk
round count (max steps in the 1024-ray chunk / K, summed over chunks)
is the quantity the while-march's runtime is proportional to — this
separates "skip boxes aren't skipping" from "chunk stragglers burn the
rounds" when deciding the next fast-mode move.
"""
import functools, json, os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import jax, jax.numpy as jnp, numpy as np

def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import svox_t_tpu as st
    from benchmarks.scenes import build_shell_tree, build_opaque_tree, orbit_camera
    from svox_t_tpu.models.renderer import _tile_perm
    from svox_t_tpu.ops.render import (
        cam2world_rays, _ray_setup, _clip_to_occupied, _lookup_leaf_xyz)

    W = H = 800
    K = 4
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
            body, (t0, act0, z.astype(bool) | act0, z, ) [0:2] + (z, z))
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
        for tag, sb in [("noskip", 0), ("skip", int(baked.skip_base))]:
            n, nocc = steps_per_ray(baked, origins, dirs, sb, stop,
                                    int(feats.shape[0]))
            n = np.asarray(n); nocc = np.asarray(nocc)
            chunks = n.reshape(-1, 1024)
            rounds = int(np.ceil(chunks.max(axis=1) / K).sum())
            r = {
                "mean_steps": round(float(n.mean()), 2),
                "p50": int(np.percentile(n, 50)),
                "p95": int(np.percentile(n, 95)),
                "max": int(n.max()),
                "mean_occ": round(float(nocc.mean()), 2),
                "chunk_rounds_total": rounds,
                "slot_waste": round(float(
                    (np.ceil(chunks.max(axis=1) / K) * K * 1024).sum()
                    / max(n.sum(), 1)), 2),
            }
            res[f"{scene}_{tag}"] = r
            print(json.dumps({f"{scene}_{tag}": r}), file=sys.stderr, flush=True)
    print(json.dumps(res))

if __name__ == "__main__":
    main()
