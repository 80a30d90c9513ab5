#!/usr/bin/env python
"""Probe: cost-plan staleness decay across nearby cameras (verdict #7).

Plans are schedules, never semantics — a stale plan renders
bit-identically, only slower. If the decay with camera angle is slow,
a truly-moving camera can REUSE the nearest plan and re-plan every few
degrees, paying the ~72-93 ms block-plan build once per K frames
instead of per frame.

Measures, on the headline shell scene (800^2, exact march, cost
schedule C=2048):
  1. throughput with a plan built at angular offset dtheta in
     {0, 1, 2, 5, 10, 20 degrees} from the rendered camera, vs the
     plan-free tile order;
  2. a 32-camera orbit swept with reuse-every-K plans (K in {1, 4, 8}),
     total wall time INCLUDING plan builds -> sustained Mrays/s for the
     moving-camera regime.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax

if os.environ.get("PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import svox_t_tpu as st
from benchmarks.scenes import build_shell_tree, orbit_camera
from svox_t_tpu.ops.render import cam2world_rays, volume_render

W = H = 800
N_SUSTAIN = 4


def main():
    tree, feats = build_shell_tree(depth=7, data_format="SH9",
                                   data_dim=28)
    r = st.VolumeRenderer(tree)
    baked = tree._baked_spec()
    opt = r._sched_options(r._get_options(False))
    n_rays = W * H
    print(f"scene ready M={feats.shape[0]}")

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def fwd_sustained(spec, f, o, d, v, opt_):
        def one(i, acc):
            out = volume_render(spec, f * (1.0 + 1e-7 * i), o, d, v,
                                opt_)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, N_SUSTAIN, one, 0.0)

    def rays_at(theta):
        c2w = orbit_camera(theta=theta)
        o, d = cam2world_rays(jnp.asarray(c2w), W, H, W * 1.1, W * 1.1)
        return c2w, o, d

    def bench_perm(o, d, label):
        _ = float(fwd_sustained(baked, feats, o, d, d, opt))
        ts = []
        for i in range(3):
            f_i = feats * (1.0 + 1e-7 * (i + 1))
            _ = float(jnp.sum(f_i))
            t0 = time.time()
            _ = float(fwd_sustained(baked, f_i, o, d, d, opt))
            ts.append(time.time() - t0)
        s = min(ts) / N_SUSTAIN
        print(f"  {label}: {s*1e3:.1f} ms/frame = "
              f"{n_rays/s/1e6:.1f} Mrays/s")
        return s

    # --- 1. decay curve ---------------------------------------------
    theta0 = 0.5
    _, o0, d0 = rays_at(theta0)
    print("decay curve (plan built at theta0 - dtheta, rendered at "
          "theta0):")
    bench_perm(o0, d0, "tile (no plan)")
    for deg in (0, 1, 2, 5, 10, 20):
        dth = np.deg2rad(deg)
        c2w_p = orbit_camera(theta=theta0 - dth)
        perm, _ = r.plan_persp(c2w_p, W, H, fx=W * 1.1, features=feats)
        p = jnp.asarray(perm)
        bench_perm(o0[p], d0[p], f"plan at -{deg:2d} deg")

    # --- 2. 32-camera orbit with reuse-every-K ----------------------
    # Serving convention: 4 camera-frames per dispatch (the stream
    # regime every frames entry point uses) so the ~25-30 ms relay RTT
    # amortizes; per-frame rays differ, so nothing hoists.
    step_deg = float(os.environ.get("PROBE_STEP_DEG", 2.0))
    thetas = theta0 + np.arange(32) * np.deg2rad(step_deg)
    cams = [rays_at(t) for t in thetas]
    F = 4

    # Rays are GENERATED in plan order inside the dispatch (a (B,)
    # pixel-id gather + elementwise pinhole math — cheap), because a
    # 640k-row perm of generated rays costs ~55 ms in- or out-of-graph
    # (CLAUDE.md). Reduction-consumer regime (no raster unsort), i.e.
    # training / metric streams.
    @jax.jit
    def fwd_frames_planned(f, c2ws_g, perms_g):
        def rays_of(c2w_, pix):
            py = (pix // W).astype(jnp.float32)
            px = (pix % W).astype(jnp.float32)
            x = (px + 0.5 - W * 0.5) / (W * 1.1)
            y = -(py + 0.5 - H * 0.5) / (W * 1.1)
            d = jnp.stack([x, y, -jnp.ones_like(x)], -1)
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            d = d @ c2w_[:3, :3].T
            o = jnp.broadcast_to(c2w_[:3, 3], d.shape)
            return o, d

        def body(c, xs):
            c2w_, pix = xs
            o, d = rays_of(c2w_, pix)
            out = volume_render(baked, f, o, d, d, opt)
            return c + jnp.sum(out), None

        s, _ = jax.lax.scan(body, 0.0, (c2ws_g, perms_g))
        return s

    # One perm per F-frame group (K >= F), shipped once per re-plan
    # (2.5 MB); dispatches chained async, ONE fetch at the end — the
    # shape a real serving loop would take.
    print(f"orbit: 32 cameras, {step_deg} deg apart, {F}/dispatch, "
          "in-plan-order raygen, no unsort")
    c2ws_all = jnp.asarray(np.stack([c[0] for c in cams]), jnp.float32)

    @jax.jit
    def fwd_frames_one_perm(f, c2ws_g, pix):
        def body(c, c2w_):
            py = (pix // W).astype(jnp.float32)
            px = (pix % W).astype(jnp.float32)
            x = (px + 0.5 - W * 0.5) / (W * 1.1)
            y = -(py + 0.5 - H * 0.5) / (W * 1.1)
            d = jnp.stack([x, y, -jnp.ones_like(x)], -1)
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            d = d @ c2w_[:3, :3].T
            o = jnp.broadcast_to(c2w_[:3, 3], d.shape)
            out = volume_render(baked, f, o, d, d, opt)
            return c + jnp.sum(out), None

        s, _ = jax.lax.scan(body, 0.0, c2ws_g)
        return s

    tp, _ = _tile_baseline(r, opt)
    for K, label in ((4, "re-plan every 4"), (8, "re-plan every 8"),
                     (32, "re-plan every 32"),
                     (0, "tile (no plans)")):
        r._plan_cache.clear()
        if K:
            p_np, _ = r.plan_persp(cams[0][0], W, H, fx=W * 1.1,
                                   features=feats)
        else:
            p_np = tp
        perm_d = jnp.asarray(p_np)
        _ = float(fwd_frames_one_perm(feats, c2ws_all[:F], perm_d))
        r._plan_cache.clear()
        t0 = time.time()
        accs = []
        for gi in range(0, 32, F):
            if K and gi % K == 0:
                p_np, _ = r.plan_persp(cams[gi][0], W, H, fx=W * 1.1,
                                       features=feats)
                perm_d = jnp.asarray(p_np)
            accs.append(fwd_frames_one_perm(
                feats * (1.0 + 1e-7 * gi), c2ws_all[gi:gi + F], perm_d))
        _ = sum(float(a) for a in accs)
        per_frame = (time.time() - t0) / 32
        print(f"  {label}: {per_frame*1e3:.1f} ms/frame = "
              f"{n_rays/per_frame/1e6:.1f} Mrays/s (incl. plan builds)")


def _tile_baseline(r, opt):
    from svox_t_tpu.models.renderer import _tile_order

    tp, ti = _tile_order(opt, W, H)
    if tp is None:
        tp = np.arange(W * H, dtype=np.int32)
    return np.asarray(tp), ti


if __name__ == "__main__":
    main()
