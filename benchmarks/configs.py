"""The five benchmark configurations from BASELINE.json, runnable
end-to-end on one chip. Each `config_N()` exercises the capability the
reference was built for and returns a JSON-able result dict:

  1. Tiny static depth-3 RGBA tree rendered 100x100 (the reference's CPU
     fallback sanity config).
  2. PlenOctree-style static SH9 scene, single-view 800x800 forward.
  3. Differentiable fit: optimize leaf features against multi-view target
     images through the custom-VJP renderer.
  4. Artemis feature-level volume (16-dim features) with opacity + depth
     map generation.
  5. Dynamic animatable loop: per-frame LBS warp -> p2v occupancy ->
     octree re-pointing -> multi-view render (Artemis-style sequence).

Run: python benchmarks/configs.py [N ...]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import svox_t_tpu as st
from benchmarks.scenes import build_shell_tree, orbit_camera
from svox_t_tpu.ops.render import cam2world_rays, volume_render


def _fetch(x):
    """Force real completion through the relay (see bench.py notes)."""
    return float(jnp.sum(x))


def _timed_min(run, n=3):
    """Best-of-n wall time: single-shot timings through the relay carry
    hundreds of ms of variance. `run(i)` must perturb its inputs by i
    and fetch its outputs."""
    ts = []
    for i in range(n):
        t0 = time.time()
        run(i + 1)
        ts.append(time.time() - t0)
    return min(ts)


def config_1():
    """Tiny static depth-3 RGBA tree @ 100x100.

    Throughput is reported SUSTAINED (a 64-frame perturbed feature
    stream through `render_persp_frames`, one dispatch) like every other
    config: a single 10k-ray call is one ~25 ms relay round-trip and
    regresses nothing (the round-3 0.413 Mrays/s number was pure
    dispatch noise). The single-call time is kept as a smoke metric."""
    tree, feats = build_shell_tree(depth=3, data_format="RGBA", data_dim=4,
                                   radius=0.3, thickness_vox=1.0)
    r = st.VolumeRenderer(tree)
    c2w = orbit_camera()
    img = r.render_persp(feats, c2w, width=100, height=100, fx=100.0)
    _fetch(img)
    dt_single = _timed_min(lambda i: _fetch(
        r.render_persp(feats * (1 + 1e-7 * i), c2w, width=100, height=100, fx=100.0)
    ))
    n_frames = 64
    scales = 1.0 + 1e-7 * np.arange(1, n_frames + 1, dtype=np.float32)
    stack = jnp.asarray(feats)[None] * scales[:, None, None]
    _fetch(r.render_persp_frames(stack, c2w, width=100, height=100, fx=100.0))
    dt = _timed_min(lambda i: _fetch(r.render_persp_frames(
        stack * (1 + 1e-7 * i), c2w, width=100, height=100, fx=100.0
    ))) / n_frames
    img = np.asarray(img)
    return {
        "config": 1,
        "render_ms": round(dt * 1e3, 2),
        "mrays_s": round(100 * 100 / dt / 1e6, 3),
        "single_call_ms": round(dt_single * 1e3, 1),
        "frames_per_call": n_frames,
        "mean_alpha": round(float(img[..., -1].mean()), 4),
        "finite": bool(np.isfinite(img).all()),
    }


def config_2():
    """PlenOctree-scale SH9 static scene, 800x800 forward (== bench.py)."""
    tree, feats = build_shell_tree(depth=7, data_format="SH9", data_dim=28)
    r = st.VolumeRenderer(tree)
    c2w = orbit_camera()
    # Tile order: for single-IMAGE renders the cost schedule's in-graph
    # permutation (random 640k-row gathers in + inverse out) costs more
    # than the march saves (measured 69.6 -> 125 ms at 800^2); the
    # schedule pays where the permutation lives OUTSIDE the dispatch
    # (raw ray batches, training reductions) — see docs/PERFORMANCE.md.
    img = r.render_persp(feats, c2w, width=800, height=800, fx=880.0)
    _fetch(img)
    dt = _timed_min(lambda i: _fetch(
        r.render_persp(feats * (1 + 1e-7 * i), c2w, width=800, height=800,
                       fx=880.0)
    ))
    # Recorded-tape serving (fixed-camera steady state): the first call
    # records the tape (cached per camera x structure), later calls
    # replay only radiometry (docs/PERFORMANCE.md "Recorded sample
    # tapes"). Single-call timings still carry the ~25-30 ms relay RTT.
    # tape_max_dev below is NOT tape error: it is the ray-generation
    # ulp difference between two XLA programs (render_persp fuses
    # cam2world_rays into its dispatch; the recorder runs it standalone)
    # — measured IDENTICAL to render_persp vs the eager march on the
    # same camera (same deviating pixel set). On identical rays the
    # uncompacted tape replay is BITWISE equal to the march at 800^2.
    img_t = r.render_persp_tape(feats, c2w, width=800, height=800,
                                fx=880.0)
    _fetch(img_t)
    dt_tape = _timed_min(lambda i: _fetch(
        r.render_persp_tape(feats * (1 + 1e-7 * i), c2w, width=800,
                            height=800, fx=880.0)
    ))
    return {
        "config": 2,
        "render_ms": round(dt * 1e3, 1),
        "mrays_s": round(800 * 800 / dt / 1e6, 3),
        "tape_render_ms": round(dt_tape * 1e3, 1),
        "tape_mrays_s": round(800 * 800 / dt_tape / 1e6, 3),
        "tape_max_dev": round(
            float(np.abs(np.asarray(img_t) - np.asarray(img)).max()), 7
        ),
        "mean_alpha": round(float(np.asarray(img)[..., -1].mean()), 4),
    }


def config_3():
    """Differentiable fit: recover leaf features from 3 target views."""
    import optax

    tree, feats_true = build_shell_tree(depth=5, data_format="SH1", data_dim=4)
    r = st.VolumeRenderer(tree)
    opt = r._get_options(False)
    baked = tree._baked_spec()

    views = [orbit_camera(th, 0.4) for th in (0.3, 2.0, 4.0)]
    W = 160
    # Training is the case where the cost schedule costs nothing
    # in-dispatch: the loss is a permutation-invariant reduction over
    # rays, so each view's rays (and its target rows) are HELD in plan
    # order for the whole fit — one structure-only plan per view,
    # computed once, never stale (exact mode ignores densities).
    # Measured FLAT on this config (10.3 steps/s either way): a 25.6k-ray
    # fit step is dominated by the gradient scatter and the relay
    # round-trip, not the march the plan shortens. Kept as the
    # production-representative usage.
    from svox_t_tpu.ops.schedule import cost_order

    opt = r._sched_options(opt)
    rays = []
    for c2w in views:
        o, d = cam2world_rays(c2w, W, W, fx=W * 1.1, fy=W * 1.1)
        order = cost_order(baked, o, d, opt, feats_true.shape[0],
                           jnp.asarray(feats_true)[:, -1])
        rays.append((o[order], d[order]))
    targets = [
        volume_render(baked, feats_true, o, d, d, opt) for (o, d) in rays
    ]
    _ = [_fetch(t) for t in targets]

    optimizer = optax.adam(5e-2)

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def step(f, ostate, o, d, target, opt_):
        def loss_fn(ff):
            pred = volume_render(baked, ff, o, d, d, opt_)
            return jnp.mean((pred - target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(f)
        updates, ostate = optimizer.update(g, ostate, f)
        return optax.apply_updates(f, updates), ostate, loss

    # Zero-density init has zero gradient everywhere (the backward gates
    # on sigma > 0, like the reference's rt_kernel.cu:382) — start with a
    # small positive density like any NeRF-style fit.
    feats = jnp.zeros_like(feats_true).at[:, -1].set(2.0)
    ostate = optimizer.init(feats)
    # warm (compile once; same treatment as the tape fit below)
    _ = step(feats, ostate, rays[0][0], rays[0][1], targets[0], opt)
    loss0 = None
    t0 = time.time()
    n_steps = 30
    for i in range(n_steps):
        v = i % 3
        feats, ostate, loss = step(feats, ostate, rays[v][0], rays[v][1],
                                   targets[v], opt)
        if i == 0:
            loss0 = float(loss)
    loss_final = float(loss)
    dt = time.time() - t0

    # The same fit through RECORDED TAPES (fixed views = the tape
    # training regime, ops/tape.py): one record per view, every step
    # replays radiometry only through the tape VJP.
    from svox_t_tpu.ops import tape as tape_ops

    tapes = [
        tape_ops.record_tape(baked, feats_true.shape[0], o, d, d, opt)
        for (o, d) in rays
    ]

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def step_tape(f, ostate, tp, target, opt_):
        def loss_fn(ff):
            pred = tape_ops.replay_render(tp, ff, opt_, baked)
            return jnp.mean((pred - target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(f)
        updates, ostate = optimizer.update(g, ostate, f)
        return optax.apply_updates(f, updates), ostate, loss

    feats_t = jnp.zeros_like(feats_true).at[:, -1].set(2.0)
    ostate_t = optimizer.init(feats_t)
    # warm (compile once)
    _ = step_tape(feats_t, ostate_t, tapes[0], targets[0], opt)
    t0 = time.time()
    for i in range(n_steps):
        v = i % 3
        feats_t, ostate_t, loss_t = step_tape(
            feats_t, ostate_t, tapes[v], targets[v], opt
        )
    loss_final_tape = float(loss_t)
    dt_tape = time.time() - t0
    return {
        "config": 3,
        "n_steps": n_steps,
        "steps_per_s": round(n_steps / dt, 2),
        "fwd_bwd_mrays_s": round(n_steps * W * W / dt / 1e6, 3),
        "tape_steps_per_s": round(n_steps / dt_tape, 2),
        "tape_fwd_bwd_mrays_s": round(n_steps * W * W / dt_tape / 1e6, 3),
        "loss_first": round(loss0, 6),
        "loss_final": round(loss_final, 6),
        "tape_loss_final": round(loss_final_tape, 6),
        "loss_reduction": round(loss0 / max(loss_final, 1e-12), 1),
    }


def config_4():
    """Feature-level volume (16-dim) + opacity & depth map generation."""
    tree, feats = build_shell_tree(depth=6, data_format="RGBA", data_dim=16)
    joints = np.array(
        [[0.5, 0.5, 0.5], [0.3, 0.5, 0.5], [0.7, 0.5, 0.5]], np.float32
    )
    tree.extra_data = joints
    tree._invalidate()
    r = st.VolumeRenderer(tree)
    c2w = orbit_camera()
    W = 400
    o, d = cam2world_rays(c2w, W, W, fx=W * 1.1, fy=W * 1.1)
    rays = st.Rays(o, d, d)
    feat_img = r(feats, rays)          # (W*W, 16): 15 feature chans + alpha
    op = r.opacity_render(feats, rays)
    dp = r.render_depth(feats, rays)
    mf, mdep, hp, didx = r.motion_render(feats, rays)
    _ = [_fetch(x) for x in (feat_img, op, dp, mf)]

    def run(i):
        e = 1 + 1e-7 * i
        _fetch(r(feats * e, rays))
        _fetch(r.opacity_render(feats * (e + 1e-8), rays))
        _fetch(r.render_depth(feats * (e + 2e-8), rays))

    dt = _timed_min(run)
    d_np = np.asarray(dp)
    return {
        "config": 4,
        "three_pass_ms": round(dt * 1e3, 1),
        "feature_dim": int(feat_img.shape[1]) - 1,
        "opacity_mean": round(float(np.asarray(op).mean()), 4),
        "depth_mean_hit": round(float(d_np[d_np > 0].mean()), 4),
        "motion_feature_dim": int(mf.shape[1]),
    }


def config_5():
    """Dynamic animatable loop: warp -> p2v occupancy -> re-point -> render."""
    rng = np.random.RandomState(3)
    tree, feats0 = build_shell_tree(depth=6, data_format="SH1", data_dim=7)
    r = st.VolumeRenderer(tree)
    opt = r._get_options(False)

    # canonical point cloud = occupied leaf centers; 2-bone skeleton
    spec = tree._spec()
    leaves = tree._all_leaves()
    corners = np.asarray(jax.device_get(tree._calc_corners(leaves)))
    depths = tree.parent_depth[leaves[:, 0], 1]
    centers = corners + 0.5 * (0.5 ** (depths[:, None] + 1.0))
    data_ids = np.asarray(tree.data)[
        leaves[:, 0], leaves[:, 1], leaves[:, 2], leaves[:, 3], 0
    ]
    occ = data_ids < feats0.shape[0]
    pts_local = centers[occ]
    order = np.argsort(data_ids[occ])
    pts_local = pts_local[order]
    pts = np.asarray(jax.device_get(tree.tree2world(jnp.asarray(pts_local))))
    Q = pts.shape[0]
    nb, J = 2, 2
    sw = np.abs(rng.rand(Q, nb)).astype(np.float32)
    sw /= sw.sum(1, keepdims=True)
    ji = rng.randint(0, J, (Q, nb)).astype(np.int32)

    W = 200
    cams = [orbit_camera(th, 0.4) for th in (0.5, 2.5)]
    ray_sets = [cam2world_rays(c, W, W, fx=W * 1.1, fy=W * 1.1) for c in cams]

    # all views rendered as ONE ray batch (fewer dispatches); rendering
    # runs on the baked structure, refreshed on-device after re-pointing
    baked = tree._baked_spec()
    all_o = jnp.concatenate([o for (o, d) in ray_sets])
    all_d = jnp.concatenate([d for (o, d) in ray_sets])

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def frame(spec_in, baked_in, f, T, sw_, ji_, opt_):
        warped, mats = st.warp_vertices(T, jnp.asarray(pts), sw_, ji_)
        vol = st.voxelize(
            warped, jnp.ones((Q, 1)), [0.0, 0.0, 0.0], [1.0, 1.0, 1.0],
            32, 0.03, 0.06,
        )
        new_data = st.ops.query.construct_tree(spec_in, warped)
        baked2 = st.ops.bake.refresh(baked_in, new_data)
        outs = volume_render(baked2, f, all_o, all_d, all_d, opt_)
        return outs, vol, baked2

    T0 = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (J, 1, 1)))
    outs, vol, _ = frame(spec, baked, feats0, T0, jnp.asarray(sw), jnp.asarray(ji), opt)
    _fetch(outs)

    n_frames = 5
    t0 = time.time()
    for k in range(n_frames):
        T = np.tile(np.eye(4, dtype=np.float32), (J, 1, 1))
        T[0, 0, 3] = 0.02 * np.sin(0.7 * (k + 1))
        T[1, 1, 3] = 0.02 * np.cos(0.7 * (k + 1))
        outs, vol, _ = frame(spec, baked, feats0, jnp.asarray(T),
                             jnp.asarray(sw), jnp.asarray(ji), opt)
        _fetch(outs)
        _fetch(vol)
    dt = time.time() - t0

    # Fused scan variant (renderer.render_dynamic_frames): the whole
    # warp -> re-point -> bake-refresh -> render sequence as ONE
    # dispatch (no p2v — measured above). The per-frame path pays a
    # relay round-trip per dispatch that the scan amortizes away.
    T_stack = np.tile(np.eye(4, dtype=np.float32), (n_frames, J, 1, 1))
    for k in range(n_frames):
        T_stack[k, 0, 0, 3] = 0.02 * np.sin(0.7 * (k + 1))
        T_stack[k, 1, 1, 3] = 0.02 * np.cos(0.7 * (k + 1))
    src = np.tile(np.eye(4, dtype=np.float32), (J, 1, 1))
    rays = st.Rays(all_o, all_d, all_d)

    def fused(i):
        out = r.render_dynamic_frames(
            feats0 * (1.0 + 1e-3 * i), T_stack, src, pts, sw, ji,
            rays=rays, viewdir_rotation=False, update_tree=False,
        )
        _fetch(out)

    fused(0)  # compile
    fused_dt = _timed_min(fused, n=3)

    # Cell-indexed tape serving (round 4/5 — the >30 fps animating
    # path): ONE record against the animation's union occupancy, per
    # frame warp -> re-point -> radiometry REPLAY (no structure walk in
    # the frame loop). Equal to the fused loop to the compaction
    # license (bitwise with compact=False — tests/test_tape_dynamic).
    t0 = time.time()
    _ = r.record_dynamic_rays(rays, T_stack, src, pts, sw, ji)
    taped_record_s = time.time() - t0

    def taped(i):
        out = r.render_dynamic_tape_frames(
            feats0 * (1.0 + 1e-3 * i), T_stack, src, pts, sw, ji,
            rays=rays, update_tree=False, viewdir_rotation=False,
        )
        _fetch(out)

    taped(0)  # compile (tape cached from the record above)
    taped_dt = _timed_min(taped, n=3)

    return {
        "config": 5,
        "frames_per_s": round(n_frames / dt, 2),
        "frame_ms": round(dt / n_frames * 1e3, 1),
        "views_per_frame": len(cams),
        "points": int(Q),
        "p2v_voxels": int(vol.size),
        "rebuilds_per_s": round(n_frames / dt, 2),
        "fused_frames_per_s": round(n_frames / fused_dt, 2),
        "fused_frame_ms": round(fused_dt / n_frames * 1e3, 1),
        "taped_frames_per_s": round(n_frames / taped_dt, 2),
        "taped_frame_ms": round(taped_dt / n_frames * 1e3, 1),
        "taped_record_s": round(taped_record_s, 2),
    }


CONFIGS = {1: config_1, 2: config_2, 3: config_3, 4: config_4, 5: config_5}


def main():
    which = [int(a) for a in sys.argv[1:]] or sorted(CONFIGS)
    for n in which:
        res = CONFIGS[n]()
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
