#!/usr/bin/env python
"""Headline benchmark: forward volume-render throughput at 800x800 on a
PlenOctree-scale SH9 shell scene, on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N, ...}

vs_baseline is against the north-star target of 100 Mrays/s/chip forward
(BASELINE.json; the PlenOctrees paper's ~100 Mrays/s on a V100 is the
only hard number in the reference's lineage). Extra keys report the
fwd+bwd rate (target >= 25 Mrays/s) and scene stats.

NOTE: inputs are perturbed every timed iteration — the axon TPU relay can
serve repeated identical dispatches from a cache, which silently inflates
naive benchmark loops by orders of magnitude.
"""

import json
import os
import sys
import time

# Persistent compile cache: first-run XLA compiles of the march loop cost
# minutes on this host; cache them across bench invocations.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import functools

import jax
import jax.numpy as jnp
import numpy as np


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import svox_t_tpu as st
    from benchmarks.scenes import build_shell_tree, orbit_camera
    from svox_t_tpu.ops.render import cam2world_rays, volume_render

    W = H = 800
    depth = 7

    t0 = time.time()
    tree, feats = build_shell_tree(depth=depth, data_format="SH9", data_dim=28)
    build_s = time.time() - t0
    t0 = time.time()
    baked = tree._baked_spec()
    bake_s = time.time() - t0

    r = st.VolumeRenderer(tree, step_size=1e-3)
    # Cost-schedule chunk design point: C=2048 forward chunks (the
    # cost-homogeneous-chunk win, probe_chunk_sched.py) with the
    # backward march kept at 1024 (probe_bwd_sched.py).
    opt = r._sched_options(r._get_options(False))
    c2w = orbit_camera()
    origins, dirs = cam2world_rays(c2w, W, H, fx=W * 1.1, fy=W * 1.1)
    # Tile-coherent ray order (what render_persp uses internally).
    from svox_t_tpu.models.renderer import _tile_perm

    perm, _ = _tile_perm(W, H, 32)
    origins, dirs = origins[perm], dirs[perm]
    vdirs = dirs
    n_rays = origins.shape[0]

    # Cost-ordered ray schedule (ops/schedule.py; render_persp
    # schedule="cost"): one plan per (camera, scene) — precomputed here
    # exactly as a serving system would, its cost reported below —
    # makes march chunks cost-homogeneous. Outputs are BIT-identical to
    # tile order (schedule only changes chunk membership).
    from svox_t_tpu.ops.schedule import cost_order

    def plan(sp, o_, d_, opt_, f_):
        # Warm first (march_cost compiles once per options), then report
        # the best of two timed plans — the steady-state serving cost.
        sig = jnp.asarray(f_, jnp.float32)[:, -1]
        _ = cost_order(sp, o_, d_, opt_, f_.shape[0], sig)
        ts = []
        for _i in range(2):
            t0 = time.time()
            order = cost_order(sp, o_, d_, opt_, f_.shape[0], sig)
            ts.append(time.time() - t0)
        return o_[order], d_[order], min(ts)

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def fwd(sp, f, o, d, v, opt_):
        return volume_render(sp, f, o, d, v, opt_)

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def fwdbwd(sp, f, o, d, v, opt_):
        return jax.grad(
            lambda ff: jnp.sum(volume_render(sp, ff, o, d, v, opt_))
        )(f)

    # Sustained variants: N frames per dispatch, each frame's features
    # perturbed so the relay cannot serve cached results; one fetch of a
    # value depending on every frame. This is the serving-relevant
    # number: a single dispatch through the axon relay carries a fixed
    # ~25-30 ms host round-trip that a frame stream amortizes away.
    N_SUSTAIN = 4

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def fwd_sustained(sp, f, o, d, v, opt_):
        def one(i, acc):
            # Quantized pools: perturb the dequant scale so the loop body
            # stays loop-variant (XLA must not hoist the render).
            ff = (
                f._replace(scale=f.scale * (1.0 + 1e-7 * i))
                if isinstance(f, tuple) else f * (1.0 + 1e-7 * i)
            )
            out = volume_render(sp, ff, o, d, v, opt_)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, N_SUSTAIN, one, 0.0)

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def fwdbwd_sustained(sp, f, o, d, v, opt_):
        def one(i, acc):
            g = jax.grad(
                lambda ff: jnp.sum(volume_render(sp, ff, o, d, v, opt_))
            )(f * (1.0 + 1e-7 * i))
            return acc + jnp.sum(g)
        return jax.lax.fori_loop(0, N_SUSTAIN, one, 0.0)

    o_ex, d_ex, plan_exact_s = plan(baked, origins, dirs, opt, feats)

    # Warmup (compile)
    out = fwd(baked, feats, o_ex, d_ex, d_ex, opt)
    out.block_until_ready()
    g = fwdbwd(baked, feats, o_ex, d_ex, d_ex, opt)
    g.block_until_ready()
    _ = float(fwd_sustained(baked, feats, o_ex, d_ex, d_ex, opt))
    _ = float(fwdbwd_sustained(baked, feats, o_ex, d_ex, d_ex, opt))

    def bench(fn, n_iter=5, scalar=False):
        # Honest timing through the axon relay requires (a) perturbing the
        # inputs each iteration (identical dispatches can be served from a
        # cache) and (b) fetching a value that depends on the whole result
        # (block_until_ready alone returns early). Anything less inflates
        # the numbers by orders of magnitude.
        times = []
        for i in range(n_iter):
            f_i = feats * (1.0 + 1e-7 * (i + 1))
            _ = float(jnp.sum(f_i))
            t0 = time.time()
            res = fn(baked, f_i, o_ex, d_ex, d_ex, opt)
            _ = float(res) if scalar else float(jnp.sum(res))
            times.append(time.time() - t0)
        return min(times)

    fwd_lat_s = bench(fwd)
    fwd_s = bench(fwd_sustained, n_iter=4, scalar=True) / N_SUSTAIN
    fwd_mrays = n_rays / fwd_s / 1e6
    bwd_lat_s = bench(fwdbwd, n_iter=3)
    bwd_s = bench(fwdbwd_sustained, n_iter=3, scalar=True) / N_SUSTAIN
    bwd_mrays = n_rays / bwd_s / 1e6

    # PLAN-FREE exact march (tile order, C=1024 — the tile-order design
    # point): the truly-moving-camera regime, where neither a tape nor
    # a cost plan has amortized yet. Regression-visible by request
    # (round-3 verdict #4i).
    opt_np = r._get_options(False)
    _ = float(fwd_sustained(baked, feats, origins, dirs, vdirs, opt_np))
    times = []
    for i in range(3):
        f_i = feats * (1.0 + 1e-7 * (i + 1))
        _ = float(jnp.sum(f_i))
        t0 = time.time()
        _ = float(fwd_sustained(baked, f_i, origins, dirs, vdirs, opt_np))
        times.append(time.time() - t0)
    noplan_s = min(times) / N_SUSTAIN
    noplan_mrays = n_rays / noplan_s / 1e6

    # Recorded-tape serving path (ops/tape.py): the structure walk is a
    # per-(camera x structure) artifact like the cost plan — recorded
    # once (cost reported below), steady-state frames replay only
    # radiometry. This is the production path for the benchmark's own
    # workload (fixed camera, features animated per frame) and the
    # HEADLINE number; march-only figures are kept alongside for the
    # moving-camera / fresh-rays regimes where a tape cannot amortize.
    from svox_t_tpu.ops import tape as tape_ops

    # Tape replays are fast enough that the fixed ~25-30 ms relay RTT
    # dominates a 4-frame dispatch; serving streams frames in bulk
    # (render_tape_frames), so the tape numbers amortize over 32
    # perturbed frames per dispatch (each loop-variant, value fetched).
    N_TAPE = 32

    # The serving forward is measured in PIXEL order (unsort=True): an
    # image consumer needs raster output, so the unsort gather is part
    # of the honest per-frame cost. Tapes are recorded via the
    # production entry point (record_persp), whose 4x8 pixel-block sort
    # makes that unsort a near-free block gather + transpose
    # (benchmarks/probe_tape_group.py).
    @functools.partial(jax.jit, static_argnames=("opt_",))
    def tape_sustained(tp, f, opt_):
        def one(i, acc):
            out = tape_ops.replay_render(
                tp, f * (1.0 + 1e-7 * i), opt_, unsort=True
            )
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, N_TAPE, one, 0.0)

    # Fixed-ray gradient evaluation over a 16-frame feature stream in
    # one dispatch (replay_render_frames): 16 INDEPENDENT per-frame
    # gradients — the same work the old per-frame fori computed — but
    # the backward batches all 16 flushes into ONE wide scatter
    # (probe_flush_wide.py). This is the gradient-accumulation /
    # feature-stream regime; a sequential SGD chain (step n+1 needs
    # step n's update) cannot share the flush and runs at the
    # `tape_fwd_bwd_seq` rate below.
    N_TAPE_BWD = 16

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def tape_fwdbwd_frames(tp, f, opt_):
        scales = 1.0 + 1e-7 * jnp.arange(N_TAPE_BWD, dtype=f.dtype)
        fs = f[None] * scales[:, None, None]
        g = jax.grad(lambda ffs: jnp.sum(tape_ops.replay_render_frames(
            tp, ffs, opt_, unsort=False)))(fs)
        return jnp.sum(g)

    N_TAPE_BWD_SEQ = 8

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def tape_fwdbwd_sustained(tp, f, opt_):
        def one(i, acc):
            g = jax.grad(lambda ff: jnp.sum(tape_ops.replay_render(
                tp, ff, opt_, unsort=False)))(f * (1.0 + 1e-7 * i))
            return acc + jnp.sum(g)
        return jax.lax.fori_loop(0, N_TAPE_BWD_SEQ, one, 0.0)

    def bench_tape(f, opt_):
        # Warm first (count+record walks compile once per options/shape
        # bucket), then report a second record — the steady-state cost
        # of taping a NEW camera, exactly as `plan` reports plan cost.
        tp = r.record_persp(c2w, W, H, fx=W * 1.1, features=f)
        jax.block_until_ready(tp.idx)
        r._tape_cache.clear()
        t0 = time.time()
        tp = r.record_persp(c2w, W, H, fx=W * 1.1, features=f)
        jax.block_until_ready(tp.idx)
        rec_s = time.time() - t0
        _ = float(tape_sustained(tp, f, opt_))
        times = []
        for i in range(4):
            f_i = f * (1.0 + 1e-7 * (i + 1))
            _ = float(jnp.sum(f_i))
            t0 = time.time()
            _ = float(tape_sustained(tp, f_i, opt_))
            times.append(time.time() - t0)
        return tp, rec_s, min(times) / N_TAPE

    tape_ex, tape_rec_s, tape_fwd_s = bench_tape(feats, opt)
    tape_fwd_mrays = n_rays / tape_fwd_s / 1e6
    # Fixed-ray training step through the tape VJP (bwd rounds K=8).
    # Training reduces over rays (order-free, unsort=False) and its
    # bulk-flush cost tracks ALLOCATED rows, so the training tape keeps
    # the tighter ray-level sort (group_size=1) — the block sort above
    # exists for pixel-order serving, where it moves the unsort cost.
    tape_tr = r.record_persp(c2w, W, H, fx=W * 1.1, features=feats,
                             group_size=1)
    _ = float(tape_fwdbwd_frames(tape_tr, feats, opt))
    times = []
    for i in range(3):
        f_i = feats * (1.0 + 1e-7 * (i + 1))
        _ = float(jnp.sum(f_i))
        t0 = time.time()
        _ = float(tape_fwdbwd_frames(tape_tr, f_i, opt))
        times.append(time.time() - t0)
    tape_bwd_s = min(times) / N_TAPE_BWD
    tape_bwd_mrays = n_rays / tape_bwd_s / 1e6
    # Sequential per-frame grads (the SGD-chain regime: one flush per
    # step) — kept regression-visible next to the batched number.
    _ = float(tape_fwdbwd_sustained(tape_tr, feats, opt))
    times = []
    for i in range(3):
        f_i = feats * (1.0 + 1e-7 * (i + 1))
        _ = float(jnp.sum(f_i))
        t0 = time.time()
        _ = float(tape_fwdbwd_sustained(tape_tr, f_i, opt))
        times.append(time.time() - t0)
    tape_bwd_seq_s = min(times) / N_TAPE_BWD_SEQ
    tape_bwd_seq_mrays = n_rays / tape_bwd_seq_s / 1e6

    # TRUE sequential SGD chain (round-5 verdict #4): N in-dispatch
    # steps where step n+1 replays the features step n's update wrote —
    # fwd + tape backward + SGD per step, nothing shareable across
    # steps (the bulk gradient flush is the serial dependency; see
    # docs/PERFORMANCE.md "Sequential-chain floor").
    from svox_t_tpu.ops import tape_subset as tsub

    tgt_chain = tape_ops.replay_render(tape_tr, feats, opt,
                                       unsort=False)[:, :3]
    # tape-order targets -> original order for train_steps' contract
    tgt_chain = tape_ops.unsort_output(tape_tr, tgt_chain)
    jax.block_until_ready(tgt_chain)
    N_CHAIN = 8

    def chain_run(i):
        f_out, _, _ = tsub.train_steps(
            tape_tr, tgt_chain, feats * (0.9 + 1e-6 * i), opt, N_CHAIN,
            lr=0.05,
        )
        return float(jnp.sum(f_out))

    _ = chain_run(0)
    times = []
    for i in range(3):
        t0 = time.time()
        _ = chain_run(i + 1)
        times.append(time.time() - t0)
    chain_s = min(times) / N_CHAIN
    chain_mrays = n_rays / chain_s / 1e6

    # Random-pixel minibatch training (round-5 verdict #1): sequential
    # SGD over random 64k-ray batches drawn across a FOUR-camera rig
    # tape, 32 steps per dispatch (ops/tape_subset.py). The canonical
    # NeRF/Artemis loop; per-step floor = packed source gather + round
    # fixed costs + gradient flush (docs/PERFORMANCE.md "Minibatch
    # training").
    mb = {}
    try:
        rng_mb = np.random.RandomState(7)
        c2ws_rig = np.stack(
            [orbit_camera(theta=0.9 * v, phi=0.3 + 0.1 * v)
             for v in range(4)]
        )
        rig_tape = r.record_persp_rig(c2ws_rig, W, H, fx=W * 1.1,
                                      features=feats, group_size=1)
        t0 = time.time()
        src_mb = tsub.TapeRowSource(rig_tape)
        jax.block_until_ready(src_mb.packed)
        mb["minibatch_source_s"] = round(time.time() - t0, 2)
        tgt_mb = tape_ops.replay_render(rig_tape, feats, opt)[:, :3]
        jax.block_until_ready(tgt_mb)
        N_MB, B_MB = 32, 65536
        n_rig = rig_tape.n_rays

        def mb_batches():
            # with-replacement uniform sampling (canonical SGD; a
            # no-replacement 2.56M choice costs 160 ms/batch on this
            # host and is a sampling-strategy choice, not framework
            # cost)
            return rng_mb.randint(0, n_rig, size=(N_MB, B_MB))

        def mb_prep():
            return tsub.prep_minibatches(src_mb, mb_batches(),
                                         chunk_size=256)

        pack = mb_prep()
        f_out, _, _ = tsub.train_minibatches(
            src_mb, pack, tgt_mb, feats * 0.9, opt, lr=0.05,
        )
        _ = float(jnp.sum(f_out))
        # Pipelined steady state: prep of super-batch i+1 overlaps the
        # device executing i (dispatches are async; fetch afterwards).
        times = []
        for i in range(3):
            t0 = time.time()
            f_out, _, _ = tsub.train_minibatches(
                src_mb, pack, tgt_mb, feats * (0.9 + 1e-6 * i), opt,
                lr=0.05,
            )
            pack = mb_prep()
            _ = float(jnp.sum(f_out))
            times.append(time.time() - t0)
        mb_s = min(times) / N_MB
        mb["minibatch_rays"] = B_MB
        mb["minibatch_steps_per_call"] = N_MB
        mb["minibatch_step_ms"] = round(mb_s * 1e3, 2)
        mb["minibatch_fwd_bwd_mrays_s"] = round(B_MB / mb_s / 1e6, 3)
        mb["minibatch_vs_target"] = round(B_MB / mb_s / 1e6 / 25.0, 4)

        # Batch-size knee: the same chain at 256k-ray steps (per-step
        # fixed costs amortize 4x; docs/PERFORMANCE.md "Minibatch
        # training" floor terms).
        N_MB2, B_MB2 = 8, 262144

        def mb_prep2():
            return tsub.prep_minibatches(
                src_mb, rng_mb.randint(0, n_rig, size=(N_MB2, B_MB2)),
                chunk_size=512,
            )

        pack2 = mb_prep2()
        f_out, _, _ = tsub.train_minibatches(
            src_mb, pack2, tgt_mb, feats * 0.9, opt, lr=0.05,
        )
        _ = float(jnp.sum(f_out))
        times = []
        for i in range(3):
            t0 = time.time()
            f_out, _, _ = tsub.train_minibatches(
                src_mb, pack2, tgt_mb, feats * (0.9 + 1e-6 * i), opt,
                lr=0.05,
            )
            pack2 = mb_prep2()
            _ = float(jnp.sum(f_out))
            times.append(time.time() - t0)
        mb2_s = min(times) / N_MB2
        mb["minibatch256k_step_ms"] = round(mb2_s * 1e3, 2)
        mb["minibatch256k_fwd_bwd_mrays_s"] = round(
            B_MB2 / mb2_s / 1e6, 3)
        # Free the rig structures before the deep sections build.
        del src_mb, rig_tape
        r._tape_cache.clear()
    except Exception as e:  # pragma: no cover - defensive
        mb = {"minibatch_error": repr(e)[:200]}

    # "fast" mode (sigma_thresh = stop_thresh = 1e-2): the reference's
    # accelerated configuration and the setting PlenOctrees-class FPS
    # numbers are quoted in (early ray termination).
    opt_fast = r._sched_options(r._get_options(True))
    o_f, d_f, plan_fast_s = plan(baked, origins, dirs, opt_fast, feats)
    out = fwd(baked, feats, o_f, d_f, d_f, opt_fast)
    out.block_until_ready()
    _ = float(fwd_sustained(baked, feats, o_f, d_f, d_f, opt_fast))
    times = []
    for i in range(4):
        f_i = feats * (1.0 + 1e-7 * (i + 1))
        _ = float(jnp.sum(f_i))
        t0 = time.time()
        res = fwd_sustained(baked, f_i, o_f, d_f, d_f, opt_fast)
        _ = float(res)
        times.append(time.time() - t0)
    fast_s = min(times) / N_SUSTAIN
    fast_mrays = n_rays / fast_s / 1e6

    # Opaque-surface variant of the same scene: the workload where the
    # reference's fast mode (early ray termination) pays — rays stop at
    # the first surface crossing. Same structure, near-opaque densities.
    from benchmarks.scenes import build_opaque_tree

    otree, ofeats = build_opaque_tree(depth=depth, data_format="SH9",
                                      data_dim=28)
    obaked = otree._baked_spec()
    o_o, d_o, plan_opaque_s = plan(obaked, origins, dirs, opt_fast, ofeats)
    out_o = fwd(obaked, ofeats, o_o, d_o, d_o, opt_fast)
    out_o.block_until_ready()
    _ = float(fwd_sustained(obaked, ofeats, o_o, d_o, d_o, opt_fast))
    times = []
    for i in range(3):
        f_i = ofeats * (1.0 + 1e-7 * (i + 1))
        _ = float(jnp.sum(f_i))
        t0 = time.time()
        res = fwd_sustained(obaked, f_i, o_o, d_o, d_o, opt_fast)
        _ = float(res)
        times.append(time.time() - t0)
    opaque_fast_s = min(times) / N_SUSTAIN
    opaque_fast_mrays = n_rays / opaque_fast_s / 1e6

    # Fast-mode TAPE serving (fixed camera, per-frame features): tapes
    # recorded with the fast geometry replay through the retiring while
    # (tape_stop_program=0 default — chunks retire once every ray
    # stopped; benchmarks/probe_stopprog.py). The early-stop
    # counterparts of the headline tape number.
    def bench_fast_tape(tree_, feats_):
        rr = st.VolumeRenderer(tree_, step_size=1e-3, chunk_size=2048)
        opt_t = rr._get_options(True)
        tp = rr.record_persp(c2w, W, H, fx=W * 1.1, features=feats_,
                             fast=True)
        _ = float(tape_sustained(tp, feats_, opt_t))
        ts = []
        for i in range(3):
            f_i = feats_ * (1.0 + 1e-7 * (i + 1))
            _ = float(jnp.sum(f_i))
            t0 = time.time()
            _ = float(tape_sustained(tp, f_i, opt_t))
            ts.append(time.time() - t0)
        return min(ts) / N_TAPE

    tape_fast_s = bench_fast_tape(tree, feats)
    tape_fast_mrays = n_rays / tape_fast_s / 1e6
    tape_opaque_s = bench_fast_tape(otree, ofeats)
    tape_opaque_mrays = n_rays / tape_opaque_s / 1e6

    # Round-4 cheap plan (plan_persp block=4 + chunked cost walk): plan
    # build cost through the production entry, and the exact march's
    # throughput under the block plan (must hold the per-ray plan's
    # rate for the cheap plan to be the default).
    _ = r.plan_persp(c2w, W, H, fx=W * 1.1, features=feats)  # compile
    r._plan_cache.clear()
    t0 = time.time()
    perm_b, _inv_b = r.plan_persp(c2w, W, H, fx=W * 1.1, features=feats)
    plan_block_s = time.time() - t0
    o_px, d_px = cam2world_rays(c2w, W, H, fx=W * 1.1, fy=W * 1.1)
    pb = jnp.asarray(perm_b)
    o_b, d_b = o_px[pb], d_px[pb]
    _ = float(fwd_sustained(baked, feats, o_b, d_b, d_b, opt))
    times = []
    for i in range(3):
        f_i = feats * (1.0 + 1e-7 * (i + 1))
        _ = float(jnp.sum(f_i))
        t0 = time.time()
        _ = float(fwd_sustained(baked, f_i, o_b, d_b, d_b, opt))
        times.append(time.time() - t0)
    blockplan_s = min(times) / N_SUSTAIN
    blockplan_mrays = n_rays / blockplan_s / 1e6

    # TRULY-MOVING-CAMERA orbit (round-5 verdict #7): 32 cameras 2 deg
    # apart, 4 frames/dispatch, rays GENERATED in plan order in-graph
    # (a (B,) pixel-id gather — full-ray perms cost ~55 ms), ONE plan
    # reused across the whole sweep (decay measured flat to 20+ deg:
    # 33.2-40.1 ms/frame vs 100 raster — probe_plan_decay.py), plan
    # build INCLUDED. Reduction-consumer regime (no raster unsort).
    orbit = {}
    try:
        thetas = 0.5 + np.arange(32) * np.deg2rad(2.0)
        c2ws_orbit = jnp.asarray(
            np.stack([orbit_camera(theta=t) for t in thetas]),
            jnp.float32,
        )

        @jax.jit
        def orbit_frames(f, c2ws_g, pix):
            def body(acc, c2w_):
                py = (pix // W).astype(jnp.float32)
                px = (pix % W).astype(jnp.float32)
                x = (px + 0.5 - W * 0.5) / (W * 1.1)
                y = -(py + 0.5 - H * 0.5) / (W * 1.1)
                d_ = jnp.stack([x, y, -jnp.ones_like(x)], -1)
                d_ = d_ / jnp.linalg.norm(d_, axis=-1, keepdims=True)
                d_ = d_ @ c2w_[:3, :3].T
                o_ = jnp.broadcast_to(c2w_[:3, 3], d_.shape)
                out = volume_render(baked, f, o_, d_, d_, opt)
                return acc + jnp.sum(out), None

            s, _ = jax.lax.scan(body, 0.0, c2ws_g)
            return s

        r._plan_cache.clear()
        p_np, _ = r.plan_persp(np.asarray(c2ws_orbit[0]), W, H,
                               fx=W * 1.1, features=feats)
        perm_d = jnp.asarray(p_np)
        _ = float(orbit_frames(feats, c2ws_orbit[:4], perm_d))
        r._plan_cache.clear()
        t0 = time.time()
        accs = []
        p_np, _ = r.plan_persp(np.asarray(c2ws_orbit[0]), W, H,
                               fx=W * 1.1, features=feats)
        perm_d = jnp.asarray(p_np)
        for gi in range(0, 32, 4):
            accs.append(orbit_frames(
                feats * (1.0 + 1e-7 * gi), c2ws_orbit[gi:gi + 4],
                perm_d))
        _ = sum(float(a) for a in accs)
        orbit_s = (time.time() - t0) / 32
        orbit["orbit32_planned_mrays_s"] = round(
            n_rays / orbit_s / 1e6, 3)
        orbit["orbit32_planned_frame_ms"] = round(orbit_s * 1e3, 1)

        # Steady-state repeated path (turntable serving): per-camera
        # per-ray plans live in the plan_persp cache (FIFO sized 32 —
        # this sweep), so a repeated orbit pays ZERO build and each
        # frame marches under a FRESH plan. The cache-warm regime is
        # the serving norm; the number above is the first-pass cost.
        perms_c = []
        for ci in range(32):
            p_np, _ = r.plan_persp(np.asarray(c2ws_orbit[ci]), W, H,
                                   fx=W * 1.1, features=feats, block=1)
            perms_c.append(jnp.asarray(p_np))
        # one untimed warm sweep (perm H2D transfers + executable)
        _ = sum(float(orbit_frames(feats, c2ws_orbit[gi:gi + 4],
                                   perms_c[gi]))
                for gi in range(0, 32, 4))
        t0 = time.time()
        accs = []
        for gi in range(0, 32, 4):
            # group shares plan of its first camera (<=6 deg stale —
            # measured free) so the dispatch keeps one perm operand
            accs.append(orbit_frames(
                feats * (1.0 + 1e-7 * gi), c2ws_orbit[gi:gi + 4],
                perms_c[gi]))
        _ = sum(float(a) for a in accs)
        orbit_s = (time.time() - t0) / 32
        orbit["orbit32_cached_mrays_s"] = round(
            n_rays / orbit_s / 1e6, 3)
        orbit["orbit32_cached_frame_ms"] = round(orbit_s * 1e3, 1)
    except Exception as e:  # pragma: no cover - defensive
        orbit = {"orbit_error": repr(e)[:200]}

    # Deep-scene forward (depth-9 shell, ~2.1M leaves / 1.4M features,
    # bf16 pool): the memory-bound regime — exercises the pinnable-top
    # bake + brick atlas (round 3).
    t0 = time.time()
    dtree, dfeats = build_shell_tree(depth=9, data_format="SH9", data_dim=28)
    dbaked = dtree._baked_spec()
    dfeats = dfeats.astype(jnp.bfloat16)
    deep_build_s = time.time() - t0
    rd = st.VolumeRenderer(dtree, step_size=1e-3)
    opt_deep = rd._sched_options(rd._get_options(False))
    o_d, d_d, plan_deep_s = plan(dbaked, origins, dirs, opt_deep, dfeats)
    _ = float(fwd_sustained(dbaked, dfeats, o_d, d_d, d_d, opt_deep))
    times = []
    for i in range(3):
        f_i = dfeats * (1.0 + 1e-2 * (i + 1))
        _ = float(jnp.sum(f_i))
        t0 = time.time()
        res = fwd_sustained(dbaked, f_i, o_d, d_d, d_d, opt_deep)
        _ = float(res)
        times.append(time.time() - t0)
    deep_s = min(times) / N_SUSTAIN
    deep_mrays = n_rays / deep_s / 1e6

    # int8-quantized pool on the same deep scene (inference path): the
    # 39 MB int8 table re-enters the VMEM-pinnable regime the 78 MB bf16
    # one misses — measured ~3.5x. Quantization error reported alongside
    # (per-channel affine int8; NOT the exact path).
    from svox_t_tpu.ops.render import quantize_features

    def _quant(i):
        return quantize_features(
            (dfeats.astype(jnp.float32) * (1.0 + 1e-2 * i))
        )

    qf = _quant(0)
    sel = np.random.RandomState(0).choice(n_rays, 8192, replace=False)
    oq = volume_render(dbaked, qf, origins[sel], dirs[sel], vdirs[sel],
                       opt_deep)
    of = volume_render(dbaked, dfeats.astype(jnp.float32), origins[sel],
                       dirs[sel], vdirs[sel], opt_deep)
    deep_int8_err = float(jnp.max(jnp.abs(oq - of)))
    _ = float(fwd_sustained(dbaked, qf, o_d, d_d, d_d, opt_deep))
    times = []
    for i in range(3):
        q_i = _quant(i + 1)
        _ = float(jnp.sum(q_i.q))
        t0 = time.time()
        res = fwd_sustained(dbaked, q_i, o_d, d_d, d_d, opt_deep)
        _ = float(res)
        times.append(time.time() - t0)
    deep_int8_s = min(times) / N_SUSTAIN
    deep_int8_mrays = n_rays / deep_int8_s / 1e6

    # Deep-scene tape replay: depth-9's march is ~60% structure gathers
    # from HBM (brick atlas + unpinnable top) — the tape removes them
    # entirely, leaving the pool gather + radiometry (measured 5.2x).
    # Pixel-order output like the headline tape.
    dtape = rd.record_persp(c2w, W, H, fx=W * 1.1,
                            n_features=dfeats.shape[0])

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def tape_sustained_q(tp, f, opt_):
        def one(i, acc):
            ff = (
                f._replace(scale=f.scale * (1.0 + 1e-7 * i))
                if isinstance(f, tuple) else f * (1.0 + 1e-7 * i)
            )
            out = tape_ops.replay_render(tp, ff, opt_, unsort=True)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, N_TAPE, one, 0.0)

    def bench_tape_replay(tp, f, opt_, n_iter=3):
        _ = float(tape_sustained_q(tp, f, opt_))
        times = []
        for i in range(n_iter):
            f_i = (
                f._replace(scale=f.scale * (1.0 + 1e-7 * (i + 1)))
                if isinstance(f, tuple) else f * (1.0 + 1e-7 * (i + 1))
            )
            _ = float(jnp.sum(f_i.scale if isinstance(f_i, tuple) else f_i))
            t0 = time.time()
            _ = float(tape_sustained_q(tp, f_i, opt_))
            times.append(time.time() - t0)
        return min(times) / N_TAPE

    deep_tape_s = bench_tape_replay(dtape, dfeats, opt_deep)
    deep_tape_mrays = n_rays / deep_tape_s / 1e6
    deep_tape_int8_s = bench_tape_replay(dtape, qf, opt_deep)
    deep_tape_int8_mrays = n_rays / deep_tape_int8_s / 1e6

    # Dynamic serving metric: the fused temporal pipeline
    # (render_dynamic_frames — per frame: LBS warp, construct_tree
    # re-point, bake refresh, 800x800 render — in ONE scanned dispatch).
    # Guarded: the headline metrics above must survive any failure here.
    dyn = {}
    try:
        drng = np.random.RandomState(1)
        Q = 20000
        pts = np.clip(
            (0.5 + 0.15 * drng.randn(Q, 3)), 0.2, 0.8
        ).astype(np.float32)
        dfeats = jnp.asarray(
            np.concatenate(
                [drng.rand(Q, 3), 8.0 + drng.rand(Q, 1)], axis=1
            ).astype(np.float32)
        )
        sw = np.stack([1.0 - pts[:, 2], pts[:, 2]], axis=1).astype(np.float32)
        ji = np.tile(np.array([0, 1], np.int32), (Q, 1))
        dt_tree = st.N3Tree(N=2, data_dim=4, depth_limit=6)
        dt_tree.refine(repeats=5)
        # Point the canonical tree at the cloud so the cost plan
        # (schedule="cost" below) sees the canonical-pose occupancy.
        dt_tree.construct_tree(jnp.asarray(pts))
        dt_tree.features = dfeats
        dr = st.VolumeRenderer(dt_tree)
        n_frames = 4
        poses = []
        for i in range(n_frames):
            a = 0.5 * np.sin(2 * np.pi * i / n_frames)
            c_, s_ = np.cos(a), np.sin(a)
            rot = np.array(
                [[c_, -s_, 0, 0], [s_, c_, 0, 0], [0, 0, 1, 0],
                 [0, 0, 0, 1]], np.float32,
            )
            poses.append(np.stack([np.eye(4, dtype=np.float32), rot]))
        poses = np.stack(poses)
        src = np.stack([np.eye(4, dtype=np.float32)] * 2)

        # Tile order: a cost plan computed on the canonical pose goes
        # STALE once the cloud animates (measured 12.9 -> 7.4 fps: a
        # stale plan loses both cost homogeneity and tile coherence).
        # schedule="cost" on the dynamic path pays only for near-static
        # motion.
        def dyn_run(i, fast):
            outs = dr.render_dynamic_frames(
                dfeats * (1.0 + 1e-3 * i), poses, src, pts, sw, ji,
                c2w=c2w, width=W, height=H, fx=W * 1.1,
                update_tree=False, fast=fast,
            )
            return float(jnp.sum(outs))

        dyn = {"dynamic_points": Q}
        for fast, key in ((False, "dynamic_fused"), (True, "dynamic_fast")):
            _ = dyn_run(0, fast)  # compile
            dts = []
            for i in range(3):
                t0 = time.time()
                _ = dyn_run(i + 1, fast)
                dts.append(time.time() - t0)
            dyn_s = min(dts) / n_frames
            dyn[key + "_frames_s"] = round(1.0 / dyn_s, 2)
            dyn[key + "_frame_ms"] = round(dyn_s * 1e3, 1)

        # Union-occupancy schedule (round-5 verdict #3): MEASURED
        # NEGATIVE on this loop — 190-269 ms/frame vs 107/73 tile
        # (probe_dyn_union.py + C=1024 retest). Mechanism: the fused
        # loop's structure tables are SCAN-CARRIED (refreshed per
        # frame), so they cannot VMEM-pin; its gathers run at the
        # locality-SENSITIVE HBM rate, and any cost reordering destroys
        # the tile locality it needs (the same mechanism as the
        # in-dispatch render_persp cost case, 69.6 -> 125 ms). The
        # schedule stays available (semantics-free, cached) but is not
        # benchmarked; tile order remains the dynamic default.

        # Dynamic TAPE serving (round 4): data-indirect (cell-indexed)
        # replay — ONE record against the animation's union occupancy,
        # then per frame: LBS warp + construct_tree + radiometry replay
        # (data rows resolve through the frame's index table; no
        # structure walk, no bake refresh, no DDA in the frame loop).
        t0 = time.time()
        _ = dr.record_dynamic_persp(
            c2w, poses, src, pts, sw, ji, W, H, fx=W * 1.1
        )
        dyn["dynamic_tape_record_s"] = round(time.time() - t0, 2)
        # WARM record (round-5 verdict #2): the production cost of
        # taping a NEW animation once executables are cached — measured
        # exactly as bench_tape does for static tapes (clear the tape
        # cache, re-record). The cold number above includes first
        # compiles of the union pre-pass + record chunks.
        dr._tape_cache.clear()
        t0 = time.time()
        _ = dr.record_dynamic_persp(
            c2w, poses, src, pts, sw, ji, W, H, fx=W * 1.1
        )
        dyn["dynamic_tape_record_warm_s"] = round(time.time() - t0, 2)

        def dyn_tape_run(i, fast):
            outs = dr.render_dynamic_tape_frames(
                dfeats * (1.0 + 1e-3 * i), poses, src, pts, sw, ji,
                c2w=c2w, width=W, height=H, fx=W * 1.1,
                update_tree=False, fast=fast,
            )
            return float(jnp.sum(outs))

        for fast, key in (
            (False, "dynamic_tape"), (True, "dynamic_tape_fast")
        ):
            _ = dyn_tape_run(0, fast)  # compile
            dts = []
            for i in range(3):
                t0 = time.time()
                _ = dyn_tape_run(i + 1, fast)
                dts.append(time.time() - t0)
            dyn_s = min(dts) / n_frames
            dyn[key + "_frames_s"] = round(1.0 / dyn_s, 2)
            dyn[key + "_frame_ms"] = round(dyn_s * 1e3, 1)
    except Exception as e:  # pragma: no cover - defensive for the driver
        dyn = {"dynamic_error": repr(e)[:200]}

    # DEEP dynamic serving (round-5 verdict #6): animated structure on
    # the depth-9 tree, fixed camera, through the cell-indexed tape.
    # The canonical cloud lives ON the shell (z-rotations keep it in
    # refined cells); construct_tree re-points depth-9 leaves per
    # frame. Mutates dtree (re-pointed at the cloud) — runs LAST among
    # deep metrics.
    try:
        drng9 = np.random.RandomState(2)
        Q9 = 40000
        u = drng9.randn(Q9, 3)
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        pts9 = (0.5 + 0.30 * u).astype(np.float32)
        dfeats9 = jnp.asarray(
            np.concatenate(
                [drng9.rand(Q9, 3), 8.0 + drng9.rand(Q9, 1)], axis=1
            ).astype(np.float32)
        )
        sw9 = np.stack(
            [1.0 - pts9[:, 2], pts9[:, 2]], axis=1
        ).astype(np.float32)
        ji9 = np.tile(np.array([0, 1], np.int32), (Q9, 1))
        poses9 = []
        for i in range(4):
            a = 0.4 * np.sin(2 * np.pi * i / 4)
            c_, s_ = np.cos(a), np.sin(a)
            rot = np.array(
                [[c_, -s_, 0, 0], [s_, c_, 0, 0], [0, 0, 1, 0],
                 [0, 0, 0, 1]], np.float32,
            )
            poses9.append(np.stack([np.eye(4, dtype=np.float32), rot]))
        poses9 = np.stack(poses9)
        # Reset the index table (the shell build pointed every leaf at
        # a pool row; rows < Q9 would alias point features) and point
        # the tree at the canonical cloud.
        dtree._data[:] = st.DATA_SENTINEL
        dtree._invalidate()
        dtree.construct_tree(jnp.asarray(pts9))
        dtree.features = dfeats9
        dr9 = st.VolumeRenderer(dtree, step_size=1e-3)

        t0 = time.time()
        _ = dr9.record_dynamic_persp(
            c2w, poses9, src, pts9, sw9, ji9, W, H, fx=W * 1.1
        )
        dyn["deep9_dyn_record_s"] = round(time.time() - t0, 2)

        def deep_dyn_run(i):
            outs = dr9.render_dynamic_tape_frames(
                dfeats9 * (1.0 + 1e-3 * i), poses9, src, pts9, sw9, ji9,
                c2w=c2w, width=W, height=H, fx=W * 1.1,
                update_tree=False,
            )
            return float(jnp.sum(outs))

        _ = deep_dyn_run(0)
        dts = []
        for i in range(3):
            t0 = time.time()
            _ = deep_dyn_run(i + 1)
            dts.append(time.time() - t0)
        dd_s = min(dts) / 4
        dyn["deep9_dyn_tape_frame_ms"] = round(dd_s * 1e3, 1)
        dyn["deep9_dyn_tape_mrays_s"] = round(n_rays / dd_s / 1e6, 3)
    except Exception as e:  # pragma: no cover - defensive
        dyn["deep9_dyn_error"] = repr(e)[:200]

    alpha = float(jnp.mean(out[:, -1]))
    print(
        json.dumps(
            {
                "metric": "fwd_render_throughput_800x800_sh9",
                # Headline = the recorded-tape serving path: exactly
                # this benchmark's workload (fixed camera, per-frame
                # features) rendered by the production render_persp_tape
                # architecture; record cost reported in tape_record_ms.
                # March-only numbers (the moving-camera / fresh-rays
                # regime, comparable to BENCH_r01/r02) in fwd_march_*.
                "value": round(tape_fwd_mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(tape_fwd_mrays / 100.0, 4),
                "fwd_tape_ms": round(tape_fwd_s * 1e3, 1),
                "tape_record_ms": round(tape_rec_s * 1e3, 0),
                "tape_fwd_bwd_mrays_s": round(tape_bwd_mrays, 3),
                "tape_fwd_bwd_ms": round(tape_bwd_s * 1e3, 1),
                "tape_fwd_bwd_seq_mrays_s": round(tape_bwd_seq_mrays, 3),
                "tape_fwd_bwd_seq_ms": round(tape_bwd_seq_s * 1e3, 1),
                "tape_train_chain_mrays_s": round(chain_mrays, 3),
                "tape_train_chain_step_ms": round(chain_s * 1e3, 1),
                "tape_train_chain_steps_per_call": N_CHAIN,
                **mb,
                "fwd_march_mrays_s": round(fwd_mrays, 3),
                "fwd_march_noplan_mrays_s": round(noplan_mrays, 3),
                "fwd_march_noplan_ms": round(noplan_s * 1e3, 1),
                "fwd_ms": round(fwd_s * 1e3, 1),
                "fwd_single_call_ms": round(fwd_lat_s * 1e3, 1),
                "fwd_bwd_mrays_s": round(bwd_mrays, 3),
                "fwd_bwd_ms": round(bwd_s * 1e3, 1),
                "fwd_bwd_single_call_ms": round(bwd_lat_s * 1e3, 1),
                "fwd_bwd_vs_target": round(bwd_mrays / 25.0, 4),
                "tape_fwd_bwd_vs_target": round(tape_bwd_mrays / 25.0, 4),
                "sustained_frames_per_call": N_SUSTAIN,
                "tape_frames_per_call": N_TAPE,
                "tape_bwd_frames_per_call": N_TAPE_BWD,
                "fast_mode_mrays_s": round(fast_mrays, 3),
                "fast_mode_ms": round(fast_s * 1e3, 1),
                "opaque_fast_mrays_s": round(opaque_fast_mrays, 3),
                "opaque_fast_ms": round(opaque_fast_s * 1e3, 1),
                "tape_fast_mrays_s": round(tape_fast_mrays, 3),
                "tape_fast_ms": round(tape_fast_s * 1e3, 1),
                "tape_opaque_fast_mrays_s": round(tape_opaque_mrays, 3),
                "tape_opaque_fast_ms": round(tape_opaque_s * 1e3, 1),
                "deep9_mrays_s": round(deep_mrays, 3),
                "deep9_ms": round(deep_s * 1e3, 1),
                "deep9_build_s": round(deep_build_s, 1),
                "deep9_int8_mrays_s": round(deep_int8_mrays, 3),
                "deep9_int8_ms": round(deep_int8_s * 1e3, 1),
                "deep9_int8_max_err": round(deep_int8_err, 5),
                "deep9_tape_mrays_s": round(deep_tape_mrays, 3),
                "deep9_tape_ms": round(deep_tape_s * 1e3, 1),
                "deep9_tape_int8_mrays_s": round(deep_tape_int8_mrays, 3),
                "ray_schedule": "cost",
                "plan_block_ms": round(plan_block_s * 1e3, 1),
                "fwd_march_blockplan_mrays_s": round(blockplan_mrays, 3),
                "plan_exact_ms": round(plan_exact_s * 1e3, 1),
                "plan_fast_ms": round(plan_fast_s * 1e3, 1),
                "plan_opaque_ms": round(plan_opaque_s * 1e3, 1),
                "plan_deep_ms": round(plan_deep_s * 1e3, 1),
                "n_rays": int(n_rays),
                "tree_internal_nodes": int(tree.n_internal),
                "tree_leaves": int(tree.n_leaves),
                "n_features": int(feats.shape[0]),
                "mean_alpha": round(alpha, 4),
                "scene_build_s": round(build_s, 2),
                "bake_s": round(bake_s, 2),
                "device": str(jax.devices()[0]),
                **orbit,
                **dyn,
            }
        )
    )


if __name__ == "__main__":
    main()
