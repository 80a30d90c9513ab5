#!/usr/bin/env python
"""Probe 2: where do the minibatch-chain milliseconds go, and does a
PACKED single-gather source fix the gather cost?

probe_minibatch.py measured (v5e, 4x800^2 rig, B=64k, C=1024):
  train chain 25.46 ms/step; gathers 10.31; subset fwd 2.05;
  subset fwd+bwd 6.94 — leaving ~8 ms/step unattributed.

Here:
  1. device-trace ONE train_minibatches dispatch (per-op attribution);
  2. packed source prototype: ONE (rows, 2S+16) int32 gather (idx + dt
     bitcast + ray consts bitcast + targets bitcast) vs the 7 separate
     gathers;
  3. subset chunk-size sweep C in {512, 1024, 2048} for fwd and
     fwd+bwd on prebuilt subset tapes (bwd allocated-row padding vs
     round fixed costs).
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
from svox_t_tpu.ops import tape as tape_ops
from svox_t_tpu.ops import tape_subset as tsub
from svox_t_tpu.utils.profiling import device_trace

W = H = int(os.environ.get("PROBE_WH", 800))
V = int(os.environ.get("PROBE_V", 4))
B = int(os.environ.get("PROBE_B", 65536))
N = int(os.environ.get("PROBE_N", 16))


def main():
    tree, feats = build_shell_tree(depth=7, data_format="SH9",
                                   data_dim=28)
    r = st.VolumeRenderer(tree)
    c2ws = np.stack([orbit_camera(theta=0.9 * v, phi=0.3 + 0.1 * v)
                     for v in range(V)])
    tape = r.record_persp_rig(c2ws, W, H, fx=W * 1.1, features=feats,
                              group_size=1)
    src = tsub.TapeRowSource(tape)
    opt = r._get_options(False)
    spec = tree._baked_spec()
    n_rays = tape.n_rays
    rng = np.random.RandomState(0)
    tgt = tape_ops.replay_render(tape, feats, opt, spec)[:, :3]
    jax.block_until_ready(tgt)
    f0 = feats * 0.85
    print(f"scene+tape ready: S={tape.S} samples={tape.n_samples}")

    def batches():
        return np.stack([rng.choice(n_rays, size=B, replace=False)
                         for _ in range(N)])

    # --- 1. trace one chain dispatch --------------------------------
    ids = batches()
    f_out, _ = tsub.train_minibatches(src, ids, tgt, f0, opt, lr=0.05,
                                      spec=spec, chunk_size=1024)
    _ = float(jnp.sum(f_out))
    with device_trace("/tmp/mb_trace") as t:
        f_out, _ = tsub.train_minibatches(src, ids, tgt, f0, opt,
                                          lr=0.05, spec=spec,
                                          chunk_size=1024)
        _ = float(jnp.sum(f_out))
    t.summary(top=25)
    print(f"total device ms: {t.total_ms:.1f} "
          f"(/{N} steps = {t.total_ms/N:.2f} ms/step)")

    # --- 2. packed single-gather prototype --------------------------
    S = src.S
    packed = jnp.concatenate(
        [src.idx_rm,
         jax.lax.bitcast_convert_type(src.dt_rm, jnp.int32),
         jax.lax.bitcast_convert_type(src.vdirs_rm, jnp.int32),
         jax.lax.bitcast_convert_type(
             src.dscale_rm[:, None], jnp.int32),
         src.counts_rm[:, None],
         jax.lax.bitcast_convert_type(
             jnp.take(tgt, tape.inv_pos.argsort(), axis=0)
             if False else jnp.zeros((src.idx_rm.shape[0], 3),
                                     jnp.float32), jnp.int32)],
        axis=1,
    )
    jax.block_until_ready(packed)
    print(f"packed row bytes: {packed.shape[1]*4}")

    plans = [src.prep(ids[n], chunk_size=1024) for n in range(N)]
    pos_all = jnp.asarray(
        np.stack([p.pos_p for p in plans]).astype(np.int32))

    @jax.jit
    def packed_gather_scan(pk, pos):
        def one(carry, p):
            g = jnp.take(pk, p, axis=0)
            return carry + jnp.sum(g[:, :S]), None
        s, _ = jax.lax.scan(one, jnp.zeros((), jnp.int32), pos)
        return s

    _ = int(packed_gather_scan(packed, pos_all))
    ts = []
    for it in range(3):
        ids2 = batches()
        pos2 = jnp.asarray(np.stack(
            [src.prep(ids2[n], chunk_size=1024).pos_p
             for n in range(N)]).astype(np.int32))
        t0 = time.time()
        _ = int(packed_gather_scan(packed, pos2))
        ts.append(time.time() - t0)
    print(f"packed ONE gather: {min(ts)/N*1e3:.2f} ms/step")

    # gather + unpack + transpose (the full per-step source build)
    @jax.jit
    def packed_unpack_scan(pk, pos):
        def one(carry, p):
            g = jnp.take(pk, p, axis=0)
            idx = g[:, :S].reshape(-1, 1024, S).swapaxes(1, 2)
            dt = jax.lax.bitcast_convert_type(
                g[:, S:2 * S], jnp.float32).reshape(
                -1, 1024, S).swapaxes(1, 2)
            vd = jax.lax.bitcast_convert_type(
                g[:, 2 * S:2 * S + 3], jnp.float32)
            return carry + jnp.sum(dt) + jnp.sum(vd) + jnp.sum(idx), None
        s, _ = jax.lax.scan(one, jnp.zeros(()), pos)
        return s

    _ = float(packed_unpack_scan(packed, pos_all))
    ts = []
    for it in range(3):
        pos2 = jnp.asarray(np.stack(
            [src.prep(batches()[n], chunk_size=1024).pos_p
             for n in range(N)]).astype(np.int32))
        t0 = time.time()
        _ = float(packed_unpack_scan(packed, pos2))
        ts.append(time.time() - t0)
    print(f"packed gather+unpack+transpose: {min(ts)/N*1e3:.2f} ms/step")

    # --- 3. subset chunk-size sweep ---------------------------------
    @functools.partial(jax.jit, static_argnames=("opt_", "n"))
    def fwd_n(tp, f, opt_, n):
        def one(i, acc):
            out = tape_ops.replay_render(tp, f * (1.0 + 1e-7 * i), opt_,
                                         unsort=False)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, n, one, 0.0)

    @functools.partial(jax.jit, static_argnames=("opt_", "n"))
    def fwdbwd_n(tp, f, opt_, n):
        def one(i, acc):
            g = jax.grad(lambda ff: jnp.sum(tape_ops.replay_render(
                tp, ff, opt_, unsort=False)))(f * (1.0 + 1e-7 * i))
            return acc + jnp.sum(g)
        return jax.lax.fori_loop(0, n, one, 0.0)

    for C in (512, 1024, 2048):
        sub = tsub.subset_tape(src, ids[0], chunk_size=C, r_quant=16)
        Rb = int(sub.bwd_round_chunk.shape[0])
        alloc = Rb * sub.bwd_prog_K * C
        line = f"C={C}: bwd rounds={Rb} alloc={alloc/1e3:.0f}k"
        for name, fn in (("fwd", fwd_n), ("fwd+bwd", fwdbwd_n)):
            _ = float(fn(sub, feats, opt, N))
            ts = []
            for it in range(3):
                f_i = feats * (1.0 + 1e-7 * (it + 1))
                _ = float(jnp.sum(f_i))
                t0 = time.time()
                _ = float(fn(sub, f_i, opt, N))
                ts.append(time.time() - t0)
            line += f"  {name} {min(ts)/N*1e3:.2f} ms"
        print(line)


if __name__ == "__main__":
    main()
