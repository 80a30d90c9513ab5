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
    f_out, _, _ = tsub.train_minibatches(src, ids, tgt, f0, opt, lr=0.05,
                                      spec=spec, chunk_size=1024)
    _ = float(jnp.sum(f_out))
    with device_trace("/tmp/mb_trace") as t:
        f_out, _, _ = tsub.train_minibatches(src, ids, tgt, f0, opt,
                                          lr=0.05, spec=spec,
                                          chunk_size=1024)
        _ = float(jnp.sum(f_out))
    t.summary(top=25)
    print(f"total device ms: {t.total_ms:.1f} "
          f"(/{N} steps = {t.total_ms/N:.2f} ms/step)")

    # --- 2. (historical) the packed single-gather prototype measured
    # here (7.02 ms full-row gather vs 10.31 for 6 separate gathers)
    # drove the production design: TapeRowSource now stores ONE packed
    # int32 matrix and the per-step gather touches only the non-zero
    # suffix (~12% of rows) — see probe_minibatch.py "gather only" for
    # the production number.

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
