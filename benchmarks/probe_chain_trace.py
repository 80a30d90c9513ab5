#!/usr/bin/env python
"""Probe: why is the full-tape SGD chain (train_steps, 44.2 ms/step)
~7 ms/step slower than the independent-grad sequential fori (36.9)?

Suspects:
  a. the (Bp, 3) f32 target buffer (~8 MB) rides the whole scan as a
     loop-invariant operand and evicts VMEM-pinned tables (the CLAUDE
     cost-model mechanism) — test: bf16 targets halve it;
  b. non-donated feature carry copies;
  c. the loss/update epilogue itself.

Measures train_steps at f32 vs bf16 targets, the no-target chain
(update from grad of sum — the old seq shape + update), and a device
trace of the f32 chain.
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

W = H = 800
N = 8


def main():
    tree, feats = build_shell_tree(depth=7, data_format="SH9",
                                   data_dim=28)
    r = st.VolumeRenderer(tree)
    c2w = orbit_camera()
    tape = r.record_persp(c2w, W, H, fx=W * 1.1, features=feats,
                          group_size=1)
    opt = r._get_options(False)
    tgt = tape_ops.unsort_output(
        tape, tape_ops.replay_render(tape, feats, opt, unsort=False)
    )[:, :3]
    jax.block_until_ready(tgt)
    n_rays = tape.n_rays

    def timed(fn, *a):
        _ = float(jnp.sum(fn(*a)[0]))
        ts = []
        for i in range(3):
            t0 = time.time()
            _ = float(jnp.sum(fn(*a)[0]))
            ts.append(time.time() - t0)
        return min(ts) / N

    for name, t_arr in (("f32 targets", tgt),
                        ("bf16 targets", tgt.astype(jnp.bfloat16))):
        def run(f0, t_=t_arr):
            f_out, losses, _ = tsub.train_steps(
                tape, t_, f0, opt, N, lr=0.05)
            return f_out, losses
        s = timed(run, feats * 0.9)
        print(f"train_steps {name}: {s*1e3:.1f} ms/step = "
              f"{n_rays/s/1e6:.1f} Mrays/s")

    # no-target chain: grad of sum + update (isolates the target/loss
    # epilogue from the chain structure)
    @functools.partial(jax.jit, static_argnames=("opt_",))
    def chain_sum(tp, f, opt_):
        def step(carry, _):
            ff = carry
            g = jax.grad(lambda x: jnp.sum(tape_ops.replay_render(
                tp, x, opt_, unsort=False)))(ff)
            return ff - 0.05 * g, jnp.sum(g)
        f_out, gs = jax.lax.scan(step, f, None, length=N)
        return f_out, gs

    s = timed(chain_sum, tape, feats * 0.9, opt)
    print(f"chain (sum loss, no targets): {s*1e3:.1f} ms/step = "
          f"{n_rays/s/1e6:.1f} Mrays/s")

    # independent-grad fori baseline (the old tape_fwd_bwd_seq shape)
    @functools.partial(jax.jit, static_argnames=("opt_",))
    def fori_seq(tp, f, opt_):
        def one(i, acc):
            g = jax.grad(lambda ff: jnp.sum(tape_ops.replay_render(
                tp, ff, opt_, unsort=False)))(f * (1.0 + 1e-7 * i))
            return acc + jnp.sum(g)
        return jax.lax.fori_loop(0, N, one, 0.0)

    _ = float(fori_seq(tape, feats, opt))
    ts = []
    for i in range(3):
        f_i = feats * (1.0 + 1e-7 * (i + 1))
        _ = float(jnp.sum(f_i))
        t0 = time.time()
        _ = float(fori_seq(tape, f_i, opt))
        ts.append(time.time() - t0)
    s = min(ts) / N
    print(f"fori independent grads: {s*1e3:.1f} ms/step = "
          f"{n_rays/s/1e6:.1f} Mrays/s")

    with device_trace("/tmp/chain_trace") as t:
        f_out, losses, _ = tsub.train_steps(tape, tgt, feats * 0.9,
                                            opt, N, lr=0.05)
        _ = float(jnp.sum(f_out))
    t.summary(top=15)
    print(f"total device ms: {t.total_ms:.1f} (/{N} = "
          f"{t.total_ms/N:.2f} ms/step)")


if __name__ == "__main__":
    main()
