import os, sys, time, functools, dataclasses
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import svox_t_tpu as st
from benchmarks.scenes import build_shell_tree, build_opaque_tree, orbit_camera
from svox_t_tpu.ops import tape as tape_ops

W = H = 800; N = 32; B = W * H

@functools.partial(jax.jit, static_argnames=("opt",))
def sustained(tp, f, opt):
    def one(i, acc):
        out = tape_ops.replay_render(tp, f * (1.0 + 1e-7 * i), opt, unsort=True)
        return acc + jnp.sum(out)
    return jax.lax.fori_loop(0, N, one, 0.0)

def bench(tp, f, opt, n_iter=4):
    _ = float(sustained(tp, f, opt))
    ts = []
    for i in range(n_iter):
        fi = f * (1.0 + 1e-6 * (i + 1)); _ = float(jnp.sum(fi))
        t0 = time.time(); _ = float(sustained(tp, fi, opt)); ts.append(time.time() - t0)
    return min(ts) / N

for label, build in (("fast-shell", build_shell_tree), ("opaque", build_opaque_tree)):
    tree, feats = build(depth=7, data_format="SH9", data_dim=28)
    r = st.VolumeRenderer(tree, step_size=1e-3, chunk_size=2048)
    c2w = orbit_camera()
    tp = r.record_persp(c2w, W, H, fx=W * 1.1, features=feats, fast=True)
    opt = dataclasses.replace(r._get_options(True), chunk_size=2048)
    import numpy as np
    o_prog = np.asarray(tape_ops.replay_render(tp, feats, opt, unsort=True))
    opt_w = dataclasses.replace(opt, tape_stop_program=0)
    o_while = np.asarray(tape_ops.replay_render(tp, feats, opt_w, unsort=True))
    dev = float(np.abs(o_prog - o_while).max())
    s_p = bench(tp, feats, opt)
    s_w = bench(tp, feats, opt_w)
    print(f"[{label}] rounds={tp.round_chunk.shape[0]} program {s_p*1e3:.1f} ms "
          f"({B/s_p/1e6:.1f} Mrays/s)  while {s_w*1e3:.1f} ms ({B/s_w/1e6:.1f})  "
          f"max_dev {dev:.2e}")
