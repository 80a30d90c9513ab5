#!/usr/bin/env python
"""Capture a jax.profiler device trace of the headline forward render and
aggregate device-side op time. Per CLAUDE.md, device trace events are the
only trustworthy timing on the axon relay.

Usage: python benchmarks/profile_fwd.py [fwd|bwd|fast]
Writes aggregation to stdout; trace dir under /tmp/svox_trace.
"""




import os
import sys


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import functools

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import svox_t_tpu as st
from benchmarks.scenes import build_shell_tree, orbit_camera
from svox_t_tpu.ops.render import cam2world_rays, volume_render


def aggregate(trace_dir, top=40):
    from svox_t_tpu.utils.profiling import TraceResult

    TraceResult(trace_dir).summary(top=top)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    W = H = 800
    tree, feats = build_shell_tree(depth=7, data_format="SH9", data_dim=28)
    baked = tree._baked_spec()
    r = st.VolumeRenderer(tree, step_size=1e-3)
    opt = r._get_options(mode == "fast")
    c2w = orbit_camera()
    origins, dirs = cam2world_rays(c2w, W, H, fx=W * 1.1, fy=W * 1.1)
    from svox_t_tpu.models.renderer import _tile_perm

    perm, _ = _tile_perm(W, H, 32)
    origins, dirs = origins[perm], dirs[perm]
    vdirs = dirs

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def fwd(sp, f, o, d, v, opt_):
        return volume_render(sp, f, o, d, v, opt_)

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def fwdbwd(sp, f, o, d, v, opt_):
        return jax.grad(lambda ff: jnp.sum(volume_render(sp, ff, o, d, v, opt_)))(f)

    fn = fwdbwd if mode == "bwd" else fwd
    out = fn(baked, feats, origins, dirs, vdirs, opt)
    _ = float(jnp.sum(out))

    trace_dir = f"/tmp/svox_trace_{mode}"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    f_i = feats * (1.0 + 1e-7)
    res = fn(baked, f_i, origins, dirs, vdirs, opt)
    _ = float(jnp.sum(res))
    jax.profiler.stop_trace()
    aggregate(trace_dir)


if __name__ == "__main__":
    main()
