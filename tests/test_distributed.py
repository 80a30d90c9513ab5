"""Multi-process (multi-host simulation) test: 2 CPU processes x 4
virtual devices each, coordinated through jax.distributed.initialize —
the standard JAX pod simulation. Each process holds half the ray batch;
the global mesh spans 8 devices; process 0 checks the sharded render
against a single-process render of the full batch.

The worker script is spawned as real OS processes (the in-process JAX
runtime cannot host two process ids), so this test exercises the actual
DCN code path: distributed init, global mesh construction,
make_array_from_process_local_data, and the GSPMD-sharded march.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.environ["REPO_ROOT"])
sys.path.insert(0, os.path.join(os.environ["REPO_ROOT"], "tests"))
import jax
jax.config.update("jax_platforms", "cpu")
from svox_t_tpu.parallel import (initialize, global_ray_mesh,
                                 shard_global_rays, replicate_global,
                                 render_sharded)
initialize(coordinator_address=f"127.0.0.1:{port}",
           num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, len(jax.devices())

import numpy as np
import jax.numpy as jnp
import svox_t_tpu as st
from helpers import build_tree, make_rays

rng = np.random.RandomState(7)
t, feats, centers = build_tree(rng, data_dim=4, depth_limit=4,
                               n_random_refines=2)
r = st.VolumeRenderer(t)
opt = r._get_options(False)
spec = t._spec()

B = 64  # per process
all_rays = make_rays(np.random.RandomState(11), B * nproc)
lo, hi = pid * B, (pid + 1) * B
local = st.Rays(np.asarray(all_rays.origins)[lo:hi],
                np.asarray(all_rays.dirs)[lo:hi],
                np.asarray(all_rays.viewdirs)[lo:hi])

mesh = global_ray_mesh()
grays = shard_global_rays(mesh, local)
gfeats = replicate_global(mesh, np.asarray(feats))
out = render_sharded(mesh, spec, gfeats, grays, opt)

# every process fetches its addressable shards; process 0 compares the
# full global result against a plain single-device render
from svox_t_tpu.ops.render import volume_render
ref = np.asarray(volume_render(
    spec, jnp.asarray(np.asarray(feats)), all_rays.origins, all_rays.dirs,
    all_rays.viewdirs, opt,
))
local_rows = np.concatenate([
    np.asarray(s.data) for s in sorted(
        out.addressable_shards, key=lambda s: s.index[0].start or 0)
])
np.testing.assert_allclose(local_rows, ref[lo:hi], atol=1e-5)
print(f"proc {pid} OK", flush=True)
"""


def _run_workers(worker, repo, port, timeout=540):
    env = dict(os.environ)
    env["REPO_ROOT"] = repo
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        return None, "distributed workers timed out:\n" + "\n".join(outs)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 or f"proc {pid} OK" not in out:
            return False, f"proc {pid} failed:\n{out[-4000:]}"
    return True, ""


def test_two_process_render(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    # Bind-then-release port picking has a TOCTOU window before the
    # coordinator process rebinds it; retry once on a fresh port so a
    # stolen port doesn't fail the suite spuriously.
    err = ""
    for _attempt in range(2):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        ok, err = _run_workers(worker, repo, port)
        if ok:
            return
    pytest.fail(err)
