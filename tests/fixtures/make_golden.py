#!/usr/bin/env python
"""Generate the checked-in golden fixtures (run on CPU from tests/):

  golden_config1.npz   — BASELINE config 1: depth-3 RGBA shell @ 100x100
  golden_config2.npz   — BASELINE config 2 scene (depth-7 SH9 shell) at
                         96x96 (small enough to check in; exercises the
                         same SH9 radiometry + baked traversal)
  reference_schema.npz — a byte-exact *reference-schema* checkpoint
                         (int32 index-table `data`, no `features` key,
                         keys exactly as svox_t/svox.py:679-752 writes),
                         produced independently of N3Tree.save().

Regenerate ONLY when radiometry semantics are changed deliberately and
the parity suite has been re-validated; golden tests exist to catch
accidental drift.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))

import svox_t_tpu as st
from benchmarks.scenes import build_shell_tree, orbit_camera


def golden(depth, data_format, data_dim, size, fname):
    tree, feats = build_shell_tree(
        depth=depth, data_format=data_format, data_dim=data_dim
    )
    r = st.VolumeRenderer(tree)
    c2w = orbit_camera()
    img = np.asarray(
        r.render_persp(feats, c2w, width=size, height=size, fx=float(size))
    )
    np.savez_compressed(os.path.join(HERE, fname), img=img, c2w=c2w)
    print(fname, img.shape, "mean_alpha", img[..., -1].mean())


def reference_schema():
    """Write a reference-schema file with raw np.savez (no N3Tree.save):
    the key set and dtypes follow svox_t/svox.py:679-752 exactly."""
    rng = np.random.RandomState(7)
    tree, feats = build_shell_tree(
        depth=3, data_format="SH1", data_dim=4, seed=7
    )
    cap = tree._child.shape[0]
    N = tree.N
    np.savez_compressed(
        os.path.join(HERE, "reference_schema.npz"),
        data_dim=np.int64(4),
        child=tree._child.astype(np.int32),
        parent_depth=tree._parent_depth.astype(np.int32),
        n_internal=np.int64(tree._n_internal),
        n_free=np.int64(0),
        invradius3=tree.invradius.astype(np.float32),
        offset=tree.offset.astype(np.float32),
        depth_limit=np.int64(tree.depth_limit),
        geom_resize_fact=np.float64(1.5),
        data=tree._data.astype(np.int32),
        data_format="SH1",
    )
    # companion: the feature pool + a probe query, for the loader test
    centers = np.asarray(tree[:].corners_local + 0.5 * tree[:].lengths_local[:, None])
    np.savez_compressed(
        os.path.join(HERE, "reference_schema_probe.npz"),
        features=np.asarray(feats),
        centers_local=centers.astype(np.float32),
    )
    print("reference_schema.npz", tree)


if __name__ == "__main__":
    golden(3, "RGBA", 4, 100, "golden_config1.npz")
    golden(7, "SH9", 28, 96, "golden_config2.npz")
    reference_schema()
