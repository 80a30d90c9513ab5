"""Anchor tests against the ACTUAL reference implementation.

The reference (`/root/reference/svox_t`, PyTorch) ships executable
pure-torch code paths: `eval_sh` / `eval_sh_bases` (sh.py:58-162), the
CPU point-query loop (`N3Tree.forward`, svox.py:232-276), and the CPU
DDA render loop (`VolumeRenderer.forward`, renderer.py:227-301 — behind
an `assert False`, extracted here via a source shim). These tests import
that code directly (torch CPU) and compare it to this package, so the
suite fails if our radiometry/traversal diverge from the reference's own
code rather than from a re-derivation.

No reference code is copied into this repo: everything is imported (or
source-extracted at runtime) from the read-only reference checkout.
"""

import inspect
import os
import sys
import textwrap

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

torch = pytest.importorskip("torch")

_REF_ROOT = "/root/reference"
if not os.path.isdir(os.path.join(_REF_ROOT, "svox_t")):
    pytest.skip("reference checkout not available", allow_module_level=True)
if _REF_ROOT not in sys.path:
    sys.path.insert(0, _REF_ROOT)

import warnings

with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    import svox_t as ref  # noqa: E402  (the reference package)
    from svox_t import sh as ref_sh  # noqa: E402
    from svox_t import renderer as ref_renderer_mod  # noqa: E402

import svox_t_tpu as st  # noqa: E402
from svox_t_tpu.ops import sh as our_sh  # noqa: E402
from svox_t_tpu.ops.query import query  # noqa: E402
from svox_t_tpu.ops.render import volume_render  # noqa: E402

from helpers import build_tree, make_rays  # noqa: E402


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(1234)


# ---------------------------------------------------------------------------
# 1. Spherical harmonics: reference sh.py vs ops/sh.py
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("deg", [0, 1, 2, 3, 4])
def test_eval_sh_bases_matches_reference(rng, deg):
    dirs = rng.randn(257, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    # The reference's parameter is named `basis_dim` but asserted and
    # used as the DEGREE (sh.py:126).
    ref_out = ref_sh.eval_sh_bases(deg, torch.from_numpy(dirs)).numpy()
    our_out = np.asarray(our_sh.eval_sh_bases(deg, jnp.asarray(dirs)))
    np.testing.assert_allclose(our_out, ref_out, atol=1e-6)


@pytest.mark.parametrize("deg", [0, 1, 2, 3, 4])
def test_eval_sh_matches_reference(rng, deg):
    B = 65
    C = 3
    basis_dim = (deg + 1) ** 2
    dirs = rng.randn(B, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    coeffs = rng.randn(B, C, basis_dim).astype(np.float32)
    ref_out = ref_sh.eval_sh(
        deg, torch.from_numpy(coeffs), torch.from_numpy(dirs)
    ).numpy()
    our_out = np.asarray(
        our_sh.eval_sh(deg, jnp.asarray(coeffs), jnp.asarray(dirs))
    )
    np.testing.assert_allclose(our_out, ref_out, atol=1e-5)


# ---------------------------------------------------------------------------
# 2. Traversal: the reference CPU query loop vs ops/query on OUR trees
#    (structure shipped through the npz schema both sides implement)
# ---------------------------------------------------------------------------


def test_cpu_query_loop_matches_reference(rng, tmp_path):
    """Traversal + gather anchor: our query values vs the reference's
    CPU descent loop (svox.py:232-276) on the same irregular structure.

    The loop is run on the upstream-svox float-data form of the tree
    (per-leaf feature rows expanded into `data`): on svox_t's own int32
    index table the reference CPU path crashes outright (float result
    buffer filled from an Int source, svox.py:264), so the float form
    is the only executable version of that code — and it exercises
    identical descent logic."""
    t, feats, centers = build_tree(rng, depth_limit=5, n_random_refines=3)
    rt = _float_data_ref_tree(t, feats, tmp_path)
    assert int(rt.n_internal) == t.n_internal

    pts = (rng.rand(512, 3).astype(np.float32) * 2.4 - 0.7).astype(np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref_vals = ref.N3Tree.forward(
            rt, None, torch.from_numpy(pts.copy()), cuda=False
        ).numpy()

    spec = t._spec()
    vals, _, _ = query(spec, feats, jnp.asarray(pts), True)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, atol=1e-6)


def test_cpu_query_node_ids_match_reference(rng, tmp_path):
    """Packed leaf-node ids from the reference CPU descent == ours."""
    t, feats, centers = build_tree(rng, depth_limit=4, n_random_refines=2)
    rt = _float_data_ref_tree(t, feats, tmp_path)
    pts = (rng.rand(256, 3).astype(np.float32) * 1.6 - 0.3).astype(np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        _, ref_packed = ref.N3Tree.forward(
            rt, None, torch.from_numpy(pts.copy()), cuda=False,
            want_node_ids=True,
        )
    _, node_ids, _ = query(t._spec(), feats, jnp.asarray(pts), True)
    np.testing.assert_array_equal(
        np.asarray(node_ids).astype(np.int64), ref_packed.numpy()
    )


# ---------------------------------------------------------------------------
# 3. Radiometry: the reference CPU DDA render loop vs ops/render
# ---------------------------------------------------------------------------


def _extract_ref_cpu_render():
    """Compile the reference VolumeRenderer.forward with the
    `assert False` guard removed (renderer.py:225), in the reference
    module's own namespace. `maybe_eval_basis` is an unresolved name in
    that code (an upstream-svox symbol); bind it to the reference's own
    eval_sh_bases."""
    src = inspect.getsource(ref.VolumeRenderer.forward)
    src = textwrap.dedent(src)
    lines = [
        ln for ln in src.splitlines()
        if "assert False" not in ln and 'warn("Using slow volume' not in ln
    ]
    ns = dict(vars(ref_renderer_mod))
    dim_to_deg = {1: 0, 4: 1, 9: 2, 16: 3, 25: 4}
    ns["maybe_eval_basis"] = lambda bd, dirs: ref_sh.eval_sh_bases(
        dim_to_deg[bd], dirs
    )
    exec("\n".join(lines), ns)
    return ns["forward"]


class _CpuViewTree(ref.N3Tree):
    """Reference tree whose (B,3)-point views resolve PER POINT on CPU.

    The stock `N3TreeView.__init__` calls `forward(..., want_node_ids=
    True, want_leaf_node=True)` and expects 3 returns, but the
    reference's CPU branch returns 2 (it predates the svox_t view) —
    and its `unique_leaf_node` de-duplication would break per-point
    value lookup anyway. This subclass feeds the view each point's own
    (node, i, j, k), computed by the reference's CPU descent + its own
    `_unpack_index`."""

    def forward(self, features, indices, cuda=True, want_node_ids=False,
                world=True, want_data_ids=False, want_leaf_node=False):
        if want_node_ids and want_leaf_node:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                vals, packed = ref.N3Tree.forward(
                    self, None, indices, cuda=False,
                    want_node_ids=True, world=world,
                )
            return vals, packed, self._unpack_index(packed.long())
        return ref.N3Tree.forward(
            self, features, indices, cuda=False,
            want_node_ids=want_node_ids, world=world,
        )


def _float_data_ref_tree(t, feats, tmp_path):
    """Reference tree in upstream-svox form: `data` holds float feature
    rows directly (that is the layout the reference CPU DDA loop reads),
    expanded from our (structure, index table, pool) triple."""
    path = os.path.join(str(tmp_path), "anchor_dda.npz")
    t.save(path, shrink=False)
    z = np.load(path)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rt = _CpuViewTree(map_location="cpu")
    rt.data_dim = int(feats.shape[1])
    rt.child = torch.from_numpy(np.asarray(z["child"]))
    rt.N = rt.child.shape[-1]
    rt.parent_depth = torch.from_numpy(np.asarray(z["parent_depth"]))
    rt._n_internal.fill_(int(z["n_internal"]))
    rt.filled = int(z["n_internal"])
    rt._n_free.fill_(int(z["n_free"]) if "n_free" in z.files else 0)
    rt.offset = torch.from_numpy(z["offset"].astype(np.float32))
    # Scalar-radius tree (radius 0.5 -> invradius 1): the CPU DDA loop's
    # `delta_scale = 1/invradius` predates svox_t's (3,) invradius and
    # only broadcasts with a scalar.
    rt.invradius = torch.tensor(1.0)
    rt.depth_limit = int(z["depth_limit"])
    rt.geom_resize_fact = float(z["geom_resize_fact"])
    idx_table = np.asarray(z["data"])[..., 0].astype(np.int64)
    feats_np = np.asarray(feats)
    M = feats_np.shape[0]
    dense = np.zeros(idx_table.shape + (rt.data_dim,), np.float32)
    occ = (idx_table >= 0) & (idx_table < M)
    dense[occ] = feats_np[idx_table[occ]]
    rt.data = torch.from_numpy(dense)
    from svox_t.helpers import DataFormat as RefDataFormat
    rt.data_format = RefDataFormat(z["data_format"].item()) if (
        "data_format" in z.files
    ) else None
    rt._invalidate()
    return rt


@pytest.mark.parametrize("data_format,data_dim", [("RGBA", 4), ("SH4", 13)])
def test_cpu_dda_render_matches_reference(rng, tmp_path, data_format,
                                          data_dim):
    """Full radiometry anchor: our volume_render vs the reference's own
    (extracted) CPU DDA loop on an irregular tree. The loop has no
    sigma/stop thresholds, so compare against exact mode; it emits only
    RGB (background-composited), no alpha."""
    t, feats, centers = build_tree(
        rng, data_dim=data_dim, data_format=data_format,
        depth_limit=4, n_random_refines=2,
    )
    rt = _float_data_ref_tree(t, feats, tmp_path)
    ref_fwd = _extract_ref_cpu_render()

    renderer = st.VolumeRenderer(t, step_size=1e-3)
    opt = renderer._get_options(False)
    assert opt.sigma_thresh == 0.0 and opt.stop_thresh <= 0.0

    class _Shim:
        tree = rt
        step_size = 1e-3
        background_brightness = opt.background_brightness
        data_format = rt.data_format

    B = 128
    rays = make_rays(rng, B)
    o_np = np.asarray(rays.origins)
    d_np = np.asarray(rays.dirs)
    o_t = torch.from_numpy(o_np.copy())
    d_t = torch.from_numpy(d_np.copy())
    ref_rays = ref.Rays(o_t, d_t, d_t.clone())
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref_rgb = ref_fwd(_Shim(), None, ref_rays, cuda=False).numpy()

    out = np.asarray(volume_render(
        t._spec(), feats, rays.origins, rays.dirs, rays.viewdirs, opt
    ))

    # The CPU loop unconditionally takes one sample even on rays that
    # MISS the cube (its hit test only applies from the second
    # iteration), accumulating a clamped boundary leaf; the CUDA kernel
    # — the real semantic target — returns background upfront
    # (rt_kernel.cu:241-247), as do we. Compare hit rays against the
    # loop and miss rays against pure background.
    dn = d_np / np.linalg.norm(d_np, axis=1, keepdims=True)
    inv = 1.0 / (dn + 1e-9)
    t1 = (0.0 - o_np) * inv
    t2 = (1.0 - o_np) * inv
    tmin = np.maximum(np.minimum(t1, t2).max(axis=1), 0.0)
    tmax = np.maximum(t1, t2).min(axis=1)
    hit = (tmax >= 0) & (tmin <= tmax)
    assert hit.sum() > B // 2  # the anchor must mostly exercise marches
    np.testing.assert_allclose(out[hit, :3], ref_rgb[hit], atol=1e-4)
    np.testing.assert_allclose(
        out[~hit, :3],
        np.full(((~hit).sum(), 3), opt.background_brightness, np.float32),
        atol=1e-6,
    )


# ---------------------------------------------------------------------------
# 4. npz interchange: a REFERENCE-written legacy (upstream-svox float
#    `data`) file loads through our legacy path and queries identically
# ---------------------------------------------------------------------------


def test_reference_written_legacy_npz_roundtrip(rng, tmp_path):
    """The reference's own `save()` of an upstream-svox-style float-data
    tree must load through our legacy-float path (pool + identity index
    table) and produce identical query values — our loader's legacy
    branch exercised on a file the reference code actually wrote."""
    t, feats, centers = build_tree(rng, depth_limit=4, n_random_refines=2)
    rt = _float_data_ref_tree(t, feats, tmp_path)
    rt.invradius = torch.ones(3)  # (3,) so save() writes invradius3
    path = os.path.join(str(tmp_path), "ref_written.npz")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rt.save(path, shrink=False)  # reference-side write

    ours = st.N3Tree.load(path)
    assert ours.n_internal == int(rt.n_internal)
    # legacy path: float data became a pool + identity index table
    assert ours.features.shape[1] == feats.shape[1]

    pts = (rng.rand(300, 3).astype(np.float32) * 1.4 - 0.2).astype(np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref_vals = ref.N3Tree.forward(
            rt, None, torch.from_numpy(pts.copy()), cuda=False
        ).numpy()
    vals, _, _ = query(ours._spec(), ours.features, jnp.asarray(pts), True)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, atol=1e-6)


# ---------------------------------------------------------------------------
# 5. Pure-torch helpers: NDC conversion and LBS matrix composition
# ---------------------------------------------------------------------------


def test_convert_to_ndc_matches_reference(rng):
    B = 127
    origins = rng.randn(B, 3).astype(np.float32)
    origins[:, 2] = -np.abs(origins[:, 2]) - 1.5  # in front of the near plane
    dirs = rng.randn(B, 3).astype(np.float32)
    dirs[:, 2] = -np.abs(dirs[:, 2]) - 0.5
    focal, w, h = 555.0, 800.0, 600.0
    ro, rd = ref_renderer_mod.convert_to_ndc(
        torch.from_numpy(origins.copy()), torch.from_numpy(dirs.copy()),
        focal, w, h,
    )
    oo, od = st.convert_to_ndc(
        jnp.asarray(origins), jnp.asarray(dirs), focal, w, h
    )
    np.testing.assert_allclose(np.asarray(oo), ro.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(od), rd.numpy(), atol=1e-5)


def test_get_transformation_matrix_matches_reference(rng):
    J = 9
    src = rng.randn(J, 4, 4).astype(np.float32)
    src[:, 3] = [0, 0, 0, 1]
    src[:, :3, :3] += 2 * np.eye(3)  # well-conditioned
    tgt = rng.randn(J, 4, 4).astype(np.float32)
    ref_T = ref.get_transformation_matrix(
        torch.from_numpy(src), torch.from_numpy(tgt)
    ).numpy()
    our_T = np.asarray(st.get_transformation_matrix(
        jnp.asarray(src), jnp.asarray(tgt)
    ))
    np.testing.assert_allclose(our_T, ref_T, atol=2e-4)


# ---------------------------------------------------------------------------
# 6. Host structure ops: leaf views, frontiers, index packing, DataFormat
#    (all pure-torch in the reference — imported and run directly)
# ---------------------------------------------------------------------------


def test_view_attributes_match_reference(rng, tmp_path):
    """depths / lengths_local / corners_local of the full leaf view,
    computed by the reference's own N3TreeView (helpers.py:143-199 via
    _calc_corners) on the SAME structure, must equal ours — ordering
    included."""
    t, feats, centers = build_tree(rng, depth_limit=5, n_random_refines=3)
    rt = _float_data_ref_tree(t, feats, tmp_path)
    rv = rt[:]
    ours = t[:]
    np.testing.assert_array_equal(
        np.asarray(ours.depths), rv.depths.numpy()
    )
    np.testing.assert_allclose(
        np.asarray(ours.lengths_local), rv.lengths_local.numpy(), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(ours.corners_local), rv.corners_local.numpy(), atol=1e-6
    )


def test_frontier_and_reduce_match_reference(rng, tmp_path):
    """_frontier node set and reduce_frontier(mean over ALL child cells,
    empty cells = zero rows — the reference's float-form semantics,
    svox.py:391-418/471-483) vs ours on the same structure."""
    t, feats, centers = build_tree(rng, depth_limit=4, n_random_refines=3)
    rt = _float_data_ref_tree(t, feats, tmp_path)
    ref_frontier = rt._frontier.numpy()
    np.testing.assert_array_equal(np.sort(np.asarray(t._frontier)),
                                  np.sort(ref_frontier))
    ref_red = rt.reduce_frontier(op=torch.mean).numpy()
    our_red = np.asarray(t.reduce_frontier(op=np.mean, features=feats))
    # Same frontier ordering is asserted above only as a set; align by
    # sorting rows through the frontier node ids.
    ref_order = np.argsort(ref_frontier)
    our_order = np.argsort(np.asarray(t._frontier))
    np.testing.assert_allclose(
        our_red[our_order], ref_red[ref_order], atol=1e-6
    )


def test_pack_unpack_index_match_reference(rng, tmp_path):
    t, feats, centers = build_tree(rng, depth_limit=3, n_random_refines=1)
    rt = _float_data_ref_tree(t, feats, tmp_path)
    N = t.N
    txyz = np.stack([
        rng.randint(0, 50, 64),
        rng.randint(0, N, 64),
        rng.randint(0, N, 64),
        rng.randint(0, N, 64),
    ], axis=1).astype(np.int64)
    ref_packed = rt._pack_index(torch.from_numpy(txyz)).numpy()
    our_packed = np.asarray(t._pack_index(jnp.asarray(txyz)))
    np.testing.assert_array_equal(our_packed, ref_packed)
    ref_un = rt._unpack_index(torch.from_numpy(ref_packed.copy())).numpy()
    our_un = np.asarray(t._unpack_index(jnp.asarray(our_packed)))
    np.testing.assert_array_equal(our_un, ref_un)
    np.testing.assert_array_equal(our_un, txyz)


@pytest.mark.parametrize(
    "fmt", ["RGBA", "SH1", "SH4", "SH9", "SH16", "SH25", "SG3", "ASG7"]
)
def test_dataformat_matches_reference(fmt):
    """Our regex-based DataFormat parser vs the reference's
    (helpers.py:386-420): format enum, basis_dim, and repr round-trip."""
    from svox_t.helpers import DataFormat as RefDataFormat

    ref_df = RefDataFormat(fmt)
    our_df = st.DataFormat(fmt)
    assert repr(our_df) == repr(ref_df)
    assert our_df.basis_dim == ref_df.basis_dim
    # enum values are part of the npz schema (data_format saved as repr)
    for name in ("RGBA", "SH", "SG", "ASG"):
        assert getattr(type(our_df), name) == getattr(type(ref_df), name)
    assert our_df.format == ref_df.format
