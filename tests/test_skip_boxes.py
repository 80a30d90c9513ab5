"""Directed empty-space skip boxes (FAST mode; ops/bake.SKIP_BASE).

The bake packs per-empty-leaf guaranteed-empty AABB extents into the
sentinel lane the march already fetches; fast mode exits the box instead
of the cell. License: same as box_advance / the reference's fast
thresholds (renderer.py:428-433) — empty samples contribute nothing but
merging their crossings shifts later sample positions by bounded
amounts. These tests pin:
  * box soundness (no occupied cell inside any decoded box),
  * exact-mode invariance (a box-baked tree renders bit-identical with
    skip off),
  * bounded fast-mode deviation,
  * conservative degradation after on-device refresh (extent-0 decode is
    bit-identical to the plain DDA),
  * the pool-size guard (rows above SKIP_BASE are rejected).
"""

import dataclasses

import jax

import jax.numpy as jnp
import numpy as np
import pytest

import svox_t_tpu as st
from svox_t_tpu.ops import bake as bake_ops
from svox_t_tpu.ops import render as render_ops

from helpers import build_tree, make_rays


def _partial_tree(rng, predicate, **kw):
    return build_tree(rng, occupy=predicate, **kw)


def _decode_boxes(baked):
    """Yield (lo, hi) tree-space corners of every nontrivial top-grid box."""
    top = np.asarray(baked.top).reshape(-1)
    R = baked.R
    n_cells = R ** 3
    for ci in range(n_cells):
        e = int(top[ci])
        if e < 0:
            continue
        row = e & bake_ops.ROW_MASK
        b = row - bake_ops.SKIP_BASE
        if b < 0 or b >= (1 << 24) or b == 0:
            continue
        depth = e >> bake_ops.ROW_BITS
        cube = baked.N ** (depth + 1)
        center = (
            np.array([ci // (R * R), (ci // R) % R, ci % R]) + 0.5
        ) / R
        cell_lo = np.floor(center * cube) / cube
        el = np.array([b & 15, (b >> 8) & 15, (b >> 16) & 15])
        eh = np.array([(b >> 4) & 15, (b >> 12) & 15, (b >> 20) & 15])
        yield cell_lo - el / cube, cell_lo + (1.0 + eh) / cube


def test_skip_boxes_are_empty(rng):
    """No decoded box may contain an occupied cell (sampled densely)."""
    t, feats, _ = _partial_tree(
        rng, lambda c: c[:, 0] < 0.45, depth_limit=5, n_random_refines=3
    )
    baked = t._baked_spec()
    assert baked.skip_base == bake_ops.SKIP_BASE
    M = feats.shape[0]
    rs = np.random.RandomState(7)
    boxes = list(_decode_boxes(baked))
    assert len(boxes) > 100  # the half-empty tree must yield real boxes
    checked = 0
    for lo, hi in boxes[:: max(1, len(boxes) // 200)]:
        p = lo + rs.rand(32, 3) * (hi - lo)
        p = np.clip(p, 0.0, 1.0 - 1e-6).astype(np.float32)
        didx = np.asarray(bake_ops.lookup(baked, jnp.asarray(p))[0])
        assert not (didx < M).any()
        checked += 1
    assert checked >= 100


def test_exact_mode_unaffected_by_baked_boxes(rng):
    """skip_boxes=0 (the default/exact path) renders a box-baked tree
    bit-identically to the tree walk — boxes only re-code values in the
    empty range [M, EMPTY_ROW]."""
    t, feats, _ = _partial_tree(
        rng, lambda c: c[:, 1] > 0.4, depth_limit=5, n_random_refines=3
    )
    rays = make_rays(rng, B=256)
    opt = st.RenderOptions(step_size=1e-3, format=0, basis_dim=1,
                           max_steps=512)
    spec = t._spec(feats)
    baked = t._baked_spec()
    assert baked.skip_base
    a = render_ops.volume_render(
        spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    b = render_ops.volume_render(
        baked, feats, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fast_skip_close_to_fast(rng):
    """Fast mode with skip boxes deviates only within the fast license
    (O(step_size * sigma) position shifts at empty-run exits)."""
    t, feats, _ = _partial_tree(
        rng, lambda c: c[:, 0] < 0.45, depth_limit=5, n_random_refines=3
    )
    baked = t._baked_spec()
    rays = make_rays(rng, B=512)
    optf = st.RenderOptions(
        step_size=1e-3, format=0, basis_dim=1, max_steps=512,
        sigma_thresh=1e-2, stop_thresh=1e-2, box_advance=1,
    )
    optfs = dataclasses.replace(optf, skip_boxes=1)
    a = np.asarray(render_ops.volume_render(
        baked, feats, rays.origins, rays.dirs, rays.viewdirs, optf
    ))
    b = np.asarray(render_ops.volume_render(
        baked, feats, rays.origins, rays.dirs, rays.viewdirs, optfs
    ))
    assert np.max(np.abs(a - b)) < 0.05
    assert np.mean(np.abs(a - b)) < 1e-3


def test_refresh_degrades_boxes_conservatively(rng):
    """refresh() re-packs rows from the index table, wiping extents; the
    extent-0 decode is bit-identical to the plain DDA, so skip-on equals
    skip-off exactly after a refresh."""
    t, feats, _ = _partial_tree(
        rng, lambda c: c[:, 2] < 0.5, depth_limit=5, n_random_refines=2
    )
    baked = t._baked_spec()
    assert baked.skip_base
    data_flat = jnp.asarray(np.asarray(t.data).reshape(-1))
    refreshed = bake_ops.refresh(baked, data_flat)
    rays = make_rays(rng, B=256)
    optf = st.RenderOptions(
        step_size=1e-3, format=0, basis_dim=1, max_steps=512,
        sigma_thresh=1e-2, stop_thresh=1e-2, box_advance=1,
    )
    optfs = dataclasses.replace(optf, skip_boxes=1)
    a = render_ops.volume_render(
        refreshed, feats, rays.origins, rays.dirs, rays.viewdirs, optf
    )
    b = render_ops.volume_render(
        refreshed, feats, rays.origins, rays.dirs, rays.viewdirs, optfs
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fully_occupied_tree_bakes_no_boxes(rng):
    """No empty leaves -> coding enabled (regrowth may add boxes after a
    later re-point) but no box has extents, so fast+skip is a no-op."""
    t, feats, _ = build_tree(rng, depth_limit=4, n_random_refines=2)
    baked = t._baked_spec()
    assert baked.skip_base == bake_ops.SKIP_BASE
    for tbl in (baked.top, baked.brick):
        v = np.asarray(tbl).reshape(-1)
        v = v[v >= 0] & bake_ops.ROW_MASK
        b = v[(v >= bake_ops.SKIP_BASE) & (v < bake_ops.EMPTY_ROW)]
        assert ((b - bake_ops.SKIP_BASE) == 0).all()


def test_pool_guard_rejects_rows_in_code_space(rng):
    t, feats, _ = _partial_tree(
        rng, lambda c: c[:, 0] < 0.45, depth_limit=4, n_random_refines=2
    )
    baked = t._baked_spec()
    assert baked.skip_base
    opt = st.RenderOptions(format=0, basis_dim=1)
    big = jnp.zeros((bake_ops.SKIP_BASE + 4, 0), jnp.float32)
    with pytest.raises(ValueError, match="skip boxes"):
        render_ops._pool_view(big, opt, baked)


def test_renderer_fast_mode_uses_skip(rng):
    """VolumeRenderer(fast=True) turns skip on; outputs stay close to
    fast-without-skip and exact stays exact."""
    t, feats, _ = _partial_tree(
        rng, lambda c: c[:, 0] < 0.45, depth_limit=5, n_random_refines=3
    )
    r = st.VolumeRenderer(t, step_size=1e-3)
    opt = r._get_options(fast=True)
    assert opt.skip_boxes == 1 and opt.box_advance == 1
    assert r._get_options(fast=False).skip_boxes == 0
    rays = make_rays(rng, B=256)
    out_fast = np.asarray(r(feats, rays, fast=True))
    r.skip_boxes = 0  # attribute override, reference-style
    out_fast_noskip = np.asarray(r(feats, rays, fast=True))
    assert np.max(np.abs(out_fast - out_fast_noskip)) < 0.05


def test_skip_boxes_n3(rng):
    """N=3 branching: decode/DDA consistency on the 3^d lattice."""
    t, feats, _ = build_tree(
        rng, N=3, depth_limit=3, n_random_refines=2,
        occupy=lambda c: c[:, 0] < 0.45,
    )
    baked = t._baked_spec()
    assert baked.skip_base
    rays = make_rays(rng, B=256)
    optf = st.RenderOptions(
        step_size=1e-3, format=0, basis_dim=1, max_steps=512,
        sigma_thresh=1e-2, stop_thresh=1e-2, box_advance=1,
    )
    optfs = dataclasses.replace(optf, skip_boxes=1)
    a = np.asarray(render_ops.volume_render(
        baked, feats, rays.origins, rays.dirs, rays.viewdirs, optf
    ))
    b = np.asarray(render_ops.volume_render(
        baked, feats, rays.origins, rays.dirs, rays.viewdirs, optfs
    ))
    assert np.max(np.abs(a - b)) < 0.05


def test_device_box_regrowth_after_refresh(rng):
    """grow_boxes_device: refresh degrades boxes; the device regrowth
    (chebyshev erosion of the top grid) restores sound symmetric ones —
    exact rendering stays bit-identical, fast stays within the license,
    and the op is idempotent."""
    t, feats, _ = _partial_tree(
        rng, lambda c: c[:, 0] < 0.45, depth_limit=5, n_random_refines=3
    )
    M = feats.shape[0]
    baked = t._baked_spec()
    data_flat = jnp.asarray(np.asarray(t.data).reshape(-1))
    refreshed = bake_ops.refresh(baked, data_flat)
    grown = bake_ops.grow_boxes_device(refreshed)

    # regrown boxes exist and are sound (no occupied cell inside)
    top = np.asarray(grown.top).reshape(-1)
    R = grown.R
    rs = np.random.RandomState(11)
    checked = 0
    for ci in range(R ** 3):
        e = int(top[ci])
        if e < 0:
            continue
        b = (e & bake_ops.ROW_MASK) - bake_ops.SKIP_BASE
        if b <= 0 or b >= (1 << 24):
            continue
        depth = e >> bake_ops.ROW_BITS
        cube = grown.N ** (depth + 1)
        center = (np.array([ci // (R * R), (ci // R) % R, ci % R]) + 0.5) / R
        cell_lo = np.floor(center * cube) / cube
        el = np.array([b & 15, (b >> 8) & 15, (b >> 16) & 15])
        eh = np.array([(b >> 4) & 15, (b >> 12) & 15, (b >> 20) & 15])
        np.testing.assert_array_equal(el, eh)  # symmetric by construction
        lo = cell_lo - el / cube
        hi = cell_lo + (1.0 + eh) / cube
        p = np.clip(lo + rs.rand(16, 3) * (hi - lo), 0, 1 - 1e-6)
        didx = np.asarray(
            bake_ops.lookup(grown, jnp.asarray(p.astype(np.float32)))[0]
        )
        assert not (didx < M).any()
        checked += 1
        if checked >= 60:
            break
    assert checked >= 40

    rays = make_rays(rng, B=512)
    opt = st.RenderOptions(step_size=1e-3, format=0, basis_dim=1,
                           max_steps=512)
    a = render_ops.volume_render(
        refreshed, feats, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    b = render_ops.volume_render(
        grown, feats, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    optf = dataclasses.replace(opt, sigma_thresh=1e-2, stop_thresh=1e-2,
                               box_advance=1, skip_boxes=1)
    af = render_ops.volume_render(
        refreshed, feats, rays.origins, rays.dirs, rays.viewdirs, optf
    )
    bf = render_ops.volume_render(
        grown, feats, rays.origins, rays.dirs, rays.viewdirs, optf
    )
    assert float(jnp.max(jnp.abs(af - bf))) < 0.05

    g2 = bake_ops.grow_boxes_device(grown)
    np.testing.assert_array_equal(np.asarray(g2.top), np.asarray(grown.top))


def test_construct_tree_keeps_boxes_alive(rng):
    """N3Tree.construct_tree re-points the table; the cached bake must
    come back with regrown boxes (not bare sentinels) and identical
    exact renders vs the tree walk."""
    t, feats, _ = _partial_tree(
        rng, lambda c: c[:, 0] < 0.45, depth_limit=5, n_random_refines=3
    )
    # re-point at a different half-space
    centers = np.asarray(
        jax.device_get(t.tree2world(jnp.asarray(
            t[:].corners_local + 0.5 * t[:].lengths_local[:, None]
        )))
    )
    keep = centers[:, 1] > 0.5
    t.construct_tree(centers[keep])
    feats2 = jnp.asarray(
        np.random.RandomState(5).randn(int(keep.sum()), feats.shape[1])
        .astype(np.float32)
    )
    baked = t._baked_spec()
    top = np.asarray(baked.top).reshape(-1)
    rows = top[top >= 0] & bake_ops.ROW_MASK
    grown = (rows >= bake_ops.SKIP_BASE) & (rows < bake_ops.EMPTY_ROW) \
        & ((rows - bake_ops.SKIP_BASE) != 0)
    assert grown.sum() > 50  # boxes survived the re-point
    rays = make_rays(rng, B=256)
    opt = st.RenderOptions(step_size=1e-3, format=0, basis_dim=1,
                           max_steps=512)
    a = render_ops.volume_render(
        t._spec(feats2), feats2, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    b = render_ops.volume_render(
        baked, feats2, rays.origins, rays.dirs, rays.viewdirs, opt
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
