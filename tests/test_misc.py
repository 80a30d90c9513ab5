"""DataFormat parsing, quantizer, grid_weight_render, dataformat options."""

import jax.numpy as jnp
import numpy as np

import svox_t_tpu as st
from svox_t_tpu.native import quantize_median_cut
from svox_t_tpu.utils.spec import get_out_data_dim


def test_dataformat_parsing():
    f = st.DataFormat("RGBA")
    assert f.format == st.DataFormat.RGBA and f.basis_dim == -1
    f = st.DataFormat("SH9")
    assert f.format == st.DataFormat.SH and f.basis_dim == 9
    f = st.DataFormat("SG16")
    assert f.format == st.DataFormat.SG and f.basis_dim == 16
    f = st.DataFormat("ASG25")
    assert f.format == st.DataFormat.ASG and f.basis_dim == 25
    assert repr(st.DataFormat("SH4")) == "SH4"
    # unrecognized alpha prefix with digits -> RGBA (parity with reference)
    f = st.DataFormat("FOO3")
    assert f.format == st.DataFormat.RGBA


def test_get_out_data_dim():
    assert get_out_data_dim(st.DataFormat.RGBA, -1, 4) == 4
    assert get_out_data_dim(st.DataFormat.SH, 9, 28) == 4
    assert get_out_data_dim(st.DataFormat.SH, 4, 13) == 4
    assert get_out_data_dim(st.DataFormat.SH, 1, 4) == 4


def test_quantize_median_cut_basic(rng):
    # two well-separated clusters, order=1 -> 2 colors
    a = rng.randn(50, 3) * 0.1
    b = rng.randn(50, 3) * 0.1 + 10.0
    data = np.concatenate([a, b]).astype(np.float32)
    colors, ids = quantize_median_cut(data, order=1)
    assert colors.shape == (2, 3) and ids.shape == (100,)
    # each cluster maps to one color
    assert len(set(ids[:50])) == 1 and len(set(ids[50:])) == 1
    assert ids[0] != ids[50]
    got = sorted(colors[:, 0])
    np.testing.assert_allclose(got, [a[:, 0].mean(), b[:, 0].mean()], atol=0.2)


def test_quantize_median_cut_weighted(rng):
    data = rng.rand(64, 4).astype(np.float32)
    w = np.abs(rng.rand(64)).astype(np.float32)
    colors, ids = quantize_median_cut(data, w, order=3)
    assert colors.shape == (8, 4)
    assert ids.min() >= 0 and ids.max() <= 7
    # each cluster's color is the weighted mean of its members
    for c in range(8):
        m = ids == c
        if m.sum() == 0:
            continue
        want = (w[m, None] * data[m]).sum(0) / w[m].sum()
        np.testing.assert_allclose(colors[c], want, atol=1e-4)


def test_quantize_native_matches_numpy(rng):
    from svox_t_tpu.native import quantize as qmod

    data = rng.rand(128, 3).astype(np.float32)
    w = np.abs(rng.rand(128)).astype(np.float32)
    c1, i1 = qmod._quantize_numpy(data, w, 2)
    c2, i2 = quantize_median_cut(data, w, 2)
    # partitions can differ at exact-tie boundaries; compare cluster means
    np.testing.assert_allclose(np.sort(c1, 0), np.sort(c2, 0), atol=1e-3)


def test_grid_weight_render(rng):
    reso = 16
    data = np.zeros((reso, reso, reso), np.float32)
    data[6:10, 6:10, 6:10] = 20.0  # solid block in the middle
    cam_pose = np.eye(4, dtype=np.float32)
    cam_pose[:3, 3] = [0.5, 0.5, 3.0]
    cam = st.CameraSpec(c2w=jnp.asarray(cam_pose), fx=30.0, fy=30.0, width=24, height=24)
    opt = st.RenderOptions(step_size=1e-3, sigma_thresh=1e-4, max_steps=256)
    offset = jnp.zeros(3)
    scaling = jnp.ones(3)
    gw, gh = st.grid_weight_render(jnp.asarray(data), cam, opt, offset, scaling)
    gw, gh = np.asarray(gw), np.asarray(gh)
    assert gw.shape == (reso, reso, reso)
    # weights concentrate on the front face of the block
    assert gw[6:10, 6:10, 9].max() > 0.5
    # voxels behind the block got much less weight
    assert gw[6:10, 6:10, 6].max() < gw[6:10, 6:10, 9].max()
    assert gh.sum() > 0
    assert gw.max() <= 1.0 + 1e-5


def test_renderoptions_hashable():
    o1 = st.RenderOptions(step_size=1e-3)
    o2 = st.RenderOptions(step_size=1e-3)
    assert hash(o1) == hash(o2) and o1 == o2


def test_profiling_trace_capture():
    """device_trace captures and aggregates device-side op events (on
    CPU the device name differs, so just exercise capture + parse)."""
    import jax.numpy as jnp

    from svox_t_tpu.utils.profiling import TraceResult, device_trace

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        try:
            with device_trace(td) as t:
                x = jnp.arange(1024.0)
                float(jnp.sum(x * x))
        except FileNotFoundError:
            return  # no trace emitted on this backend — capture still ran
        assert t.result is not None
        assert isinstance(t.total_ms, float)
        t2 = TraceResult(td)
        assert t2.total_ms == t.total_ms
