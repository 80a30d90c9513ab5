"""Leaf-set view over an N3Tree (parity: `N3TreeView`,
svox_t/helpers.py:36-337).

A view resolves an indexing key — int / slice / bool mask / (B, 3) point
matrix / `LocalIndex` — into a set of leaf cells `(node, x, y, z)` and
exposes their geometry (depths / lengths / corners / samples) and feature
values. Point keys run a device query; the unique hit-leaf list is
computed with a deterministic `np.unique` instead of the reference's
atomic compaction kernel (svox_kernel.cu:239-269).

`values` reads (and in-place helpers write) the **feature pool rows** the
selected leaves point at; empty leaves read as zeros and ignore writes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.dataformat import LocalIndex


class N3TreeView:
    def __init__(self, tree, key):
        self.tree = tree
        local = False
        self.single_key = False
        if isinstance(key, LocalIndex):
            key = key.val
            local = True
        if isinstance(key, tuple) and len(key) >= 3 and not any(
            isinstance(k, slice) for k in key[:3]
        ):
            main_key = np.asarray(key[:3], np.float32).reshape(1, 3)
            key = (main_key, *key[3:]) if len(key) > 3 else main_key

        leaf_key = key[0] if isinstance(key, tuple) else key
        # Any 2-D (B, 3) array key is a batch of query POINTS, whatever its
        # dtype — the reference casts non-float tensors to float here
        # (helpers.py:53-56) rather than fancy-indexing leaves with them.
        is_points = (
            hasattr(leaf_key, "ndim")
            and getattr(leaf_key, "ndim", 0) == 2
            and leaf_key.shape[1] == 3
        )
        if is_points:
            pts = jnp.asarray(np.asarray(leaf_key, np.float32))
            _, node_ids, unique_leaf_node = tree.forward(
                tree.features,
                pts,
                want_node_ids=True,
                world=not local,
                want_leaf_node=True,
            )
            self._packed_ids = np.asarray(jax.device_get(node_ids))
            self.unique_leaf_node = np.asarray(jax.device_get(unique_leaf_node))
            self.leaf_node_id = self._packed_ids
            leaf_node = self.unique_leaf_node
        else:
            self._packed_ids = None
            self.unique_leaf_node = None
            if isinstance(leaf_key, int):
                leaf_key = np.asarray([leaf_key])
                self.single_key = True
            all_leaves = self.tree._all_leaves()
            leaf_node = all_leaves[leaf_key]

        self._leaf_node = np.asarray(leaf_node)  # (n, 4)
        self._chan_key = (
            key[1] if isinstance(key, tuple) and len(key) > 1 else None
        )
        self._tree_ver = tree._ver

    # -- helpers --------------------------------------------------------

    def _check_ver(self):
        if self.tree._ver > self._tree_ver:
            raise RuntimeError(
                "N3TreeView has been invalidated because tree "
                "data layout has changed"
            )

    def _data_ids(self) -> np.ndarray:
        """Feature-pool row per selected leaf (may include the empty
        sentinel)."""
        self._check_ver()
        self.tree._ensure_host_data()
        ln = self._leaf_node
        return self.tree._data[ln[:, 0], ln[:, 1], ln[:, 2], ln[:, 3], 0]

    def _indexer(self):
        return self._leaf_node

    def __repr__(self):
        self._check_ver()
        return "N3TreeView(" + repr(self.values) + ")"

    # -- values ---------------------------------------------------------

    @property
    def values(self):
        """(n_leaves, data_dim) feature values (differentiable gather)."""
        self._check_ver()
        feats = jnp.asarray(self.tree.features)
        ids = jnp.asarray(self._data_ids())
        valid = ids < feats.shape[0]
        vals = jnp.where(valid[:, None], feats[jnp.where(valid, ids, 0)], 0.0)
        if self._chan_key is not None:
            vals = vals[:, self._chan_key]
        return vals[0] if self.single_key else vals

    @property
    def values_nograd(self):
        self._check_ver()
        return jax.lax.stop_gradient(self.values)

    @property
    def values_local(self):
        """Reference-parity alias of `values`: feature rows have no
        world/tree-frame distinction. (The reference redirects
        `tree.values_local` to a view attribute it never defines —
        svox.py:931 vs helpers.py:36-337 — so there the alias raises;
        here it works.)"""
        return self.values

    @property
    def data_values(self):
        """Raw int32 index-table entries for the selected leaves."""
        return self._data_ids()

    def set(self, value):
        """Write (n_leaves, data_dim) values into the selected leaves'
        feature rows (empty leaves ignored)."""
        self._check_ver()
        if isinstance(value, N3TreeView):
            value = value.values_nograd
        feats = jnp.asarray(self.tree.features)
        ids = self._data_ids()
        valid = ids < feats.shape[0]
        if self._chan_key is None:
            scat = jnp.asarray(np.where(valid, ids, feats.shape[0]))
            value = jnp.broadcast_to(
                jnp.asarray(value, feats.dtype), (len(ids), feats.shape[1])
            )
            self.tree.features = feats.at[scat].set(value, mode="drop")
        else:
            # Channel-key write: one device scatter into the (row, col)
            # product of selected leaves x selected channels. Accepts a
            # scalar, a per-leaf vector, or a full (n_leaves, n_cols)
            # block (broadcast like NumPy).
            scat = jnp.asarray(np.where(valid, ids, feats.shape[0]))
            cols = np.atleast_1d(np.arange(feats.shape[1])[self._chan_key])
            v = jnp.asarray(value, feats.dtype)
            if v.ndim == 1 and v.shape[0] == len(ids) and len(cols) == 1:
                v = v[:, None]
            v = jnp.broadcast_to(v, (len(ids), len(cols)))
            self.tree.features = feats.at[
                scat[:, None], jnp.asarray(cols)[None, :]
            ].set(v, mode="drop")

    def __setitem__(self, key, value):
        val = np.asarray(jax.device_get(self.values_nograd))
        val[key] = value
        self.set(val)

    # -- geometry -------------------------------------------------------

    @property
    def shape(self):
        self._check_ver()
        return (self._leaf_node.shape[0], self.tree.data_dim)

    @property
    def ndim(self):
        return 2

    @property
    def depths(self):
        """Leaf depths (root children = 0), (n_leaves,) int32."""
        self._check_ver()
        return self.tree._parent_depth[self._leaf_node[:, 0], 1]

    @property
    def lengths(self):
        """World-space side lengths, (n_leaves, 3).

        (The reference hardcodes 2^-(depth+1) — helpers.py:164 — which is
        only correct for N=2; this generalizes to N^-(depth+1).)"""
        self._check_ver()
        return (
            float(self.tree.N) ** (-self.depths.astype(np.float32) - 1.0)
        )[:, None] / self.tree.invradius

    @property
    def lengths_local(self):
        """Tree-space side lengths, (n_leaves,)."""
        self._check_ver()
        return float(self.tree.N) ** (-self.depths.astype(np.float32) - 1.0)

    @property
    def corners(self):
        """World-space lower corners, (n_leaves, 3)."""
        self._check_ver()
        local = np.asarray(jax.device_get(self.tree._calc_corners(self._indexer())))
        return (local - self.tree.offset) / self.tree.invradius

    @property
    def corners_local(self):
        self._check_ver()
        return np.asarray(jax.device_get(self.tree._calc_corners(self._indexer())))

    def sample(self, n_samples, device=None):
        """(n_leaves, n_samples, 3) uniform world-space samples per leaf.
        `device` accepted for reference parity (helpers.py:203); JAX
        arrays live on the default device."""
        del device
        self._check_ver()
        corn = self.corners
        length = self.lengths
        u = self.tree._rng.rand(corn.shape[0], n_samples, 3).astype(np.float32)
        return corn[:, None] + u * length[:, None]

    def sample_local(self, n_samples):
        self._check_ver()
        corn = self.corners_local
        length = self.lengths_local
        u = self.tree._rng.rand(corn.shape[0], n_samples, 3).astype(np.float32)
        return corn[:, None] + u * length[:, None, None]

    def aux(self, arr):
        """Index an auxiliary (capacity, N, N, N[, ...]) array by this
        view's leaf cells."""
        arr = np.asarray(arr)
        ln = self._leaf_node
        return arr[ln[:, 0], ln[:, 1], ln[:, 2], ln[:, 3]]

    # -- in-place feature modification helpers --------------------------

    def _map_rows(self, fn):
        feats = np.array(jax.device_get(self.tree.features))
        ids = self._data_ids()
        valid = ids < feats.shape[0]
        rows = ids[valid]
        feats[rows] = fn(feats[rows])
        self.tree.features = jnp.asarray(feats)

    def normal_(self, mean=0.0, std=1.0):
        self._check_ver()
        rng = self.tree._rng
        self._map_rows(lambda v: rng.randn(*v.shape).astype(v.dtype) * std + mean)

    def uniform_(self, min=0.0, max=1.0):
        self._check_ver()
        rng = self.tree._rng
        self._map_rows(
            lambda v: rng.rand(*v.shape).astype(v.dtype) * (max - min) + min
        )

    def clamp_(self, min=None, max=None):
        self._check_ver()
        self._map_rows(lambda v: np.clip(v, min, max))

    def relu_(self):
        self._check_ver()
        self._map_rows(lambda v: np.maximum(v, 0.0))

    def sigmoid_(self):
        self._check_ver()
        self._map_rows(lambda v: 1.0 / (1.0 + np.exp(-v)))

    def nan_to_num_(self, inf_val=2e4):
        self._check_ver()

        def fix(v):
            v = np.nan_to_num(v, nan=0.0, posinf=inf_val, neginf=-inf_val)
            return v

        self._map_rows(fix)

    def refine(self, repeats=1):
        """Refine the selected leaves via tree.refine."""
        self._check_ver()
        sel = tuple(self._leaf_node.T)
        return self.tree.refine(repeats, sel=sel, leaf_node=self._leaf_node)

    # -- numeric dunders (redirect to values) ---------------------------

    def __len__(self):
        return self._leaf_node.shape[0]

    # -- tensor-convenience methods (parity: helpers.py:340-360 redirects
    # these to the underlying values; non-mutating counterparts of the
    # in-place helpers above) --------------------------------------------

    def size(self, dim=None):
        self._check_ver()
        return self.shape if dim is None else self.shape[dim]

    def dim(self):
        return self.ndim

    def numel(self):
        sh = self.shape
        return int(sh[0]) * int(sh[1])

    def item(self):
        return self.values.item()

    def clamp(self, min=None, max=None):
        return jnp.clip(self.values, min, max)

    def clamp_min(self, min):
        return jnp.maximum(self.values, min)

    def clamp_max(self, max):
        return jnp.minimum(self.values, max)

    def relu(self):
        return jax.nn.relu(self.values)

    def sigmoid(self):
        return jax.nn.sigmoid(self.values)


def _redirect_funcs():
    redir_grad_funcs = [
        "__add__", "__mul__", "__sub__", "__mod__", "__truediv__",
        "__radd__", "__rsub__", "__rmul__", "__abs__", "__pos__",
        "__neg__", "__eq__", "__ne__", "__ge__", "__gt__", "__le__",
        "__lt__", "clip", "max", "min", "mean", "sum", "__getitem__",
        "__floordiv__",
    ]

    def redirect_func(name):
        def impl(self, *args, **kwargs):
            return getattr(self.values, name)(*args, **kwargs)

        setattr(N3TreeView, name, impl)

    for name in redir_grad_funcs:
        redirect_func(name)


_redirect_funcs()
