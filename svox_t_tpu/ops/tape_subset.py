"""Row-subset tape replay — random-pixel minibatch training at tape rates.

The canonical NeRF/Artemis training loop samples random pixels across a
FIXED set of training cameras every step (reference
svox_t/renderer.py:207-308 takes arbitrary ray batches; the CUDA SIMT
march doesn't care which rays arrive, rt_kernel.cu:654-671). That access
pattern is exactly the tape amortization class — the camera set is fixed,
only the ROW SUBSET varies — but a recorded :class:`~.tape.RayTape` is a
whole-batch artifact: its chunking, count sort, and flat round programs
are baked for all recorded rays.

This module makes tapes serve row subsets:

  * :class:`TapeRowSource` — a one-time RAY-MAJOR re-layout of a recorded
    tape ((rows, S) sample tables instead of (chunks, S, C)), so pulling
    an arbitrary ray set is a contiguous row gather.
  * :func:`subset_tape` — build a standalone :class:`RayTape` for a host
    array of ray ids: host-side radix sort by sample count (the parent's
    ordering invariant), device row gather + re-chunk, fresh flat round
    programs. The result works with EVERY existing replay entry point
    (`replay_render`, `replay_render_frames` + wide flush,
    `replay_depth`, weight accumulation) unchanged.
  * :func:`replay_render_rows` — subset + replay in one call.
  * :func:`train_minibatches` — the training fast path: N sequential SGD
    steps (step n+1 sees step n's update) over N random minibatches in
    ONE dispatch; per step the subset gather/re-chunk runs in-graph from
    the ray-major source, so the host ships only the (N, Bp) row-position
    array. All N steps share one conservative round program (the union of
    the batches' per-chunk caps — extra rounds are provable no-ops), so
    executables are reused across calls.

Semantics: a subset replay of rays R equals the full replay restricted
to R. Per-ray round grouping is PRESERVED (each ray's recorded slot
stream replays from s0=0 at the tape's own prog_K regardless of which
chunk it lands in), so compact=False subsets are bitwise equal to the
full replay's rows — except that a basis-format (SH/SG/ASG) replay
whose subset CHUNK SHAPE differs from the parent's can shift eval_basis
by 1 ulp on a few lanes (the cross-program batch-shape sensitivity
documented in CLAUDE.md; RGBA is shape-free and exactly bitwise).
Gradients flow through the standard tape VJP; a subset gradient equals
the full-batch gradient of a loss masked to R (tested).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.spec import DATA_SENTINEL, RenderOptions
from .tape import (RayTape, _replay_call, _round_program, _size_bucket,
                   unsort_output)


class TapeRowSource:
    """Ray-major view of a recorded tape, built once per (tape) for
    row-subset extraction.

    Device arrays (``n_rows = n_chunks * C`` padded-layout rows):
      idx_rm:  (n_rows, S) int32 — per-ray sample index stream
               (feature rows, or tree-cell ids for indirect parents).
      dt_rm:   (n_rows, S) f32 — per-ray recorded step lengths.
      tval_rm: (n_rows, S) f32 or None — recorded march parameter t.
      cell_rm: (n_rows, S) int32 or None — tree-cell stream (weight
               accumulation), kept only when ``keep_cells``.
      o/d/v_rm:(n_rows, 3) f32 ray constants; ds_rm (n_rows,) f32;
      counts_rm (n_rows,) int32.

    Host metadata: the parent's padded-layout counts and the ray-id ->
    padded-row map (``inv_host``), used to order and chunk subsets
    without any device round trip.
    """

    def __init__(self, tape: RayTape, *, keep_cells: bool = False):
        if tape.n_chunks == 0:
            raise ValueError("empty tape")
        C, S = tape.C, tape.S
        n_rows = tape.n_chunks * C

        def rm(a):
            return a.swapaxes(1, 2).reshape(n_rows, S)

        self.idx_rm = rm(tape.idx)
        self.dt_rm = rm(tape.dt)
        self.tval_rm = rm(tape.tval) if tape.tval is not None else None
        self.cell_rm = (
            rm(tape.cell) if (keep_cells and tape.cell is not None)
            else None
        )
        self.origins_rm = tape.origins.reshape(n_rows, 3)
        self.dirs_rm = tape.dirs.reshape(n_rows, 3)
        self.vdirs_rm = tape.vdirs.reshape(n_rows, 3)
        self.dscale_rm = tape.dscale.reshape(n_rows)
        self.counts_rm = tape.counts.reshape(n_rows)

        # Host copies for ordering (fetched once; ~n_rays ints).
        self.counts_host = np.asarray(jax.device_get(tape.counts)).reshape(
            n_rows
        )
        self.inv_host = np.asarray(jax.device_get(tape.inv_pos))
        # Parent zero-occupancy prefix (padded rows below this index are
        # rays with zero OCCUPIED samples — the only zero-occupancy
        # signal available for uncompacted parents, whose counts column
        # holds TOTAL samples).
        self._zero_rows = tape.n_zero * C

        self.n_rays = tape.n_rays
        self.S = S
        self.compact = tape.compact
        self.indirect = tape.indirect
        self.n_features = tape.n_features
        self.n_cells = tape.n_cells
        self.geom = tape.geom
        self.prog_K = tape.prog_K
        self.bwd_prog_K = tape.bwd_prog_K
        self.dtype = tape.dt.dtype

    def _occ_flags(self, pos, counts):
        """Zero-occupancy flag per subset ray (False = provably zero)."""
        if self.compact:
            return counts > 0
        return pos >= self._zero_rows

    def prep(self, ids, chunk_size: int = 1024, r_quant: int = 8):
        """Host-side subset layout: sort by sample count (parent
        invariant: zero-occupancy first, then ascending), pad to a chunk
        multiple, derive caps / tape width / zero prefix / round
        programs. Pure NumPy (radix argsort on the int count key) — no
        device sync. Returns a :class:`_SubsetPlan`."""
        ids = np.asarray(ids).reshape(-1)
        B = ids.shape[0]
        if B == 0:
            raise ValueError("empty ray-id set")
        if ids.min() < 0 or ids.max() >= self.n_rays:
            raise ValueError(
                f"ray ids must be in [0, {self.n_rays}); got "
                f"[{ids.min()}, {ids.max()}]"
            )
        pos = self.inv_host[ids]
        counts = self.counts_host[pos]
        occ = self._occ_flags(pos, counts)
        order = np.lexsort((counts, occ))
        pos_s = pos[order]
        counts_s = counts[order]

        C = max(1, min(int(chunk_size), B))
        Bp = -(-B // C) * C
        pad = Bp - B
        # Pad rows duplicate the cheapest subset ray (front of the sort)
        # — masked out of losses by callers via `pad`.
        pos_p = np.concatenate([pos_s[:1].repeat(pad), pos_s])
        ids_p = np.concatenate([ids[order][:1].repeat(pad), ids[order]])
        cnt_p = np.concatenate([counts_s[:1].repeat(pad), counts_s])
        occ_p = np.concatenate([occ[order][:1].repeat(pad), occ[order]])

        n_chunks = Bp // C
        n_zero = int(np.argmax(occ_p)) // C if occ_p.any() else n_chunks
        caps = cnt_p.reshape(n_chunks, C).max(axis=1)
        K_hi = max(self.prog_K, self.bwd_prog_K)
        cap = int(caps.max()) if n_chunks else 0
        S_sub = min(self.S, int(max(K_hi, _size_bucket(max(cap, 1)))))
        caps_nz = np.minimum(caps[n_zero:], S_sub)

        # original-subset-position i -> padded-layout row
        inv = np.empty(B, np.int64)
        inv[order] = np.arange(pad, Bp)
        return _SubsetPlan(
            pos_p=pos_p.astype(np.int64), ids_p=ids_p.astype(np.int64),
            caps_nz=caps_nz.astype(np.int64), inv=inv.astype(np.int32),
            B=B, C=C, pad=pad, n_chunks=n_chunks, n_zero=n_zero,
            S=S_sub, r_quant=int(r_quant),
        )


@dataclasses.dataclass(frozen=True)
class _SubsetPlan:
    """Host-side layout of one subset (see TapeRowSource.prep)."""

    pos_p: np.ndarray     # (Bp,) padded-layout source row per slot
    ids_p: np.ndarray     # (Bp,) original ray id per slot (targets)
    caps_nz: np.ndarray   # (n_chunks - n_zero,) per-chunk sample caps
    inv: np.ndarray       # (B,) subset position -> padded row
    B: int
    C: int
    pad: int
    n_chunks: int
    n_zero: int
    S: int
    r_quant: int


def _programs(caps_nz, prog_K: int, bwd_K: int, S: int, r_quant: int):
    rc, rs, lr = _round_program(caps_nz, prog_K, S, r_mult=r_quant)
    brc, brs, _ = _round_program(caps_nz, bwd_K, S, r_mult=r_quant)
    return rc, rs, lr, brc, brs


def _gather_rows(src: TapeRowSource, pos_p, S: int, C: int,
                 n_chunks: int):
    """Device row gather + re-chunk: (Bp,) source rows -> the chunked
    (n_chunks, S, C) tape layout (+ per-ray constants). Traceable —
    the minibatch trainer runs it per scan step."""
    def chunked(a_rm):
        g = jnp.take(a_rm[:, :S], pos_p, axis=0)
        return g.reshape(n_chunks, C, S).swapaxes(1, 2)

    idx = chunked(src.idx_rm)
    dt = chunked(src.dt_rm)
    cell = chunked(src.cell_rm) if src.cell_rm is not None else None
    tval = chunked(src.tval_rm) if src.tval_rm is not None else None
    counts = jnp.take(src.counts_rm, pos_p, axis=0)
    counts = jnp.minimum(counts, S).reshape(n_chunks, C)
    o = jnp.take(src.origins_rm, pos_p, axis=0).reshape(n_chunks, C, 3)
    d = jnp.take(src.dirs_rm, pos_p, axis=0).reshape(n_chunks, C, 3)
    v = jnp.take(src.vdirs_rm, pos_p, axis=0).reshape(n_chunks, C, 3)
    ds = jnp.take(src.dscale_rm, pos_p, axis=0).reshape(n_chunks, C)
    return idx, dt, cell, tval, counts, o, d, v, ds


def _build_tape(src: TapeRowSource, plan: _SubsetPlan, arrays,
                programs, inv_pos) -> RayTape:
    idx, dt, cell, tval, counts, o, d, v, ds = arrays
    rc, rs, lr, brc, brs = programs
    return RayTape(
        idx=idx, dt=dt, cell=cell, counts=counts,
        origins=o, dirs=d, vdirs=v, dscale=ds, inv_pos=inv_pos,
        round_chunk=rc, round_s0=rs, last_round=lr,
        bwd_round_chunk=brc, bwd_round_s0=brs,
        n_rays=plan.B, C=plan.C, S=plan.S, compact=src.compact,
        n_features=src.n_features, n_cells=src.n_cells, geom=src.geom,
        n_zero=plan.n_zero, prog_K=src.prog_K,
        bwd_prog_K=src.bwd_prog_K, ginv=None, group=1, tval=tval,
        out_blocks=(), indirect=src.indirect,
    )


@functools.partial(jax.jit, static_argnames=("S", "C", "n_chunks"))
def _gather_rows_jit(src_leaves, pos_p, S, C, n_chunks):
    return _gather_rows(src_leaves, pos_p, S, C, n_chunks)


def subset_tape(source, ids, *, chunk_size: int = 1024,
                r_quant: int = 8) -> RayTape:
    """Standalone :class:`RayTape` over an arbitrary subset of a
    recorded tape's rays.

    ``source`` is a :class:`TapeRowSource` (or a RayTape, converted on
    the fly — build the source once when subsetting repeatedly). ``ids``
    is a host int array of ORIGINAL ray indices (duplicates allowed —
    sampling with replacement replays the row twice). The subset tape
    replays/backprops through every existing tape entry point; outputs
    unsort to ``ids`` order.

    ``r_quant`` pads the round-program length to a multiple (executable
    reuse across same-size random batches — the round count is the one
    static that varies between equally-sized subsets)."""
    if isinstance(source, RayTape):
        source = TapeRowSource(source)
    plan = source.prep(ids, chunk_size=chunk_size, r_quant=r_quant)
    programs = _programs(plan.caps_nz, source.prog_K, source.bwd_prog_K,
                         plan.S, plan.r_quant)
    arrays = _gather_rows_jit(
        _SrcLeaves.of(source),
        jnp.asarray(plan.pos_p.astype(np.int32)),
        S=plan.S, C=plan.C, n_chunks=plan.n_chunks,
    )
    return _build_tape(source, plan, arrays, programs,
                       jnp.asarray(plan.inv))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _SrcLeaves:
    """The device-array subset of TapeRowSource, as a pytree (so the
    gather can be jitted / scanned over)."""

    idx_rm: jax.Array
    dt_rm: jax.Array
    cell_rm: Optional[jax.Array]
    tval_rm: Optional[jax.Array]
    counts_rm: jax.Array
    origins_rm: jax.Array
    dirs_rm: jax.Array
    vdirs_rm: jax.Array
    dscale_rm: jax.Array

    @classmethod
    def of(cls, src: TapeRowSource):
        return cls(
            idx_rm=src.idx_rm, dt_rm=src.dt_rm, cell_rm=src.cell_rm,
            tval_rm=src.tval_rm, counts_rm=src.counts_rm,
            origins_rm=src.origins_rm, dirs_rm=src.dirs_rm,
            vdirs_rm=src.vdirs_rm, dscale_rm=src.dscale_rm,
        )


def replay_render_rows(source, ids, features, opt: RenderOptions,
                       spec=None, *, unsort: bool = True,
                       index_table=None, chunk_size: int = 1024):
    """Replay only the rays in ``ids``: :func:`subset_tape` +
    :func:`~.tape.replay_render`. Differentiable wrt ``features``; the
    gradient equals the full replay's gradient of a loss restricted to
    these rays (tested). Returns (len(ids), n_color+1) in ``ids`` order
    when ``unsort``."""
    from .tape import replay_render

    tape = subset_tape(source, ids, chunk_size=chunk_size)
    return replay_render(tape, features, opt, spec, unsort=unsort,
                         index_table=index_table)


@functools.lru_cache(maxsize=None)
def _sgd(lr: float):
    """Per-lr cached SGD update (the update fn is a STATIC argument of
    the jitted trainer — a fresh closure per call would recompile)."""
    def update(features, grad, state):
        return features - lr * grad, state
    return update


def train_minibatches(source, ids_batches, targets, features,
                      opt: RenderOptions, *,
                      lr: float = 1e-2,
                      update_fn: Optional[Callable] = None,
                      update_state=(),
                      spec=None, index_table=None,
                      chunk_size: int = 1024, r_quant: int = 16,
                      loss_cols: Optional[int] = None):
    """N sequential SGD steps over N random-ray minibatches in ONE
    dispatch — the canonical random-pixel training loop at tape rates.

    Per step n: gather minibatch n's rows from the ray-major source
    (in-graph), replay forward, L2 loss against ``targets`` rows, tape
    backward (bulk flush), apply ``update_fn`` (default SGD with
    ``lr``); step n+1 replays against the UPDATED features — a true
    sequential chain, nothing can be hoisted.

    All N steps share one conservative round program (per-chunk cap =
    max over the N batches): rounds past a batch's true cap have
    valid == all-false and are exact no-ops, so outputs/grads equal the
    per-batch programs'. The shared program + size-bucketed tape width
    keep the executable reusable across calls with same-shaped batches.

    :param ids_batches: (N, B) host int array of ray ids per step.
    :param targets: (n_rays, W) device/host array of per-ray targets in
        ORIGINAL ray order; each step compares its rays' outputs
        (first W columns, or ``loss_cols``) against these rows.
    :param update_fn: ``(features, grad, state) -> (features, state)``;
        default plain SGD. State is scanned through (e.g. momentum).
    :return: (features_out, losses (N,)) — losses are per-step MEANS of
        squared error over the batch's valid rays x W columns.
    """
    ids_batches = np.asarray(ids_batches)
    if ids_batches.ndim != 2:
        raise ValueError("ids_batches must be (N, B)")
    if isinstance(source, RayTape):
        source = TapeRowSource(source)
    N, B = ids_batches.shape
    plans = [source.prep(ids_batches[n], chunk_size=chunk_size,
                         r_quant=r_quant) for n in range(N)]
    p0 = plans[0]
    # Common layout: width/zero-prefix must be safe for every batch.
    S_com = max(p.S for p in plans)
    n_zero = min(p.n_zero for p in plans)
    n_chunks, C, pad = p0.n_chunks, p0.C, p0.pad
    # Shared conservative caps: per-chunk max over batches, re-aligned
    # to the common zero prefix (chunks a batch skips have cap<=its own
    # caps anyway — a smaller common n_zero only prepends no-op chunks).
    caps = np.zeros((N, n_chunks - n_zero), np.int64)
    for n, p in enumerate(plans):
        caps[n, p.n_zero - n_zero:] = np.minimum(p.caps_nz, S_com)
    caps_sh = caps.max(axis=0)
    programs = _programs(caps_sh, source.prog_K, source.bwd_prog_K,
                         S_com, r_quant)
    plan_com = dataclasses.replace(p0, S=S_com, n_zero=n_zero,
                                   caps_nz=caps_sh)

    pos_all = jnp.asarray(
        np.stack([p.pos_p for p in plans]).astype(np.int32)
    )
    tgt_idx = jnp.asarray(
        np.stack([p.ids_p for p in plans]).astype(np.int32)
    )
    targets = jnp.asarray(targets)
    features = jnp.asarray(features)
    W = int(loss_cols) if loss_cols else int(targets.shape[1])
    upd = update_fn if update_fn is not None else _sgd(float(lr))

    return _train_impl(
        _SrcLeaves.of(source), programs, pos_all, tgt_idx, targets,
        features, update_state, spec, index_table, opt,
        plan_meta=(plan_com.B, C, pad, n_chunks, n_zero, S_com),
        src_meta=(source.compact, source.indirect, source.n_features,
                  source.n_cells, source.geom, source.prog_K,
                  source.bwd_prog_K),
        W=W, upd=upd,
    )


def train_steps(tape: RayTape, targets, features, opt: RenderOptions,
                n_steps: int, *, lr: float = 1e-2,
                update_fn: Optional[Callable] = None, update_state=(),
                spec=None, index_table=None,
                loss_cols: Optional[int] = None):
    """N sequential full-batch SGD steps over ONE recorded tape in ONE
    dispatch — the fixed-ray training chain (every step sees every
    recorded ray; for random minibatches use :func:`train_minibatches`).

    Step n: replay forward, L2 loss against ``targets`` (original ray
    order, permuted into tape order once up front), tape backward (bulk
    flush), update; step n+1 replays the UPDATED features. The chain is
    truly sequential — each step's flush feeds the next forward — so
    per-step cost is the honest fwd+bwd+update floor with zero dispatch
    overhead amortized across ``n_steps``.

    :param targets: (n_rays, W) per-ray target rows, original order.
    :return: (features_out, losses (n_steps,)).
    """
    targets = jnp.asarray(targets)
    features = jnp.asarray(features)
    W = int(loss_cols) if loss_cols else int(targets.shape[1])
    upd = update_fn if update_fn is not None else _sgd(float(lr))
    Bp = tape.n_chunks * tape.C
    pad = Bp - tape.n_rays
    # tape-order targets: row inv_pos[i] <- targets[i]; pad rows (the
    # leading duplicate block) keep zeros and are masked out below.
    tgt_tape = jnp.zeros((Bp, W), targets.dtype).at[tape.inv_pos].set(
        targets[:, :W]
    )
    return _train_steps_impl(
        tape, tgt_tape, features, update_state, spec, index_table, opt,
        n_steps=int(n_steps), W=W, pad=pad, upd=upd,
    )


@functools.partial(
    jax.jit, static_argnames=("opt", "n_steps", "W", "pad", "upd"),
)
def _train_steps_impl(tape, tgt_tape, features, update_state, spec,
                      index_table, opt, *, n_steps, W, pad, upd):
    Bp = tape.n_chunks * tape.C
    mask = (jnp.arange(Bp) >= pad).astype(tgt_tape.dtype)
    denom = 1.0 / float(max((Bp - pad) * W, 1))

    def step(carry, _):
        f, state = carry

        def loss_fn(ff):
            out = _replay_call(tape, ff, index_table, opt, spec)
            err = (out[:, :W] - tgt_tape) * mask[:, None]
            return jnp.sum(err * err) * denom

        loss, g = jax.value_and_grad(loss_fn)(f)
        f, state = upd(f, g, state)
        return (f, state), loss

    (features, update_state), losses = jax.lax.scan(
        step, (features, update_state), None, length=n_steps
    )
    return features, losses


@functools.partial(
    jax.jit,
    static_argnames=("opt", "plan_meta", "src_meta", "W", "upd"),
)
def _train_impl(src, programs, pos_all, tgt_idx, targets, features,
                update_state, spec, index_table, opt, *, plan_meta,
                src_meta, W, upd):
    B, C, pad, n_chunks, n_zero, S = plan_meta
    compact, indirect, n_features, n_cells, geom, prog_K, bwd_K = src_meta
    Bp = n_chunks * C
    # pad rows sit at [0, pad): mask them from the loss (their
    # cotangent is 0, so their replay contributes no gradient).
    mask = (jnp.arange(Bp) >= pad).astype(targets.dtype)
    inv_dummy = jnp.zeros((B,), jnp.int32)
    denom = 1.0 / float(max(B * W, 1))

    # Rebuild a RayTape pytree around the step's gathered arrays; the
    # static fields are trace constants shared by every step.
    plan = _SubsetPlan(
        pos_p=None, ids_p=None, caps_nz=None, inv=None, B=B, C=C,
        pad=pad, n_chunks=n_chunks, n_zero=n_zero, S=S, r_quant=0,
    )

    class _Src:
        pass

    meta = _Src()
    meta.compact, meta.indirect = compact, indirect
    meta.n_features, meta.n_cells = n_features, n_cells
    meta.geom, meta.prog_K, meta.bwd_prog_K = geom, prog_K, bwd_K

    def step(carry, xs):
        f, state = carry
        pos_p, tidx = xs
        arrays = _gather_rows(src, pos_p, S, C, n_chunks)
        tape = _build_tape(meta, plan, arrays, programs, inv_dummy)
        tgt = jnp.take(targets, tidx, axis=0)

        def loss_fn(ff):
            out = _replay_call(tape, ff, index_table, opt, spec)
            err = (out[:, :W] - tgt[:, :W]) * mask[:, None]
            return jnp.sum(err * err) * denom

        loss, g = jax.value_and_grad(loss_fn)(f)
        f, state = upd(f, g, state)
        return (f, state), loss

    (features, update_state), losses = jax.lax.scan(
        step, (features, update_state), (pos_all, tgt_idx)
    )
    return features, losses
