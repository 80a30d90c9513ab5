"""Device-trace capture and aggregation — the framework's profiling
subsystem (SURVEY §5 "tracing/profiling"; the reference has only
commented-out `@profile` decorators and nvprof `-lineinfo` flags).

On the axon TPU relay, device-side trace events are the only trustworthy
timing source (host wall time carries a ~25-30 ms dispatch round-trip
and the relay may serve repeated identical dispatches from a cache —
see docs/PERFORMANCE.md). Usage:

    from svox_t_tpu.utils.profiling import device_trace

    with device_trace("/tmp/my_trace") as t:
        out = my_jitted_fn(args)
        float(jnp.sum(out))          # force completion inside the trace
    t.summary(top=20)                # aggregated per-op device time
    t.total_ms                       # total device op-time

Caveat: trace events nest — a `while`/`fori_loop` wrapper event's
duration INCLUDES its children, so `total_ms` over-counts programs with
control flow. Read the leaf ops (fusions, copies, slices) or divide a
per-iteration wrapper (e.g. an inner `while.N xK` row) by its count.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
from collections import defaultdict
from typing import Optional


class TraceResult:
    """Aggregated device-side op times from a profiler trace."""

    def __init__(self, trace_dir: str):
        self.trace_dir = trace_dir
        self.by_name = {}
        self.counts = {}
        self.total_ms = 0.0
        self._aggregate()

    def _aggregate(self):
        files = glob.glob(
            os.path.join(self.trace_dir, "**", "*.trace.json.gz"),
            recursive=True,
        )
        if not files:
            raise FileNotFoundError(f"no trace under {self.trace_dir}")
        f = max(files, key=os.path.getmtime)
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        events = data.get("traceEvents", [])
        tpu_pids = set()
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                nm = e.get("args", {}).get("name", "")
                if "TPU" in nm and "pjrt" not in nm.lower():
                    tpu_pids.add(e["pid"])
        by = defaultdict(float)
        cnt = defaultdict(int)
        total = 0.0
        for e in events:
            if e.get("ph") == "X" and e.get("pid") in tpu_pids and "dur" in e:
                nm = e.get("name", "")
                # skip the top-level module events (they cover children)
                if nm.startswith("jit_") or nm.startswith("module"):
                    continue
                by[nm] += e["dur"]
                cnt[nm] += 1
                total += e["dur"]
        self.by_name = dict(by)
        self.counts = dict(cnt)
        self.total_ms = total / 1e3

    def top(self, n: int = 20):
        """[(name, total_ms, count)] sorted by total device time."""
        rows = sorted(self.by_name.items(), key=lambda kv: -kv[1])[:n]
        return [(nm, dur / 1e3, self.counts[nm]) for nm, dur in rows]

    def summary(self, top: int = 20) -> str:
        lines = [f"total device op-time {self.total_ms:.2f} ms"]
        for nm, ms, c in self.top(top):
            lines.append(f"{ms:9.3f} ms  x{c:<6d} {nm[:100]}")
        out = "\n".join(lines)
        print(out)
        return out


class device_trace:
    """Context manager: captures a jax.profiler trace and aggregates the
    device-side events on exit (available as the `result` attribute /
    the value bound by ``with ... as t``)."""

    def __init__(self, trace_dir: str, clean: bool = True):
        self.trace_dir = trace_dir
        self.clean = clean
        self.result: Optional[TraceResult] = None

    def __enter__(self):
        import jax

        if self.clean and os.path.isdir(self.trace_dir):
            shutil.rmtree(self.trace_dir, ignore_errors=True)
        jax.profiler.start_trace(self.trace_dir)
        return self

    def __exit__(self, exc_type, exc, tb):
        import jax

        jax.profiler.stop_trace()
        if exc_type is None:
            self.result = TraceResult(self.trace_dir)
        return False

    # convenience passthroughs once the trace is closed
    @property
    def total_ms(self):
        return self.result.total_ms

    def top(self, n: int = 20):
        return self.result.top(n)

    def summary(self, top: int = 20):
        return self.result.summary(top)
