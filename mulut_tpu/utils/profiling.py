"""Profiling/tracing helpers.

The reference's observability is wall-clock dT/rT accumulators in the train
loops (ref: sr/1_train_model.py:183-201) — those are preserved in our
pipelines for log parity.  This module adds the TPU-native layer on top:
`jax.profiler` traces viewable in TensorBoard/Perfetto, plus an honest
remote-device timer (plain block_until_ready under-reports through
remote-device tunnels; a device-to-host readback is the only reliable sync).
"""

from __future__ import annotations

import contextlib
import os
import time

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str | None = None):
    """Capture a jax.profiler trace around a block.

    Enabled when `log_dir` is given or MULUT_TRACE_DIR is set; otherwise a
    no-op, so call sites can wrap hot loops unconditionally.
    """
    log_dir = log_dir or os.environ.get("MULUT_TRACE_DIR")
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (`with annotate("stage2"): ...`)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def op_breakdown(trace_dir: str, top: int = 20) -> list:
    """Aggregate per-HLO-op device time from a jax.profiler trace.

    Parses the perfetto JSON (`plugins/profile/*/*.trace.json.gz`) that
    `trace()` / jax.profiler write — this works even through remote-device
    tunnels where TensorBoard is unavailable, and is how every round-2
    kernel decision in PERF.md was measured.

    Returns [(total_ms, op_name, hlo_long_name)] sorted by time, summed
    over all executions in the trace (divide by your run count).
    """
    import glob
    import gzip
    import json

    files = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True)
    )
    if not files:
        return []
    events = json.load(gzip.open(files[-1]))["traceEvents"]
    agg: dict = {}
    for e in events:
        args = e.get("args") or {}
        if e.get("ph") == "X" and "dur" in e and args.get("hlo_category"):
            name = e.get("name", "?")
            entry = agg.setdefault(name, [0.0, args.get("long_name", "")])
            entry[0] += e["dur"] / 1e3
    rows = sorted(
        ((ms, name, long_name) for name, (ms, long_name) in agg.items()),
        reverse=True,
    )
    return rows[:top]


def device_timeline(trace_dir: str, top_gaps: int = 12) -> dict:
    """Device busy/idle analysis of a jax.profiler trace.

    Complements `op_breakdown` (which sums op durations): aggregates the
    device-lane timeline itself to answer "where does wall time go that
    no HLO op accounts for" — dispatch serialization, host sync stalls,
    inter-op bubbles.

    Returns {"span_ms", "busy_ms", "idle_ms", "gaps": [(gap_ms,
    after_op, before_op), ...]} where gaps are the largest idle holes
    between consecutive device ops (merged across overlapping lanes).
    """
    import glob
    import gzip
    import json

    files = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True)
    )
    if not files:
        return {}
    events = json.load(gzip.open(files[-1]))["traceEvents"]
    ivs = []  # (start_us, end_us, name)
    for e in events:
        args = e.get("args") or {}
        if e.get("ph") == "X" and "dur" in e and args.get("hlo_category"):
            ivs.append((e["ts"], e["ts"] + e["dur"], e.get("name", "?")))
    if not ivs:
        return {}
    ivs.sort()
    span = ivs[-1][1] - ivs[0][0]
    busy = 0.0
    gaps = []
    cur_s, cur_e, cur_n = ivs[0]
    for s, t, name in ivs[1:]:
        if s <= cur_e:  # overlap (parallel lanes) — merge
            if t > cur_e:
                cur_e, cur_n = t, name
            continue
        busy += cur_e - cur_s
        gaps.append((s - cur_e, cur_n, name))
        cur_s, cur_e, cur_n = s, t, name
    busy += cur_e - cur_s
    gaps.sort(reverse=True)
    return {
        "span_ms": span / 1e3,
        "busy_ms": busy / 1e3,
        "idle_ms": (span - busy) / 1e3,
        "gaps": [(g / 1e3, a, b) for g, a, b in gaps[:top_gaps]],
    }


def device_time(fn, *args, n: int = 4, reps: int = 2) -> float:
    """Marginal seconds per `fn(*args)` execution, tunnel-safe.

    Runs n and then 2n executions, each group followed by a device-to-host
    readback, and returns (t_2n - t_n) / n — this cancels the fixed
    dispatch/sync overhead of remote-device transports and defeats
    async-dispatch under-reporting.

    The marginal measurement repeats `reps` times and the MINIMUM wins:
    the axon tunnel intermittently stalls a group by a ~3.4 s quantum
    (observed repeatedly on 2026-08-18 — inflating unrelated workloads
    to "3.35-3.64 s/batch"), and a stall can only inflate a marginal,
    never deflate it.
    """
    import jax

    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).reshape(-1)[:1]

    def wall(k):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.reshape(-1)[:1] if hasattr(leaf, "reshape") else leaf)
        return time.perf_counter() - t0

    best = min((wall(2 * n) - wall(n)) / n for _ in range(reps))
    return max(best, 1e-9)
