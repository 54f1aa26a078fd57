"""Device-time attribution: profiler trace -> per-source-line cost table.

The round-3 kernel work needed to know WHERE a compiled train step spends
device time — per HLO fusion, mapped back to the Python source lines that
produced each dot — and the jax.profiler trace alone doesn't give that
(op names like ``fusion.134`` are opaque). This module joins the two
artifacts the toolchain does provide:

1. a profiler device trace (``jax.profiler.start_trace`` ->
   ``*.trace.json.gz``), which has per-op durations;
2. the optimized HLO text of the SAME executable
   (``jitted.lower(...).compile().as_text()``), which has fusion ->
   computation bodies with ``source_file``/``source_line`` metadata.

Used by ``cli/profile_step.py``; also importable for ad-hoc analysis.
No reference equivalent (the reference has no profiling at all,
SURVEY.md section 5) — this is framework-native observability.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
from typing import Callable, Dict, List, Tuple


def parse_hlo_fusions(hlo_text: str) -> Dict[str, str]:
    """instruction name -> called fused-computation name (entry fusions)."""
    call_of = {}
    for m in re.finditer(
            r'%?([\w.-]+) = (?:\([^)]*\)|[^\s]+) fusion\([^)]*\), '
            r'kind=\w+, calls=%?([\w.-]+)', hlo_text):
        call_of[m.group(1)] = m.group(2)
    return call_of


def parse_hlo_bodies(hlo_text: str) -> Dict[str, str]:
    """fused-computation name -> body text."""
    bodies = {}
    for m in re.finditer(r'%([\w.-]+) \((?:[^)]*)\) -> [^\{]+\{(.*?)\n\}',
                         hlo_text, re.S):
        bodies[m.group(1)] = m.group(2)
    return bodies


def describe_computation(body: str) -> str:
    """Label a fused computation by the source lines of its dots, falling
    back to any metadata line (prefixed '~' to mark the weaker signal)."""
    tags = []
    for cm in re.finditer(
            r'(convolution|dot)\([^)]*\).*?source_file="([^"]+)" '
            r'source_line=(\d+)', body):
        tags.append(f"{cm.group(2).split('/')[-1]}:{cm.group(3)}")
    if not tags:
        cm = re.search(r'source_file="([^"]+)" source_line=(\d+)', body)
        if cm:
            tags.append("~" + cm.group(1).split("/")[-1] + ":" + cm.group(2))
    return "+".join(sorted(set(tags))) or "?"


def load_trace_durations(logdir: str) -> Dict[str, float]:
    """op name -> total device microseconds across the trace."""
    agg: collections.Counter = collections.Counter()
    for f in glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                       recursive=True):
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            args = ev.get("args", {}) or {}
            if "hlo_category" in args or "hlo_op" in args:
                agg[ev["name"]] += ev.get("dur", 0)
    return dict(agg)


def attribute(durations: Dict[str, float], hlo_text: str,
              steps: int) -> List[Tuple[float, str]]:
    """Join trace durations with HLO metadata.

    Returns [(ms_per_step, label)] sorted descending. Labels are
    ``file:line`` source attributions for fusions containing dots,
    ``[category]`` buckets for everything else (copies, slices, the Pallas
    custom-calls, ...).
    """
    call_of = parse_hlo_fusions(hlo_text)
    bodies = parse_hlo_bodies(hlo_text)
    bysrc: collections.Counter = collections.Counter()
    for name, dur in durations.items():
        comp = call_of.get(name)
        if comp is not None:
            label = describe_computation(bodies.get(comp, ""))
        elif name.startswith(("jvp", "transpose_jvp", "custom-call")):
            label = "[pallas-kernel:" + name.split(".")[0] + "]"
        else:
            label = "[" + name.split(".")[0] + "]"
        bysrc[label] += dur
    rows = [(dur / steps / 1000.0, label) for label, dur in bysrc.items()]
    rows.sort(reverse=True)
    return rows


def profile_fn(fn: Callable, args: tuple, logdir: str, steps: int = 10,
               warmup: int = 3, thread_state: bool = False,
               ) -> List[Tuple[float, str]]:
    """Trace ``fn(*args)`` ``steps`` times and attribute device time.

    ``fn`` must be a jitted callable whose output supports a value fetch
    (the first leaf is fetched as the execution barrier — through remote
    tunnels ``block_until_ready`` is not reliable, benchmarks/RESULTS.md).
    ``thread_state=True`` feeds ``out[0]`` back as ``args[0]`` between
    calls so repeated dispatches are data-chained (identical repeated
    dispatches can be elided by remote-dispatch tunnels).
    """
    import jax

    def call(a, out):
        if thread_state and out is not None:
            a = (out[0],) + tuple(a[1:])
        return a, fn(*a)

    import shutil

    # jax.profiler writes a new timestamped subdir per run and never cleans
    # old ones; a reused logdir would double-count durations across runs.
    # Trace into a private subdirectory and clear only THAT, so a caller
    # pointing logdir at a directory with existing data never loses it.
    logdir = os.path.join(logdir, "_attribution_run")
    shutil.rmtree(logdir, ignore_errors=True)

    out = None
    a = tuple(args)
    for _ in range(warmup):
        a, out = call(a, out)
    _fetch(out)
    comp = fn.lower(*a).compile() if hasattr(fn, "lower") else None
    hlo = comp.as_text() if comp is not None else ""

    jax.profiler.start_trace(logdir)
    for _ in range(steps):
        a, out = call(a, out)
    _fetch(out)
    jax.profiler.stop_trace()

    return attribute(load_trace_durations(logdir), hlo, steps)


def _fetch(out):
    import jax
    import numpy as np

    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def load_trace_timeline(logdir: str) -> List[Tuple[float, float, str]]:
    """Device-op timeline [(start_us, end_us, name)] sorted by start.

    Only events carrying HLO metadata (the device lanes) are kept, same
    filter as ``load_trace_durations`` — host/python lanes are excluded.
    """
    rows: List[Tuple[float, float, str]] = []
    for f in glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                       recursive=True):
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            args = ev.get("args", {}) or {}
            if "hlo_category" in args or "hlo_op" in args:
                ts, dur = float(ev.get("ts", 0.0)), float(ev.get("dur", 0))
                rows.append((ts, ts + dur, ev["name"]))
    rows.sort()
    return rows


def occupancy(timeline: List[Tuple[float, float, str]], steps: int,
              top_gaps: int = 12) -> dict:
    """Serialization analysis of a device timeline (VERDICT r3 item 2:
    is the measured step a serialized op sequence, and where are the
    bubbles the schedule could in principle overlap?).

    Returns {span_ms, busy_ms, idle_ms, idle_frac, gaps} per step, where
    ``gaps`` is the top inter-op idle windows [(ms, after_op, before_op)]
    — each one a candidate for overlap (DMA under compute, fused
    scheduling) or evidence of dispatch overhead.
    """
    if not timeline:
        return {"span_ms": 0.0, "busy_ms": 0.0, "idle_ms": 0.0,
                "idle_frac": 0.0, "gaps": []}
    span = timeline[-1][1] - timeline[0][0]
    busy = 0.0
    gaps: List[Tuple[float, str, str]] = []
    cur_s, cur_e, cur_name = timeline[0]
    for s, e, name in timeline[1:]:
        if s > cur_e:          # an idle bubble between device ops
            gaps.append((s - cur_e, cur_name, name))
            busy += cur_e - cur_s
            cur_s, cur_e, cur_name = s, e, name
        else:                  # overlapping/abutting: extend the busy run
            if e > cur_e:
                cur_e, cur_name = e, name
    busy += cur_e - cur_s
    gaps.sort(reverse=True)
    # an inter-STEP gap (host loop) is expected once per step; keep it in
    # the list (callers see the op names) but the aggregate stays honest
    return {
        "span_ms": span / steps / 1000.0,
        "busy_ms": busy / steps / 1000.0,
        "idle_ms": (span - busy) / steps / 1000.0,
        "idle_frac": (span - busy) / span if span else 0.0,
        "gaps": [(d / 1000.0, a, b) for d, a, b in gaps[:top_gaps]],
    }
