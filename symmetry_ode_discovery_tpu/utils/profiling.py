"""Tracing / profiling utilities.

The reference has no profiling at all (SURVEY.md §5: tqdm bars only). The
TPU-native equivalents: jax.profiler traces viewable in TensorBoard/Perfetto,
and accurate wall-clock timing that accounts for async dispatch
(block_until_ready).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/sodt-trace") -> Iterator[None]:
    """Capture a device trace: `with trace(): run()` then load log_dir in
    TensorBoard (Profile plugin) or Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str = "", results: dict | None = None) -> Iterator[None]:
    """Wall-clock a block, draining the async dispatch queue at both ends so
    the measurement covers exactly the enclosed device work."""
    (jax.device_put(0.0) + 0).block_until_ready()
    t0 = time.perf_counter()
    yield
    (jax.device_put(0.0) + 0).block_until_ready()
    dt = time.perf_counter() - t0
    if results is not None:
        results[label] = dt
    if label:
        print(f"[timed] {label}: {dt:.3f}s")


def block_all(tree) -> None:
    """block_until_ready on every leaf of a pytree."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


# ---------------------------------------------------------------------------
# XPlane (.xplane.pb) op-level summaries — no TensorBoard required.
#
# jax.profiler writes plugins/profile/<ts>/<host>.xplane.pb. On the axon TPU
# tunnel the Chrome-trace sidecar (trace.json.gz) carries HOST events only;
# the device op timeline lives in the XPlane protobuf. Rather than depend on
# tensorflow/tsl to read it, parse the wire format directly — the schema
# subset needed is tiny (XSpace.planes[].{name, lines[].events[],
# event_metadata{}}). This powered the round-2 optimization work: it located
# the 500k serialized dynamic-update-slices in the GP constant-optimization
# backward and showed the symreg penalty matmuls at ~170 TFLOP/s.
# ---------------------------------------------------------------------------


def _pb_varint(buf: bytes, i: int):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _pb_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _pb_varint(buf, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _pb_varint(buf, i)
        elif wt == 2:
            ln, i = _pb_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v, i = buf[i:i + 4], i + 4
        elif wt == 1:
            v, i = buf[i:i + 8], i + 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fn, wt, v


def summarize_xplane(log_dir: str, plane: str = "/device:TPU:0",
                     line: str = "XLA Ops", top: int = 25,
                     print_table: bool = True):
    """Aggregate per-op device time from a jax.profiler trace directory.

    Returns a list of (op_name, total_seconds, count) sorted by total time,
    for `line` of `plane` (defaults: the TPU op timeline; use
    plane='/host:CPU' for host traces). Pass the directory given to
    `trace()` / jax.profiler.trace.
    """
    import collections
    import glob
    import os

    paths = sorted(glob.glob(os.path.join(log_dir, "plugins/profile/*/",
                                          "*.xplane.pb")))
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {log_dir}")
    data = open(paths[-1], "rb").read()
    agg = collections.Counter()
    cnt = collections.Counter()
    for f1, _, pl in _pb_fields(data):
        if f1 != 1:  # XSpace.planes
            continue
        pname, lines, emeta = None, [], {}
        for f2, _, v2 in _pb_fields(pl):
            if f2 == 2:
                pname = v2.decode()
            elif f2 == 3:
                lines.append(v2)
            elif f2 == 4:  # map<int64, XEventMetadata>
                k = name = None
                for f3, _, v3 in _pb_fields(v2):
                    if f3 == 1:
                        k = v3
                    elif f3 == 2:
                        for f4, _, v4 in _pb_fields(v3):
                            if f4 == 2:
                                name = v4.decode()
                if k is not None:
                    emeta[k] = name
        if pname != plane:
            continue
        for ln in lines:
            lname, events = None, []
            for f3, _, v3 in _pb_fields(ln):
                if f3 in (2, 11):  # name / display_name
                    lname = v3.decode()
                elif f3 == 4:
                    events.append(v3)
            if lname != line:
                continue
            for ev in events:
                mid = dur = 0
                for f4, _, v4 in _pb_fields(ev):
                    if f4 == 1:
                        mid = v4
                    elif f4 == 3:
                        dur = v4
                key = emeta.get(mid, str(mid))
                agg[key] += dur
                cnt[key] += 1
    rows = [(name, ps / 1e12, cnt[name]) for name, ps in agg.most_common(top)]
    if print_table:
        total = sum(ps for ps in agg.values()) / 1e12
        print(f"{plane} / {line}: {sum(cnt.values())} events, "
              f"{total * 1e3:.1f} ms total")
        for name, sec, c in rows:
            print(f"  {sec * 1e3:9.2f} ms {c:8d}  {name[:100]}")
    return rows
