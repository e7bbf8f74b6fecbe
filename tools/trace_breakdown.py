"""Summarize a ``jax.profiler`` device trace into an op-level roofline table.

The reference debugs performance by eyeballing TensorBoard (its
``DiffWave_TF/train.py`` wires tf.summary scalars and nothing else); on TPU
the profiler's Chrome trace carries per-op ``hlo_category``,
``device_duration_ps`` and ``bytes_accessed``, which is enough to answer the
two roofline questions without a TensorBoard install: where does the step
time go (category/op table), and is each bucket compute- or memory-bound
(achieved GB/s vs the chip's HBM bandwidth).

Usage:
    python tools/trace_breakdown.py /tmp/fp_trace [--steps 3] [--top 20]

``--steps`` divides the aggregate by the number of profiled steps (the
capture loop's iteration count) so the table reads in per-step ms.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re

# v5e: 819 GB/s HBM, 197 bf16 TFLOP/s (same constants as bench.py).
HBM_GBPS = 819.0


def load_device_ops(trace_dir: str):
    """Yield (name, dur_us, category, bytes_accessed, long_name) for every
    device-side XLA op event in the newest trace under ``trace_dir``."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    # Find the device pid and its "XLA Ops" tid from metadata events.
    dev_pid = xla_tid = None
    for e in events:
        if e.get("ph") != "M":
            continue
        if e["name"] == "process_name" and "TPU" in e["args"].get("name", ""):
            dev_pid = e["pid"]
        if (e["name"] == "thread_name"
                and e["args"].get("name") == "XLA Ops"):
            xla_tid = (e["pid"], e["tid"])
    if dev_pid is None or xla_tid is None or xla_tid[0] != dev_pid:
        raise RuntimeError("no TPU 'XLA Ops' thread in trace")
    for e in events:
        if (e.get("ph") == "X" and e.get("pid") == dev_pid
                and e.get("tid") == xla_tid[1]):
            args = e.get("args", {})
            yield (e["name"], e["dur"],
                   args.get("hlo_category", "?"),
                   int(args.get("bytes_accessed", 0)),
                   args.get("long_name", ""))


def summarize(trace_dir: str, steps: int = 1, top: int = 20):
    by_cat = collections.defaultdict(lambda: [0.0, 0])   # us, bytes
    by_op = collections.defaultdict(lambda: [0.0, 0, ""])
    total_us = 0.0
    for name, dur, cat, nbytes, long_name in load_device_ops(trace_dir):
        total_us += dur
        by_cat[cat][0] += dur
        by_cat[cat][1] += nbytes
        # Collapse .N suffixes so repeated layers aggregate.
        base = re.sub(r"\.\d+$", "", name)
        by_op[base][0] += dur
        by_op[base][1] += nbytes
        if not by_op[base][2]:
            by_op[base][2] = long_name[:120]
    print(f"device op time: {total_us / 1000 / steps:.2f} ms/step "
          f"({steps} steps profiled)")
    print("\n-- by hlo_category " + "-" * 44)
    print(f"{'category':<26}{'ms/step':>9}{'%':>7}{'GB/s':>9}")
    for cat, (us, nb) in sorted(by_cat.items(), key=lambda kv: -kv[1][0]):
        gbps = nb / (us * 1e-6) / 1e9 if us else 0.0
        print(f"{cat:<26}{us / 1000 / steps:>9.3f}"
              f"{100 * us / total_us:>7.1f}{gbps:>9.0f}")
    print(f"\n-- top {top} ops (deduplicated) " + "-" * 32)
    print(f"{'op':<40}{'ms/step':>9}{'%':>7}{'GB/s':>9}")
    for op, (us, nb, long_name) in sorted(
            by_op.items(), key=lambda kv: -kv[1][0])[:top]:
        gbps = nb / (us * 1e-6) / 1e9 if us else 0.0
        print(f"{op:<40}{us / 1000 / steps:>9.3f}"
              f"{100 * us / total_us:>7.1f}{gbps:>9.0f}")
        if long_name:
            print(f"    {long_name}")
    return by_cat, by_op, total_us


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=1)
    ap.add_argument("--top", type=int, default=20)
    a = ap.parse_args()
    summarize(a.trace_dir, steps=a.steps, top=a.top)
