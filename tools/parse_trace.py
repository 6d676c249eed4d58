"""Summarize device-op time from a jax.profiler trace.

Usage: python tools/parse_trace.py <trace.json.gz>

The trace file lives under the profiler directory at
``plugins/profile/<ts>/*.trace.json.gz`` (produced by
``python bench.py --profile DIR`` or any ``jax.profiler.trace`` block).
Aggregates per-op-name device time so a kernel/regression is attributable
at a glance without opening xprof/tensorboard.
"""
import collections
import gzip
import json
import sys

path = sys.argv[1]
with gzip.open(path) as f:
    data = json.load(f)
events = data["traceEvents"]

names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"].get("name", "")

agg = collections.Counter()
cnt = collections.Counter()
total = 0
for e in events:
    if e.get("ph") == "X" and "TPU" in names.get(e.get("pid"), "") and "dur" in e:
        nm = e.get("name", "?")
        agg[nm] += e["dur"]
        cnt[nm] += 1
        total += e["dur"]

print(f"total device-op time: {total/1e6:.3f} s  (tracks: {set(names.values())})")
for nm, d in agg.most_common(25):
    print(f"{d/1e3:10.1f} ms  x{cnt[nm]:<6d} {nm[:110]}")
