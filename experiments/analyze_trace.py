"""Aggregate a jax.profiler device trace into an op-family time table.

Reads the ``*.trace.json.gz`` Chrome-trace export inside a profile dir
(written by ``jax.profiler.trace`` / ``--profile`` on the CLIs), keeps
only TPU device-track slices (complete 'X' events), and groups their
durations by op family — the same bucketing used for the op-level
profile tables in docs/PERFORMANCE.md.

Usage:
    python experiments/analyze_trace.py /tmp/prof_dense [--top 25]
"""

import argparse
import glob
import gzip
import json
import os
import re
from collections import defaultdict


FAMILIES = [
    ("convolution", re.compile(r"convolution|conv", re.I)),
    ("copy/format", re.compile(r"^copy|copy\.|transpose|bitcast", re.I)),
    ("convert+reduce", re.compile(r"convert|reduce", re.I)),
    ("dynamic-slice/update", re.compile(r"dynamic.?(slice|update)", re.I)),
    ("gather/scatter", re.compile(r"gather|scatter", re.I)),
    ("fusion (elementwise/loop)", re.compile(r"fusion|loop", re.I)),
    ("dot/matmul", re.compile(r"dot|matmul|gemm", re.I)),
    ("infeed/outfeed/transfer", re.compile(r"infeed|outfeed|transfer", re.I)),
]


def classify(name: str) -> str:
    for fam, rx in FAMILIES:
        if rx.search(name):
            return fam
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    paths = glob.glob(
        os.path.join(args.logdir, "plugins", "profile", "*", "*.trace.json.gz")
    )
    if not paths:
        raise SystemExit(f"no trace.json.gz under {args.logdir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)

    events = trace.get("traceEvents", [])
    # Container events (the jit wrapper, scan `while` bodies, bare
    # step-number scopes) NEST the leaf HLO slices on the same track —
    # summing them double-counts; keep leaves only.
    container = re.compile(r"^(jit_?|while[.\d]|\d+$|region|name_scope)", re.I)
    # Identify device tracks: process names containing 'TPU' (fall back
    # to all non-python threads if none found).
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e
    }
    device_pids = {p for p, n in pid_names.items() if "TPU" in n or "tpu" in n}
    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        if container.match(e["name"]):
            continue
        by_name[e["name"]] += e["dur"]
        total += e["dur"]
    if not by_name:
        raise SystemExit("no complete device events found")

    by_family = defaultdict(float)
    for name, dur in by_name.items():
        by_family[classify(name)] += dur

    print(f"device time total: {total / 1e6:.3f} s over {len(by_name)} op names")
    print("\nby family:")
    for fam, dur in sorted(by_family.items(), key=lambda kv: -kv[1]):
        print(f"  {dur / total:6.1%}  {dur / 1e6:8.3f} s  {fam}")
    print(f"\ntop {args.top} op names:")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {dur / total:6.1%}  {dur / 1e6:8.3f} s  {name[:110]}")


if __name__ == "__main__":
    main()
