"""Per-HLO-op device-time profile of the flagship train step (real TPU).

Captures a ``jax.profiler`` trace of the bf16 FlowNet2 train step, then joins
the Chrome-trace "XLA Ops" lane with the compiled module's ``op_name``
metadata to attribute real device time per subnet / op family — the tool
that located the round-2 warp-epilogue and conv-padding costs (BASELINE.md
"Transposed warp epilogue"). Unlike the XLA cost model (bytes-accessed
overcounts fusion-internal reads ~4×) or isolated per-op benchmarks (a
~2-3 ms per-dispatch floor through the axon tunnel), this is ground truth.

Usage: timeout 580 python tools/trace_ops.py [--batch 24] [--size 256]
       [--steps 5] [--top 30]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def capture(batch, size, steps, logdir):
    from tpureg.data import random_pair_batch
    from tpureg.reg import OpticalFlowReg
    from tpureg.train import create_train_state, make_train_step
    from tpureg.utils import enable_compilation_cache

    enable_compilation_cache()
    batches = [random_pair_batch(jax.random.key(i), batch, size)
               for i in range(4)]
    model = OpticalFlowReg(conv_predictor="flownet2")
    state = create_train_state(model, jax.random.key(0), batches[0])
    step = make_train_step(donate=False, compute_dtype=jnp.bfloat16)
    hlo = step.lower(state, batches[0]).compile().as_text()
    for _ in range(3):
        state, m = step(state, batches[0])
    float(m["loss"])  # fence (block_until_ready lies through the tunnel)
    jax.profiler.start_trace(logdir)
    for i in range(steps):
        state, m = step(state, batches[i % 4])
    float(m["loss"])
    jax.profiler.stop_trace()
    traces = glob.glob(os.path.join(logdir, "plugins/profile/*/*.trace.json.gz"))
    # a reused logdir accumulates one trace per run — take the newest
    return hlo, max(traces, key=os.path.getmtime)


def parse_meta(hlo_text):
    meta = {}
    for line in hlo_text.splitlines():
        # type is a scalar shape or a (possibly nested) tuple — allow two
        # levels of parens inside the tuple (inner tuples + T(8,128) layouts)
        m = re.match(
            r"\s*(?:ROOT )?%?([\w.\-]+) = "
            r"(?:\((?:[^()]|\((?:[^()]|\([^()]*\))*\))*\)|\S+) ([\w\-]+)",
            line)
        if not m:
            continue
        mm = re.search(r'op_name="([^"]*)"', line)
        meta[m.group(1)] = (m.group(2), mm.group(1) if mm else "")
    return meta


def device_op_times(trace_path):
    with gzip.open(trace_path) as f:
        d = json.load(f)
    tids = {(e["pid"], e["tid"]): e["args"].get("name", "")
            for e in d["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    agg = collections.Counter()
    for e in d["traceEvents"]:
        if (e.get("ph") != "X"
                or tids.get((e.get("pid"), e.get("tid"))) != "XLA Ops"):
            continue
        name = e.get("name", "").lstrip("%")
        if name.startswith("branch_"):
            continue  # nested inside its cond event — counting both doubles
        agg[name] += e.get("dur", 0)
    return agg


def classify(opcode, op_name):
    sub = "head/loss/misc"
    sm = re.search(r"/(flownet[a-z_0-9]*)/", op_name)
    if sm:
        sub = sm.group(1)
    elif "pallas" in op_name or opcode == "custom-call":
        sub = "pallas(warp/corr)"
    elif op_name == "":
        sub = "(no-meta)"
    fam = "other:" + opcode
    if "pallas_call" in op_name or opcode in ("custom-call", "conditional"):
        fam = "pallas"
    elif "conv_general_dilated" in op_name:
        fam = "conv"
    elif "bn/" in op_name:
        fam = "bn"
    elif "leaky_relu" in op_name:
        fam = "leaky"
    elif opcode in ("copy", "copy-start", "copy-done", "reverse",
                    "transpose", "bitcast"):
        fam = "layout"
    elif opcode == "custom-call":
        fam = "pallas"
    elif "reduce" in opcode:
        fam = "reduce"
    return sub, fam


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--logdir", default="/tmp/tpureg_trace")
    ap.add_argument("--family", default=None,
                    help="comma-separated families to list top ops for "
                         "(e.g. layout,pallas)")
    args = ap.parse_args()

    hlo, trace = capture(args.batch, args.size, args.steps, args.logdir)
    meta = parse_meta(hlo)
    agg = device_op_times(trace)
    total = sum(agg.values()) / args.steps / 1e3
    print(f"device time: {total:.1f} ms/step  ({len(agg)} distinct ops)")

    by_sub, by_fam = collections.Counter(), collections.Counter()
    rows = []
    for name, dur in agg.items():
        opcode, op_name = meta.get(name, ("?", ""))
        sub, fam = classify(opcode, op_name)
        ms = dur / args.steps / 1e3
        by_sub[sub] += ms
        by_fam[fam] += ms
        rows.append((ms, opcode, name, op_name))
    print("\nby subnet:")
    for k, v in by_sub.most_common():
        print(f"  {k:22s} {v:7.2f} ms")
    print("\nby family:")
    for k, v in by_fam.most_common(12):
        print(f"  {k:26s} {v:7.2f} ms")
    rows.sort(reverse=True)
    fams = args.family.split(",") if args.family else [None]
    for fam in fams:
        sel = rows if fam is None else [
            r for r in rows if classify(r[1], r[3])[1] == fam]
        print(f"\ntop {args.top} ops" + (f" in family {fam!r}:" if fam
                                         else ":"))
        for ms, opcode, name, op_name in sel[: args.top]:
            print(f"  {ms:7.3f} ms {opcode:14s} {name[:26]:26s} "
                  f"{op_name[-70:]}")


if __name__ == "__main__":
    main()
