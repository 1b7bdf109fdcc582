"""Ablation profile of the FlowNet2 train step on the real TPU chip.

Times each component of the flagship step in isolation (subnets fwd+bwd at
their true cascade shapes, warps, correlation, loss, optimizer) plus whole-
step variants (bf16 compute, remat policies), with honest host-transfer
fencing (block_until_ready lies through the axon tunnel — BASELINE.md).

Usage:  timeout 580 python tools/profile_step.py [--batch 24] [--size 256]
        [--variants-only]   (skip the per-component section)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
    float(jnp.sum(leaves[-1]))


def bench(name, fn, *args, iters=10, warmup=3):
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:46s} {dt:8.2f} ms")
    return dt


def grad_bench(name, fn, *args, **kw):
    """fwd+bwd: sum-output pullback through fn w.r.t. every arg."""

    def loss(*a):
        out = fn(*a)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(out))

    return bench(name, jax.grad(loss, argnums=tuple(range(len(args)))), *args,
                 **kw)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--variants-only", action="store_true")
    ap.add_argument("--components-only", action="store_true")
    ap.add_argument("--bf16", action="store_true",
                    help="profile components at bf16 compute (params+inputs "
                         "cast, as the mixed-precision train step does)")
    args = ap.parse_args()

    from tpureg.utils import enable_compilation_cache

    enable_compilation_cache()

    from tpureg.data import random_pair_batch
    from tpureg.reg import OpticalFlowReg
    from tpureg.train import create_train_state, make_train_step

    b, s = args.batch, args.size
    print(f"backend={jax.default_backend()}  batch={b} size={s}")
    key = jax.random.key(0)
    imgs = random_pair_batch(key, b, s)

    if not args.variants_only:
        from tpureg.models import (
            FlowNetC,
            FlowNetFusion,
            FlowNetS,
            FlowNetSD,
        )
        from tpureg.ops.channelnorm import channelnorm
        from tpureg.ops.correlation import correlation
        from tpureg.ops.warp import warp2d
        from tpureg.train.steps import loss_from_outputs

        cdt = jnp.bfloat16 if args.bf16 else jnp.float32

        def cast(t):
            return jax.tree.map(
                lambda a: a.astype(cdt)
                if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
                else a, t)

        def sub(mod, cin, label):
            x = jax.random.normal(jax.random.key(1), (b, s, s, cin))
            v = jax.jit(lambda k, x: mod.init(k, x, train=True))(key, x)

            def fwd(params, x):
                out = mod.apply(
                    {"params": cast(params), "batch_stats": v["batch_stats"]},
                    cast(x), train=True, mutable=["batch_stats"],
                )[0]
                return jax.tree.leaves(out)

            bench(f"{label} fwd", fwd, v["params"], x)
            grad_bench(f"{label} fwd+bwd", fwd, v["params"], x)

        sub(FlowNetC(use_bn=True), 2, "FlowNetC")
        sub(FlowNetS(input_channels=6, use_bn=True, style="nvidia"),
            6, "FlowNetS(6ch)")
        sub(FlowNetSD(use_bn=True), 2, "FlowNetSD")
        sub(FlowNetFusion(use_bn=True), 9, "FlowNetFusion")

        flow = jax.random.normal(jax.random.key(2), (b, s, s, 2)).astype(cdt)
        x2 = imgs[..., 1:2].astype(cdt)
        bench("warp2d pixel fwd", lambda i, f: warp2d(i, f, "pixel"), x2, flow)
        grad_bench("warp2d pixel fwd+bwd", lambda i, f: (warp2d(i, f, "pixel"),),
                   x2, flow)

        f1 = jax.random.normal(jax.random.key(3), (b, s // 8, s // 8, 256)).astype(cdt)
        f2 = jax.random.normal(jax.random.key(4), (b, s // 8, s // 8, 256)).astype(cdt)
        bench("correlation 441ch fwd", lambda a, c: correlation(a, c, 20, 2),
              f1, f2)
        grad_bench("correlation 441ch fwd+bwd",
                   lambda a, c: (correlation(a, c, 20, 2),), f1, f2)

        bench("channelnorm 256² fwd", lambda x: channelnorm(x), flow)

        # loss alone on 2-scale outputs (FlowNet2 returns the flow twice)
        wimg = warp2d(x2, flow, "pixel")
        bench("OFEloss (2 identical scales)",
              lambda fl, wi, fx: loss_from_outputs(
                  ((fl, fl), (wi, wi), None, None), fx, {}),
              flow, wimg, imgs)

    print("--- whole-step variants ---")
    model = OpticalFlowReg(conv_predictor="flownet2")
    state = create_train_state(model, key, imgs)

    def run_variant(label, **kw):
        step = make_train_step(donate=False, **kw)
        for _ in range(3):
            st, m = step(state, imgs)
        float(m["loss"])
        t0 = time.perf_counter()
        st = state
        for _ in range(10):
            st, m = step(st, imgs)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / 10 * 1e3
        print(f"train_step {label:35s} {dt:8.2f} ms  ({b / dt * 1e3:.1f} pairs/s)")

    run_variant("base")
    run_variant("bf16", compute_dtype=jnp.bfloat16)
    run_variant("remat=dots", remat="dots")
    run_variant("remat=full", remat="full")
    run_variant("bf16+remat=dots", compute_dtype=jnp.bfloat16, remat="dots")


if __name__ == "__main__":
    main()
