"""Minimal timer for the headline bf16 FlowNet2 train step — A/B sweeps.

Times ONLY the production configuration (bf16 compute, batch 24, 256²) so
env-var ablations (e.g. TPUREG_WARP_BAND, TPUREG_NO_BAND_WARP) turn around
in one compile instead of profile_step.py's five variants.

Usage:  TPUREG_WARP_BAND=32 timeout 580 python tools/step_time.py
        [--batch 24] [--size 256] [--iters 20] [--model flownet2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--model", default="flownet2")
    args = ap.parse_args()

    from tpureg.utils import enable_compilation_cache

    enable_compilation_cache()

    from tpureg.data import random_pair_batch
    from tpureg.reg import OpticalFlowReg
    from tpureg.train import create_train_state, make_train_step

    key = jax.random.key(0)
    imgs = random_pair_batch(key, args.batch, args.size)
    model = OpticalFlowReg(conv_predictor=args.model)
    state = create_train_state(model, key, imgs)
    donate = bool(int(os.environ.get("TPUREG_STEP_DONATE", "0")))
    step = make_train_step(donate=donate, compute_dtype=jnp.bfloat16)

    t0 = time.perf_counter()
    for _ in range(3):
        state, m = step(state, imgs)
    float(m["loss"])  # fence (block_until_ready lies through the tunnel)
    print(f"compile+warmup {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    st = state
    for _ in range(args.iters):
        st, m = step(st, imgs)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"{args.model} bf16 b{args.batch} {args.size}²: {dt:.2f} ms/step "
          f"({args.batch / dt * 1e3:.1f} pairs/s)")


if __name__ == "__main__":
    main()
