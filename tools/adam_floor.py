"""Measure the optimizer-update HBM floor of the flagship train state.

The Adam update of FlowNet2's 162.5M fp32 parameters reads p/m/v/g and
writes p/m/v — ~4.6 GB of HBM traffic per step that is identical for the
optimized and naive bench variants and independent of batch size. This
tool times that update in isolation (apply_gradients with precomputed
gradients) to put a measured number under the vs_baseline_b8 roofline
argument (BASELINE.md round-5).

Run: timeout 580 python tools/adam_floor.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from tpureg.utils import enable_compilation_cache

enable_compilation_cache()


def main():
    from tpureg.data import random_pair_batch
    from tpureg.reg import OpticalFlowReg
    from tpureg.train import create_train_state

    key = jax.random.key(0)
    imgs = random_pair_batch(key, 2, 64)  # tiny — only the param tree matters
    model = OpticalFlowReg(conv_predictor="flownet2")
    state = create_train_state(model, key, imgs)
    n = sum(p.size for p in jax.tree.leaves(state.params))
    grads = jax.tree.map(lambda p: jnp.full_like(p, 1e-6), state.params)

    @jax.jit
    def update(state, grads):
        return state.apply_gradients(grads=grads)

    s = update(state, grads)
    float(jax.tree.leaves(s.params)[-1][(0,) * jax.tree.leaves(s.params)[-1].ndim])
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        s = update(s, grads)
    leaf = jax.tree.leaves(s.params)[-1]
    float(leaf[(0,) * leaf.ndim])  # honest fence through the axon tunnel
    dt = (time.perf_counter() - t0) / iters
    traffic = n * 4 * 7  # read p,m,v,g + write p,m,v (fp32)
    print(f"Adam update of {n/1e6:.1f}M fp32 params: {1e3*dt:.2f} ms/step "
          f"({traffic/2**30:.2f} GB nominal traffic -> "
          f"{traffic/dt/1e9:.0f} GB/s effective)")


if __name__ == "__main__":
    main()
