"""Whole-volume 3-D training at the reference's full evaluation size.

The reference's volumetric pipeline resizes every volume to (256, 256, 176)
(reference dataset.py:141-157) and trains the affine stage on whole volumes
(models.py:156-191). This tool proves the TPU path at that size on real
hardware — one measured train step for each 3-D model, single chip:

- AffineNet3D   (the reference's affine stage, Affloss)
- VoxelMorph3D  (the learned deformable stage, DEFloss3D)

and records ms/volume + peak HBM. Timing fences with a host transfer of the
loss (``block_until_ready`` lies through the axon tunnel — BASELINE.md).

Run:  timeout 1500 python tools/fullres3d_check.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from tpureg.utils import enable_compilation_cache

enable_compilation_cache()

import optax
from flax.training import train_state as flax_train_state

from tpureg.models.affine3d import AffineNet3D
from tpureg.models.voxelmorph3d import VoxelMorph3D
from tpureg.train.steps import make_affine_train_step, make_deform3d_train_step
from tpureg.utils.profiling import device_memory_stats

SHAPE = (256, 256, 176)  # reference dataset.py:152: Resized((256,256,176))


def peak_hbm_gb() -> float:
    for st in device_memory_stats().values():
        if "peak_bytes_in_use" in st:
            return st["peak_bytes_in_use"] / 2**30
    return float("nan")


def run(name, model, make_step, batch, iters=10, lr=1e-4):
    d, h, w = SHAPE
    key = jax.random.key(0)
    # distinct smooth-ish random volumes per step (content is irrelevant to
    # the timing; shapes/dtypes match the volume_ds pipeline output)
    vols = [
        jax.random.uniform(jax.random.key(i), (batch, d, h, w, 2),
                           jnp.float32)
        for i in range(2)
    ]
    params = model.init(key, vols[0])["params"]
    n_params = sum(p.size for p in jax.tree.leaves(params))
    state = flax_train_state.TrainState.create(
        apply_fn=lambda v, x: model.apply(v, x),
        params=params,
        tx=optax.adam(lr),
    )
    step = make_step(donate=False)

    # compile-time HBM accounting (the axon tunnel exposes no runtime
    # memory_stats — peak_bytes_in_use reads NaN); XLA's own program
    # memory analysis is exact for the compiled step
    try:
        ma = step.lower(state, vols[0]).compile().memory_analysis()
        hbm_gb = (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                  + ma.output_size_in_bytes) / 2**30
        print(f"  XLA memory: temp {ma.temp_size_in_bytes/2**30:.2f} GB, "
              f"args+out {(ma.argument_size_in_bytes + ma.output_size_in_bytes)/2**30:.2f} GB "
              f"= {hbm_gb:.2f} GB total", flush=True)
    except Exception as e:
        print(f"  XLA memory analysis unavailable: {type(e).__name__}",
              flush=True)

    t0 = time.time()
    state, m = step(state, vols[0])
    float(m["loss"])  # fence (compile + first step)
    print(f"  compile+first step: {time.time()-t0:.0f}s", flush=True)

    for i in range(3):  # warmup
        state, m = step(state, vols[i % 2])
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, vols[i % 2])
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(
        f"  {name}: {1e3*dt:.1f} ms/step (b{batch}) = "
        f"{1e3*dt/batch:.1f} ms/volume, {n_params/1e6:.1f}M params, "
        f"peak HBM {peak_hbm_gb():.2f} GB",
        flush=True,
    )
    del state
    return dt


def main(batch=1):
    print(f"whole-volume {SHAPE} train steps, fp32, single chip", flush=True)
    run("AffineNet3D + Affloss   ", AffineNet3D(), make_affine_train_step,
        batch)
    run("VoxelMorph3D + DEFloss3D", VoxelMorph3D(), make_deform3d_train_step,
        batch)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
