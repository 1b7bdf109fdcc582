"""3-D registration-quality gate: learned deformable vs classical SyN (Dice).

The reference's volumetric path stops at affine pre-registration (models.py:
156-191); its deformable 3-D registration exists only as the classical ANTs
comparator (inference_ants.py:51-57). This framework adds a learned
deformable 3-D model (VoxelMorph3D, SVF diffeomorphic) — this gate measures
it against the classical path the same way the 2-D gate does
(tools/quality_check.py): synthetic smooth-anatomy phantom volumes with
tercile segmentations, smooth random ground-truth deformations, Dice of
warped moving seg vs fixed seg, plus diffeomorphism regularity
(negative-Jacobian fraction) for the learned flow.

Run on the TPU:  timeout 1200 python tools/quality_check3d.py [train_steps]
                 [DxHxW]   (default 32x64x64; e.g. 64x128x128 for the
                            scaled gate — dims divisible by 16)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tpureg.utils import enable_compilation_cache

enable_compilation_cache()

import optax
from flax.training import train_state as flax_train_state

from tpureg.classical.syn3d import apply_flow3d, register_syn3d
from tpureg.metrics.jacobian import neg_jacobian_fraction
from tpureg.metrics.seg import dice_average
from tpureg.models.voxelmorph3d import VoxelMorph3D
from tpureg.ops.resize import resize_nd
from tpureg.ops.warp import warp3d
from tpureg.train.steps import make_deform3d_train_step

SHAPE = (32, 64, 64)  # divisible by 2^4 (UNet depth); override via argv
TRAIN_B = 4
EVAL_B = 4


def phantom3d(key, batch, shape):
    d, h, w = shape
    coarse = jax.random.uniform(key, (batch, d // 8, h // 8, w // 8, 1))
    img = jnp.clip(resize_nd(coarse, shape, "linear"), 0.0, 1.0)
    q = jnp.quantile(img.reshape(batch, -1), jnp.asarray([0.25, 0.5, 0.75]),
                     axis=1).T
    seg = (
        (img > q[:, 0, None, None, None, None]).astype(jnp.int32)
        + (img > q[:, 1, None, None, None, None])
        + (img > q[:, 2, None, None, None, None])
    )
    return img, seg.astype(jnp.float32)


def rand_smooth_flow3d(key, batch, shape, magnitude):
    d, h, w = shape
    coarse = jax.random.normal(key, (batch, d // 8, h // 8, w // 8, 3))
    return resize_nd(coarse, shape, "linear") * magnitude


from functools import partial


@partial(jax.jit, static_argnums=(1, 2, 3))
def make_pairs(key, batch, shape, magnitude):
    k1, k2 = jax.random.split(key)
    fixed, fixed_seg = phantom3d(k1, batch, shape)
    flow_gt = rand_smooth_flow3d(k2, batch, shape, magnitude)
    moving = warp3d(fixed, flow_gt)
    moving_seg = apply_flow3d(fixed_seg, flow_gt, "nearest")
    vols = jnp.concatenate([fixed, moving], axis=-1)
    segs = jnp.concatenate([fixed_seg, moving_seg], axis=-1)
    return vols, segs


def dice_batch(warped_seg, fixed_seg):
    return float(np.mean([
        dice_average(np.asarray(fixed_seg[i, ..., 0]),
                     np.asarray(warped_seg[i, ..., 0]))
        for i in range(fixed_seg.shape[0])
    ]))


def main(train_steps: int = 300, shape=SHAPE):
    # larger volumes: keep total voxels/batch roughly constant so train
    # wall-time scales with voxels, not voxels*batch
    train_b = max(1, TRAIN_B * (32 * 64 * 64) // int(np.prod(shape)))
    eval_b = max(1, EVAL_B * (32 * 64 * 64) // int(np.prod(shape)))
    key = jax.random.key(0)
    model = VoxelMorph3D()
    vols, _ = make_pairs(key, train_b, shape, 2.0)
    params = model.init(jax.random.key(1), vols)["params"]
    state = flax_train_state.TrainState.create(
        apply_fn=lambda v, x: model.apply(v, x),
        params=params,
        tx=optax.adam(1e-3),
    )
    step = make_deform3d_train_step(donate=False)

    print(f"training VoxelMorph3D: {train_steps} steps (b{train_b} "
          f"{shape})", flush=True)
    t0 = time.time()
    for i in range(train_steps):
        key, k = jax.random.split(key)
        v, _ = make_pairs(k, train_b, shape, 2.0)
        state, m = step(state, v)
    final_loss = float(m["loss"])  # fence BEFORE reading the clock — the
    # axon tunnel queues executions asynchronously (BASELINE.md)
    print(f"trained in {time.time()-t0:.0f}s (final loss "
          f"{final_loss:.2f})", flush=True)

    vols, segs = make_pairs(jax.random.key(777), eval_b, shape, 2.0)
    fixed, moving = vols[..., 0:1], vols[..., 1:2]
    fixed_seg, moving_seg = segs[..., 0:1], segs[..., 1:2]

    results = {"identity": (dice_batch(moving_seg, fixed_seg), None)}

    t0 = time.time()
    flow_c, _ = jax.jit(
        lambda f, mv: register_syn3d(f, mv, reg_iterations=(10, 0, 0))
    )(fixed, moving)
    warped_seg_c = apply_flow3d(moving_seg, flow_c, "nearest")
    results["syn3d(10,0,0)"] = (
        dice_batch(warped_seg_c, fixed_seg),
        neg_jacobian_fraction(np.asarray(flow_c[0])),
    )
    print(f"syn3d: {time.time()-t0:.0f}s", flush=True)

    flow_d, warped, _vel = jax.jit(
        lambda p, x: model.apply({"params": p}, x)
    )(state.params, vols)
    warped_seg_d = apply_flow3d(moving_seg, flow_d, "nearest")
    results["deep(voxelmorph3d)"] = (
        dice_batch(warped_seg_d, fixed_seg),
        neg_jacobian_fraction(np.asarray(flow_d[0])),
    )

    print("\n3-D Dice (labels 1-3) vs fixed seg, smooth flow magnitude 2.0 vox:")
    for name, (v, nj) in results.items():
        njs = "" if nj is None else f"   neg-Jac {nj:.2e}"
        print(f"  {name:20s} {v:.4f}{njs}")
    ok = results["deep(voxelmorph3d)"][0] >= results["syn3d(10,0,0)"][0]
    print("QUALITY CHECK 3D:",
          "PASS (deep >= classical comparator)" if ok else "FAIL")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    shape = (tuple(int(v) for v in sys.argv[2].split("x"))
             if len(sys.argv) > 2 else SHAPE)
    main(steps, shape)
