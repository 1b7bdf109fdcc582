"""Registration-quality gate: deep model vs classical SyN vs identity (Dice).

The BASELINE.json north star asks for Dice parity with the classical (ANTs
SyN) comparator path. OASIS data is not available in this environment, so
this gate constructs the comparison on synthetic smooth-anatomy phantoms
with 3-label segmentations (intensity terciles) and elastic-deformed moving
pairs at the *eval* magnitude range (0.5, 1.0) — the same synthesis family
as the reference's Rand2DElastic eval config (dataset.py:198).

Pipeline: train FlowNetS self-supervised on the phantom family, then report
per-method Dice (labels {1,2,3}, reference utils.py:72-91 semantics) of
warped-moving-seg vs fixed-seg:

- identity          (no registration — the floor)
- classical SyN     (reference comparator config: SyNOnly, iters (10,0,0))
- classical SyN+    (multi-resolution (30,20,10) — the stronger setting)
- deep (FlowNetS)   (the trained model's flow0 + nearest label warp)

Run on the TPU:  timeout 580 python tools/quality_check.py [train_steps]
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

from tpureg.classical.syn import apply_flow, register_syn
from tpureg.metrics.seg import dice_average
from tpureg.ops.elastic import elastic_displacement_2d
from tpureg.ops.warp import base_grid, sample2d, sample2d_nearest
from tpureg.reg import OpticalFlowReg
from tpureg.train import (create_train_state, make_eval_step,
                          make_flow_supervised_step, make_train_step)

SIZE = 256
EVAL_B = 8
TRAIN_B = 16


def phantom(key, batch, size):
    """Smooth random anatomy in [0,1] + tercile segmentation (labels 0..3)."""
    coarse = jax.random.uniform(key, (batch, size // 16, size // 16, 1))
    img = jnp.clip(jax.image.resize(coarse, (batch, size, size, 1), "bicubic"),
                   0.0, 1.0)
    q = jnp.quantile(img.reshape(batch, -1), jnp.asarray([0.25, 0.5, 0.75]),
                     axis=1).T  # [B, 3]
    seg = (
        (img > q[:, 0, None, None, None]).astype(jnp.int32)
        + (img > q[:, 1, None, None, None])
        + (img > q[:, 2, None, None, None])
    )
    return img, seg.astype(jnp.float32)


from functools import partial


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def make_pairs(key, batch, size, magnitude=(0.5, 1.0), with_disp=False):
    k1, k2 = jax.random.split(key)
    fixed, fixed_seg = phantom(k1, batch, size)
    disp = elastic_displacement_2d(k2, batch, (size, size),
                                   magnitude_range=magnitude)
    pos = base_grid(size, size)[None] + disp
    moving = sample2d(fixed, pos[..., 0], pos[..., 1])
    moving_seg = sample2d_nearest(fixed_seg, pos[..., 0], pos[..., 1])
    imgs = jnp.concatenate([fixed, moving], axis=-1)
    segs = jnp.concatenate([fixed_seg, moving_seg], axis=-1)
    if with_disp:
        return imgs, segs, disp
    return imgs, segs


def dice_batch(warped_seg, fixed_seg):
    scores = [
        dice_average(np.asarray(fixed_seg[i, ..., 0]),
                     np.asarray(warped_seg[i, ..., 0]))
        for i in range(fixed_seg.shape[0])
    ]
    return float(np.mean(scores))


def main(train_steps: int = 400, model_name: str = "flownets",
         bootstrap_steps: int = 0, learning_rate: float = 1e-4):
    key = jax.random.key(0)
    model = OpticalFlowReg(conv_predictor=model_name)
    sample, _ = make_pairs(key, TRAIN_B, SIZE, magnitude=(0.0, 0.5))
    state = create_train_state(
        model, key, sample,
        learning_rate=1e-4 if bootstrap_steps else learning_rate)
    # PWC: loss on the finest two flows only + native-unit bootstrap —
    # see make_flow_supervised_step / loss_from_outputs docstrings
    is_pwc = "pwc" in model_name
    loss_kwargs = {"num_scales": 2} if is_pwc else None
    train_step = make_train_step(loss_kwargs=loss_kwargs, donate=False,
                                 compute_dtype=jnp.bfloat16)
    eval_step = make_eval_step(loss_kwargs=loss_kwargs,
                               compute_dtype=jnp.bfloat16)

    if bootstrap_steps:
        # the reference's pretrained-FlyingChairs mechanism for PWC
        # (models.py:243-248): supervised synthetic-flow pretraining before
        # self-supervised finetuning. Chairs weights have no egress path
        # here; the elastic synthesizer's own ground-truth fields supply the
        # identical supervision signal (see make_flow_supervised_step).
        # "resolution" (ramp-consistent stn-inverse at every level) is the
        # right scheme even for PWC: its finest flows are linear deconvs of
        # flow2, so a ramp-free pwc20 flow2 target makes the finest targets
        # unreachable (make_flow_supervised_step docstring).
        boot_step = make_flow_supervised_step(
            compute_dtype=jnp.bfloat16, donate=False,
            flow_units=os.environ.get("TPUREG_BOOT_UNITS", "resolution"))
        # Chairs-style large-motion pretraining: FlyingChairs flows span
        # tens of px, which is what teaches PWC's coarse levels to commit
        # to large displacements; the train-magnitude family (0, 0.5)
        # alone does not generalize up to the eval family (0.5, 1.0).
        print(f"bootstrap ({model_name}): {bootstrap_steps} supervised "
              f"synthetic-flow steps, magnitude (0, 1.5)", flush=True)
        t0 = time.time()
        for i in range(bootstrap_steps):
            key, k = jax.random.split(key)
            imgs, _, disp = make_pairs(k, TRAIN_B, SIZE, magnitude=(0.0, 1.5),
                                       with_disp=True)
            state, bm = boot_step(state, imgs, disp)
        print(f"bootstrapped in {time.time()-t0:.0f}s (final EPE "
              f"{float(bm['epe']):.4f}, finest {float(bm['epe0']):.4f} px)",
              flush=True)
        bimgs, bsegs = make_pairs(jax.random.key(777), EVAL_B, SIZE)
        (_, _, bsegs_int, _), _ = eval_step(state, bimgs, bsegs)
        print(f"bootstrap-only deep Dice: "
              f"{dice_batch(bsegs_int, bsegs[..., 0:1]):.4f}", flush=True)
        if learning_rate != 1e-4:
            # fresh optimizer for the self-supervised phase at the
            # requested LR (bootstrap always runs at the 1e-4 default)
            import optax
            tx = optax.adam(learning_rate, eps=1e-4)
            state = state.replace(tx=tx, opt_state=tx.init(state.params))

    if train_steps:
        print(f"training {model_name} on phantoms: {train_steps} steps "
              f"(b{TRAIN_B} {SIZE}², bf16, lr {learning_rate:g})", flush=True)
        t0 = time.time()
        for i in range(train_steps):
            key, k = jax.random.split(key)
            imgs, _ = make_pairs(k, TRAIN_B, SIZE, magnitude=(0.0, 0.5))
            state, m = train_step(state, imgs)
        print(f"trained in {time.time()-t0:.0f}s (final loss "
              f"{float(m['loss']):.1f})", flush=True)

    imgs, segs = make_pairs(jax.random.key(777), EVAL_B, SIZE)
    fixed_seg = segs[..., 0:1]
    moving_seg = segs[..., 1:2]
    fixed = imgs[..., 0:1]
    moving = imgs[..., 1:2]

    results = {"identity": dice_batch(moving_seg, fixed_seg)}

    # classical comparator, reference config (inference_ants.py:51-52);
    # TPUREG_QUICK_GATE=1 skips the non-gating multi-res setting
    settings = [("syn(10,0,0)", (10, 0, 0))]
    if not os.environ.get("TPUREG_QUICK_GATE"):
        settings.append(("syn(30,20,10)", (30, 20, 10)))
    for name, iters in settings:
        t0 = time.time()
        flow, _ = jax.jit(
            lambda f, mv: register_syn(f, mv, reg_iterations=iters)
        )(fixed, moving)
        warped_seg = apply_flow(moving_seg, flow, "nearest")
        results[name] = dice_batch(warped_seg, fixed_seg)
        print(f"{name}: {time.time()-t0:.0f}s", flush=True)

    # deep path: eval step returns the head's rounded warped segs
    (flows, _, warped_segs_int, _), _ = eval_step(state, imgs, segs)
    results[f"deep({model_name})"] = dice_batch(warped_segs_int, fixed_seg)

    print("\nDice (labels 1-3) vs fixed seg, elastic eval magnitude (0.5, 1.0):")
    for name, v in results.items():
        print(f"  {name:15s} {v:.4f}")
    ok = results[f"deep({model_name})"] >= results["syn(10,0,0)"]
    print("QUALITY CHECK:",
          "PASS (deep >= classical comparator)" if ok else "FAIL")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400,
         sys.argv[2] if len(sys.argv) > 2 else "flownets",
         int(sys.argv[3]) if len(sys.argv) > 3 else 0,
         float(sys.argv[4]) if len(sys.argv) > 4 else 1e-4)
