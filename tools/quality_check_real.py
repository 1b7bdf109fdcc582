"""Registration-quality gate on real-format fixture pairs (inter-subject).

The reference's evaluation protocol is real inter-subject pairs — one fixed
atlas subject against distinct moving subjects, no augmentation
(reference inference.py:67-75, dataset.py:222-275) — while the phantom gates
(tools/quality_check.py) score synthetic elastic pairs. This gate runs the
comparison the reference actually ships: Analyze-format volumes through the
SAME real-pairs pipeline the inference CLI uses (data/pipeline.py::
real_pairs_dataset → _process_real), scoring on identical pairs:

- identity        (no registration — the inter-subject misalignment floor)
- classical SyN   (reference comparator config: SyNOnly, iters (10,0,0),
                   inference_ants.py:51-52)
- deep model      (trained self-supervised on the fixture corpus via the
                   training pipeline, exactly the reference's protocol)

OASIS-1 has no egress path here, so the fixtures are synthetic smooth-
anatomy volumes in the reference's exact on-disk format (tools/
make_fixtures.py); inter-subject misalignment comes from genuinely distinct
per-subject anatomies.

Run:  python tools/make_fixtures.py /tmp/oasis_fix 8     # once
      timeout 1500 python tools/quality_check_real.py [train_steps] [model]
          [aug_hi]

``aug_hi`` widens the training synthesis's elastic magnitude to
(0, aug_hi) px — the reference hard-codes (0, 0.5) (dataset.py:75), which
under-covers inter-subject residual displacements of ~1-2 px; the
framework exposes the range (cli/train.py --aug_magnitude).
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
from tpureg.data import real_pairs_dataset, volume2slices_datasets
from tpureg.metrics.seg import dice_average
from tpureg.reg import OpticalFlowReg
from tpureg.train import (create_train_state, default_loss_kwargs,
                          make_eval_step, make_train_step)

FIX = os.environ.get("TPUREG_FIXTURES", "/tmp/oasis_fix")
EVAL_BATCHES = 4
EVAL_B = 8


def dice_batch(warped_seg, fixed_seg):
    return [
        dice_average(np.asarray(fixed_seg[i, ..., 0]),
                     np.asarray(warped_seg[i, ..., 0]))
        for i in range(fixed_seg.shape[0])
    ]


def main(train_steps: int = 600, model_name: str = "flownet2",
         aug_hi: float = 0.5, decay_steps: int = 0):
    key = jax.random.key(0)
    train_ds, _, _, n_train, _ = volume2slices_datasets(
        os.path.join(FIX, "img"), os.path.join(FIX, "seg"),
        batch_size=16, with_seg=False, magnitude=(0.0, aug_hi),
    )
    model = OpticalFlowReg(conv_predictor=model_name)
    sample = next(iter(train_ds))["image_c"]
    state = create_train_state(model, key, sample, learning_rate=1e-4)
    loss_kwargs = default_loss_kwargs(model_name)
    train_step = make_train_step(loss_kwargs=loss_kwargs, donate=False,
                                 compute_dtype=jnp.bfloat16)
    eval_step = make_eval_step(loss_kwargs=loss_kwargs,
                               compute_dtype=jnp.bfloat16)

    print(f"training {model_name} on fixture corpus ({n_train} "
          f"slices/epoch): {train_steps} steps (b16 256², bf16, "
          f"aug magnitude (0, {aug_hi}))", flush=True)
    t0 = time.time()
    done, epoch = 0, 0
    while done < train_steps:
        train_ds.set_epoch(epoch)
        for batch in train_ds:
            state, m = train_step(state, batch["image_c"])
            done += 1
            if done >= train_steps:
                break
        epoch += 1
    final_loss = float(m["loss"])  # fence BEFORE reading the clock
    print(f"trained in {time.time()-t0:.0f}s over {epoch} epochs "
          f"(final loss {final_loss:.1f})", flush=True)

    if decay_steps:
        # lr-decay finetune phase (the schedule the pwc-reg phantom gate
        # needed, BASELINE.md round 4): fresh Adam moments at lr/10
        import optax

        tx2 = optax.adam(1e-5, eps=1e-4)
        state = state.replace(tx=tx2, opt_state=tx2.init(state.params))
        t0, done = time.time(), 0
        while done < decay_steps:
            train_ds.set_epoch(epoch)
            for batch in train_ds:
                state, m = train_step(state, batch["image_c"])
                done += 1
                if done >= decay_steps:
                    break
            epoch += 1
        final_loss = float(m["loss"])
        print(f"decay phase (+{decay_steps} @1e-5) in {time.time()-t0:.0f}s "
              f"(final loss {final_loss:.1f})", flush=True)

    eval_ds, n_pairs = real_pairs_dataset(
        os.path.join(FIX, "fiximg"), os.path.join(FIX, "fixseg"),
        os.path.join(FIX, "movimg"), os.path.join(FIX, "movseg"),
        batch_size=EVAL_B,
    )
    print(f"evaluating on {EVAL_BATCHES}×{EVAL_B} of {n_pairs} real "
          f"inter-subject pairs", flush=True)

    syn_fn = jax.jit(lambda f, mv: register_syn(f, mv,
                                                reg_iterations=(10, 0, 0)))
    scores = {"identity": [], "syn(10,0,0)": [], f"deep({model_name})": []}
    for bi, batch in enumerate(eval_ds):
        if bi >= EVAL_BATCHES:
            break
        imgs, segs = batch["image_c"], batch["seg_c"]
        fixed, moving = imgs[..., 0:1], imgs[..., 1:2]
        fixed_seg, moving_seg = segs[..., 0:1], segs[..., 1:2]

        scores["identity"] += dice_batch(moving_seg, fixed_seg)

        flow, _ = syn_fn(fixed, moving)
        scores["syn(10,0,0)"] += dice_batch(
            apply_flow(moving_seg, flow, "nearest"), fixed_seg)

        (_, _, warped_segs_int, _), _ = eval_step(state, imgs, segs)
        scores[f"deep({model_name})"] += dice_batch(warped_segs_int,
                                                    fixed_seg)
        print(f"  batch {bi}: done", flush=True)

    print("\nDice (labels 1-3), real inter-subject fixture pairs:")
    for name, v in scores.items():
        print(f"  {name:18s} {np.mean(v):.4f}  (n={len(v)})")
    ok = np.mean(scores[f"deep({model_name})"]) >= np.mean(
        scores["syn(10,0,0)"])
    print("REAL-PAIR QUALITY CHECK:",
          "PASS (deep >= classical comparator)" if ok else "FAIL")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 600,
         sys.argv[2] if len(sys.argv) > 2 else "flownet2",
         float(sys.argv[3]) if len(sys.argv) > 3 else 0.5,
         int(sys.argv[4]) if len(sys.argv) > 4 else 0)
