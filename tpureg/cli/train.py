"""Training CLI — argparse-compatible with the reference's train.py.

Flags (reference train.py:107-120): --img_dir --seg_dir --model --epochs
--batch_size --lrIni --lrMin --cp, extended with --synthetic (random-data
smoke mode for machines without OASIS), --pretrained/--surgery (checkpoint
import with channel surgery, train.py:158-171), --shuffle, --logdir,
--workdir, --lr_step/--lr_gamma (StepLR intent, train.py:131-133 — the
reference never steps it, so decay defaults off).

Per epoch: TRAIN pass (loss meters printed every PRINT_INTERVAL batches,
train.py:75-84), training_state checkpoint (train.py:183-188), VAL pass +
best-weight save on improvement (train.py:191-201), TEST pass, TensorBoard
scalar groups for loss/photo/corr/smooth across the three splits
(train.py:209-212).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from ..data import prefetch_to_device, random_pair_batch, volume2slices_datasets
from ..reg import OpticalFlowReg
from ..train import (create_train_state, default_loss_kwargs, make_eval_step,
                     make_train_step)
from ..train.checkpoint import (
    restore_training_state,
    save_best_weights,
    save_training_state,
)
from ..utils import AverageMeter, seed_everything
from ..utils.tb import MetricWriter

PRINT_INTERVAL = 2


def run_epoch(step_fn, state, loader, mode: str, n_batches_hint=None,
              train: bool = True):
    """One pass over ``loader``; returns (state, avg metric dict).

    Device metrics are converted to host floats lazily (at print intervals
    and epoch end) so consecutive steps pipeline on the accelerator instead
    of paying a host round-trip per batch.
    """
    meters = {k: AverageMeter() for k in
              ("loss", "photo_loss", "corr_loss", "smooth_loss")}
    timer = AverageMeter()
    pending = []

    def flush(blocking: bool = True):
        # Non-blocking mid-epoch: only convert metric sets whose device
        # computation has already finished — a float() on an in-flight
        # array would stall the step pipeline for a full host round-trip
        # (expensive through a device tunnel). Printed values lag a batch
        # or two; epoch end flushes everything.
        drained = []
        while pending:
            head_loss = pending[0]["loss"]
            if (not blocking and hasattr(head_loss, "is_ready")
                    and not head_loss.is_ready()):
                break
            drained.append(pending.pop(0))
        for mset in drained:
            loss = float(mset["loss"])
            if not np.isfinite(loss):
                # failure detection the reference lacks: an unguarded NaN
                # would silently poison every subsequent step and the saved
                # checkpoints; fail fast with a diagnosable state instead.
                # Only TRAIN halts — a transient non-finite eval metric
                # doesn't invalidate healthy training state, so VAL/TEST
                # log and skip the batch instead of aborting the run.
                if train:
                    raise FloatingPointError(
                        f"non-finite loss {loss} in {mode} after "
                        f"{meters['loss'].count} finite batches — halting "
                        "before the divergence reaches the checkpoints "
                        "(lower the lr, check input scaling, or resume from "
                        "the last epoch)"
                    )
                print(f"[{mode}] WARNING: non-finite loss {loss} — batch "
                      "excluded from epoch averages", flush=True)
                continue
            for k, m in meters.items():
                m.update(float(mset[k]))

    epoch_t0 = time.time()
    tic = epoch_t0
    for i, batch in enumerate(loader):
        imgs = batch["image_c"]
        if train:
            state, metrics = step_fn(state, imgs)
        else:
            _, metrics = step_fn(state, imgs, None)
        pending.append(metrics)
        timer.update(time.time() - tic)
        tic = time.time()
        if i % PRINT_INTERVAL == 0:
            flush(blocking=False)
            total = f"/{n_batches_hint}" if n_batches_hint else ""
            # Dispatch is async: until the first metric set lands on the
            # host the loss meters carry no data — say so rather than
            # print zeros (values legitimately lag a batch or two).
            stats = (
                f"loss {meters['loss'].val:.4f} ({meters['loss'].avg:.4f})  "
                f"smooth {meters['smooth_loss'].val:.4f}  "
                f"corr {meters['corr_loss'].val:.4f}  "
                f"photo {meters['photo_loss'].val:.4f}"
                if meters["loss"].count else "loss (pending)"
            )
            print(
                f"[{mode} batch {i + 1:03d}{total}] "
                f"time {timer.val:.3f}s ({timer.avg:.3f}s)  {stats}",
                flush=True,
            )
    flush()
    # wall time includes the final blocking drain — the per-batch timer only
    # sees dispatch once flushes stopped blocking mid-epoch
    epoch_s = time.time() - epoch_t0
    print(
        f"===> {mode} done in {epoch_s:.1f}s | avg loss "
        f"{meters['loss'].avg:.4f} smooth {meters['smooth_loss'].avg:.4f} "
        f"corr {meters['corr_loss'].avg:.4f} photo "
        f"{meters['photo_loss'].avg:.4f}\n",
        flush=True,
    )
    out = {k: m.avg for k, m in meters.items()}
    out["_n"] = meters["loss"].count
    return state, out


def synthetic_loader(key, n_batches: int, batch_size: int, size: int):
    for i in range(n_batches):
        key, k = jax.random.split(key)
        yield {"image_c": random_pair_batch(k, batch_size, size)}


def build_argparser():
    p = argparse.ArgumentParser(description="tpureg self-supervised training")
    p.add_argument("--img_dir", default="OASIS1/masked", metavar="DIR_Img")
    p.add_argument("--seg_dir", default="OASIS1/seg", metavar="DIR_Seg")
    p.add_argument("--model", default="flownet2",
                   help="flownets | flownet2 | pwc | raft (+ registry names)")
    p.add_argument("--epochs", default=4, type=int)
    p.add_argument("--batch_size", default=24, type=int)
    p.add_argument("--lrIni", default=1e-4, type=float)
    p.add_argument("--lrMin", default=1e-4, type=float,
                   help="adam eps (reference quirk: eps := lrMin)")
    p.add_argument("--cp", default=True, type=lambda s: s not in ("0", "False"),
                   help="resume from training_state checkpoint when present")
    p.add_argument("--synthetic", default=0, type=int, metavar="N",
                   help="train on N random batches/epoch instead of OASIS")
    p.add_argument("--image_size", default=256, type=int)
    p.add_argument("--shuffle", action="store_true")
    p.add_argument("--pretrained", default=None,
                   help="torch checkpoint to import (strict=False)")
    p.add_argument("--surgery", default=None, choices=(None, "rgb", "rgb_pair"),
                   help="input-channel surgery applied to the stem conv")
    p.add_argument("--workdir", default=".")
    p.add_argument("--logdir", default="./log")
    p.add_argument("--seed", default=6, type=int)
    p.add_argument("--limit_volumes", default=10, type=int)
    p.add_argument("--precision", default="fp32", choices=("fp32", "bf16"),
                   help="bf16 = mixed precision (fp32 master params/BN)")
    p.add_argument("--aug_magnitude", default=(0.0, 0.5), nargs=2,
                   type=float, metavar=("LO", "HI"),
                   help="elastic control-point offset range (px) for the "
                        "moving-image synthesis; the reference hard-codes "
                        "(0, 0.5) (dataset.py:75) — widen to match the "
                        "task's displacement scale")
    p.add_argument("--accum_steps", default=1, type=int,
                   help="gradient-accumulation microbatches per step "
                        "(batch_size must divide; effective batch beyond "
                        "per-chip HBM)")
    p.add_argument("--lr_step", default=0, type=int,
                   help="StepLR period in steps (reference defines "
                        "StepLR(40, 0.8) but never steps it; 0 = constant)")
    p.add_argument("--lr_gamma", default=0.8, type=float)
    p.add_argument("--fsdp", action="store_true",
                   help="shard params + optimizer state over the 'data' mesh "
                        "axis (FSDP); batches are batch-sharded when "
                        "batch_size divides the device count")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    seed_everything(args.seed)
    from ..utils import enable_compilation_cache

    enable_compilation_cache()

    from ..train.schedule import step_decay_schedule

    lr = step_decay_schedule(args.lrIni, step_size=args.lr_step,
                             gamma=args.lr_gamma, enabled=args.lr_step > 0)
    model = OpticalFlowReg(conv_predictor=args.model)
    key = jax.random.key(args.seed)
    sample = random_pair_batch(key, args.batch_size, args.image_size)
    state = create_train_state(
        model, key, sample, learning_rate=lr, adam_eps=args.lrMin
    )
    # checkpoint paths are keyed by predictor class name (train.py:127)
    from ..models import build_predictor

    predictor_name = type(build_predictor(args.model)).__name__

    starting_epoch, best_loss = 0, float(1e5)
    if args.cp:
        restored = restore_training_state(args.workdir, predictor_name, state)
        if restored is not None:
            print("----------loading checkpoint state----------", flush=True)
            state, starting_epoch, best_loss = restored

    if args.pretrained:
        from ..compat import import_torch_state_dict, load_torch_checkpoint

        sd = load_torch_checkpoint(args.pretrained)
        surgery = {}
        if args.surgery:
            # stem conv of each package: conv1.0 / conv1a.0 (+ cascade prefix)
            for k in sd:
                if k.endswith(("conv1.0.weight", "conv1a.0.weight")):
                    surgery[k] = args.surgery
        params, stats, report = import_torch_state_dict(
            sd, jax.tree.map(np.asarray, state.params),
            jax.tree.map(np.asarray, state.batch_stats),
            surgery=surgery, prefix=("predictor",),
        )
        print(
            f"imported {len(report['loaded'])} tensors "
            f"({len(report['missing'])} unmatched, "
            f"{len(report['shape_mismatch'])} shape-mismatched)",
            flush=True,
        )
        state = state.replace(params=params, batch_stats=stats)

    import jax.numpy as jnp

    compute_dtype = jnp.bfloat16 if args.precision == "bf16" else None
    loss_kwargs = default_loss_kwargs(args.model)
    train_step = make_train_step(loss_kwargs=loss_kwargs,
                                 compute_dtype=compute_dtype,
                                 accum_steps=args.accum_steps)
    eval_step = make_eval_step(loss_kwargs=loss_kwargs,
                               compute_dtype=compute_dtype)

    shard_fn = None
    if args.fsdp:
        from ..parallel import batch_sharding, fsdp_state_sharding, make_mesh

        mesh = make_mesh(n_data=len(jax.devices()))
        state = jax.device_put(state, fsdp_state_sharding(mesh, state))
        n_dev = mesh.shape["data"]
        print(f"FSDP: params/opt-state sharded over {n_dev} devices", flush=True)
        if args.batch_size % n_dev == 0:
            bsh = batch_sharding(mesh, 4)
            shard_fn = lambda b: {k: jax.device_put(v, bsh)
                                  for k, v in b.items()}
        else:
            print(f"FSDP: batch {args.batch_size} not divisible by {n_dev} "
                  "devices — batches stay replicated", flush=True)

    def shard_loader(loader):
        if shard_fn is None:
            return loader
        return (shard_fn(b) for b in loader)

    # Datasets are built ONCE: the decoded (and device-resident) volume
    # cache survives the whole run instead of being re-read and re-uploaded
    # every epoch. Per-epoch augmentation freshness comes from set_epoch
    # (train only — val/test stay deterministic so the best-weight
    # comparison across epochs is apples-to-apples; documented deviation
    # from the reference's per-epoch val redraw).
    oasis = None
    fused_synth = False
    if not args.synthetic:
        oasis = volume2slices_datasets(
            args.img_dir, args.seg_dir, args.batch_size, seed=args.seed,
            limit=args.limit_volumes, shuffle_train=args.shuffle,
            # this loop never reads seg_c (reference train.py:41-44 likewise)
            # — skip the per-batch seg elastic warp + decode entirely
            with_seg=False,
            magnitude=tuple(args.aug_magnitude),
        )
        # Fuse the augmentation INTO the train step: one device program per
        # batch (gather + elastic synthesis + fwd/bwd/update) instead of an
        # augmentation program running serially with the step on the core.
        # FSDP keeps the unfused path (its batch sharding hooks the
        # materialized batch).
        if oasis[0].supports_fused_step and not args.fsdp:
            from functools import partial

            from ..data import synth_image_batch

            train_step = make_train_step(
                loss_kwargs=loss_kwargs,
                compute_dtype=compute_dtype,
                accum_steps=args.accum_steps,
                synth=partial(synth_image_batch, size=oasis[0].size,
                              magnitude=oasis[0].magnitude),
            )
            fused_synth = True

    def make_loaders(epoch_idx):
        if args.synthetic:
            k = jax.random.fold_in(jax.random.key(args.seed), epoch_idx)
            n_val = max(1, args.synthetic // 8)
            return (
                synthetic_loader(jax.random.fold_in(k, 0), args.synthetic,
                                 args.batch_size, args.image_size),
                synthetic_loader(jax.random.fold_in(k, 1), n_val,
                                 args.batch_size, args.image_size),
                synthetic_loader(jax.random.fold_in(k, 2), n_val,
                                 args.batch_size, args.image_size),
                args.synthetic * args.batch_size,
                n_val * args.batch_size,
            )
        train_ds, val_ds, test_ds, train_len, val_len = oasis
        train_ds.set_epoch(epoch_idx + 1)
        train_iter = (({"image_c": s} for s in train_ds.batch_specs())
                      if fused_synth else iter(train_ds))
        return (prefetch_to_device(train_iter),
                prefetch_to_device(iter(val_ds)),
                prefetch_to_device(iter(test_ds)), train_len, val_len)

    writer = MetricWriter(args.logdir, flush_secs=30)
    for e in range(starting_epoch, args.epochs):
        print(f"=================\n EPOCH {e + 1}/{args.epochs}\n"
              f"=================", flush=True)
        train_loader, val_loader, test_loader, train_len, _ = make_loaders(e)
        train_loader = shard_loader(train_loader)
        val_loader = shard_loader(val_loader)
        test_loader = shard_loader(test_loader)
        # log the lr actually scheduled at the current optimizer step, not
        # the initial value (matters once --lr_step decay is enabled)
        lr_now = float(lr(int(state.step))) if callable(lr) else float(lr)
        writer.add_scalar("lr", lr_now, e + 1)

        state, train_m = run_epoch(
            train_step, state, train_loader, "TRAIN",
            train_len // args.batch_size,
        )
        save_training_state(args.workdir, predictor_name, state, e, best_loss)

        state, val_m = run_epoch(eval_step, state, val_loader, "VAL",
                                 train=False)
        if val_m["_n"] and val_m["loss"] < best_loss:
            print("---------saving new best weights----------", flush=True)
            best_loss = val_m["loss"]
            save_best_weights(
                args.workdir, predictor_name, state,
                {f"{k}_val": v for k, v in val_m.items() if k != "_n"},
            )

        state, test_m = run_epoch(eval_step, state, test_loader, "TEST",
                                  train=False)

        for tag, key_ in (("loss", "loss"), ("photo_loss", "photo_loss"),
                          ("corr_loss", "corr_loss"),
                          ("smooth_loss", "smooth_loss")):
            writer.add_scalars(tag, {"train": train_m[key_],
                                     "val": val_m[key_],
                                     "test": test_m[key_]}, e + 1)
    writer.close()
    print("---------Train complete---------", flush=True)
    return state


if __name__ == "__main__":
    main()
