"""Evaluation CLI — argparse-compatible with the reference's inference.py.

Loads the best-validation weights (inference.py:147-148), runs the
registration head over real inter-subject pairs (``--mode real``,
inference.py:178-179) or synthetic elastic pairs (``--mode synthetic``,
eval_random_ds), and computes the full per-sample metric suite
(inference.py:67-75): Dice, MSE, PSNR, SSIM (image + seg), modified
Hausdorff, MI, Pearson correlation — plus the flow-magnitude JET panel and
warped-grid visualization streams (inference.py:77-100). Per-step TensorBoard
avg+single scalar pairs and image panels mirror the reference's layout.
"""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np

from ..data import eval_random_dataset, prefetch_to_device, real_pairs_dataset
from ..metrics import (
    CORR,
    MI,
    MSE,
    PSNR,
    dice_average,
    dist_hausdorff,
    flow_mag,
    log_jacobian_std,
    neg_jacobian_fraction,
    ssim,
)
from ..reg import OpticalFlowReg
from ..train import create_train_state, default_loss_kwargs, make_eval_step
from ..train.checkpoint import restore_best_weights
from ..utils import AverageMeter, seed_everything
from ..utils.tb import MetricWriter

PRINT_INTERVAL = 2

METRICS = ("dice", "mse", "psnr", "hausdorff", "ssim_img", "ssim_seg", "mi",
           "corr", "mag", "neg_jac", "log_jac_std")


def evaluate(state, eval_step, loader, writer: MetricWriter, length: int,
             batch_size: int, max_samples: int = 0):
    meters = {k: AverageMeter() for k in METRICS}
    loss_meters = {k: AverageMeter() for k in
                   ("loss", "photo_loss", "corr_loss", "smooth_loss")}
    timer = AverageMeter()
    tic = time.time()
    for i, batch in enumerate(loader):
        imgs, segs = batch["image_c"], batch.get("seg_c")
        outputs, metrics = eval_step(state, imgs, segs)
        flows, warped_imgs, warped_segs, warped_grid = outputs
        timer.update(time.time() - tic)
        tic = time.time()
        for k, m in loss_meters.items():
            m.update(float(metrics[k]))

        imgs_np = np.asarray(imgs)
        fixed = imgs_np[..., 0:1]
        moving = imgs_np[..., 1:2]
        warped = np.asarray(warped_imgs[0])
        segs_np = None if segs is None else np.asarray(segs)
        wsegs = None if warped_segs is None else np.asarray(warped_segs)

        for j in range(fixed.shape[0]):
            f2d, w2d = fixed[j, ..., 0], warped[j, ..., 0]
            meters["mse"].update(MSE(f2d, w2d))
            meters["psnr"].update(PSNR(f2d, w2d))
            meters["ssim_img"].update(ssim(f2d, w2d, data_range=1.0))
            meters["mi"].update(MI(f2d, w2d))
            meters["corr"].update(CORR(f2d, w2d))
            if segs_np is not None:
                fs, ws = segs_np[j, ..., 0], wsegs[j, ..., 0]
                meters["dice"].update(dice_average(fs, ws))
                meters["ssim_seg"].update(
                    ssim(fs, ws, data_range=max(1.0, float(fs.max())))
                )
                meters["hausdorff"].update(dist_hausdorff(fs, ws))

        mag, mag_img = flow_mag(np.asarray(flows[0][:1]))
        meters["mag"].update(mag)
        flow0 = np.asarray(flows[0])
        for j in range(flow0.shape[0]):
            meters["neg_jac"].update(neg_jacobian_fraction(flow0[j]))
            meters["log_jac_std"].update(log_jacobian_std(flow0[j]))

        step = i + 1
        writer.add_images("fixed_img", fixed, step)
        writer.add_images("moving_img", moving, step)
        writer.add_images("warped_img", np.clip(warped, 0, 1), step)
        writer.add_images("warped_grid", np.clip(np.asarray(warped_grid), 0, 1),
                          step)
        writer.add_images("flow_mag", mag_img, step, dataformats="NCHW")
        for k, m in meters.items():
            if m.count:
                writer.add_scalar(f"{k}_avg", m.avg, step)
                writer.add_scalar(f"{k}_single", m.data[-1], step)

        if i % PRINT_INTERVAL == 0:
            print(
                f"[EVAL batch {step:03d}/{length // batch_size:03d}] "
                f"time {timer.val:.3f}s  loss {loss_meters['loss'].val:.4f} "
                f"({loss_meters['loss'].avg:.4f})  "
                f"dice {meters['dice'].avg:.4f}  "
                f"psnr {meters['psnr'].avg:.2f}",
                flush=True,
            )
        if max_samples and meters["mse"].count >= max_samples:
            break

    print("\n===> EVAL summary")
    for k, m in {**loss_meters, **meters}.items():
        if m.count:
            print(f"  {k:12s}: {m.avg:.5f}")
    return {k: m.avg for k, m in {**loss_meters, **meters}.items() if m.count}


def build_argparser():
    p = argparse.ArgumentParser(description="tpureg evaluation")
    p.add_argument("--img_dir", default="OASIS1/masked")
    p.add_argument("--seg_dir", default="OASIS1/seg")
    p.add_argument("--fiximg_dir", default="OASIS1/fiximg")
    p.add_argument("--fixseg_dir", default="OASIS1/fixseg")
    p.add_argument("--movimg_dir", default="OASIS1/movimg")
    p.add_argument("--movseg_dir", default="OASIS1/movseg")
    p.add_argument("--mode", default="real", choices=("real", "synthetic"))
    p.add_argument("--model", default="flownet2")
    p.add_argument("--batch_size", default=1, type=int)
    p.add_argument("--workdir", default=".")
    p.add_argument("--logdir", default="./log_eval")
    p.add_argument("--seed", default=8, type=int)
    p.add_argument("--max_samples", default=0, type=int,
                   help="stop after N samples (0 = all)")
    p.add_argument("--precision", default="fp32", choices=("fp32", "bf16"),
                   help="bf16 = mixed-precision eval (fp32 weights cast)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    seed_everything(args.seed)
    from ..utils import enable_compilation_cache

    enable_compilation_cache()

    from ..data import random_pair_batch
    from ..models import build_predictor

    model = OpticalFlowReg(conv_predictor=args.model)
    key = jax.random.key(args.seed)
    sample = random_pair_batch(key, args.batch_size, 256)
    state = create_train_state(model, key, sample)
    predictor_name = type(build_predictor(args.model)).__name__
    state, best_metrics = restore_best_weights(args.workdir, predictor_name,
                                               state)
    print(f"loaded best weights ({best_metrics})", flush=True)

    if args.mode == "real":
        loader, length = real_pairs_dataset(
            args.fiximg_dir, args.fixseg_dir, args.movimg_dir,
            args.movseg_dir, args.batch_size,
        )
    else:
        loader, length = eval_random_dataset(
            args.img_dir, args.seg_dir, args.batch_size, seed=args.seed
        )

    if length == 0:
        raise SystemExit(
            "no image/seg pairs found (checked "
            f"{args.fiximg_dir if args.mode == 'real' else args.img_dir!r})"
        )

    writer = MetricWriter(args.logdir, flush_secs=30)
    import jax.numpy as jnp

    eval_step = make_eval_step(
        loss_kwargs=default_loss_kwargs(args.model),
        compute_dtype=jnp.bfloat16 if args.precision == "bf16" else None,
    )
    print("=================\n EVAL start\n=================", flush=True)
    results = evaluate(state, eval_step, prefetch_to_device(iter(loader)),
                       writer, length, args.batch_size, args.max_samples)
    for tag in ("loss", "photo_loss", "corr_loss", "smooth_loss"):
        writer.add_scalars(tag, {"eval": results[tag]}, 1)
    writer.close()
    return results


if __name__ == "__main__":
    main()
