"""Classical-registration comparator CLI (reference inference_ants.py parity).

Runs classical (non-learned) registration on the same eval pairs as the deep
models and computes the identical metric suite, so deep-vs-classical numbers
are directly comparable (reference inference_ants.py:51-100).

Backend selection:
- ``--backend ants`` uses ANTsPy exactly as the reference does
  (``SyNOnly``, masked, ``reg_iterations=(10,0,0)``, forward transforms with
  linear/nearest interpolation) when the ``ants`` package is importable.
- ``--backend jax`` (default; automatic fallback) uses the TPU-native
  SVF diffeomorphic registration (tpureg.classical.register_syn) with the
  same masked-NCC objective and multi-resolution schedule.
"""

from __future__ import annotations

import argparse
import time

import jax.numpy as jnp
import numpy as np

from ..classical import apply_flow, register_syn
from ..data import eval_random_dataset, prefetch_to_device, real_pairs_dataset
from ..metrics import CORR, MI, MSE, PSNR, dice_average, dist_hausdorff, ssim
from ..utils import AverageMeter, seed_everything
from ..utils.tb import MetricWriter

PRINT_INTERVAL = 2


def _register_ants(fixed, moving, fixed_seg, moving_seg, iters):
    import ants

    f = ants.from_numpy(fixed)
    m = ants.from_numpy(moving)
    msk = ants.from_numpy((fixed > 0).astype(np.float32))
    reg = ants.registration(
        fixed=f, moving=m, type_of_transform="SyNOnly",
        reg_iterations=tuple(iters), mask=msk,
    )
    warped = reg["warpedmovout"].numpy()
    warped_seg = ants.apply_transforms(
        fixed=f, moving=ants.from_numpy(moving_seg),
        transformlist=reg["fwdtransforms"], interpolator="nearestNeighbor",
    ).numpy()
    return warped, warped_seg


def _register_jax(fixed, moving, fixed_seg, moving_seg, iters):
    fb = jnp.asarray(fixed)[None, ..., None]
    mb = jnp.asarray(moving)[None, ..., None]
    mask = (fb > 0).astype(jnp.float32)
    flow, warped = register_syn(fb, mb, mask=mask, reg_iterations=iters)
    warped_seg = apply_flow(
        jnp.asarray(moving_seg)[None, ..., None], flow, mode="nearest"
    )
    return np.asarray(warped[0, ..., 0]), np.asarray(warped_seg[0, ..., 0])


def build_argparser():
    p = argparse.ArgumentParser(description="classical registration comparator")
    p.add_argument("--img_dir", default="OASIS1/masked")
    p.add_argument("--seg_dir", default="OASIS1/seg")
    p.add_argument("--fiximg_dir", default="OASIS1/fiximg")
    p.add_argument("--fixseg_dir", default="OASIS1/fixseg")
    p.add_argument("--movimg_dir", default="OASIS1/movimg")
    p.add_argument("--movseg_dir", default="OASIS1/movseg")
    p.add_argument("--mode", default="synthetic", choices=("real", "synthetic"))
    p.add_argument("--backend", default="auto", choices=("auto", "ants", "jax"))
    p.add_argument("--reg_iterations", default="10,0,0",
                   help="coarse-to-fine iterations (reference: 10,0,0)")
    p.add_argument("--batch_size", default=1, type=int)
    p.add_argument("--logdir", default="./log_ants")
    p.add_argument("--seed", default=8, type=int)
    p.add_argument("--max_samples", default=0, type=int,
                   help="stop after N samples (0 = all)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    seed_everything(args.seed)
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    iters = tuple(int(x) for x in args.reg_iterations.split(","))

    backend = args.backend
    if backend in ("auto", "ants"):
        try:
            import ants  # noqa: F401

            backend = "ants"
        except ImportError:
            if args.backend == "ants":
                raise
            backend = "jax"
    register = _register_ants if backend == "ants" else _register_jax
    print(f"classical backend: {backend}", flush=True)

    if args.mode == "real":
        loader, length = real_pairs_dataset(
            args.fiximg_dir, args.fixseg_dir, args.movimg_dir,
            args.movseg_dir, args.batch_size,
        )
    else:
        loader, length = eval_random_dataset(
            args.img_dir, args.seg_dir, args.batch_size, seed=args.seed
        )

    writer = MetricWriter(args.logdir, flush_secs=30)
    names = ("dice", "mse", "psnr", "hausdorff", "ssim_img", "ssim_seg",
             "mi", "corr")
    meters = {k: AverageMeter() for k in names}
    timer = AverageMeter()
    tic = time.time()
    n_done = 0
    for i, batch in enumerate(prefetch_to_device(iter(loader))):
        imgs = np.asarray(batch["image_c"])
        segs = np.asarray(batch["seg_c"])
        for j in range(imgs.shape[0]):
            fixed, moving = imgs[j, ..., 0], imgs[j, ..., 1]
            fseg, mseg = segs[j, ..., 0], segs[j, ..., 1]
            warped, warped_seg = register(fixed, moving, fseg, mseg, iters)
            meters["dice"].update(dice_average(fseg, warped_seg))
            meters["mse"].update(MSE(fixed, warped))
            meters["psnr"].update(PSNR(fixed, warped))
            meters["ssim_img"].update(ssim(fixed, warped, data_range=1.0))
            meters["ssim_seg"].update(
                ssim(fseg, warped_seg, data_range=max(1.0, float(fseg.max())))
            )
            meters["hausdorff"].update(dist_hausdorff(fseg, warped_seg))
            meters["mi"].update(MI(fixed, warped))
            meters["corr"].update(CORR(fixed, warped))
            n_done += 1
        timer.update(time.time() - tic)
        tic = time.time()
        step = i + 1
        for k, m in meters.items():
            writer.add_scalar(f"{k}_avg", m.avg, step)
            writer.add_scalar(f"{k}_single", m.data[-1], step)
        if i % PRINT_INTERVAL == 0:
            print(
                f"[CLASSICAL {step:03d}/{length:03d}] time {timer.val:.2f}s "
                f"dice {meters['dice'].avg:.4f} psnr {meters['psnr'].avg:.2f} "
                f"mse {meters['mse'].avg:.5f}",
                flush=True,
            )
        if args.max_samples and n_done >= args.max_samples:
            break

    print("\n===> CLASSICAL summary")
    for k, m in meters.items():
        if m.count:
            print(f"  {k:12s}: {m.avg:.5f}")
    writer.close()
    return {k: m.avg for k, m in meters.items() if m.count}


if __name__ == "__main__":
    main()
