"""Export a trained registration model as a self-contained serving artifact.

The reference has no deployment surface (SURVEY.md §1 L5 — its entry points
rebuild the model and load a checkpoint per run); this CLI is the
production-serving addition: it loads the best-validation weights written by
``train.py``, bakes them into the eval forward, and writes one serialized
StableHLO file (``jax.export``) that serves without model code or
checkpoints (see tpureg/serving/export.py).

    python -m tpureg.cli.export --model flownets --workdir runs/x \
        --out model.shlo --batch_size 1 --image_size 256 --with_segs \
        [--platforms tpu cpu] [--check]
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from ..reg import OpticalFlowReg
from ..serving import export_registration, load_artifact, save_artifact
from ..train import create_train_state
from ..train.checkpoint import restore_best_weights

__all__ = ["main", "build_argparser"]


def build_argparser():
    p = argparse.ArgumentParser(description="tpureg serving export")
    p.add_argument("--model", default="flownets")
    p.add_argument("--workdir", default=".",
                   help="training workdir holding model_weight/.../best_weight")
    p.add_argument("--out", default="model.shlo")
    p.add_argument("--batch_size", default=1, type=int)
    p.add_argument("--image_size", default=256, type=int)
    p.add_argument("--with_segs", action="store_true",
                   help="artifact signature f(imgs, segs) incl. warped labels")
    p.add_argument("--platforms", nargs="*", default=None,
                   help="export platforms, e.g. --platforms tpu cpu "
                        "(default: current backend)")
    p.add_argument("--random_weights", action="store_true",
                   help="skip checkpoint loading (smoke/testing)")
    p.add_argument("--check", action="store_true",
                   help="reload the artifact and verify vs live apply")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    from ..data import random_pair_batch
    from ..models import build_predictor
    from ..utils import enable_compilation_cache

    enable_compilation_cache()

    model = OpticalFlowReg(conv_predictor=args.model)
    key = jax.random.key(0)
    sample = random_pair_batch(key, args.batch_size, args.image_size)
    state = create_train_state(model, key, sample)
    if not args.random_weights:
        predictor_name = type(build_predictor(args.model)).__name__
        state, metrics = restore_best_weights(args.workdir, predictor_name,
                                              state)
        print(f"loaded best weights ({metrics})", flush=True)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    exp = export_registration(
        model, variables, args.batch_size, args.image_size,
        with_segs=args.with_segs, platforms=args.platforms,
    )
    save_artifact(args.out, exp)
    import os

    print(f"wrote {args.out} ({os.path.getsize(args.out)/1e6:.1f} MB, "
          f"platforms={exp.platforms})", flush=True)

    if args.check:
        f = load_artifact(args.out)
        imgs = np.random.default_rng(0).random(
            (args.batch_size, args.image_size, args.image_size, 2),
        ).astype(np.float32)
        sample = imgs
        live = model.apply(variables, sample, sample if args.with_segs else None,
                           train=False)
        art = f(imgs, imgs) if args.with_segs else f(imgs)
        # On TPU the artifact and the live apply are two independent XLA
        # lowerings of the same graph; default-precision convs (bf16 passes,
        # fp32 accumulate) fuse differently between them, so agreement is at
        # bf16 level (measured ≤2e-3 abs), not bitwise. CPU matches ~exactly.
        atol = 1e-5 if jax.default_backend() == "cpu" else 5e-3
        for a, b in zip(jax.tree.leaves(live), jax.tree.leaves(art)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=atol, rtol=0)
        print(f"artifact check OK (matches live apply, atol={atol})",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
