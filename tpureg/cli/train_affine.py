"""3-D volumetric registration training CLI (affine and deformable stages).

``--stage affine`` trains ``AffineNet3D`` with ``Affloss`` on whole-volume
pairs from ``volume_dataset`` (reference affmodel models.py:156-191 +
loss.py:87-94 + volume_ds dataset.py:100-167; the stage the reference's
train.py references through its affmodel import, train.py:5).

``--stage deform`` trains the learned deformable model ``VoxelMorph3D``
with ``DEFloss3D`` — the stage past the reference, whose deformable 3-D
registration exists only as the classical ANTs comparator
(inference_ants.py:51-57).

Both stages support synthetic-volume smoke mode and optional spatial
sharding of the volume over the device mesh ('spatial' axis; the
framework's context-parallel analogue, SURVEY.md §5).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state as ts

from ..data import volume_dataset
from ..models import AffineNet3D, VoxelMorph3D
from ..parallel import make_mesh, replicated, spatial_sharding
from ..train.steps import make_affine_train_step, make_deform3d_train_step
from ..utils import AverageMeter, seed_everything
from ..utils.tb import MetricWriter


def synthetic_volumes(key, n_batches, batch_size, size):
    d, h, w = size
    for _ in range(n_batches):
        key, k = jax.random.split(key)
        yield {"image_c": jax.random.uniform(k, (batch_size, d, h, w, 2))}


def build_argparser():
    p = argparse.ArgumentParser(description="3-D volumetric registration")
    p.add_argument("--stage", default="affine", choices=("affine", "deform"),
                   help="affine pre-registration or learned deformable (SVF)")
    p.add_argument("--img_dir", default="OASIS1/masked")
    p.add_argument("--epochs", default=4, type=int)
    p.add_argument("--batch_size", default=2, type=int)
    p.add_argument("--lrIni", default=1e-4, type=float)
    p.add_argument("--synthetic", default=0, type=int,
                   help="train on N random volume batches/epoch")
    p.add_argument("--volume_size", default="176,256,256",
                   help="D,H,W (reference: 176 slices of 256²)")
    p.add_argument("--spatial_shards", default=1, type=int,
                   help="shard volume H over this many mesh devices")
    p.add_argument("--logdir", default="./log_affine")
    p.add_argument("--seed", default=6, type=int)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    seed_everything(args.seed)
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    size = tuple(int(x) for x in args.volume_size.split(","))

    key = jax.random.key(args.seed)
    deform = args.stage == "deform"
    model = VoxelMorph3D() if deform else AffineNet3D()
    sample = jnp.zeros((args.batch_size, *size, 2), jnp.float32)
    variables = jax.jit(model.init)(key, sample)
    state = ts.TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=optax.adam(args.lrIni),
    )

    mesh = None
    if args.spatial_shards > 1:
        mesh = make_mesh(
            n_data=len(jax.devices()) // args.spatial_shards,
            n_spatial=args.spatial_shards,
        )
        state = jax.device_put(state, replicated(mesh))

    if deform:
        train_step = make_deform3d_train_step(donate=False)
        meter_keys = ("loss", "photo_loss", "corr_loss", "smooth_loss")
    else:
        train_step = make_affine_train_step(donate=False)
        meter_keys = ("loss", "photo_loss", "corr_loss")
    writer = MetricWriter(args.logdir, flush_secs=30)
    meters = {k: AverageMeter() for k in meter_keys}

    for e in range(args.epochs):
        if args.synthetic:
            loader = synthetic_volumes(
                jax.random.fold_in(key, e), args.synthetic, args.batch_size,
                size,
            )
        else:
            train_ds, _, _, _, _ = volume_dataset(
                args.img_dir, args.batch_size, seed=args.seed
            )
            loader = iter(train_ds)
        for m in meters.values():
            m.reset()
        for batch in loader:
            vols = batch["image_c"]
            if mesh is not None:
                vols = jax.device_put(vols, spatial_sharding(mesh, 5, axis=2))
            state, metrics = train_step(state, vols)
            for k, m in meters.items():
                m.update(float(metrics[k]))
        tag = "DEFORM" if deform else "AFFINE"
        print(
            f"[{tag} epoch {e + 1}/{args.epochs}] loss {meters['loss'].avg:.4f} "
            f"photo {meters['photo_loss'].avg:.4f} "
            f"corr {meters['corr_loss'].avg:.4f}",
            flush=True,
        )
        for k, m in meters.items():
            writer.add_scalar(f"{tag.lower()}_{k}", m.avg, e + 1)
    writer.close()
    return state


if __name__ == "__main__":
    main()
