"""Hardware compile gate: AOT-compile every production Pallas kernel
configuration (all dispatch branches × dtypes × the cascade's actual
geometries) on the TPU toolchain WITHOUT executing — catches Mosaic lowering
rejections (e.g. the round-3 "batch dims pos must be 0" banded-forward crash,
VERDICT r3 item 1) that interpret-mode CPU tests cannot see.

Usage:
    python tools/compile_check_tpu.py            # kernel branch matrix (~1 min cached)
    python tools/compile_check_tpu.py --full     # + whole-model train steps

Rule (VERDICT r3 item 2): no kernel or dispatch-default change lands without
this tool's output recorded in BASELINE.md. check_pallas_tpu.py/check_warp_tpu.py
--compile-only delegate here.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from tpureg.utils import enable_compilation_cache

enable_compilation_cache()

S = jax.ShapeDtypeStruct
BF, F32 = jnp.bfloat16, jnp.float32


def compile_one(name, fn, *args):
    t0 = time.perf_counter()
    try:
        jax.jit(fn).lower(*args).compile()
        print(f"[OK ] {name:58s} {time.perf_counter()-t0:6.1f}s")
        return True
    except Exception as e:  # noqa: BLE001 — report every failure, keep going
        msg = str(e).split("\n")[0][:120]
        print(f"[FAIL] {name:57s} {msg}")
        return False


def kernel_matrix():
    """Every correlation/warp dispatch branch at production geometries."""
    from tpureg.ops import correlation_pallas as cp
    from tpureg.ops.warp_pallas import warp2d_pallas

    ok = True
    # -- correlation: production configs -----------------------------------
    # FlowNet2's FlowNetC: 256² input → corr at 32², C=256, md=20, s2=2
    #   (reference contract: flownet2/networks/FlowNetC.py:28-31)
    # PWC pyramid levels 6..2 (PWC/models/PWCNet.py:69,200-259): md=4, s2=1
    corr_cfgs = [
        ("corr441 b24 32x32x256", (24, 32, 32, 256), 20, 2),
        ("corr441 b8  32x32x256", (8, 32, 32, 256), 20, 2),
        ("corr81  b24 4x4x196", (24, 4, 4, 196), 4, 1),
        ("corr81  b24 8x8x128", (24, 8, 8, 128), 4, 1),
        ("corr81  b24 16x16x96", (24, 16, 16, 96), 4, 1),
        ("corr81  b24 32x32x64", (24, 32, 32, 64), 4, 1),
        ("corr81  b24 64x64x32", (24, 64, 64, 32), 4, 1),
    ]
    for name, shape, md, s2 in corr_cfgs:
        for dt in (BF, F32):
            a, b = S(shape, dt), S(shape, dt)
            # value_and_grad covers the fwd dispatch (banded for bf16 /
            # VPU for f32) AND the bwd dispatch (banded / fused / split)
            ok &= compile_one(
                f"{name} {dt.__name__} fwd+bwd",
                jax.value_and_grad(
                    lambda x, y: jnp.sum(
                        cp.correlation_pallas(x, y, md, s2)
                        .astype(jnp.float32) ** 2), argnums=(0, 1)),
                a, b)

    # non-default branches: the bf16 VPU fallback (kill-switch / over-VMEM
    # path) and the split backward
    shape = (24, 32, 32, 256)
    ok &= compile_one(
        "corr441 b24 bf16 VPU-forward fallback",
        lambda x, y: cp._corr_fwd_pallas(x, y, 20, 2, force_vpu=True),
        S(shape, BF), S(shape, BF))
    ok &= compile_one(
        "corr441 b24 f32 split backward",
        lambda x, y, g: cp._corr_bwd_pallas(x, y, g, 20, 2, force_split=True),
        S(shape, F32), S(shape, F32), S((24, 32, 32, 441), F32))
    ok &= compile_one(
        "corr441 b24 bf16 banded backward (raw)",
        lambda x, y, g: cp._corr_bwd_banded(x, y, g, 20, 2),
        S(shape, BF), S(shape, BF), S((24, 32, 32, 441), BF))
    ok &= compile_one(
        "corr441 b24 f32 banded backward HIGHEST",
        lambda x, y, g: cp._corr_bwd_banded(
            x, y, g, 20, 2, precision=jax.lax.Precision.HIGHEST),
        S(shape, F32), S(shape, F32), S((24, 32, 32, 441), F32))

    # -- warp: the cascade's 5 full-res C=1 warps (flownet2/models.py:139-182
    #   analogue) + grads; fp32 and bf16-image branches
    b_, h_, w_ = 24, 256, 256
    p = h_ * w_
    for dt, tag in ((F32, "f32"), (BF, "bf16-img")):
        ok &= compile_one(
            f"warp 256sq b24 {tag} fwd",
            lambda im, px, py: warp2d_pallas(im, px, py),
            S((b_, h_, w_), dt), S((b_, p), F32), S((b_, p), F32))
        ok &= compile_one(
            f"warp 256sq b24 {tag} dpos",
            jax.grad(lambda px, py, im: jnp.sum(
                warp2d_pallas(im, px, py).astype(jnp.float32) ** 2),
                argnums=(0, 1)),
            S((b_, p), F32), S((b_, p), F32), S((b_, h_, w_), dt))
    ok &= compile_one(
        "warp 256sq b24 f32 dimg",
        jax.grad(lambda im, px, py: jnp.sum(warp2d_pallas(im, px, py) ** 2)),
        S((b_, h_, w_), F32), S((b_, p), F32), S((b_, p), F32))
    # non-banded fallback branch (kill switch)
    os.environ["TPUREG_NO_BAND_WARP"] = "1"
    try:
        ok &= compile_one(
            "warp 256sq b24 f32 fwd (band disabled)",
            lambda im, px, py: warp2d_pallas(im, px, py),
            S((b_, h_, w_), F32), S((b_, p), F32), S((b_, p), F32))
    finally:
        del os.environ["TPUREG_NO_BAND_WARP"]

    # -- warp3d: the volumetric path's trilinear kernel at reference scale
    #   (256,256,176 — dataset.py:100-167) and the scaled 3-D gate size;
    #   fwd + d/dposition (training hot path), fp32 and bf16-volume branches
    from tpureg.ops.warp3d_pallas import warp3d_pallas

    for d3, h3, w3 in ((256, 256, 176), (64, 128, 128)):
        p3 = d3 * h3 * w3
        for dt, tag in ((F32, "f32"), (BF, "bf16-vol")):
            ok &= compile_one(
                f"warp3d {d3}x{h3}x{w3} {tag} fwd",
                lambda v, px, py, pz: warp3d_pallas(v, px, py, pz),
                S((1, d3, h3, w3), dt), S((1, p3), F32), S((1, p3), F32),
                S((1, p3), F32))
        ok &= compile_one(
            f"warp3d {d3}x{h3}x{w3} f32 dpos",
            jax.grad(lambda px, py, pz, v: jnp.sum(
                warp3d_pallas(v, px, py, pz) ** 2), argnums=(0, 1, 2)),
            S((1, p3), F32), S((1, p3), F32), S((1, p3), F32),
            S((1, d3, h3, w3), F32))
    return ok


def model_steps():
    """Whole-model production programs: the headline bf16 train steps."""
    from tpureg.data import random_pair_batch
    from tpureg.reg import OpticalFlowReg
    from tpureg.train import create_train_state, make_train_step

    ok = True
    for model_name, batch in (("flownet2", 24), ("pwc", 24), ("raft", 24),
                              ("flownets", 24)):
        try:
            t0 = time.perf_counter()
            imgs = random_pair_batch(jax.random.key(0), batch, 256)
            model = OpticalFlowReg(conv_predictor=model_name)
            state = create_train_state(model, jax.random.key(0), imgs)
            step = make_train_step(donate=False, compute_dtype=BF)
            step.lower(state, imgs).compile()
            print(f"[OK ] train step {model_name} b{batch} bf16"
                  f"{'':26s} {time.perf_counter()-t0:6.1f}s")
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] train step {model_name}: {str(e)[:200]}")
            ok = False
    return ok


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="also compile whole-model train steps")
    args = ap.parse_args(argv)
    print("backend:", jax.default_backend(), jax.devices())
    t0 = time.perf_counter()
    ok = kernel_matrix()
    if args.full:
        ok &= model_steps()
    print(f"total {time.perf_counter()-t0:.0f}s — "
          f"{'ALL OK' if ok else 'FAILURES PRESENT'}")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
