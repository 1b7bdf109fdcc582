"""Validate + benchmark the Pallas warp kernel on real TPU vs the gather path.

Honest timing: every iteration forces a host sync (block_until_ready through
the axon tunnel does not actually await queued work — see BASELINE.md).
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

from tpureg.ops.warp import base_grid, sample2d_gather as sample2d
from tpureg.ops.warp_pallas import warp2d_pallas


def timeit(fn, *args, n=15):
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / n * 1e3


def check(name, got, want, atol):
    err = float(np.max(np.abs(np.asarray(got) - np.asarray(want))))
    print(f"[{'OK ' if err <= atol else 'FAIL'}] {name:42s} max|Δ|={err:.2e}")
    return err <= atol


def main():
    if "--compile-only" in sys.argv:
        import compile_check_tpu

        compile_check_tpu.main([a for a in sys.argv[1:]
                                if a != "--compile-only"])
        return
    print("backend:", jax.default_backend())
    ok = True
    for (b, h, w, c), mag in [((24, 256, 256, 1), 8.0), ((24, 256, 256, 1), 30.0)]:
        img = jax.random.uniform(jax.random.key(0), (b, h, w, c))
        flow = jax.random.normal(jax.random.key(1), (b, h, w, 2)) * mag
        pos = base_grid(h, w)[None] + flow
        px = pos[..., 0].reshape(b, h * w)
        py = pos[..., 1].reshape(b, h * w)
        img2d = img[..., 0]

        gather = jax.jit(lambda im, fl: sample2d(
            im, (base_grid(h, w)[None] + fl)[..., 0],
            (base_grid(h, w)[None] + fl)[..., 1]))
        pallas = jax.jit(lambda im, a_, b_: warp2d_pallas(im, a_, b_)
                         .reshape(b, h, w, 1))

        a = gather(img, flow)
        bb = pallas(img2d, px, py)
        ok &= check(f"fwd {b}x{h}x{w}x{c}", bb, a, 1e-5)

        ga = jax.jit(jax.grad(lambda fl: jnp.sum(gather(img, fl) ** 2)))(flow)
        gpx, gpy = jax.jit(jax.grad(
            lambda a_, b_: jnp.sum(warp2d_pallas(img2d, a_, b_) ** 2),
            argnums=(0, 1)))(px, py)
        gp = jnp.stack([gpx.reshape(b, h, w), gpy.reshape(b, h, w)], -1)
        ok &= check(f"dpos {b}x{h}x{w}x{c}", gp, ga, 1e-2)

        gia = jax.jit(jax.grad(lambda im: jnp.sum(gather(im, flow) ** 2)))(img)
        gip = jax.jit(jax.grad(
            lambda im: jnp.sum(warp2d_pallas(im, px, py) ** 2)))(img2d)
        # dimg runs bf16 dots (gradients tolerate reduced precision;
        # images are non-differentiated leaves on every model path)
        ok &= check(f"dimg {b}x{h}x{w}x{c}", gip[..., None], gia, 5e-2)

        t_g = timeit(gather, img, flow)
        t_p = timeit(pallas, img2d, px, py)
        gg = jax.jit(jax.grad(lambda fl: jnp.sum(gather(img, fl) ** 2)))
        pg = jax.jit(jax.grad(
            lambda a_: jnp.sum(warp2d_pallas(img2d, a_, py) ** 2)))
        t_gg = timeit(gg, flow)
        t_pg = timeit(pg, px)
        print(f"  fwd: gather {t_g:7.2f} ms | pallas {t_p:7.2f} ms "
              f"({t_g/t_p:.1f}x)")
        print(f"  f+b: gather {t_gg:7.2f} ms | pallas {t_pg:7.2f} ms "
              f"({t_gg/t_pg:.1f}x)")

        # bf16-image path: the lo residual is statically dropped (half the
        # MXU work); must be EXACT vs the gather warp of the same bf16 image
        img16 = img2d.astype(jnp.bfloat16)
        pallas16 = jax.jit(lambda im, a_, b_: warp2d_pallas(im, a_, b_)
                           .reshape(b, h, w, 1))
        # oracle: gather the SAME bf16-valued image in fp32 (the gather path
        # would round its output back to bf16; the kernel keeps fp32)
        a16 = gather(img16.astype(jnp.float32)[..., None], flow)
        b16 = pallas16(img16, px, py)
        ok &= check(f"fwd bf16-img {b}x{h}x{w}x{c}", b16, a16, 1e-5)
        pg16 = jax.jit(jax.grad(
            lambda a_: jnp.sum(warp2d_pallas(img16, a_, py) ** 2)))
        t_p16 = timeit(pallas16, img16, px, py)
        t_pg16 = timeit(pg16, px)
        print(f"  bf16-img: fwd {t_p16:7.2f} ms | f+b {t_pg16:7.2f} ms "
              f"(fp32: {t_p:.2f} / {t_pg:.2f})")

    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
