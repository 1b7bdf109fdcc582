"""Hardware check + micro-bench: banded-MXU correlation backward vs fused.

Validates _corr_bwd_banded against the jnp reference VJP at the cascade
config (32², C=256, md=20, s2=2 → 441 ch) and times it against the shipped
fused kernel at the b24 training shape, with honest host-transfer fencing
(block_until_ready lies through the axon tunnel — BASELINE.md).

Usage:  timeout 900 python tools/check_banded_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tpureg.ops.correlation import correlation_reference
from tpureg.ops.correlation_pallas import _corr_bwd_banded, _corr_bwd_pallas
from tpureg.utils import enable_compilation_cache


def check(name, got, want, atol=1e-4):
    got, want = np.asarray(got), np.asarray(want)
    err = np.max(np.abs(got - want))
    status = "OK " if err <= atol else "FAIL"
    print(f"[{status}] {name:44s} max|Δ|={err:.3e}", flush=True)
    return err <= atol


def fence(*arrays):
    return sum(float(jnp.sum(a[..., -1])) for a in arrays)


def bench(name, fn, *args, iters=20, warmup=3):
    f = jax.jit(fn)
    out = None
    for _ in range(warmup):
        out = f(*args)
    fence(*out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    fence(*out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    ok = True

    configs = [
        ("flownetc 32x32x256 md20 s2", (2, 32, 32, 256), 20, 2),
        ("pwc l2 64x64x32 md4 s1", (2, 64, 64, 32), 4, 1),
    ]
    for name, shape, md, s2 in configs:
        b, h, w, c = shape
        k = 2 * (md // s2) + 1
        f1 = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        f2 = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        g = jnp.asarray(
            rng.standard_normal((b, h, w, k * k)).astype(np.float32))

        # f32 operands need HIGHEST (the default one-bf16-pass truncation
        # loses ~8 mantissa bits — measured 6e-4..3.5e-3 at these configs)
        _, vjp = jax.vjp(
            lambda a, bb: correlation_reference(a, bb, md, s2), f1, f2)
        rdf1, rdf2 = vjp(g)
        df1, df2 = jax.jit(
            lambda a, bb, gg: _corr_bwd_banded(
                a, bb, gg, md, s2, precision=jax.lax.Precision.HIGHEST)
        )(f1, f2, g)
        ok &= check(f"{name} banded-hi f32 df1", df1, rdf1)
        ok &= check(f"{name} banded-hi f32 df2", df2, rdf2)

        # bf16 operands at DEFAULT precision are exact (inv_c applied
        # post-dot → MXU truncation is the identity): compare against the
        # f32 reference VJP evaluated on the same bf16-rounded inputs
        f1b = f1.astype(jnp.bfloat16)
        f2b = f2.astype(jnp.bfloat16)
        gb = g.astype(jnp.bfloat16)
        _, vjpb = jax.vjp(
            lambda a, bb: correlation_reference(a, bb, md, s2),
            f1b.astype(jnp.float32), f2b.astype(jnp.float32))
        rdf1b, rdf2b = vjpb(gb.astype(jnp.float32))
        df1b, df2b = jax.jit(
            lambda a, bb, gg: _corr_bwd_banded(a, bb, gg, md, s2)
        )(f1b, f2b, gb)
        # banded outputs come back in the input dtype (bf16) — the final
        # cast is the only lossy step; compare pre-cast via f32 upcast with
        # a bf16-output tolerance
        ok &= check(f"{name} banded bf16 df1", df1b.astype(jnp.float32),
                    rdf1b, atol=2e-2)
        ok &= check(f"{name} banded bf16 df2", df2b.astype(jnp.float32),
                    rdf2b, atol=2e-2)
        # tight cross-check: fused (VPU f32-accumulate) and banded (MXU
        # f32-accumulate) on the same bf16 operands differ only by summation
        # order + the final bf16 cast → ≤ ~1 bf16 ulp
        fdf1b, fdf2b = jax.jit(
            lambda a, bb, gg: _corr_bwd_pallas(a, bb, gg, md, s2)
        )(f1b, f2b, gb)
        ok &= check(f"{name} banded≡fused bf16 df1",
                    df1b.astype(jnp.float32), fdf1b.astype(jnp.float32),
                    atol=4e-3)
        ok &= check(f"{name} banded≡fused bf16 df2",
                    df2b.astype(jnp.float32), fdf2b.astype(jnp.float32),
                    atol=4e-3)

    # micro-benchmark at the b24 cascade training shape
    shape, md, s2 = (24, 32, 32, 256), 20, 2
    k = 2 * (md // s2) + 1
    f1 = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    g = jnp.asarray(
        rng.standard_normal((*shape[:3], k * k)).astype(np.float32))
    t_fused = bench("fused bwd b24 corr441",
                    lambda a, bb, gg: _corr_bwd_pallas(a, bb, gg, md, s2),
                    f1, f2, g)
    t_band = bench("banded bwd b24 corr441",
                   lambda a, bb, gg: _corr_bwd_banded(a, bb, gg, md, s2),
                   f1, f2, g)
    print(f"speedup fused→banded: {t_fused / t_band:.2f}x", flush=True)
    bench("banded-hi bwd b24 corr441 (f32-accurate)",
          lambda a, bb, gg: _corr_bwd_banded(
              a, bb, gg, md, s2, precision=jax.lax.Precision.HIGHEST),
          f1, f2, g)

    # bf16 inputs (mixed-precision cascade path)
    f1b, f2b = f1.astype(jnp.bfloat16), f2.astype(jnp.bfloat16)
    gb = g.astype(jnp.bfloat16)
    t_fused_bf = bench("fused bwd b24 corr441 bf16-in",
                       lambda a, bb, gg: _corr_bwd_pallas(a, bb, gg, md, s2),
                       f1b, f2b, gb)
    t_band_bf = bench("banded bwd b24 corr441 bf16-in",
                      lambda a, bb, gg: _corr_bwd_banded(a, bb, gg, md, s2),
                      f1b, f2b, gb)
    print(f"speedup bf16 fused→banded: {t_fused_bf / t_band_bf:.2f}x",
          flush=True)

    print("ALL OK" if ok else "FAILURES", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
