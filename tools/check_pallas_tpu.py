"""Validate Pallas kernels against jnp references on the real TPU chip.

Run with the ambient JAX_PLATFORMS (axon/tpu):  python tools/check_pallas_tpu.py
``--compile-only`` skips the numerics and instead AOT-compiles every
production kernel configuration (all dispatch branches × dtypes × cascade
shapes) via tools/compile_check_tpu.py — the fast hardware gate that catches
Mosaic lowering rejections interpret-mode CPU tests cannot see.

The CPU test suite cannot exercise compiled Pallas (interpret mode is too
slow), so this script is the hardware golden check — run it whenever a kernel
changes; CI-equivalent coverage lives in tests/test_correlation.py semantics
tests plus this.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tpureg.utils import enable_compilation_cache

enable_compilation_cache()

from tpureg.ops.correlation import correlation_reference
from tpureg.ops.correlation_pallas import correlation_pallas


def check(name, got, want, atol=1e-4):
    got, want = np.asarray(got), np.asarray(want)
    err = np.max(np.abs(got - want))
    status = "OK " if err <= atol else "FAIL"
    print(f"[{status}] {name:40s} max|Δ|={err:.3e}")
    return err <= atol


def main():
    if "--compile-only" in sys.argv:
        import compile_check_tpu

        compile_check_tpu.main([a for a in sys.argv[1:]
                                if a != "--compile-only"])
        return
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)
    ok = True

    configs = [
        ("flownetc 32x32x256 md20 s2", (2, 32, 32, 256), 20, 2),
        ("pwc l6 4x4x196 md4 s1", (2, 4, 4, 196), 4, 1),
        ("pwc l2 64x64x32 md4 s1", (2, 64, 64, 32), 4, 1),
    ]
    for name, shape, md, s2 in configs:
        f1 = rng.standard_normal(shape).astype(np.float32)
        f2 = rng.standard_normal(shape).astype(np.float32)
        got = jax.jit(lambda a, b: correlation_pallas(a, b, md, s2))(f1, f2)
        want = correlation_reference(jnp.asarray(f1), jnp.asarray(f2), md, s2)
        ok &= check(name, got, want)

        # grad path (pallas fwd + reference vjp)
        g = jax.grad(lambda a: jnp.sum(correlation_pallas(a, jnp.asarray(f2), md, s2) ** 2))(
            jnp.asarray(f1)
        )
        gref = jax.grad(
            lambda a: jnp.sum(correlation_reference(a, jnp.asarray(f2), md, s2) ** 2)
        )(jnp.asarray(f1))
        ok &= check(name + " (grad)", g, gref, atol=1e-3)

    # bf16 operands (the mixed-precision train path) route through the
    # banded-MXU forward — validate at bf16 rounding tolerance against the
    # f32 reference of the same bf16-valued inputs, at the production
    # cascade shape (b24 input 256² → corr at 32²)
    from tpureg.ops.correlation_pallas import (_corr_fwd_banded,
                                               _fwd_banded_fits_vmem)

    for name, shape, md, s2 in [
        ("flownetc bf16 24x32x32x256 md20 s2", (24, 32, 32, 256), 20, 2),
        ("pwc bf16 l2 64x64x32 md4 s1", (2, 64, 64, 32), 4, 1),
    ]:
        assert _fwd_banded_fits_vmem(shape, md, s2), name
        f1 = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        f2 = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        got = jax.jit(lambda a, b: correlation_pallas(a, b, md, s2))(f1, f2)
        want = correlation_reference(f1.astype(jnp.float32),
                                     f2.astype(jnp.float32), md, s2)
        ok &= check(name, np.asarray(got, np.float32), want, atol=3e-2)

    # banded bf16 forward micro-benchmark at the production shape
    f1 = jnp.asarray(rng.standard_normal((24, 32, 32, 256)), jnp.bfloat16)
    f2 = jnp.asarray(rng.standard_normal((24, 32, 32, 256)), jnp.bfloat16)
    for fn, label in [
        (jax.jit(lambda a, b: correlation_pallas(a, b, 20, 2)), "banded"),
        (jax.jit(functools.partial(_corr_fwd_banded, max_displacement=20,
                                   stride2=2)), "banded(raw)"),
    ]:
        float(jnp.sum(fn(f1, f2).astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn(f1, f2)
        float(jnp.sum(out.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / 20
        print(f"corr bf16 441ch b24 {label:12s}: {dt*1e3:.3f} ms/call")

    # micro-benchmark: pallas vs pure-XLA reference
    f1 = jnp.asarray(rng.standard_normal((8, 32, 32, 256)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((8, 32, 32, 256)).astype(np.float32))
    pal = jax.jit(lambda a, b: correlation_pallas(a, b, 20, 2))
    ref = jax.jit(lambda a, b: correlation_reference(a, b, 20, 2))
    for fn, label in [(pal, "pallas"), (ref, "xla-ref")]:
        # fence via host transfer: block_until_ready returns early through
        # the axon tunnel (see BASELINE.md)
        float(jnp.sum(fn(f1, f2)))
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn(f1, f2)
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / 20
        print(f"corr 441ch b8 {label:8s}: {dt*1e3:.3f} ms/call")

    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
