"""Validate + benchmark the 3-D Pallas warp kernel on real TPU vs gather.

Drives ops/warp3d_pallas.py (the banded trilinear kernel) at the reference
volumetric geometry (256,256,176) and at the scaled-gate size, checking
forward + full VJP against the jnp gather oracle and timing both paths.
Honest timing: every iteration forces a host transfer (block_until_ready
through the axon tunnel does not await queued work — see BASELINE.md).
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

from tpureg.ops.warp import sample3d_gather
from tpureg.ops.warp3d_pallas import supported, warp3d_pallas, _guard3


def timeit(fn, *args, n=10):
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / n * 1e3


def check(name, got, want, atol):
    err = float(np.max(np.abs(np.asarray(got) - np.asarray(want))))
    print(f"[{'OK ' if err <= atol else 'FAIL'}] {name:46s} max|Δ|={err:.2e}")
    return err <= atol


def smooth_positions(d, h, w, amp, wavelen=4.0):
    zz, yy, xx = jnp.meshgrid(jnp.arange(d), jnp.arange(h), jnp.arange(w),
                              indexing="ij")

    def disp(phase):
        arg = (xx / (wavelen * w) + yy / (wavelen * h)
               + zz / (wavelen * d))
        return amp * jnp.sin(2 * jnp.pi * arg + phase)

    p = d * h * w
    px = (xx + disp(0.1)).reshape(1, p).astype(jnp.float32)
    py = (yy + disp(1.2)).reshape(1, p).astype(jnp.float32)
    pz = (zz + disp(2.3)).reshape(1, p).astype(jnp.float32)
    return px, py, pz


def gather_flat(vol, px, py, pz):
    b = vol.shape[0]
    shp = vol.shape[1:]
    out = sample3d_gather(vol[..., None], px.reshape(b, *shp),
                          py.reshape(b, *shp), pz.reshape(b, *shp))
    return out.reshape(b, -1)


def main():
    print("backend:", jax.default_backend())
    ok = True
    shapes = [(1, 64, 128, 128, 2.5), (1, 256, 256, 176, 2.5)]
    for b, d, h, w, amp in shapes:
        vol = jax.random.uniform(jax.random.key(0), (b, d, h, w))
        px, py, pz = smooth_positions(d, h, w, amp)
        assert supported(vol.shape), (d, h, w)
        g = bool(jax.jit(_guard3, static_argnums=(2, 3, 4))(py, pz, d, h, w))
        print(f"--- ({d},{h},{w}) amp={amp} guard={g}")
        assert g

        pallas_f = jax.jit(warp3d_pallas)
        gather_f = jax.jit(gather_flat)
        got = pallas_f(vol, px, py, pz)
        want = gather_f(vol, px, py, pz)
        ok &= check(f"fwd ({d},{h},{w})", got, want, 5e-5)

        # full VJP (positions differentiated — the training hot path)
        def loss_p(a, bb, c):
            return jnp.sum(jnp.sin(warp3d_pallas(vol, a, bb, c)))

        def loss_g(a, bb, c):
            return jnp.sum(jnp.sin(gather_flat(vol, a, bb, c)))

        gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))
        gg = jax.jit(jax.grad(loss_g, argnums=(0, 1, 2)))
        rp = gp(px, py, pz)
        rg = gg(px, py, pz)
        for name, a, bb in zip("xyz", rp, rg):
            ok &= check(f"grad d{name} ({d},{h},{w})", a, bb, 1e-3)

        t_p = timeit(pallas_f, vol, px, py, pz)
        t_g = timeit(gather_f, vol, px, py, pz)
        t_pg = timeit(gp, px, py, pz, n=5)
        t_gg = timeit(gg, px, py, pz, n=5)
        print(f"fwd:      pallas {t_p:8.2f} ms   gather {t_g:8.2f} ms   "
              f"{t_g / t_p:5.1f}x")
        print(f"fwd+grad: pallas {t_pg:8.2f} ms   gather {t_gg:8.2f} ms   "
              f"{t_gg / t_pg:5.1f}x")

        # bf16 fast path (half the DMA + MXU work)
        v16 = vol.astype(jnp.bfloat16)
        got16 = jax.jit(warp3d_pallas)(v16, px, py, pz)
        want16 = gather_f(v16.astype(jnp.float32), px, py, pz)
        ok &= check(f"fwd bf16 ({d},{h},{w})", got16, want16, 1e-5)
        t16 = timeit(jax.jit(warp3d_pallas), v16, px, py, pz)
        print(f"fwd bf16: pallas {t16:8.2f} ms")

    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
