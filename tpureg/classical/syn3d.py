"""3-D volumetric diffeomorphic registration (classical comparator, volumes).

Extends the 2-D SVF registration (syn.py) to whole brain volumes — the
classical side of BASELINE.json config 5 ("Full 3D volumetric registration
... Dice/Jacobian eval vs ANTs"). Same construction: stationary velocity
field, scaling-and-squaring exponentiation, masked local NCC similarity,
Gaussian velocity smoothing, multi-resolution schedule — all one jit per
level, running on the accelerator. Layout: [B, D, H, W, C]; displacement
last axis (u_x, u_y, u_z).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.resize import resize_nd
from ..ops.warp import warp3d
from .syn import _blur_matrix

__all__ = ["register_syn3d", "apply_flow3d", "local_ncc3d", "gaussian_blur3d"]


def gaussian_blur3d(vol, sigma: float):
    """Separable Gaussian blur of [B, D, H, W, C] as three small matmuls."""
    if sigma <= 0:
        return vol
    d, h, w = vol.shape[1:4]
    kd = jnp.asarray(_blur_matrix(d, float(sigma)))
    kh = jnp.asarray(_blur_matrix(h, float(sigma)))
    kw = jnp.asarray(_blur_matrix(w, float(sigma)))
    y = jnp.einsum("od,bdhwc->bohwc", kd, vol)
    y = jnp.einsum("ph,bdhwc->bdpwc", kh, y)
    return jnp.einsum("qw,bdhwc->bdhqc", kw, y)


def apply_flow3d(vol, flow, mode: str = "bilinear"):
    """Backward-warp volume by a 3-D displacement field (pixel units)."""
    if mode == "nearest":
        # snap positions by rounding the flow contribution at sample time:
        # round the sampled position via a half-voxel trick on warp3d is
        # not exact; do explicit nearest sampling instead.
        b, d, h, w, c = vol.shape
        zz, yy, xx = jnp.meshgrid(
            jnp.arange(d, dtype=jnp.float32),
            jnp.arange(h, dtype=jnp.float32),
            jnp.arange(w, dtype=jnp.float32),
            indexing="ij",
        )
        px = jnp.rint(xx[None] + flow[..., 0]).astype(jnp.int32)
        py = jnp.rint(yy[None] + flow[..., 1]).astype(jnp.int32)
        pz = jnp.rint(zz[None] + flow[..., 2]).astype(jnp.int32)
        inb = ((px >= 0) & (px < w) & (py >= 0) & (py < h)
               & (pz >= 0) & (pz < d))
        idx = ((jnp.clip(pz, 0, d - 1) * h + jnp.clip(py, 0, h - 1)) * w
               + jnp.clip(px, 0, w - 1)).reshape(b, -1)
        flat = vol.reshape(b, -1, c)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals.reshape(b, d, h, w, c) * inb[..., None].astype(vol.dtype)
    return warp3d(vol, flow)


def _compose3d(flow_a, flow_b):
    """Displacement of a∘b: b(x) + a(x + b(x))."""
    a_at_b = warp3d(flow_a, flow_b)
    return flow_b + a_at_b


def exp_velocity3d(v, steps: int = 6):
    flow = v / (2.0**steps)
    for _ in range(steps):
        flow = _compose3d(flow, flow)
    return flow


def local_ncc3d(a, b, mask=None, sigma: float = 4.0, eps: float = 1e-5):
    if mask is None:
        mask = jnp.ones_like(a)
    blur = functools.partial(gaussian_blur3d, sigma=sigma)
    w = blur(mask) + eps
    ma = blur(a * mask) / w
    mb = blur(b * mask) / w
    va = blur(a * a * mask) / w - ma**2
    vb = blur(b * b * mask) / w - mb**2
    cab = blur(a * b * mask) / w - ma * mb
    cc = (cab * cab) / (va * vb + eps)
    return jnp.sum(cc * mask) / jnp.sum(mask)


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "sigma_flow", "sigma_metric", "lr",
                     "exp_steps"),
)
def _optimize_level3d(fixed, moving, mask, v0, iterations: int,
                      sigma_flow: float, sigma_metric: float, lr: float,
                      exp_steps: int):
    import optax

    opt = optax.adam(lr)

    def loss_fn(v):
        flow = exp_velocity3d(v, exp_steps)
        warped = warp3d(moving, flow)
        return -local_ncc3d(fixed, warped, mask, sigma_metric)

    def step(carry, _):
        v, opt_state = carry
        loss, g = jax.value_and_grad(loss_fn)(v)
        updates, opt_state = opt.update(g, opt_state)
        v = optax.apply_updates(v, updates)
        v = gaussian_blur3d(v, sigma_flow)
        return (v, opt_state), loss

    (v, _), losses = jax.lax.scan(step, (v0, opt.init(v0)), None,
                                  length=iterations)
    return v, losses


def register_syn3d(
    fixed,
    moving,
    mask=None,
    reg_iterations: Sequence[int] = (30, 20, 10),
    sigma_flow: float = 1.5,
    sigma_metric: float = 4.0,
    lr: float = 2.0,
    exp_steps: int = 6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-resolution 3-D diffeomorphic registration of [B,D,H,W,1] pairs.

    Returns (flow, warped) at full resolution. Apply to label volumes with
    ``apply_flow3d(..., 'nearest')``; check regularity with
    ``metrics.neg_jacobian_fraction``.
    """
    b, d, h, w, _ = fixed.shape
    fixed = fixed.astype(jnp.float32)
    moving = moving.astype(jnp.float32)
    mask = None if mask is None else mask.astype(jnp.float32)

    n_levels = len(reg_iterations)
    v = None
    for i, iters in enumerate(reg_iterations):
        scale = 2 ** (n_levels - 1 - i)
        ds, hs, ws = d // scale, h // scale, w // scale
        f = resize_nd(fixed, (ds, hs, ws))
        m = resize_nd(moving, (ds, hs, ws))
        msk = None if mask is None else resize_nd(mask, (ds, hs, ws))
        if v is None:
            v = jnp.zeros((b, ds, hs, ws, 3), jnp.float32)
        elif v.shape[1] != ds:
            v = resize_nd(v, (ds, hs, ws)) * (ds / v.shape[1])
        if iters > 0:
            v, _ = _optimize_level3d(f, m, msk, v, int(iters), sigma_flow,
                                     sigma_metric, lr, exp_steps)
    if v.shape[1] != d:
        v = resize_nd(v, (d, h, w)) * (d / v.shape[1])
    flow = exp_velocity3d(v, exp_steps)
    warped = warp3d(moving, flow)
    return flow, warped
