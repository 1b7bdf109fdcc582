"""RAFT — recurrent all-pairs field transforms (iterative flow refinement).

The reference *references* RAFT (models.py:227-240 builds ``raft.RAFT`` with
iters=5) but does not vendor the implementation (SURVEY.md: "RAFT is
referenced but not vendored"), so the reference's 'raft' registry entry is
non-functional in the snapshot. Here RAFT is a real TPU-native
implementation: residual feature/context encoders, an all-pairs correlation
pyramid with radius-4 lookups, and a ConvGRU update operator unrolled for a
static number of iterations (lax-friendly: the iteration count is a trace-
time constant).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize2d
from ..ops.warp import sample2d

__all__ = ["RAFT"]


class _ResBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=((1, 1), (1, 1)), name="conv1")(x)
        y = nn.relu(nn.GroupNorm(num_groups=8, name="norm1")(y))
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv2")(y)
        y = nn.GroupNorm(num_groups=8, name="norm2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                        name="proj")(x)
        return nn.relu(x + y)


class _Encoder(nn.Module):
    """1/8-resolution residual encoder (shared shape for feature/context).

    ``final_stride=1`` stops at 1/4 resolution instead (the raft-reg
    variant's finer evidence grid)."""

    out_features: int
    final_stride: int = 2

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(32, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                    name="stem")(x)
        y = nn.relu(nn.GroupNorm(num_groups=8, name="stem_norm")(y))
        y = _ResBlock(32, name="res1a")(y)
        y = _ResBlock(64, stride=2, name="res2a")(y)
        y = _ResBlock(64, name="res2b")(y)
        y = _ResBlock(96, stride=self.final_stride, name="res3a")(y)
        y = _ResBlock(96, name="res3b")(y)
        return nn.Conv(self.out_features, (1, 1), name="head")(y)


def _corr_pyramid(f1, f2, levels: int = 4):
    """All-pairs correlation [B, H, W, H*W] + average-pooled pyramid."""
    b, h, w, c = f1.shape
    a = f1.reshape(b, h * w, c)
    bmat = f2.reshape(b, h * w, c)
    corr = jnp.einsum("bic,bjc->bij", a, bmat) / jnp.sqrt(jnp.float32(c))
    corr = corr.reshape(b * h * w, h, w, 1)  # treat each source px as batch
    pyramid = [corr]
    for _ in range(levels - 1):
        corr = nn.avg_pool(corr, (2, 2), (2, 2))
        pyramid.append(corr)
    return pyramid


def _window_onehot(i0, m, size):
    """[P, m, size] one-hot row selectors for indices i0..i0+m-1.

    Out-of-range rows are all-zero (zero-padding semantics, matching the
    independent per-tap zeroing of ops.warp.sample2d).
    """
    idx = i0[:, None] + jnp.arange(m, dtype=jnp.int32)[None]        # [P, m]
    inb = (idx >= 0) & (idx <= size - 1)
    grid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, size), 2)
    oh = (jnp.clip(idx, 0, size - 1)[..., None] == grid) & inb[..., None]
    return oh.astype(jnp.float32)


def _lookup_windows(corr, cx, cy, radius: int):
    """Gather-free correlation lookup: one-hot window matmuls + bilinear blend.

    ``corr``: [P, hl, wl] per-source-pixel correlation maps; ``cx``/``cy``:
    [P] float center positions. All (2r+1)² taps of one source pixel share a
    single fractional offset, so the lookup factors into extracting a
    (2r+2)² *integer* window — two batched one-hot contractions that XLA maps
    onto the MXU instead of the scalar-loop gather lowering — followed by a
    4-shift bilinear blend. Exact vs the 4-tap gather (zero out-of-bounds
    taps). Returns [P, (2r+1)²].
    """
    p, hl, wl = corr.shape
    n = 2 * radius + 1
    m = n + 1
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = (cx - x0)[:, None, None]
    fy = (cy - y0)[:, None, None]
    x0i = x0.astype(jnp.int32) - radius
    y0i = y0.astype(jnp.int32) - radius

    ry = _window_onehot(y0i, m, hl)                                  # [P,m,hl]
    cxm = _window_onehot(x0i, m, wl)                                 # [P,m,wl]
    hi = jax.lax.Precision.HIGHEST
    tmp = jnp.einsum("pkh,phw->pkw", ry, corr, precision=hi)         # [P,m,wl]
    win = jnp.einsum("pkw,pjw->pkj", tmp, cxm, precision=hi)         # [P,m,m]

    out = (
        (1 - fy) * (1 - fx) * win[:, : m - 1, : m - 1]
        + (1 - fy) * fx * win[:, : m - 1, 1:]
        + fy * (1 - fx) * win[:, 1:, : m - 1]
        + fy * fx * win[:, 1:, 1:]
    )
    return out.reshape(p, n * n)


def _lookup(pyramid, coords, radius: int = 4, use_windows: bool = True):
    """Sample correlation values around ``coords`` at every pyramid level.

    coords: [B, H, W, 2] absolute 1/8-res positions. Returns
    [B, H, W, levels*(2r+1)^2]. ``use_windows`` selects the gather-free
    one-hot window path (TPU fast path); the 4-tap gather (sample2d) is the
    semantics oracle.
    """
    b, h, w, _ = coords.shape
    n = 2 * radius + 1
    outs = []
    for lvl, corr in enumerate(pyramid):
        scale = 2.0**lvl
        if use_windows:
            c = coords.reshape(b * h * w, 2) / scale
            vals = _lookup_windows(corr[..., 0], c[..., 0], c[..., 1], radius)
            outs.append(vals.reshape(b, h, w, n * n))
        else:
            centers = coords.reshape(b * h * w, 1, 1, 2) / scale
            d = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
            dy, dx = jnp.meshgrid(d, d, indexing="ij")
            px = centers[..., 0] + dx.reshape(1, n, n)
            py = centers[..., 1] + dy.reshape(1, n, n)
            vals = sample2d(corr, px, py)  # [BHW, n, n, 1]
            outs.append(vals.reshape(b, h, w, n * n))
    return jnp.concatenate(outs, axis=-1)


class _GRU(nn.Module):
    hidden: int = 96

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(nn.Conv(self.hidden, (3, 3), padding=((1, 1), (1, 1)),
                               name="convz")(hx))
        r = nn.sigmoid(nn.Conv(self.hidden, (3, 3), padding=((1, 1), (1, 1)),
                               name="convr")(hx))
        q = nn.tanh(nn.Conv(self.hidden, (3, 3), padding=((1, 1), (1, 1)),
                            name="convq")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class RAFT(nn.Module):
    """Compact RAFT ('small'-class) with static iteration count.

    ``__call__`` returns per-iteration full-resolution flows finest-last in
    RAFT convention; reversed here to finest-first to match the framework's
    multi-scale contract (most-refined flow at index 0).
    """

    iters: int = 5
    corr_levels: int = 4
    corr_radius: int = 4
    hidden: int = 96
    # "raft-reg" registry variant: each iteration's motion encoder also
    # sees the moving features warped by the current flow, next to the
    # fixed features. The cost-volume lookup alone is nearly flat under
    # the sub-pixel flows of medical registration (measured: 4000
    # self-supervised steps leave Dice exactly at identity — BASELINE.md
    # round-4 PWC/RAFT section); the warped-feature stream is bilinear in
    # the flow and therefore carries a sub-pixel-sensitive gradient, the
    # same fix that takes PWC from identity-level to gate-passing.
    feed_warped: bool = False
    # working resolution divisor: 8 (RAFT paper) or 4. At 1/8 even the
    # warped-feature stream plateaus near identity on sub-pixel fields
    # (0.9359, /tmp/lab_raftreg.log); 1/4 matches the evidence grid that
    # takes pwc-reg past the SyN gate.
    downsample: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        b, h, w, _ = x.shape
        x1, x2 = x[..., 0:1], x[..., 1:2]

        assert self.downsample in (4, 8)
        fs = 2 if self.downsample == 8 else 1
        fnet = _Encoder(128, final_stride=fs, name="fnet")
        f1, f2 = fnet(x1), fnet(x2)
        ctx = _Encoder(self.hidden + 64, final_stride=fs, name="cnet")(x1)
        hidden = nn.tanh(ctx[..., : self.hidden])
        inp = nn.relu(ctx[..., self.hidden :])

        pyramid = _corr_pyramid(f1, f2, self.corr_levels)

        h8, w8 = f1.shape[1], f1.shape[2]
        ys, xs = jnp.meshgrid(jnp.arange(h8, dtype=jnp.float32),
                              jnp.arange(w8, dtype=jnp.float32), indexing="ij")
        coords0 = jnp.broadcast_to(jnp.stack([xs, ys], -1), (b, h8, w8, 2))
        flow = jnp.zeros((b, h8, w8, 2), jnp.float32)

        motion_enc = nn.Sequential([
            nn.Conv(96, (1, 1), name="menc1"), nn.relu,
            nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), name="menc2"),
            nn.relu,
        ])
        gru = _GRU(self.hidden, name="gru")
        flow_head = nn.Sequential([
            nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)), name="fh1"),
            nn.relu,
            nn.Conv(2, (3, 3), padding=((1, 1), (1, 1)), name="fh2"),
        ])

        flows_up = []
        for _ in range(self.iters):
            corr = _lookup(pyramid, coords0 + flow, self.corr_radius)
            m_in = [corr, flow]
            if self.feed_warped:
                from ..ops.warp import warp2d

                m_in += [warp2d(f2, flow, convention="pixel"), f1]
            m = motion_enc(jnp.concatenate(m_in, axis=-1))
            hidden = gru(hidden, jnp.concatenate([m, inp], axis=-1))
            flow = flow + flow_head(hidden)
            flows_up.append(
                resize2d(flow, (h, w), "bilinear", align_corners=False)
                * float(self.downsample)
            )
        # finest-first: last (most refined) iteration leads
        return tuple(reversed(flows_up))
