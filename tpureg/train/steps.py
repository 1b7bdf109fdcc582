"""jit-able train / eval steps: model forward + OFE loss + Adam update.

One fused XLA program per step (the reference's hot loop, train.py:41-57):
forward through the registration head, multi-scale loss against the fixed
channel, grad, Adam update, BatchNorm running-stat update. Under a device
mesh, batches are sharded over 'data' and params replicated — pjit inserts
the gradient all-reduce over ICI automatically.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..losses import OFEloss

__all__ = [
    "make_train_step",
    "make_eval_step",
    "make_affine_train_step",
    "make_deform3d_train_step",
    "make_flow_supervised_step",
    "stn_inverse_target",
    "loss_from_outputs",
    "default_loss_kwargs",
]


def default_loss_kwargs(model_name: str) -> Optional[dict]:
    """Per-model-family loss conventions for the multi-scale OFE loss.

    - PWC family: restrict the loss to the finest 2 of the 7 returned flows
      (``num_scales=2``) — the coarse levels carry px/20-unit flows by
      architectural convention (reference PWC/models/PWCNet.py:214-258), and
      a photometric pull toward resolution-px units there breaks the
      pyramid's internal warps.
    - RAFT family: reference ascending weights. RAFT returns its
      same-resolution iterations most-refined-first (models/raft.py), so
      ascending weights give the most refined iterate the LIGHTEST weight
      — the inverse of RAFT's own supervised convention (latest-heaviest,
      γ^(N-i)). Both orders were A/B'd on hardware under the
      self-supervised OFE loss (round 5, BASELINE.md): descending
      (``weight_order='descending'``, available on OFEloss) converges
      measurably SLOWER on registration Dice (0.9362 vs 0.9414 at 3k
      steps) — heavier gradient on the early iterates acts as deep
      supervision that stabilizes the recurrent refinement, while RAFT's
      latest-heaviest convention comes from supervised EPE training and
      does not transfer. Reference semantics kept.
    - everything else: ``None`` = exact reference semantics.
    """
    key = model_name.lower()
    if "pwc" in key:
        return {"num_scales": 2}
    return None


def loss_from_outputs(outputs, imgs, loss_kwargs):
    flows, warped_imgs, _, _ = outputs
    # ``num_scales``: restrict the multi-scale loss to the finest k flows.
    # The reference loss consumes every returned scale with ascending
    # weights (loss.py:71) — the right default for the FlowNet families
    # (2-5 scales) but counterproductive for PWC-Net's 7 returned flows,
    # whose coarse levels carry px/20-unit flows by architectural
    # convention (PWC/models/PWCNet.py:214-258 warp scaling): a photometric
    # pull toward px-at-resolution units there breaks the pyramid's
    # internal warps. None = reference semantics.
    loss_kwargs = dict(loss_kwargs)
    num_scales = loss_kwargs.pop("num_scales", None)
    if num_scales is not None:
        flows = flows[:num_scales]
        warped_imgs = warped_imgs[:num_scales]
    # the multi-scale loss always evaluates in fp32, whatever the compute dtype
    flows = [f.astype(jnp.float32) for f in flows]
    warped_imgs = [w.astype(jnp.float32) for w in warped_imgs]
    fixed = imgs[..., 0:1].astype(jnp.float32)
    return OFEloss(flows, warped_imgs, fixed, **loss_kwargs)


def _cast_floats(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def make_train_step(
    loss_kwargs: Optional[dict] = None,
    donate: bool = True,
    compute_dtype: Optional[jnp.dtype] = None,
    remat: Optional[str] = None,
    accum_steps: int = 1,
    synth: Optional[callable] = None,
):
    """Fused train step. ``compute_dtype=jnp.bfloat16`` enables TPU-native
    mixed precision: master params stay fp32 (Adam state, BN stats too — the
    BatchNorm blocks pin fp32 internally), while conv/warp activations and
    weights run in bf16. Replaces the reference's optional fp16-storage
    wrappers (flownet2/models.py:47-88, submodules.py:40-53).

    ``remat`` trades recompute FLOPs for saved-activation HBM traffic
    (jax.checkpoint over the model forward): ``'full'`` stores nothing and
    recomputes the whole forward inside the backward; ``'dots'`` keeps
    matmul/conv outputs and recomputes only the cheap elementwise tail
    (checkpoint_dots policy).

    ``accum_steps > 1`` enables gradient accumulation: the batch (whose
    leading axis must be divisible) is split into that many microbatches
    swept by a ``lax.scan`` — live activations shrink by the factor while
    the optimizer sees the mean gradient, so effective batch size is no
    longer bounded by per-chip HBM. BatchNorm statistics thread through the
    microbatches sequentially (each sees the running stats its predecessor
    produced). Loss metrics are microbatch means.

    ``synth`` fuses the data pipeline into the step: when set, the step's
    second argument is a spec tuple (e.g. ``SliceDataset.batch_specs()``'s
    ``(epoch_key, flat_img, idx)``) and ``imgs = synth(*spec)`` is computed
    inside the jitted program — one device dispatch per batch covering
    gather + augmentation + forward/backward/update, instead of a separate
    augmentation program running serially with the step.
    """
    loss_kwargs = loss_kwargs or {}
    if remat not in (None, "full", "dots"):
        raise ValueError(f"remat must be None|'full'|'dots', got {remat!r}")
    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum_steps}")

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state, imgs):
        if synth is not None:
            imgs = synth(*imgs)
        apply_fn = state.apply_fn

        def forward(params, batch_stats, imgs_c):
            return apply_fn(
                {"params": params, "batch_stats": batch_stats},
                imgs_c,
                None,
                train=True,
                mutable=["batch_stats"],
            )

        if remat == "full":
            forward = jax.checkpoint(forward)
        elif remat == "dots":
            forward = jax.checkpoint(
                forward, policy=jax.checkpoint_policies.checkpoint_dots
            )

        def grads_for(batch_stats, mb_imgs):
            """(grads, (p, c, s, total, new_stats)) for one microbatch."""

            def loss_fn(params):
                if compute_dtype is not None:
                    params = _cast_floats(params, compute_dtype)
                    imgs_c = mb_imgs.astype(compute_dtype)
                else:
                    imgs_c = mb_imgs
                outputs, mutated = forward(params, batch_stats, imgs_c)
                new_stats = _cast_floats(mutated["batch_stats"], jnp.float32)
                p, c, s, total = loss_from_outputs(outputs, mb_imgs,
                                                   loss_kwargs)
                return total, (p, c, s, new_stats)

            (total, (p, c, s, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            if compute_dtype is not None:  # grads of the cast come back fp32
                grads = _cast_floats(grads, jnp.float32)
            return grads, (p, c, s, total, new_stats)

        if accum_steps == 1:
            grads, (p, c, s, total, new_stats) = grads_for(
                state.batch_stats, imgs
            )
        else:
            b = imgs.shape[0]
            if b % accum_steps:
                raise ValueError(
                    f"batch {b} not divisible by accum_steps {accum_steps}"
                )
            micro = imgs.reshape(accum_steps, b // accum_steps, *imgs.shape[1:])

            def body(carry, mb):
                grads_acc, stats = carry
                g, (p, c, s, t, stats) = grads_for(stats, mb)
                grads_acc = jax.tree.map(jnp.add, grads_acc, g)
                return (grads_acc, stats), jnp.stack([p, c, s, t])

            zero = jax.tree.map(jnp.zeros_like, state.params)
            (grads, new_stats), ms = jax.lax.scan(
                body, (zero, state.batch_stats), micro
            )
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            p, c, s, total = [m for m in jnp.mean(ms, axis=0)]

        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        metrics = {
            "loss": total,
            "photo_loss": p,
            "corr_loss": c,
            "smooth_loss": s,
        }
        return state, metrics

    return train_step


def stn_inverse_target(disp, h, w, h_full):
    """The flow the head's 'stn' warp needs to undo ``disp``, at (h, w).

    ``disp`` is the [B, H, W, 2] full-resolution pixel displacement used to
    synthesize ``moving(x) = fixed(x + d(x))``. The 'stn' warp samples at
    ``(x + flow)·(s-1)/s`` (ops/warp.py::warp2d), so solving
    ``(x + flow)·(s-1)/s = x - d`` gives
    ``flow = -d·s/(s-1) + x/(s-1)`` per axis — the grid term is NOT
    negligible (→ 1 px at the far border).
    """
    w_full = disp.shape[2]
    d = jax.image.resize(disp, (disp.shape[0], h, w, 2), "bilinear")
    # pixel units at this scale, per axis (w ratio for x, h ratio for y —
    # they differ for non-square inputs)
    d = d * jnp.asarray([w / w_full, h / h_full], d.dtype)
    from ..ops.warp import base_grid

    g = base_grid(h, w)[None]
    # at a degenerate 1-wide scale the stn position scale (s-1)/s is 0 and
    # the warp ignores flow entirely — any finite target works; use -d
    wd, hd = max(w - 1, 1), max(h - 1, 1)
    return jnp.stack(
        [
            -d[..., 0] * (w / wd) + (g[..., 0] / wd if w > 1 else 0.0),
            -d[..., 1] * (h / hd) + (g[..., 1] / hd if h > 1 else 0.0),
        ],
        axis=-1,
    )


def make_flow_supervised_step(compute_dtype: Optional[jnp.dtype] = None,
                              donate: bool = True,
                              flow_units: str = "resolution"):
    """Supervised synthetic-flow pretraining step (multi-scale EPE).

    The reference never trains PWC-Net from scratch: its ``pwc`` path loads
    FlyingChairs-pretrained weights (synthetic ground-truth flow
    supervision) before self-supervised finetuning (models.py:243-248).
    With no egress for those weights, this step IS that mechanism,
    TPU-native: the elastic synthesizer (ops/elastic.py) already knows the
    ground-truth displacement of every (fixed, moving) pair. For a
    backward-warp synthesis ``moving(x) = fixed(x + d(x))`` the aligning
    source position is ``src ≈ x - d(x)``; the head's 'stn' warp samples at
    ``(x + flow)·(s-1)/s`` (the reference's grid*2/size - 1 +
    align_corners=True quirk, models.py:262-266), so the stn-flow the head
    must predict is the exact inverse ``flow = -d·s/(s-1) + x/(s-1)`` —
    NOT plain ``-d``: the ``x/(s-1)`` term reaches a full pixel at the
    far border, the same order as sub-pixel medical displacements, and
    training against ``-d`` measurably *hurts* registration (warping a
    (0.5, 1.0)-magnitude elastic eval pair with ``-d`` scores BELOW
    identity Dice; the exact target scores 0.98). The loss is mean
    endpoint error at every predicted scale against that target resized
    to the scale (displacement values scaled by h_scale/H — pixel units
    shrink with resolution), the standard FlowNet/PWC supervised schedule.

    Step signature: ``step(state, imgs, disp)`` with ``disp`` the [B,H,W,2]
    pixel-unit displacement used to synthesize ``imgs[..., 1]`` from
    ``imgs[..., 0]``.

    ``flow_units``:
    - ``"resolution"``: target at each scale is the stn-inverse of ``d``
      in pixels at that scale's resolution (displacement × h_scale/H) —
      the FlowNet convention.
    - ``"pwc20"``: scales at ≤¼ resolution are supervised in the PWC
      architecture's native units, ``-d / 20`` (div_flow=20; identical at
      every internal level — PWC/models/PWCNet.py:214-258 scale factors
      0.625..5.0 presume it). The finest two scales (the learned
      deconv1/2 upsamplers) are supervised with the stn-inverse target at
      their resolution, which is what the registration head warps with
      (models.py:277). Caveat measured on hardware: because flow0/flow1
      are *linear* 2→2 deconvs of flow2, they cannot synthesize the stn
      grid-ramp term from a ramp-free ``-d/20`` flow2 — the finest
      targets become unreachable and EPE plateaus. Prefer
      ``"resolution"`` (ramp-consistent at every level) unless starting
      from converged PWC weights.

    Metrics: ``epe`` (scale-mean) and ``epe0`` (finest scale, px — the
    flow the registration head actually warps with).
    """

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state, imgs, disp):
        def loss_fn(params):
            if compute_dtype is not None:
                params = _cast_floats(params, compute_dtype)
                imgs_c = imgs.astype(compute_dtype)
            else:
                imgs_c = imgs
            outputs, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                imgs_c,
                None,
                train=True,
                mutable=["batch_stats"],
            )
            new_stats = _cast_floats(mutated["batch_stats"], jnp.float32)
            flows = [f.astype(jnp.float32) for f in outputs[0]]
            h_full = imgs.shape[1]
            epe = 0.0
            epe0 = None
            for f in flows:
                h, w = f.shape[1], f.shape[2]
                if flow_units == "pwc20" and h * 4 <= h_full:
                    unit = 20.0  # report in ~px units
                    gt = jax.image.resize(
                        -disp, (disp.shape[0], h, w, 2), "bilinear"
                    ) * (1.0 / 20.0)
                else:
                    unit = 1.0
                    gt = stn_inverse_target(disp, h, w, h_full)
                term = jnp.mean(
                    jnp.sqrt(jnp.sum((f - gt) ** 2, axis=-1) + 1e-12)
                )
                if epe0 is None:
                    epe0 = term
                epe = epe + unit * term
            epe = epe / len(flows)
            return epe, (new_stats, epe0)

        (epe, (new_stats, epe0)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if compute_dtype is not None:
            grads = _cast_floats(grads, jnp.float32)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        return state, {"epe": epe, "epe0": epe0}

    return step


def make_affine_train_step(loss_kwargs: Optional[dict] = None,
                           donate: bool = True):
    """3-D affine pre-registration step: AffineNet3D + Affloss.

    The volumetric stage (reference affmodel models.py:156-191 + Affloss
    loss.py:87-94 + volume_ds). ``vols``: [B, D, H, W, 2] fixed/moving.
    """
    from ..losses import Affloss

    loss_kwargs = loss_kwargs or {}

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state, vols):
        fixed = vols[..., 0:1]

        def loss_fn(params):
            theta, warped = state.apply_fn({"params": params}, vols)
            p, c, total = Affloss(warped, fixed, **loss_kwargs)
            return total, (p, c)

        (total, (p, c)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        return state, {"loss": total, "photo_loss": p, "corr_loss": c}

    return train_step


def make_deform3d_train_step(loss_kwargs: Optional[dict] = None,
                             donate: bool = True):
    """Learned deformable 3-D registration step: VoxelMorph3D + DEFloss3D.

    The stage beyond the reference's affine-only volumetric training
    (its deformable 3-D registration exists only as the classical ANTs
    comparator, inference_ants.py:51-57). ``vols``: [B, D, H, W, 2]
    fixed/moving. The model's SVF construction keeps the field
    diffeomorphic; regularity is checked post-hoc with
    ``metrics.jacobian`` on the returned flow.
    """
    from ..losses import DEFloss3D

    loss_kwargs = loss_kwargs or {}

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state, vols):
        fixed = vols[..., 0:1]

        def loss_fn(params):
            flow, warped, _vel = state.apply_fn({"params": params}, vols)
            p, c, s, total = DEFloss3D(flow, warped, fixed, **loss_kwargs)
            return total, (p, c, s)

        (total, (p, c, s)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        return state, {
            "loss": total,
            "photo_loss": p,
            "corr_loss": c,
            "smooth_loss": s,
        }

    return train_step


def make_eval_step(loss_kwargs: Optional[dict] = None,
                   compute_dtype: Optional[jnp.dtype] = None):
    loss_kwargs = loss_kwargs or {}

    @jax.jit
    def eval_step(state, imgs, segs=None):
        params = state.params
        imgs_c = imgs
        if compute_dtype is not None:
            params = _cast_floats(params, compute_dtype)
            imgs_c = imgs.astype(compute_dtype)
        outputs = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            imgs_c,
            segs,
            train=False,
        )
        p, c, s, total = loss_from_outputs(outputs, imgs, loss_kwargs)
        metrics = {
            "loss": total,
            "photo_loss": p,
            "corr_loss": c,
            "smooth_loss": s,
        }
        return outputs, metrics

    return eval_step
