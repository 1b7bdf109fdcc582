"""Schedule lab for the PWC quality gate: compile once, try many arms.

Through the axon tunnel each fresh XLA program costs ~10 min to compile, so
iterating on training schedules via tools/quality_check.py (one process per
arm) is compile-bound. This driver builds every jitted program ONCE (boot
step, self-supervised step, eval step, syn comparator) and then runs an
arbitrary phase schedule against them, evaluating Dice as it goes. LR
changes ride inside the optimizer state via ``optax.inject_hyperparams``
(no recompile, no re-jit).

Usage:
  python tools/pwc_lab.py <model> <phase> [<phase> ...]
  phase := boot:<steps>:<lr>[:<lo>-<hi>]   supervised synthetic-flow
         | self:<steps>:<lr>[:<lo>-<hi>]   self-supervised (OFE loss)
  e.g. python tools/pwc_lab.py pwc-bilinear boot:2000:1e-4 self:2000:1e-4:0-0.5

Same phantoms / magnitudes / comparator as tools/quality_check.py; the gate
threshold is the reference-config SyN comparator (inference_ants.py:51-52).
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

import optax

from tpureg.classical.syn import apply_flow, register_syn
from tpureg.reg import OpticalFlowReg
from tpureg.train import (create_train_state, default_loss_kwargs,
                          make_eval_step, make_flow_supervised_step,
                          make_train_step)

sys.path.insert(0, os.path.dirname(__file__))
from quality_check import EVAL_B, SIZE, TRAIN_B, dice_batch, make_pairs


def parse_phase(spec):
    parts = spec.split(":")
    kind, steps, lr = parts[0], int(parts[1]), float(parts[2])
    if len(parts) > 3:
        lo, hi = parts[3].split("-")
        mag = (float(lo), float(hi))
    else:
        mag = (0.0, 1.5) if kind == "boot" else (0.0, 0.5)
    return kind, steps, lr, mag


def main(model_name, phase_specs, eval_every=1000):
    key = jax.random.key(0)
    model = OpticalFlowReg(conv_predictor=model_name)
    sample, _ = make_pairs(key, TRAIN_B, SIZE, magnitude=(0.0, 0.5))
    state = create_train_state(model, key, sample, learning_rate=1e-4)
    # LR as a traced hyperparam: phases change it without recompiling
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=1e-4, eps=1e-4)
    state = state.replace(tx=tx, opt_state=tx.init(state.params))

    # per-family loss conventions (pwc num_scales, raft descending iteration
    # weights — see tpureg.train.default_loss_kwargs)
    # resume from a saved best-params msgpack (the artifact note_best writes)
    resume = os.environ.get("TPUREG_LAB_RESUME")
    if resume:
        import flax.serialization

        with open(resume, "rb") as f:
            blob = flax.serialization.from_bytes(
                {"params": state.params, "batch_stats": state.batch_stats},
                f.read())
        state = state.replace(params=blob["params"],
                              batch_stats=blob["batch_stats"])
        print(f"resumed params from {resume}", flush=True)

    loss_kwargs = default_loss_kwargs(model_name)
    steps = {
        "boot": make_flow_supervised_step(compute_dtype=jnp.bfloat16,
                                          donate=False),
        "self": make_train_step(loss_kwargs=loss_kwargs, donate=False,
                                compute_dtype=jnp.bfloat16),
    }
    eval_step = make_eval_step(loss_kwargs=loss_kwargs,
                               compute_dtype=jnp.bfloat16)

    eimgs, esegs = make_pairs(jax.random.key(777), EVAL_B, SIZE)
    efixed_seg = esegs[..., 0:1]

    def deep_dice(state):
        (_, _, segs_int, _), _ = eval_step(state, eimgs, esegs)
        return dice_batch(segs_int, efixed_seg)

    t0 = time.time()
    syn_flow, _ = jax.jit(
        lambda f, mv: register_syn(f, mv, reg_iterations=(10, 0, 0))
    )(eimgs[..., 0:1], eimgs[..., 1:2])
    syn_dice = dice_batch(
        apply_flow(esegs[..., 1:2], syn_flow, "nearest"), efixed_seg)
    print(f"[{model_name}] identity {dice_batch(esegs[..., 1:2], efixed_seg):.4f}"
          f"  syn(10,0,0) {syn_dice:.4f}  ({time.time()-t0:.0f}s)", flush=True)

    def set_lr(state, lr):
        hp = dict(state.opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return state.replace(opt_state=state.opt_state._replace(hyperparams=hp))

    best_ckpt = os.environ.get(
        "TPUREG_LAB_CKPT", f"/tmp/pwc_lab_best_{model_name}.msgpack")

    def note_best(best, d, tag, state):
        """Track the best eval Dice AND persist the parameters that scored
        it, so a PASS where best != final state is reproducible from the
        saved artifact (ADVICE r4 item 2)."""
        if d > best[0]:
            import flax.serialization

            with open(best_ckpt, "wb") as f:
                f.write(flax.serialization.to_bytes(
                    {"params": state.params,
                     "batch_stats": state.batch_stats}))
            return (d, tag)
        return best

    best = (0.0, "init")
    for spec in phase_specs:
        kind, n, lr, mag = parse_phase(spec)
        # fresh Adam moments per phase (same semantics as a new optimizer),
        # then set the phase LR inside the injected hyperparams
        state = state.replace(opt_state=state.tx.init(state.params))
        state = set_lr(state, lr)
        step = steps[kind]
        print(f"--- {spec}: {kind} {n} steps @ lr {lr:g}, magnitude {mag}",
              flush=True)
        t0 = time.time()
        m = {}
        for i in range(n):
            key, k = jax.random.split(key)
            if kind == "boot":
                imgs, _, disp = make_pairs(k, TRAIN_B, SIZE, magnitude=mag,
                                           with_disp=True)
                state, m = step(state, imgs, disp)
            else:
                imgs, _ = make_pairs(k, TRAIN_B, SIZE, magnitude=mag)
                state, m = step(state, imgs)
            if (i + 1) % eval_every == 0 and i + 1 < n:
                d = deep_dice(state)
                best = note_best(best, d, f"{spec}@{i+1}", state)
                mtxt = ", ".join(f"{k2} {float(v):.4f}" for k2, v in m.items())
                print(f"  [{i+1}/{n}] dice {d:.4f}  ({mtxt})", flush=True)
        d = deep_dice(state)
        best = note_best(best, d, f"{spec}@end", state)
        mtxt = ", ".join(f"{k2} {float(v):.4f}" for k2, v in m.items())
        print(f"  [end, {time.time()-t0:.0f}s] dice {d:.4f}  ({mtxt})",
              flush=True)

    ok = best[0] >= syn_dice
    print(f"\nbest deep({model_name}) Dice {best[0]:.4f} at {best[1]} "
          f"(params saved to {best_ckpt}) "
          f"vs syn {syn_dice:.4f} -> {'PASS' if ok else 'FAIL'}", flush=True)
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
