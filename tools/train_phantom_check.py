"""Learning check: does the system actually learn to register?

Trains FlowNetS on synthetic phantom pairs (random smooth 'anatomy' +
elastic-deformed moving image — the same synthesis family as the OASIS
pipeline) and reports registration quality before/after: photometric MSE
between fixed and warped-moving, and the fraction recovered vs the identity
baseline. This is the end-to-end 'it learns' gate — shape tests can't catch
a sign error in the warp/loss coupling.

Run on the TPU: python tools/train_phantom_check.py [steps] [--bf16]
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

from tpureg.ops.elastic import rand_elastic_2d
from tpureg.reg import OpticalFlowReg
from tpureg.train import create_train_state, make_eval_step, make_train_step

SIZE = 128
BATCH = 16


def phantom_batch(key, batch=BATCH, size=SIZE):
    """Smooth random 'anatomy' + elastic moving pair, intensity [0,1]."""
    k1, k2 = jax.random.split(key)
    # smooth random field: upsampled low-res noise (brain-ish blobs)
    coarse = jax.random.uniform(k1, (batch, size // 16, size // 16, 1))
    fixed = jax.image.resize(coarse, (batch, size, size, 1), "bicubic")
    fixed = jnp.clip(fixed, 0.0, 1.0)
    moving, _ = rand_elastic_2d(k2, fixed, magnitude_range=(0.4, 0.8),
                                spacing=(16, 16))
    return jnp.concatenate([fixed, moving], axis=-1)


def main(steps: int = 300, bf16: bool = False):
    key = jax.random.key(0)
    model = OpticalFlowReg(conv_predictor="flownets")
    sample = phantom_batch(key)
    state = create_train_state(model, key, sample, learning_rate=1e-4)
    dtype = jnp.bfloat16 if bf16 else None
    print(f"compute dtype: {'bf16 mixed' if bf16 else 'fp32'}", flush=True)
    train_step = make_train_step(donate=False, compute_dtype=dtype)
    eval_step = make_eval_step(compute_dtype=dtype)

    def quality(state, batch):
        (flows, warped, _, _), _ = eval_step(state, batch, None)
        fixed = batch[..., 0:1]
        mse_warped = float(jnp.mean((warped[0] - fixed) ** 2))
        mse_identity = float(jnp.mean((batch[..., 1:2] - fixed) ** 2))
        return mse_warped, mse_identity

    eval_batch = phantom_batch(jax.random.key(999))
    mse0, mse_id = quality(state, eval_batch)
    print(f"identity-baseline MSE {mse_id:.5f}; untrained warped MSE {mse0:.5f}",
          flush=True)

    t0 = time.time()
    for i in range(steps):
        key, k = jax.random.split(key)
        state, m = train_step(state, phantom_batch(k))
        if (i + 1) % 50 == 0:
            loss = float(m["loss"])
            mse, _ = quality(state, eval_batch)
            print(f"step {i+1:4d}: loss {loss:9.1f}  eval warped MSE {mse:.5f}",
                  flush=True)

    mse1, _ = quality(state, eval_batch)
    recovered = 1.0 - mse1 / mse_id
    print(f"\nfinal: warped MSE {mse1:.5f} vs identity {mse_id:.5f} "
          f"-> {100*recovered:.1f}% of misalignment removed "
          f"({time.time()-t0:.0f}s for {steps} steps)")
    ok = mse1 < 0.5 * mse_id
    print("LEARNING CHECK:", "PASS" if ok else "FAIL")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--bf16"]
    main(int(argv[0]) if argv else 300, bf16="--bf16" in sys.argv)
