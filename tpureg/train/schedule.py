"""Learning-rate schedules.

The reference defines ``StepLR(step_size=40, gamma=0.8)`` (train.py:131-133)
but never calls ``scheduler.step()`` (commented out at train.py:58), so its
effective schedule is constant lr. Both behaviors are exposed; the step-decay
form is the documented intent.
"""

from __future__ import annotations

import optax

__all__ = ["step_decay_schedule"]


def step_decay_schedule(
    base_lr: float,
    step_size: int = 40,
    gamma: float = 0.8,
    enabled: bool = False,
):
    """StepLR-style staircase decay per *epoch boundary* counted in steps.

    ``enabled=False`` (default) reproduces the reference's effective constant
    lr. When enabled, pass ``step_size`` in optimizer steps (epochs × steps
    per epoch) for the torch-equivalent staircase.
    """
    if not enabled:
        return base_lr
    return optax.exponential_decay(
        init_value=base_lr,
        transition_steps=step_size,
        decay_rate=gamma,
        staircase=True,
    )
