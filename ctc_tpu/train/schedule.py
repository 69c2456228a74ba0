"""Learning-rate schedules.

The reference decays LR by 10x every ``lr_decay_rate`` epochs
(/root/reference/train.py:34-38, applied per-epoch to both optimizers).  Here
that is an optax-compatible step->lr callable.
"""

from __future__ import annotations


def step_decay_schedule(
    base_lr: float, decay_every_epochs: int, steps_per_epoch: int
):
    """``lr = base_lr * 0.1 ** (epoch // decay_every_epochs)`` as a function
    of the optimizer step count."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * (0.1 ** (epoch // max(decay_every_epochs, 1)))

    return schedule
