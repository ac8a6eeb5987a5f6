"""LR schedules (reference models/lr_scheduler.py:8-62) as optax schedules.

* multistep_restart: gamma decay at milestones, optional restarts that reset
  the LR to base*weight at given steps.
* cosine_restart: cosine annealing with restart periods/weights.
Both include the linear warmup rule of BaseModel.update_learning_rate
(base_model.py:51-63) when warmup_iter > 0.
"""

from __future__ import annotations

import numpy as np


def multistep_restart(
    base_lr: float,
    milestones,
    gamma: float = 0.5,
    restarts=None,
    restart_weights=None,
    warmup_iter: int = -1,
):
    milestones = sorted(milestones or [])
    restarts = list(restarts or [])
    restart_weights = list(restart_weights or [1] * len(restarts))

    def schedule(step):
        step = int(step)
        lr = base_lr
        # restarts reset the decay chain (reference lr_scheduler.py:21-29)
        last_restart = 0
        weight = 1.0
        for r, w in zip(restarts, restart_weights):
            if step >= r:
                last_restart, weight = r, w
        n_decay = sum(1 for m in milestones if last_restart < m <= step)
        lr = base_lr * weight * (gamma ** n_decay)
        if 0 < warmup_iter and step < warmup_iter:
            lr = lr * step / max(1, warmup_iter)
        return lr

    return schedule


def cosine_restart(
    base_lr: float,
    t_period,
    eta_min: float = 1e-7,
    restarts=None,
    restart_weights=None,
    warmup_iter: int = -1,
):
    t_period = list(t_period)
    restarts = list(restarts or [])
    restart_weights = list(restart_weights or [1] * len(restarts))

    def schedule(step):
        step = int(step)
        last_restart = 0
        weight = 1.0
        period_idx = 0
        for i, r in enumerate(restarts):
            if step >= r:
                last_restart, weight = r, restart_weights[i]
                period_idx = i + 1
        T = t_period[min(period_idx, len(t_period) - 1)]
        t = step - last_restart
        lr = eta_min + 0.5 * (base_lr * weight - eta_min) * (
            1 + np.cos(np.pi * (t % T) / T)
        )
        if 0 < warmup_iter and step < warmup_iter:
            lr = lr * step / max(1, warmup_iter)
        return float(lr)

    return schedule
