"""ADA probability controller — integral control on discriminator sign stats.

Behavioral contract (reference: src/model/loss.py:11-52 ``ADAp``): every
D-step feeds the mean sign of the discriminator's real scores. Once
``n_batches = ada_e // batch_size`` scores have accumulated, the NEXT
score closes the window (n_batches + 1 scores including the boundary
score, which also opens the new window — an exact quirk of the reference's
append-before-and-after-reset flow); if the window mean exceeds the
overfitting target, p is raised by ``ada_adjustment_size * ada_e``, if
below, lowered; p is clamped at 0.

The reference's Python-list state machine is reformulated as a pure
(p, count, accum) struct updated with ``jnp.where`` inside the jitted
train step — no host round-trip.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AdaState(NamedTuple):
    p: jax.Array  # float32 scalar: current augmentation probability
    count: jax.Array  # int32 scalar: scores in the open window
    accum: jax.Array  # float32 scalar: sum of scores in the open window


def init_ada_state() -> AdaState:
    return AdaState(
        p=jnp.zeros((), jnp.float32),
        count=jnp.zeros((), jnp.int32),
        accum=jnp.zeros((), jnp.float32),
    )


def make_ada_update(
    ada_e: int, ada_adjustment_size: float, batch_size: int, target: float
):
    """Build the pure update function for the given hyperparameters."""
    n_batches = ada_e // batch_size
    adjustment = ada_adjustment_size * ada_e

    def update(state: AdaState, mean_real_sign: jax.Array) -> AdaState:
        score = mean_real_sign.astype(jnp.float32)
        closes = state.count == n_batches
        window_mean = (state.accum + score) / (state.count.astype(jnp.float32) + 1.0)
        delta = jnp.where(
            window_mean > target,
            adjustment,
            jnp.where(window_mean < target, -adjustment, 0.0),
        )
        new_p = jnp.where(closes, jax.nn.relu(state.p + delta), state.p)
        new_count = jnp.where(closes, 1, state.count + 1)
        new_accum = jnp.where(closes, score, state.accum + score)
        return AdaState(p=new_p, count=new_count, accum=new_accum)

    return update
