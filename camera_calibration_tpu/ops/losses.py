"""Robust loss functions (value + IRLS weight interfaces).

Conventions match the reference (reference: libvis/src/libvis/
loss_functions.h:68-224): costs carry the 1/2 factor inside the quadratic
region, and ``weight`` is the IRLS multiplier applied to JᵀJ / Jᵀr rows.

All functions take the *squared* residual magnitude, which is what batched
residual evaluation produces naturally, and are safe at 0 via masking.
"""

from __future__ import annotations

import jax.numpy as jnp


def quadratic_cost(sq_r):
    return 0.5 * sq_r


def quadratic_weight(sq_r):
    return jnp.ones_like(sq_r)


def huber_cost(sq_r, tau):
    """Huber cost from squared residual (loss_functions.h:110-117)."""
    tau_sq = tau * tau
    lin = tau * (jnp.sqrt(jnp.maximum(sq_r, tau_sq)) - 0.5 * tau)
    return jnp.where(sq_r < tau_sq, 0.5 * sq_r, lin)


def huber_weight(sq_r, tau):
    """IRLS weight for Huber (loss_functions.h:125-128)."""
    tau_sq = tau * tau
    return jnp.where(sq_r < tau_sq, 1.0, tau / jnp.sqrt(jnp.maximum(sq_r, tau_sq)))


def tukey_cost(sq_r, c):
    c_sq = c * c
    term = 1.0 - jnp.minimum(sq_r, c_sq) / c_sq
    return (c_sq / 6.0) * (1.0 - term * term * term)


def tukey_weight(sq_r, c):
    c_sq = c * c
    term = 1.0 - sq_r / c_sq
    return jnp.where(sq_r < c_sq, term * term, 0.0)


def cauchy_cost(sq_r, c):
    c_sq = c * c
    return 0.5 * c_sq * jnp.log1p(sq_r / c_sq)


def cauchy_weight(sq_r, c):
    c_sq = c * c
    return 1.0 / (1.0 + sq_r / c_sq)
