"""Generic matrix-free Levenberg-Marquardt with an inner CG solve.

The TPU-native counterpart of the reference's generic LMOptimizer engine
(reference: libvis/src/libvis/lm_optimizer.h:256,628): the problem is given
as a *pure residual function* over a pytree tangent plus a *retraction*,
and the normal equations (JᵀJ + λ·D)δ = −Jᵀr are solved matrix-free with
conjugate gradients, where J·v and Jᵀ·u come from ``jax.jvp`` / ``jax.vjp``
of the residual function at δ = 0.  No Jacobian is ever materialized; XLA
fuses the two linearized passes per CG iteration.

λ handling mirrors the reference: initialized from the mean diagonal of
JᵀJ (lm_optimizer.h:762-781), accept/reject with λ·{0.5, 2}
(lm_optimizer.h:930-964).  The damping diagonal D defaults to I.

This engine is used for medium-size problems (model fitting, refinement);
the full bundle adjustment has a dedicated solver with explicit small
Jacobian blocks and a Jacobi-preconditioned PCG (ba/lm_pcg.py), mirroring
the reference's split between lm_optimizer.h and cuda_joint_optimization.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class LMResult(NamedTuple):
    state: Any
    cost: jnp.ndarray
    iterations: jnp.ndarray
    lam: jnp.ndarray


def _tree_dot(a, b):
    leaves = jax.tree_util.tree_map(lambda x, y: jnp.vdot(x, y), a, b)
    return jax.tree_util.tree_reduce(jnp.add, leaves)


def _tree_axpy(alpha, x, y):
    return jax.tree_util.tree_map(lambda xi, yi: alpha * xi + yi, x, y)


def _tree_scale(alpha, x):
    return jax.tree_util.tree_map(lambda xi: alpha * xi, x)


def _tree_zeros_like(x):
    return jax.tree_util.tree_map(jnp.zeros_like, x)


def _hutchinson_diag_estimate(matvec, template, key, n_probes):
    """Rademacher estimate of diag(A) — optional Jacobi preconditioner."""
    diag = _tree_zeros_like(template)
    keys = jax.random.split(key, n_probes)

    def body(carry, k):
        diag = carry
        leaves, treedef = jax.tree_util.tree_flatten(template)
        subkeys = jax.random.split(k, len(leaves))
        z = jax.tree_util.tree_unflatten(
            treedef,
            [
                jax.random.rademacher(sk, l.shape, dtype=l.dtype)
                for sk, l in zip(subkeys, leaves)
            ],
        )
        az = matvec(z)
        diag = jax.tree_util.tree_map(lambda d, zi, azi: d + zi * azi, diag, z, az)
        return diag, None

    diag, _ = jax.lax.scan(body, diag, keys)
    return jax.tree_util.tree_map(lambda d: d / n_probes, diag)


def lm_solve(
    residual_fn: Callable[[Any], jnp.ndarray],
    retract_fn: Callable[[Any, Any], Any],
    state0: Any,
    tangent_template: Any,
    *,
    max_iterations: int = 10,
    cg_iterations: int = 50,
    cg_tolerance: float = 1e-8,
    init_lambda_factor: float = 1e-3,
    lambda_min: float = 1e-12,
    weight_fn: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    lam0=None,
):
    """Minimize 0.5·Σ w(r)·r² over a manifold state.

    residual_fn(state) -> flat (or any-pytree) residual array; entries for
    invalid/padded terms must be zero (masked inside residual_fn).
    retract_fn(state, tangent) -> new state; tangent_template gives the
    tangent pytree structure (zeros).
    weight_fn: optional IRLS weights from *squared* residuals (e.g. Huber);
    weights are frozen per outer iteration (standard IRLS linearization).

    Fully jittable; runs a lax.while_loop over LM iterations.
    """

    def cost_of(state):
        r = residual_fn(state)
        sq = r * r
        if weight_fn is None:
            return 0.5 * jnp.sum(sq)
        # cost uses the robust cost, not w·r² (matches reference semantics)
        return jnp.sum(0.5 * weight_fn(sq) * sq)

    def lin_residual(state):
        def f(tangent):
            return residual_fn(retract_fn(state, tangent))

        return f

    def one_iteration(carry):
        state, lam, cost, it, done = carry
        f = lin_residual(state)
        zeros = _tree_zeros_like(tangent_template)
        r, pullback = jax.vjp(f, zeros)
        if weight_fn is None:
            w = jnp.ones_like(r)
        else:
            w = weight_fn(r * r)

        def gn_matvec(v):
            _, jv = jax.jvp(f, (zeros,), (v,))
            (jtjv,) = pullback(w * jv)
            return jtjv

        (grad,) = pullback(w * r)  # Jᵀ W r

        # λ init from mean diagonal of JᵀWJ estimated by |grad| scale-free
        # alternative: use the Gauss-Newton matvec with a ones-vector probe.
        ones = jax.tree_util.tree_map(jnp.ones_like, zeros)
        diag_proxy = _tree_dot(ones, gn_matvec(ones))
        n_params = sum(
            x.size for x in jax.tree_util.tree_leaves(tangent_template)
        )
        lam = jnp.where(
            lam < 0,
            init_lambda_factor * jnp.abs(diag_proxy) / jnp.maximum(n_params, 1),
            lam,
        )

        def damped_matvec(v):
            return _tree_axpy(lam, v, gn_matvec(v))

        # CG solve: (JᵀWJ + λI) δ = −grad
        b = _tree_scale(-1.0, grad)
        x = _tree_zeros_like(b)
        rr = b
        p = rr
        rs = _tree_dot(rr, rr)

        def cg_body(c):
            x, rr, p, rs, k = c
            ap = damped_matvec(p)
            alpha = rs / jnp.maximum(_tree_dot(p, ap), 1e-30)
            x = _tree_axpy(alpha, p, x)
            rr = _tree_axpy(-alpha, ap, rr)
            rs_new = _tree_dot(rr, rr)
            beta = rs_new / jnp.maximum(rs, 1e-30)
            p = _tree_axpy(beta, p, rr)
            return x, rr, p, rs_new, k + 1

        def cg_cond(c):
            _, _, _, rs_c, k = c
            return (k < cg_iterations) & (rs_c > cg_tolerance * cg_tolerance)

        x, _, _, _, _ = jax.lax.while_loop(
            cg_cond, cg_body, (x, rr, p, rs, jnp.int32(0))
        )

        test_state = retract_fn(state, x)
        test_cost = cost_of(test_state)
        accept = test_cost < cost
        # relative improvement measured against the pre-update cost
        rel_impr = (cost - test_cost) / jnp.maximum(cost, 1e-30)
        state = jax.tree_util.tree_map(
            lambda a, b_: jnp.where(accept, b_, a), state, test_state
        )
        cost = jnp.where(accept, test_cost, cost)
        lam = jnp.maximum(
            jnp.where(accept, 0.5 * lam, 2.0 * lam), lambda_min
        )
        # done on runaway lambda (many rejects) or a converged accept
        done = done | ((~accept) & (lam > 1e8)) | (accept & (rel_impr < 1e-9))
        return state, lam, cost, it + 1, done

    def cond(carry):
        _, _, _, it, done = carry
        return (it < max_iterations) & (~done)

    cost0 = cost_of(state0)
    lam_init = jnp.asarray(-1.0 if lam0 is None else lam0, cost0.dtype)
    state, lam, cost, it, _ = jax.lax.while_loop(
        cond,
        one_iteration,
        (state0, lam_init, cost0, jnp.int32(0), jnp.asarray(False)),
    )
    return LMResult(state=state, cost=cost, iterations=it, lam=lam)
