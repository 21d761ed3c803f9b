"""Dense-blocked Levenberg-Marquardt on manifolds — the factor-graph solver.

TPU-native replacement for the vendored g2o optimizer stack
(object_slam/Thirdparty/g2o: SparseOptimizer + BlockSolverX +
LinearSolverDense + OptimizationAlgorithmLevenberg). Instead of virtual
computeError calls over a pointer graph, a problem is:

  * `params`        — any pytree of state arrays (poses, cuboids, points),
  * `retract_fn`    — params x flat tangent (D,) -> params (manifold update;
                      fixed/padded coordinates are masked out),
  * `residual_fn`   — params -> whitened residual vector (R,)
                      (sqrt-information already applied; padded residuals 0).

One LM iteration builds J by forward-mode autodiff of the residual at the
zero tangent (replacing g2o's hand-written/numeric Jacobians), forms the
normal equations densely, solves by Cholesky with g2o's Levenberg damping
policy (tau * max diag init, rho-gated lambda updates —
g2o/core/optimization_algorithm_levenberg.cpp), and accepts or rejects the
step. Everything runs under jit with static shapes; `num_iters` is the
outer iteration count like `SparseOptimizer::optimize(n)`.

Scaling: residuals are embarrassingly parallel across edges — shard the
edge arrays over a device mesh and psum the (H, g) contributions (see
parallel/). The dense solve stays replicated (graph states are small
relative to measurements, the classic Schur setting).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LMResult(NamedTuple):
    params: object
    chi2: jnp.ndarray          # final cost
    chi2_history: jnp.ndarray  # (num_iters + 1,)
    lam_final: jnp.ndarray


def lm_optimize(
    residual_fn: Callable,
    retract_fn: Callable,
    params,
    dim: int,
    num_iters: int = 10,
    tau: float = 1e-5,
    param_mask=None,
    diag_damping: bool = False,
):
    """Run LM. dim = tangent dimension D (static). param_mask: (D,) bool —
    False coordinates are frozen (fixed vertices / padding).

    Returns LMResult. Jit-safe; differentiable in principle (pure lax ops).
    """
    if param_mask is None:
        param_mask = jnp.ones((dim,), dtype=bool)
    mask_f = param_mask.astype(jnp.float32)

    def whitened(params, dx):
        return residual_fn(retract_fn(params, dx * mask_f))

    zero_dx = jnp.zeros((dim,), dtype=jnp.float32)

    def chi2_of(params):
        r = residual_fn(params)
        return jnp.sum(r * r)

    def build_normal_eqs(params):
        r = whitened(params, zero_dx)
        J = jax.jacfwd(lambda dx: whitened(params, dx))(zero_dx)  # (R, D)
        g = J.T @ r
        H = J.T @ J
        return r, J, g, H

    def solve(H, g, lam):
        if diag_damping:
            damp = lam * jnp.diag(H)
        else:
            damp = lam * jnp.ones((dim,), dtype=H.dtype)
        # freeze masked-out coordinates with a unit diagonal
        A = H + jnp.diag(damp + (1.0 - mask_f))
        A = mask_f[:, None] * A * mask_f[None, :] + jnp.diag(1.0 - mask_f)
        L, low = jax.scipy.linalg.cho_factor(A, lower=True)
        dx = jax.scipy.linalg.cho_solve((L, low), -g * mask_f)
        return dx * mask_f

    def body(i, state):
        params, lam, ni, chi2, hist = state
        r, J, g, H = build_normal_eqs(params)
        # initial lambda on the first pass: tau * max diag(H) at the initial
        # params (g2o computeLambdaInit). Computing it here — instead of with
        # a second build_normal_eqs outside the loop — keeps ONE copy of the
        # (expensive-to-compile) Jacobian graph in the program; H at i==0 is
        # the same H the pre-loop evaluation would have produced.
        lam0 = tau * jnp.max(jnp.diag(H) * mask_f)
        lam0 = jnp.where(lam0 > 0, lam0, tau)
        lam = jnp.where(i == 0, lam0, lam)
        dx = solve(H, g, lam)
        new_params = retract_fn(params, dx)
        new_chi2 = chi2_of(new_params)
        # g2o rho gain: (chi2 - new) / (dx^T (lam dx - g))
        denom = jnp.dot(dx, lam * dx - g) + 1e-12
        rho = (chi2 - new_chi2) / denom
        accept = (new_chi2 < chi2) & jnp.isfinite(new_chi2)

        lam_acc = lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam_rej = lam * ni
        lam_next = jnp.where(accept, lam_acc, lam_rej)
        ni_next = jnp.where(accept, 2.0, ni * 2.0)
        params_next = jax.tree.map(
            lambda new, old: jnp.where(accept, new, old), new_params, params
        )
        chi2_next = jnp.where(accept, new_chi2, chi2)
        hist = hist.at[i + 1].set(chi2_next)
        return params_next, lam_next, ni_next, chi2_next, hist

    chi2_0 = chi2_of(params)
    hist0 = jnp.zeros((num_iters + 1,), dtype=jnp.float32).at[0].set(chi2_0)
    params, lam, _, chi2, hist = jax.lax.fori_loop(
        0, num_iters, body, (params, jnp.float32(tau), 2.0, chi2_0, hist0)
    )
    return LMResult(params=params, chi2=chi2, chi2_history=hist, lam_final=lam)


def gauss_newton_step(residual_fn, retract_fn, params, dim, param_mask=None, damping=1e-6):
    """Single damped GN step (for well-conditioned inner loops)."""
    if param_mask is None:
        param_mask = jnp.ones((dim,), dtype=bool)
    mask_f = param_mask.astype(jnp.float32)
    zero_dx = jnp.zeros((dim,), dtype=jnp.float32)

    def whitened(dx):
        return residual_fn(retract_fn(params, dx * mask_f))

    r = whitened(zero_dx)
    J = jax.jacfwd(whitened)(zero_dx)
    g = J.T @ r
    H = J.T @ J + damping * jnp.eye(dim) + jnp.diag(1.0 - mask_f)
    L, low = jax.scipy.linalg.cho_factor(H, lower=True)
    dx = jax.scipy.linalg.cho_solve((L, low), -g * mask_f) * mask_f
    return retract_fn(params, dx), jnp.sum(r * r)
