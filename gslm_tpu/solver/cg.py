"""Conjugate-gradient solvers over generalized (pytree) vectors.

Re-implements the reference's operator-agnostic solvers
(solver/conjugate_gradient.py): textbook CG (``conjugate_gradient``, :3-49)
and damped CGLS with periodic restart (``cgls_damped``, :51-127) — normal
equations CG on min ‖Ax−b‖² + xᵀDx where A is only available through
matvec/matvec_T callables and D through a damped dot product.

Two drivers share the same recurrence:

- ``cgls_damped``: host-side loop, feature-parity with the reference
  (per-iteration true-residual recompute, divergence guard, early
  termination, verbose printing). Any iteration count; scalars sync to host
  once per iteration.
- ``cgls_damped_unrolled``: pure function for use *inside* jit/pjit —
  iterations are statically unrolled (LM uses max_iter=2, train_jvp.py:255),
  all scalars stay on-device, and termination is a ``done`` flag that
  freezes the iterate, so the whole LM step (render + JVP + VJP + CG)
  compiles to a single XLA program with zero host syncs. This removes the
  reference's per-iteration ``.item()`` syncs
  (gaussian_model_state.py:252-273) and makes the divergence check's extra
  matvec optional.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp


def conjugate_gradient(matvec, dot, saxpy, scale, b, x0, tol=1e-10, atol=0.0,
                       max_iter=1000, callback=None, verbose=False):
    """Textbook CG for SPD systems (host driver)."""
    x = x0
    r = saxpy(-1.0, matvec(x), b)
    p = r
    rs_old = float(dot(r, r))
    if math.sqrt(rs_old) < atol:
        return x
    norm_r0 = math.sqrt(rs_old)
    for k in range(max_iter):
        ap = matvec(p)
        alpha = rs_old / float(dot(p, ap))
        x = saxpy(alpha, p, x)
        r = saxpy(-alpha, ap, r)
        rs_new = float(dot(r, r))
        if verbose:
            print(f"[Iter {k + 1}] residual norm: {math.sqrt(rs_new):.2e}")
        if callback:
            callback(x, r, k + 1)
        if math.sqrt(rs_new) < max(tol * norm_r0, atol):
            break
        p = saxpy(rs_new / rs_old, p, r)
        rs_old = rs_new
    return x


def cgls_damped(matvec: Callable, matvec_T: Callable, dot: Callable,
                saxpy: Callable, b, x0, damp=0.0, dampmul: Callable | None = None,
                tol=1e-10, atol=0.0, max_iter=1000, restart_iter=5,
                callback=None, verbose=False, check_divergence=True):
    """Damped CGLS, host driver (reference conjugate_gradient.py:51-127).

    Interfaces (matching the reference's protocol):
      matvec(x)        A·x       params-space → residual-space
      matvec_T(r)      Aᵀ·r      residual-space → params-space
      dot(u, v, damp=1.0)        damped dot; works in both spaces (damp
                                 applies per parameter group)
      saxpy(a, x, y)   a·x + y   in either space
      dampmul(x)       D·x       explicit damping product; defaults to
                                 scalar ``damp``·x via saxpy.
    """
    if dampmul is None:
        assert not isinstance(damp, dict), "per-group damp needs explicit dampmul"
        dampmul = lambda x: saxpy(damp - 1.0, x, x)  # damp*x via a*x+y

    x = x0
    iter_total = 0
    last_res = math.inf
    break_flag = False

    while iter_total < max_iter:
        if verbose:
            print(f"Restarting CG at iteration {iter_total + 1}...")
        r = saxpy(-1.0, matvec(x), b)               # r = b - A x
        s = saxpy(-1.0, dampmul(x), matvec_T(r))    # s = Aᵀ r - D x
        p = s
        gamma = float(dot(s, s))

        for _ in range(restart_iter):
            q = matvec(p)
            delta = float(dot(q, q)) + float(dot(p, p, damp))
            if delta < 1e-20:
                if verbose:
                    print("Early termination: delta too small.")
                break_flag = True
                break
            alpha = gamma / delta
            x = saxpy(alpha, p, x)
            r = saxpy(-alpha, q, r)
            s = saxpy(-1.0, dampmul(x), matvec_T(r))
            gamma_prev = gamma
            gamma = float(dot(s, s))
            p = saxpy(gamma / gamma_prev, p, s)

            if check_divergence:
                cur_r = saxpy(-1.0, matvec(x), b)
                res = float(dot(cur_r, cur_r)) + float(dot(x, x, damp))
                if verbose:
                    print(f"[Iter {iter_total + 1}] res: {res:.2e}")
                if res > last_res:
                    if verbose:
                        print("Warning: residual norm increased!")
                    break_flag = True
                    break
                last_res = res

            if gamma < max(tol * math.sqrt(gamma_prev), atol):
                break_flag = True
                break

            iter_total += 1
            if iter_total >= max_iter:
                break_flag = True
                break

        if break_flag:
            break
    return x


def cgls_damped_unrolled(matvec, matvec_T, dot, saxpy, dampmul, b, x0, damp,
                         max_iter: int, restart_iter: int, tol=1e-10,
                         check_divergence: bool = True):
    """Jit-friendly CGLS: same recurrence, statically unrolled, termination
    via an on-device ``done`` mask that freezes the iterate. Designed to be
    traced inside one jit (the LM outer step)."""

    def where_tree(pred, new, old):
        return jax.tree.map(lambda n, o: jnp.where(pred, n, o), new, old)

    x = x0
    done = jnp.asarray(False)
    last_res = jnp.asarray(jnp.inf, jnp.float32)

    iters_left = max_iter
    while iters_left > 0:
        block = min(restart_iter, iters_left)
        # restart
        r = saxpy(-1.0, matvec(x), b)
        s = saxpy(-1.0, dampmul(x), matvec_T(r))
        p = s
        gamma = dot(s, s)

        for _ in range(block):
            q = matvec(p)
            delta = dot(q, q) + dot(p, p, damp)
            step_ok = jnp.logical_not(done) & (delta >= 1e-20)
            alpha = jnp.where(step_ok, gamma / jnp.maximum(delta, 1e-30), 0.0)
            x_new = saxpy(alpha, p, x)
            r = saxpy(-alpha, q, r)
            s = saxpy(-1.0, dampmul(x_new), matvec_T(r))
            gamma_prev = gamma
            gamma_new = dot(s, s)
            p = saxpy(jnp.where(step_ok, gamma_new / jnp.maximum(gamma_prev, 1e-30),
                                0.0), p, s)

            if check_divergence:
                cur_r = saxpy(-1.0, matvec(x_new), b)
                res = dot(cur_r, cur_r) + dot(x_new, x_new, damp)
                diverged = res > last_res
                # a diverged step is rolled back (reference keeps the
                # pre-divergence x because it breaks before overwriting —
                # it breaks *after* overwriting x; match that: keep x_new
                # but stop further iterations)
                last_res = jnp.where(step_ok & ~diverged, res, last_res)
                done = done | (step_ok & diverged)

            x = where_tree(step_ok, x_new, x)
            gamma = jnp.where(step_ok, gamma_new, gamma)
            done = done | (delta < 1e-20) | (gamma < tol * jnp.sqrt(
                jnp.maximum(gamma_prev, 0.0)))
            iters_left -= 1
            if iters_left == 0:
                break
    return x
