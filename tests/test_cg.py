"""CGLS solver tests vs dense numpy ground truth (the reference validates
its CG recurrence the same way: solver/test.py random 20x10 system,
solver/test_cg.py synthetic Gauss-Newton)."""

import jax
import jax.numpy as jnp
import numpy as np

from gslm_tpu.solver.cg import cgls_damped, cgls_damped_unrolled, conjugate_gradient

import pytest

pytestmark = pytest.mark.smoke  # layer smoke set (README)


def vec_dot(a, b, damp=1.0):
    return damp * jnp.vdot(a, b)


def vec_saxpy(a, x, y):
    return a * x + y


def test_cg_spd(rng):
    n = 12
    m = rng.normal(size=(n, n))
    a = m @ m.T + n * np.eye(n)
    b = rng.normal(size=n)
    aj = jnp.asarray(a, jnp.float64) if jax.config.jax_enable_x64 else jnp.asarray(a, jnp.float32)
    bj = jnp.asarray(b, jnp.float32)
    x = conjugate_gradient(lambda v: aj.astype(v.dtype) @ v, vec_dot, vec_saxpy,
                           lambda s, v: s * v, bj, jnp.zeros(n, jnp.float32),
                           max_iter=200, tol=1e-12)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(a, b), rtol=1e-4)


def test_cgls_damped_matches_dense(rng):
    m, n = 20, 10
    a = rng.normal(size=(m, n)).astype(np.float32)
    b = rng.normal(size=m).astype(np.float32)
    damp = 0.3
    aj, bj = jnp.asarray(a), jnp.asarray(b)

    x = cgls_damped(matvec=lambda v: aj @ v, matvec_T=lambda u: aj.T @ u,
                    dot=vec_dot, saxpy=vec_saxpy, b=bj,
                    x0=jnp.zeros(n, jnp.float32), damp=damp,
                    max_iter=100, restart_iter=10, check_divergence=False)
    x_exact = np.linalg.solve(a.T @ a + damp * np.eye(n), a.T @ b)
    np.testing.assert_allclose(np.asarray(x), x_exact, rtol=1e-3, atol=1e-5)


def test_cgls_unrolled_matches_host(rng):
    m, n = 16, 8
    a = rng.normal(size=(m, n)).astype(np.float32)
    b = rng.normal(size=m).astype(np.float32)
    damp = 0.5
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    kw = dict(matvec=lambda v: aj @ v, matvec_T=lambda u: aj.T @ u,
              dot=vec_dot, saxpy=vec_saxpy, b=bj,
              x0=jnp.zeros(n, jnp.float32), damp=damp)

    x_host = cgls_damped(**kw, max_iter=4, restart_iter=2,
                         check_divergence=True)
    x_jit = jax.jit(lambda b_: cgls_damped_unrolled(
        kw["matvec"], kw["matvec_T"], vec_dot, vec_saxpy,
        lambda x: damp * x, b_, kw["x0"], damp,
        max_iter=4, restart_iter=2, check_divergence=True))(bj)
    np.testing.assert_allclose(np.asarray(x_jit), np.asarray(x_host),
                               rtol=1e-5, atol=1e-6)


def test_cgls_lm_defaults_reduce_residual(rng):
    """With the reference LM defaults (max_iter=2, restart_iter=1), one CGLS
    call must reduce ‖Ax−b‖² + damp‖x‖² from x0=0."""
    m, n = 30, 12
    a = rng.normal(size=(m, n)).astype(np.float32)
    b = rng.normal(size=m).astype(np.float32)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    damp = 0.05
    x = cgls_damped_unrolled(lambda v: aj @ v, lambda u: aj.T @ u, vec_dot,
                             vec_saxpy, lambda x_: damp * x_, bj,
                             jnp.zeros(n, jnp.float32), damp,
                             max_iter=2, restart_iter=1)
    res0 = float(jnp.vdot(bj, bj))
    r = aj @ x - bj
    res = float(jnp.vdot(r, r) + damp * jnp.vdot(x, x))
    assert res < res0
