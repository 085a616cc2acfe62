"""Native library (C++/ctypes) parity tests vs the Python/JAX paths."""

import numpy as np
import pytest

from gslm_tpu import native

pytestmark = pytest.mark.smoke  # layer smoke set (README)


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_knn_matches_bruteforce(lib_ok, rng):
    pts = rng.normal(0, 1, (500, 3)).astype(np.float32)
    got = native.mean_sq_dist_3nn(pts)
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    ref = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_knn_matches_jax(lib_ok, rng):
    import jax.numpy as jnp

    from gslm_tpu.ops.knn import mean_sq_dist_3nn as jax_knn
    pts = rng.uniform(-2, 2, (1200, 3)).astype(np.float32)
    got = native.mean_sq_dist_3nn(pts)
    ref = np.asarray(jax_knn(jnp.asarray(pts)))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_points3d_parser_matches_python(lib_ok, tmp_path, rng):
    from gslm_tpu.data import colmap
    n = 257
    xyz = rng.normal(0, 1, (n, 3))
    rgb = (rng.uniform(0, 255, (n, 3))).astype(np.uint8)
    err = rng.uniform(0, 1, n)
    path = str(tmp_path / "points3D.bin")
    colmap.write_points3d_binary(xyz, rgb, err, path)

    fast = native.parse_points3d_bin(path)
    assert fast is not None
    np.testing.assert_allclose(fast[0], xyz)
    np.testing.assert_array_equal(fast[1], rgb)
    np.testing.assert_allclose(fast[2], err)
