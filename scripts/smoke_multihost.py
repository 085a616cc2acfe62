"""Two-process CPU smoke of the multi-host wiring (SURVEY §5.8).

Launches itself twice with jax.distributed coordinator env vars, builds a
process-spanning (data, model) mesh over 2 processes x 4 virtual CPU
devices, and runs a sharded train step — validating that
maybe_initialize_distributed + make_mesh + make_sharded_train_step work
across process boundaries. Real pods only change the device count.

Usage: python scripts/smoke_multihost.py          # parent: spawns workers
       (workers are re-invoked with JAX_PROCESS_ID set)
"""
from __future__ import annotations

import os
import subprocess
import sys


def worker():
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from gslm_tpu.parallel.mesh import maybe_initialize_distributed

    assert maybe_initialize_distributed(), "distributed init did not trigger"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    import jax.numpy as jnp
    import numpy as np

    from gslm_tpu import config as cfg_mod
    from gslm_tpu.optim import init_adam
    from gslm_tpu.ops.rasterize_tiled import RasterConfig
    from gslm_tpu.parallel import (camera_sharding, make_mesh,
                                   make_sharded_train_step, shard_state)
    from gslm_tpu.utils.synthetic import random_gaussians, ring_camera_batch

    rng = np.random.default_rng(3)
    params, aux = random_gaussians(rng, n=48, capacity=256, num_images=4)
    cams = ring_camera_batch(4, 32, 32)
    rcfg = RasterConfig(dup_capacity=1 << 12, max_per_tile=128, tile_chunk=4)
    opt = cfg_mod.OptimizationParams()
    opt_state = init_adam(params)
    bg = jnp.zeros(3)

    mesh = make_mesh(4, 2)
    # multi-host: build globally-sharded arrays from per-process data
    s_params, s_aux, s_opt = shard_state(mesh, params, aux, opt_state)
    s_cams = jax.device_put(cams, camera_sharding(mesh, cams))
    step_fn = make_sharded_train_step(
        mesh, s_params, s_aux, s_opt, s_cams, rcfg=rcfg, opt=opt,
        active_sh_degree=3, use_exp=False, sparse_adam=False,
        update_stats=True)
    p2, a2, o2, m = step_fn(s_params, s_aux, s_opt, s_cams, bg,
                            jnp.int32(1), jnp.float32(1.0), jnp.float32(0.0))
    loss = float(m["loss"])
    assert np.isfinite(loss), loss
    if jax.process_index() == 0:
        print(f"MULTIHOST SMOKE OK: 2 processes, mesh {dict(mesh.shape)}, "
              f"loss {loss:.6f}")


def parent():
    env = dict(os.environ)
    env.update(JAX_COORDINATOR_ADDRESS="127.0.0.1:29701",
               JAX_NUM_PROCESSES="2")
    procs = []
    for pid in range(2):
        e = dict(env, JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker"], env=e))
    rcs = [p.wait(timeout=600) for p in procs]
    assert rcs == [0, 0], rcs
    print("parent: both workers exited 0")


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    else:
        parent()
