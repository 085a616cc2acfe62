"""Mesh construction and named shardings for every framework state pytree.

Layouts (mesh axes ``("data", "model")``):

  GaussianParams   per-Gaussian groups → P("model") on the capacity axis;
                   ``exposure`` (per-image, tiny) replicated.
  GaussianAux      all (C,) arrays → P("model").
  AdamState        moments mirror GaussianParams; step counter replicated.
  CameraBatch      every leaf → P("data") on the view axis.

The capacity axis must be divisible by the model-axis size and the view
batch by the data-axis size — both are padding knobs the caller controls
(capacity is already lane-padded, see models/gaussians.py:round_capacity).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from gslm_tpu.models.gaussians import PARAM_GROUPS, GaussianParams
from gslm_tpu.optim import AdamState


def maybe_initialize_distributed() -> bool:
    """Multi-host wiring (SURVEY §5.8): initialize the JAX distributed
    runtime when the standard coordinator env vars (or GSLM_DIST=1) are
    present, so ``jax.devices()`` spans every process and the meshes built
    below become process-spanning — GSPMD/shard_map collectives then ride
    ICI within a slice and DCN across slices with no further code changes.

    Trigger env (either set explicitly or injected by the launcher):
      JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
      (jax.distributed.initialize reads these), or GSLM_DIST=1 on TPU
      pods where initialize() autodetects everything.

    Returns True if the distributed runtime was (already) initialized.
    Call once, before any backend touch; safe to call when single-process
    (no-op). scripts/smoke_multihost.py exercises the 2-process CPU path.
    """
    import os
    if jax._src.distributed.global_state.client is not None:  # already up
        return True
    want = (os.environ.get("GSLM_DIST") == "1"
            or "JAX_COORDINATOR_ADDRESS" in os.environ)
    if not want:
        return False
    kwargs = {}
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kwargs = dict(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]))
        if os.environ.get("JAX_LOCAL_DEVICE_IDS"):
            kwargs["local_device_ids"] = [
                int(i) for i in
                os.environ["JAX_LOCAL_DEVICE_IDS"].split(",")]
    jax.distributed.initialize(**kwargs)
    return True


def make_mesh(n_data: int | None = None, n_model: int | None = None,
              devices=None) -> Mesh:
    """Build a (data, model) mesh.

    With no sizes given, all devices go to the data axis (pure view
    parallelism — the right default for 3DGS where P fits one chip's HBM).
    """
    devices = list(devices if devices is not None else jax.devices())
    total = len(devices)
    if n_data is None and n_model is None:
        n_data, n_model = total, 1
    elif n_data is None:
        assert total % n_model == 0
        n_data = total // n_model
    elif n_model is None:
        assert total % n_data == 0
        n_model = total // n_data
    assert n_data * n_model <= total, \
        f"mesh {n_data}x{n_model} needs more than {total} devices"
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _gauss(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("model"))


def params_sharding(mesh: Mesh, like: GaussianParams) -> GaussianParams:
    """A GaussianParams-shaped pytree of NamedShardings.

    Built from a concrete instance so static fields (sh_degree) — which are
    part of the treedef — match when the tree is used as in_shardings."""
    g, r = _gauss(mesh), replicated(mesh)
    return like.replace(**({grp: g for grp in PARAM_GROUPS
                            if grp != "exposure"} | {"exposure": r}))


def aux_sharding(mesh: Mesh):
    from gslm_tpu.models.gaussians import GaussianAux
    g = _gauss(mesh)
    return GaussianAux(alive=g, max_radii2d=g, xyz_gradient_accum=g, denom=g)


def adam_sharding(mesh: Mesh, like: AdamState) -> AdamState:
    return AdamState(mu=params_sharding(mesh, like.mu),
                     nu=params_sharding(mesh, like.nu),
                     step=replicated(mesh))


def camera_sharding(mesh: Mesh, camera_batch):
    """Every CameraBatch leaf sharded on its leading (view) axis."""
    d = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda _: d, camera_batch)


def shard_state(mesh: Mesh, params, aux=None, opt_state=None):
    """device_put the training state onto the mesh with canonical layouts.

    The capacity axis must divide evenly by the model-axis size."""
    m = mesh.shape["model"]
    assert params.capacity % m == 0, \
        f"capacity {params.capacity} not divisible by model axis {m}"
    out = [jax.device_put(params, params_sharding(mesh, params))]
    if aux is not None:
        out.append(jax.device_put(aux, aux_sharding(mesh)))
    if opt_state is not None:
        out.append(jax.device_put(opt_state, adam_sharding(mesh, opt_state)))
    return out[0] if len(out) == 1 else tuple(out)
