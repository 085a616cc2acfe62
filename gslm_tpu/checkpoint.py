"""Training checkpoints (capture/restore).

Equivalent of the reference's ``torch.save((gaussians.capture(), iteration),
chkpnt<it>.pth)`` (train.py:188-190, gaussian_model.py:158-190): the full
training state — parameter pytree, aux (alive mask, densification stats),
Adam moments, iteration — as one .npz of named leaves (no pickle). PLY
export (the interchange format) is handled by Scene.save.

For multi-chip/multi-host state the orbax-backed pair
``save_checkpoint_sharded`` / ``load_checkpoint_sharded`` writes each
shard from its owning devices (no host gather of the full model) and
restores directly into a target sharding — the distributed analog the
reference cannot need (single GPU). The npz format stays the portable
single-host interchange."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from gslm_tpu.models.gaussians import GaussianAux, GaussianParams
from gslm_tpu.optim import AdamState


def _flatten(prefix: str, tree) -> dict[str, np.ndarray]:
    leaves = {}
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        key = prefix + "/".join(str(getattr(p, "name", getattr(p, "idx", p)))
                                for p in path)
        leaves[key] = np.asarray(leaf)
    return leaves


def save_checkpoint(path: str, params: GaussianParams, aux: GaussianAux,
                    opt_state: AdamState, iteration: int,
                    spatial_lr_scale: float = 1.0):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = {}
    data.update(_flatten("params/", params))
    data.update(_flatten("aux/", aux))
    data.update(_flatten("opt/", opt_state))
    data["iteration"] = np.asarray(iteration)
    data["spatial_lr_scale"] = np.asarray(spatial_lr_scale)
    data["sh_degree"] = np.asarray(params.sh_degree)
    np.savez(path, **data)


def load_checkpoint(path: str):
    """→ (params, aux, opt_state, iteration, spatial_lr_scale)."""
    z = np.load(path)
    sh_degree = int(z["sh_degree"])

    def group(prefix, cls, **extra):
        fields = {k[len(prefix):]: jnp.asarray(v) for k, v in z.items()
                  if k.startswith(prefix)}
        return fields | extra

    pf = group("params/", GaussianParams)
    params = GaussianParams(sh_degree=sh_degree, **pf)
    aux = GaussianAux(**group("aux/", GaussianAux))

    opt_fields = group("opt/", AdamState)
    mu = GaussianParams(sh_degree=sh_degree, **{
        k[len("mu/"):]: v for k, v in opt_fields.items() if k.startswith("mu/")})
    nu = GaussianParams(sh_degree=sh_degree, **{
        k[len("nu/"):]: v for k, v in opt_fields.items() if k.startswith("nu/")})
    opt_state = AdamState(mu=mu, nu=nu, step=opt_fields["step"])
    return (params, aux, opt_state, int(z["iteration"]),
            float(z["spatial_lr_scale"]))


# ---------------------------------------------------------------------------
# sharded checkpoints (orbax): multi-chip/multi-host state
# ---------------------------------------------------------------------------
def _as_dicts(params, aux, opt_state):
    from gslm_tpu.models.gaussians import PARAM_GROUPS
    p = {g: getattr(params, g) for g in PARAM_GROUPS}
    a = {k: getattr(aux, k)
         for k in ("alive", "max_radii2d", "xyz_gradient_accum", "denom")}
    o = {"mu": {g: getattr(opt_state.mu, g) for g in PARAM_GROUPS},
         "nu": {g: getattr(opt_state.nu, g) for g in PARAM_GROUPS},
         "step": opt_state.step}
    return {"params": p, "aux": a, "opt": o}


def save_checkpoint_sharded(path: str, params: GaussianParams,
                            aux: GaussianAux, opt_state: AdamState,
                            iteration: int, spatial_lr_scale: float = 1.0):
    """Write the (possibly mesh-sharded) training state with orbax: every
    process writes only its addressable shards — no host gather of the
    full model. ``path`` is a directory."""
    import orbax.checkpoint as ocp

    state = _as_dicts(params, aux, opt_state)

    def spec_of(tree):
        if isinstance(tree, dict):
            return {k: spec_of(v) for k, v in tree.items()}
        return [list(np.shape(tree)), str(tree.dtype)]

    meta = {"iteration": int(iteration),
            "spatial_lr_scale": float(spatial_lr_scale),
            "sh_degree": int(params.sh_degree),
            "tree": spec_of(state)}
    with ocp.Checkpointer(ocp.CompositeCheckpointHandler()) as ckptr:
        ckptr.save(os.path.abspath(path),
                   args=ocp.args.Composite(
                       state=ocp.args.StandardSave(state),
                       meta=ocp.args.JsonSave(meta)),
                   force=True)


def load_checkpoint_sharded(path: str, mesh=None):
    """Restore a sharded checkpoint. With ``mesh`` given, leaves restore
    DIRECTLY into the canonical (data, model) layouts (parallel/mesh.py:
    per-Gaussian leaves P("model"), exposure/step replicated) — each
    process reads only its shards. Without a mesh, arrays restore onto
    the default device.

    -> (params, aux, opt_state, iteration, spatial_lr_scale)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.Checkpointer(ocp.CompositeCheckpointHandler()) as ckptr:
        meta = ckptr.restore(
            path, args=ocp.args.Composite(
                meta=ocp.args.JsonRestore()))["meta"]
        if mesh is None:
            state = ckptr.restore(
                path, args=ocp.args.Composite(
                    state=ocp.args.StandardRestore()))["state"]
        else:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P
            gshard = NamedSharding(mesh, P("model"))
            rshard = NamedSharding(mesh, P())

            def shard_for(keypath):
                name = keypath[-1]
                return rshard if name in ("exposure", "step") else gshard

            def target_of(tree, keypath=()):
                if isinstance(tree, dict):
                    return {k: target_of(v, keypath + (k,))
                            for k, v in tree.items()}
                shape, dtype = tree
                return jax.ShapeDtypeStruct(
                    tuple(shape), np.dtype(dtype),
                    sharding=shard_for(keypath))

            state = ckptr.restore(
                path, args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(
                        target_of(meta["tree"]))))["state"]

    sh_degree = int(meta["sh_degree"])
    params = GaussianParams(sh_degree=sh_degree, **state["params"])
    aux = GaussianAux(**state["aux"])
    opt_state = AdamState(
        mu=GaussianParams(sh_degree=sh_degree, **state["opt"]["mu"]),
        nu=GaussianParams(sh_degree=sh_degree, **state["opt"]["nu"]),
        step=state["opt"]["step"])
    return (params, aux, opt_state, int(meta["iteration"]),
            float(meta["spatial_lr_scale"]))
