"""Training checkpoints (capture/restore).

Equivalent of the reference's ``torch.save((gaussians.capture(), iteration),
chkpnt<it>.pth)`` (train.py:188-190, gaussian_model.py:158-190): the full
training state — parameter pytree, aux (alive mask, densification stats),
Adam moments, iteration — as one .npz of named leaves (no pickle). PLY
export (the interchange format) is handled by Scene.save."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from gslm_tpu.models.gaussians import GaussianAux, GaussianParams, init_aux
from gslm_tpu.optim import AdamState, init_adam


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
