"""Lightweight pytree dataclasses.

The framework's core state objects (Gaussian parameters, camera batches,
render outputs, solver states) are immutable dataclasses registered as JAX
pytrees so they flow through jit/jvp/vjp/shard_map natively. This replaces the
reference's mutable ``GaussianModel`` attribute soup and its hand-rolled
generalized-vector classes (reference: solver/gaussian_model_state.py,
solver/loss_image_state.py) with standard pytree algebra.
"""

from __future__ import annotations

import dataclasses
from typing import TypeVar

import jax

_T = TypeVar("_T")


def pytree_dataclass(cls=None, *, static_fields: tuple[str, ...] = ()):
    """Decorator: frozen dataclass registered as a JAX pytree.

    ``static_fields`` are treated as aux data (compile-time constants); all
    other fields are pytree children.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = tuple(
            f.name for f in dataclasses.fields(c) if f.name not in static_fields
        )
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=tuple(static_fields)
        )

        def replace(self, **kwargs):
            return dataclasses.replace(self, **kwargs)

        c.replace = replace
        return c

    if cls is None:
        return wrap
    return wrap(cls)
