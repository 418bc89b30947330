"""Minimal pytree-dataclass helper.

All SoA containers in this framework (rays, hits, triangles, BVH nodes, ...)
are frozen dataclasses registered as JAX pytrees so they flow through
``jit`` / ``vmap`` / ``pjit`` / ``lax.scan`` transparently.  Fields whose name
is listed in ``meta_fields`` are treated as static (hashable) auxiliary data.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax


def pytree_dataclass(cls=None, *, meta_fields: Sequence[str] = ()):
    """Decorator: frozen dataclass registered as a JAX pytree.

    ``meta_fields`` become static aux data (they must be hashable and are
    baked into the jit cache key); everything else is a traced leaf.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = [f.name for f in dataclasses.fields(c) if f.name not in meta_fields]
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=list(meta_fields)
        )

        def _replace(self, **kw):
            return dataclasses.replace(self, **kw)

        c.replace = _replace
        return c

    if cls is None:
        return wrap
    return wrap(cls)
