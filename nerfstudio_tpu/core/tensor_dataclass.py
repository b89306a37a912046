"""Pytree-registered batched tensor dataclasses.

TPU-native re-design of the reference's ``TensorDataclass``
(reference: nerfstudio/utils/tensor_dataclass.py:27). Instead of a torch
``nn.Module``-adjacent container, this is a JAX pytree: every array field is a
leaf, so instances flow through ``jit`` / ``vmap`` / ``grad`` / ``pjit``
transparently and can be sharded over a ``jax.sharding.Mesh``.

Semantics preserved from the reference:
  * all array fields broadcast to a common batch shape on construction
  * fields may declare custom trailing (non-batch) dimensions
    (e.g. a camera-to-world matrix of shape ``(..., 3, 4)``)
  * indexing / reshape / flatten / broadcast_to operate on the batch shape
  * ``None`` fields and nested dicts of arrays are supported

Differences (deliberate, TPU-first):
  * immutable by convention — use ``.replace(**kw)`` instead of in-place
    mutation (XLA functional semantics)
  * no ``.to(device)`` — placement is governed by ``jax.device_put`` and
    sharding annotations
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple, TypeVar

import jax
import jax.numpy as jnp
import numpy as np

T = TypeVar("T", bound="TensorDataclass")

# Sentinel metadata key: fields marked static are stored in the pytree aux data
# (compile-time constants), not traced as leaves.
STATIC = {"pytree_node": False}


def static_field(**kwargs):
    """A dataclass field stored as pytree aux-data (static under jit)."""
    kwargs.setdefault("metadata", {})
    kwargs["metadata"] = {**kwargs["metadata"], **STATIC}
    return dataclasses.field(**kwargs)


def _is_array(x) -> bool:
    return isinstance(x, (jnp.ndarray, np.ndarray, jax.Array))


class TensorDataclass:
    """Base class. Subclass, decorate with ``@tensor_dataclass``.

    Class attribute ``_field_custom_dimensions: Dict[str, int]`` maps field
    name -> number of trailing dims excluded from the batch shape (default 1).
    """

    _field_custom_dimensions: Dict[str, int] = {}
    _shape: Tuple[int, ...]

    def __post_init__(self) -> None:
        batch_shapes = self._gather_batch_shapes()
        if batch_shapes:
            batch_shape = jnp.broadcast_shapes(*batch_shapes)
        else:
            batch_shape = ()
        object.__setattr__(self, "_shape", tuple(batch_shape))
        self._broadcast_fields(tuple(batch_shape))

    # -- shape bookkeeping -------------------------------------------------

    def _trailing(self, name: str) -> int:
        return self._field_custom_dimensions.get(name, 1)

    def _gather_batch_shapes(self):
        shapes = []
        for f in dataclasses.fields(self):  # type: ignore[arg-type]
            if f.metadata.get("pytree_node", True) is False:
                continue
            v = getattr(self, f.name)
            t = self._trailing(f.name)
            if _is_array(v):
                shapes.append(v.shape[: max(v.ndim - t, 0)])
            elif isinstance(v, TensorDataclass):
                shapes.append(v.shape)
            elif isinstance(v, dict):
                for leaf in jax.tree_util.tree_leaves(v):
                    if _is_array(leaf):
                        shapes.append(leaf.shape[: max(leaf.ndim - 1, 0)])
        return shapes

    def _broadcast_fields(self, batch_shape: Tuple[int, ...]) -> None:
        for f in dataclasses.fields(self):  # type: ignore[arg-type]
            if f.metadata.get("pytree_node", True) is False:
                continue
            v = getattr(self, f.name)
            t = self._trailing(f.name)
            if _is_array(v):
                new = jnp.broadcast_to(v, batch_shape + v.shape[max(v.ndim - t, 0):])
                object.__setattr__(self, f.name, new)
            elif isinstance(v, TensorDataclass):
                object.__setattr__(self, f.name, v.broadcast_to(batch_shape))
            elif isinstance(v, dict):
                new = jax.tree_util.tree_map(
                    lambda leaf: jnp.broadcast_to(leaf, batch_shape + leaf.shape[max(leaf.ndim - 1, 0):])
                    if _is_array(leaf)
                    else leaf,
                    v,
                )
                object.__setattr__(self, f.name, new)

    @property
    def shape(self) -> Tuple[int, ...]:
        return self._shape

    @property
    def size(self) -> int:
        return int(np.prod(self._shape)) if self._shape else 1

    @property
    def ndim(self) -> int:
        return len(self._shape)

    def __len__(self) -> int:
        if not self._shape:
            raise TypeError("len() of a 0-d TensorDataclass")
        return self._shape[0]

    # -- functional ops ----------------------------------------------------

    def _apply(self: T, fn) -> T:
        """Apply fn to every array field (batch-dims-aware fns only)."""
        updates: Dict[str, Any] = {}
        for f in dataclasses.fields(self):  # type: ignore[arg-type]
            if f.metadata.get("pytree_node", True) is False:
                continue
            v = getattr(self, f.name)
            t = self._trailing(f.name)
            if _is_array(v):
                updates[f.name] = fn(v, t)
            elif isinstance(v, TensorDataclass):
                updates[f.name] = v._apply(fn)
            elif isinstance(v, dict):
                updates[f.name] = jax.tree_util.tree_map(
                    lambda leaf: fn(leaf, 1) if _is_array(leaf) else leaf, v
                )
        return self.replace(**updates)

    def __getitem__(self: T, idx) -> T:
        if not isinstance(idx, tuple):
            idx = (idx,)
        return self._apply(lambda a, t: a[idx + (slice(None),) * t if t else idx])

    def reshape(self: T, shape: Tuple[int, ...]) -> T:
        return self._apply(lambda a, t: a.reshape(tuple(shape) + a.shape[a.ndim - t:] if t else tuple(shape)))

    def flatten(self: T) -> T:
        return self.reshape((-1,))

    def broadcast_to(self: T, shape: Tuple[int, ...]) -> T:
        return self._apply(lambda a, t: jnp.broadcast_to(a, tuple(shape) + a.shape[a.ndim - t:] if t else tuple(shape)))

    def astype(self: T, dtype) -> T:
        return self._apply(
            lambda a, t: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a
        )

    def replace(self: T, **updates) -> T:
        return dataclasses.replace(self, **updates)  # type: ignore[type-var]


def tensor_dataclass(cls):
    """Decorator: dataclass + pytree registration + broadcasting semantics."""
    cls = dataclasses.dataclass(cls)

    data_fields = []
    static_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("pytree_node", True) is False:
            static_fields.append(f.name)
        else:
            data_fields.append(f.name)

    def flatten_with_keys(obj):
        children = [(jax.tree_util.GetAttrKey(n), getattr(obj, n)) for n in data_fields]
        aux = tuple(getattr(obj, n) for n in static_fields)
        return children, aux

    def flatten(obj):
        return tuple(getattr(obj, n) for n in data_fields), tuple(
            getattr(obj, n) for n in static_fields
        )

    def unflatten(aux, children):
        obj = object.__new__(cls)
        for n, v in zip(data_fields, children):
            object.__setattr__(obj, n, v)
        for n, v in zip(static_fields, aux):
            object.__setattr__(obj, n, v)
        # Recompute batch shape cheaply without re-broadcasting (leaves may be
        # tracers mid-transform; broadcasting again is shape-preserving but we
        # skip it to avoid surprising ops inside tree_unflatten).
        shape = ()
        for n in data_fields:
            v = getattr(obj, n)
            t = cls._field_custom_dimensions.get(n, 1)
            if _is_array(v):
                shape = v.shape[: max(v.ndim - t, 0)]
                break
            if isinstance(v, TensorDataclass):
                shape = v.shape
                break
        object.__setattr__(obj, "_shape", tuple(shape))
        return obj

    jax.tree_util.register_pytree_with_keys(cls, flatten_with_keys, unflatten, flatten)
    return cls
