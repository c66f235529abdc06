"""Camera-model infrastructure: pytree dataclasses + shared conventions.

Models are immutable pytree dataclasses (arrays = leaves, configuration =
static metadata), so every model slots directly into jit/vmap/grad and into
optimizer states.  This replaces the reference's virtual-dispatch CameraModel
class hierarchy (reference: applications/camera_calibration/src/
camera_calibration/models/camera_model.h:42) with functional dispatch.

Pixel conventions follow the reference: "pixel-corner" coordinates put the
origin at the top-left corner of the top-left pixel, so the center of pixel
(i, j) is (i + 0.5, j + 0.5); observations are stored in pixel-corner
convention (feature_detector_tagged_pattern.cc:619-650).
"""

from __future__ import annotations

import dataclasses

import jax


_MODEL_REGISTRY: dict[str, type] = {}


def model_dataclass(cls=None, *, name: str | None = None):
    """Register a frozen dataclass as a JAX pytree with static metadata.

    Fields annotated with ``static=True`` in their ``field.metadata`` become
    aux data (hashable, trigger recompilation when changed); everything else
    is a traced array leaf.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = []
        meta_fields = []
        for f in dataclasses.fields(c):
            if f.metadata.get("static", False):
                meta_fields.append(f.name)
            else:
                data_fields.append(f.name)
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=meta_fields
        )
        _MODEL_REGISTRY[name or c.__name__] = c
        return c

    return wrap(cls) if cls is not None else wrap


def static_field(**kwargs):
    """Dataclass field treated as static pytree metadata."""
    return dataclasses.field(metadata={"static": True}, **kwargs)


def get_model_class(name: str) -> type:
    return _MODEL_REGISTRY[name]


def replace(model, **kwargs):
    return dataclasses.replace(model, **kwargs)
