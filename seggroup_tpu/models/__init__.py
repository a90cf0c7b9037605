"""Model registry (replaces the reference's four per-subtree model systems:
pointgroup model_fn_decorator, kpconv architecture strings, minkowski
models/__init__ registry)."""

from seggroup_tpu.models.seggroup import SegGroupGNN

_REGISTRY = {}


def register(name):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls

    return deco


def get_model(name: str, **kwargs):
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


register("seggroup_gnn")(SegGroupGNN)
