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


def _register_lazy():
    from seggroup_tpu.models.kpconv import KPCNN as KPCNN_KP
    from seggroup_tpu.models.kpconv import KPFCNN
    from seggroup_tpu.models.minkunet import (HYPER_VARIANTS,
                                              RESUNET_VARIANTS,
                                              ST_RESUNET_VARIANTS,
                                              ST_VARIANTS, VARIANTS,
                                              make_hyper, make_minkunet,
                                              make_resunet)
    from seggroup_tpu.models.pointgroup import PointGroup

    from seggroup_tpu.models.resnet_sparse import (
        KPCNN, RESNET_VARIANTS, ST_RESNET_VARIANTS, make_sparse_resnet,
    )

    register("pointgroup")(PointGroup)
    register("kpfcnn")(KPFCNN)
    register("kpcnn")(KPCNN)          # sparse-voxel-engine classifier
    register("kpcnn_kp")(KPCNN_KP)    # true KPConv-block classifier
    for name in list(VARIANTS) + list(ST_VARIANTS):
        _REGISTRY[name] = (lambda v: lambda **kw: make_minkunet(v, **kw))(name)
    for name in list(RESUNET_VARIANTS) + list(ST_RESUNET_VARIANTS):
        _REGISTRY[name] = (lambda v: lambda **kw: make_resunet(v, **kw))(name)
    for name in HYPER_VARIANTS:
        _REGISTRY[name] = (lambda v: lambda **kw: make_hyper(v, **kw))(name)
    for name in list(RESNET_VARIANTS) + list(ST_RESNET_VARIANTS):
        _REGISTRY[name] = (lambda v: lambda **kw: make_sparse_resnet(v, **kw))(name)

    # CRF-wrapped backbones (reference wrapper_type=BilateralCRF,
    # minkowski/models/__init__.py:46-57 + conditional_random_fields.py)
    from seggroup_tpu.models.crf import CRFWrapped

    def _make_crf(variant, temporal):
        def f(out_channels: int = 20, **kw):
            return CRFWrapped(
                backbone=make_minkunet(variant, out_channels=out_channels, **kw),
                num_classes=out_channels,
                temporal=temporal,
            )
        return f

    for name in VARIANTS:
        _REGISTRY[f"BilateralCRF-{name}"] = _make_crf(name, False)
        # TrilateralCRF: 7-D space+chroma+time mean field (reference
        # conditional_random_fields.py:157-166; temporal sigma 1)
        _REGISTRY[f"TrilateralCRF-{name}"] = _make_crf(name, True)


_register_lazy()
