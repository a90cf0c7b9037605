import pytest
import jax
import jax.numpy as jnp
import numpy as np

from seggroup_tpu.models.resnet_sparse import KPCNN, make_sparse_resnet
from seggroup_tpu.sparse.tensor import SparseTensor


@pytest.mark.slow
def test_sparse_resnet_classification(rng):
    m_cap, n = 512, 300
    coords = np.zeros((m_cap, 4), np.int32)
    seen, rows = set(), []
    while len(rows) < n:
        c = (rng.integers(0, 4), *rng.integers(0, 16, 3))
        if c not in seen:
            seen.add(c)
            rows.append(c)
    coords[:n] = rows
    feats = np.zeros((m_cap, 3), np.float32)
    feats[:n] = rng.normal(size=(n, 3))
    valid = np.zeros(m_cap, bool); valid[:n] = True
    st = SparseTensor(jnp.array(coords), jnp.array(feats), jnp.array(valid),
                      jnp.int32(n))
    model = make_sparse_resnet("ResNet14", out_channels=10, num_batches=4,
                               level_caps=[256, 128, 64, 32])
    variables = model.init(jax.random.PRNGKey(0), st, train=False)
    logits = np.asarray(model.apply(variables, st, train=False))
    assert logits.shape == (4, 10)
    assert np.isfinite(logits).all()


@pytest.mark.slow
def test_kpcnn_classification(rng):
    from seggroup_tpu.models.kpconv import build_pyramid

    n = 512
    pts = rng.random((n, 3)).astype(np.float32) * 2
    batch = (np.arange(n) % 2).astype(np.int32)
    valid = np.ones(n, bool)
    pyr = build_pyramid(jnp.array(pts), jnp.array(batch), jnp.array(valid),
                        num_layers=4, dl0=0.1, level_caps=[256, 128, 64])
    feats = jnp.ones((n, 4))
    model = KPCNN(num_classes=40, first_features_dim=16, dl0=0.1, num_batches=2)
    variables = model.init(jax.random.PRNGKey(0), pyr, feats,
                           pyr[-1].batch, train=False)
    logits, regs = model.apply(variables, pyr, feats, pyr[-1].batch,
                               train=False)
    assert logits.shape == (2, 40)
    assert np.isfinite(np.asarray(logits)).all()
