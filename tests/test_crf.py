"""Bilateral mean-field CRF (reference conditional_random_fields.py:14-155)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seggroup_tpu.models.crf import MeanFieldCRF, CRFWrapped
from seggroup_tpu.sparse.tensor import SparseTensor


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_input(rng, m_cap=64, n=40, c=5):
    coords = np.zeros((m_cap, 4), np.int32)
    coords[:n, 0] = rng.integers(0, 2, n)
    coords[:n, 1:] = rng.integers(0, 6, (n, 3))
    feats = np.zeros((m_cap, c), np.float32)
    valid = np.zeros(m_cap, bool)
    valid[:n] = True
    st = SparseTensor(jnp.array(coords), jnp.array(feats), jnp.array(valid),
                      jnp.int32(n))
    logits = rng.normal(size=(m_cap, c)).astype(np.float32)
    logits[n:] = 0
    colors = rng.integers(0, 255, (m_cap, 3)).astype(np.float32)
    return st, jnp.array(logits), jnp.array(colors)


def test_crf_center_offset_matches_cell_sum_oracle(rng):
    """With the kernel zeroed except identity at the center offset and one
    iteration, out = softmax(unary) summed per bilateral cell + unary — a
    closed form we can check in numpy."""
    c = 5
    st, logits, colors = make_input(rng, c=c)
    crf = MeanFieldCRF(channels=c, spatial_sigma=2.0, chromatic_sigma=64.0,
                       iterations=1)
    variables = crf.init(jax.random.PRNGKey(0), logits, st, colors)
    kernel = np.zeros_like(np.asarray(variables["params"]["kernel"]))
    kernel[0] = np.eye(c)
    out = crf.apply({"params": {"kernel": jnp.array(kernel)}}, logits, st,
                    colors)
    out = np.asarray(out)

    n = int(st.num)
    coords = np.asarray(st.coords)[:n]
    cols = np.asarray(colors)[:n]
    lg = np.asarray(logits)[:n]
    cell = np.concatenate(
        [coords[:, :1],
         np.floor(coords[:, 1:4] / 2.0).astype(int),
         np.floor(cols / 64.0).astype(int)], axis=1)
    sm = np.exp(lg - lg.max(1, keepdims=True))
    sm /= sm.sum(1, keepdims=True)
    want = lg.copy()
    for i in range(n):
        same = (cell == cell[i]).all(1)
        want[i] += sm[same].sum(0)
    np.testing.assert_allclose(out[:n], want, rtol=1e-4, atol=1e-4)
    assert (out[n:] == 0).all()


def test_crf_neighbor_cells_couple(rng):
    """A face-adjacent bilateral cell contributes through its offset's
    kernel slice; a far cell does not."""
    c = 3
    m = 16
    coords = np.zeros((m, 4), np.int32)
    coords[0, 1:] = (0, 0, 0)
    coords[1, 1:] = (1, 0, 0)   # +x face neighbor at spatial_sigma=1
    coords[2, 1:] = (5, 5, 5)   # far cell
    valid = np.zeros(m, bool)
    valid[:3] = True
    st = SparseTensor(jnp.array(coords), jnp.zeros((m, c)), jnp.array(valid),
                      jnp.int32(3))
    colors = jnp.zeros((m, 3))
    logits = np.zeros((m, c), np.float32)
    logits[1] = (4.0, 0.0, 0.0)
    logits[2] = (0.0, 4.0, 0.0)

    crf = MeanFieldCRF(channels=c, spatial_sigma=1.0, chromatic_sigma=256.0,
                       iterations=1)
    variables = crf.init(jax.random.PRNGKey(0), jnp.array(logits), st, colors)
    kernel = np.zeros_like(np.asarray(variables["params"]["kernel"]))
    kernel[1:] = np.eye(c)  # all non-center offsets pass messages
    out = np.asarray(crf.apply({"params": {"kernel": jnp.array(kernel)}},
                               jnp.array(logits), st, colors))
    # voxel 0 receives softmax(logits[1]) from its +x neighbor, nothing from
    # the far voxel 2
    sm1 = np.exp(logits[1] - logits[1].max())
    sm1 /= sm1.sum()
    np.testing.assert_allclose(out[0], sm1, rtol=1e-4, atol=1e-5)


def test_crf_realistic_grid_no_key_aliasing(rng):
    """Regression: at realistic scene scale (spatial cells ~600/axis at
    spatial_sigma=1, chromatic cells ~22/axis at sigma=12) the 6-D cell space
    is ~1e12 >> 2^32, so a single packed uint32 key would wrap and alias
    distinct cells. The triple-int32 key must keep the center-offset oracle
    exact."""
    c = 4
    m_cap = 256
    n = 200
    coords = np.zeros((m_cap, 4), np.int32)
    coords[:n, 0] = rng.integers(0, 2, n)
    coords[:n, 1:] = rng.integers(0, 600, (n, 3))  # ~12 m scene at 2 cm
    valid = np.zeros(m_cap, bool)
    valid[:n] = True
    st = SparseTensor(jnp.array(coords), jnp.zeros((m_cap, c)),
                      jnp.array(valid), jnp.int32(n))
    logits = rng.normal(size=(m_cap, c)).astype(np.float32)
    logits[n:] = 0
    colors = rng.integers(0, 255, (m_cap, 3)).astype(np.float32)

    crf = MeanFieldCRF(channels=c, spatial_sigma=1.0, chromatic_sigma=12.0,
                       iterations=1)
    variables = crf.init(jax.random.PRNGKey(0), jnp.array(logits), st, colors)
    kernel = np.zeros_like(np.asarray(variables["params"]["kernel"]))
    kernel[0] = np.eye(c)
    out = np.asarray(crf.apply({"params": {"kernel": jnp.array(kernel)}},
                               jnp.array(logits), st, colors))

    cell = np.concatenate(
        [coords[:n, :1], coords[:n, 1:4],
         np.floor(colors[:n] / 12.0).astype(int)], axis=1)
    lg = logits[:n]
    sm = np.exp(lg - lg.max(1, keepdims=True))
    sm /= sm.sum(1, keepdims=True)
    want = lg.copy()
    for i in range(n):
        same = (cell == cell[i]).all(1)
        want[i] += sm[same].sum(0)
    np.testing.assert_allclose(out[:n], want, rtol=1e-4, atol=1e-4)


def test_trilateral_crf_time_separates_cells(rng):
    """TrilateralCRF (reference conditional_random_fields.py:157-166): with a
    center-identity kernel and one iteration, voxels in the same 6-D
    bilateral cell but DIFFERENT time frames no longer couple — the 7th
    (temporal) dimension splits the cell. Oracle in numpy over the 7-D key."""
    c = 4
    m_cap, n = 64, 40
    coords = np.zeros((m_cap, 4), np.int32)
    coords[:n, 1:] = rng.integers(0, 4, (n, 3))
    valid = np.zeros(m_cap, bool)
    valid[:n] = True
    st = SparseTensor(jnp.array(coords), jnp.zeros((m_cap, c)),
                      jnp.array(valid), jnp.int32(n))
    logits = rng.normal(size=(m_cap, c)).astype(np.float32)
    logits[n:] = 0
    colors = rng.integers(0, 255, (m_cap, 3)).astype(np.float32)
    times = np.zeros(m_cap, np.int32)
    times[:n] = rng.integers(0, 3, n)

    crf = MeanFieldCRF(channels=c, spatial_sigma=2.0, chromatic_sigma=64.0,
                       iterations=1, temporal=True)
    variables = crf.init(jax.random.PRNGKey(0), jnp.array(logits), st,
                         jnp.array(colors), jnp.array(times))
    kernel = np.zeros_like(np.asarray(variables["params"]["kernel"]))
    assert kernel.shape[0] == 15  # 7-D hypercross: center + 2*7
    kernel[0] = np.eye(c)
    out = np.asarray(crf.apply({"params": {"kernel": jnp.array(kernel)}},
                               jnp.array(logits), st, jnp.array(colors),
                               jnp.array(times)))

    cell = np.concatenate(
        [coords[:n, :1], np.floor(coords[:n, 1:4] / 2.0).astype(int),
         np.floor(colors[:n] / 64.0).astype(int), times[:n, None]], axis=1)
    lg = logits[:n]
    sm = np.exp(lg - lg.max(1, keepdims=True))
    sm /= sm.sum(1, keepdims=True)
    want = lg.copy()
    for i in range(n):
        same = (cell == cell[i]).all(1)
        want[i] += sm[same].sum(0)
    np.testing.assert_allclose(out[:n], want, rtol=1e-4, atol=1e-4)

    # with all times equal the temporal grid degenerates to the bilateral one
    crf_b = MeanFieldCRF(channels=c, spatial_sigma=2.0, chromatic_sigma=64.0,
                         iterations=1)
    vb = crf_b.init(jax.random.PRNGKey(0), jnp.array(logits), st,
                    jnp.array(colors))
    kb = np.zeros_like(np.asarray(vb["params"]["kernel"]))
    kb[0] = np.eye(c)
    out_b = np.asarray(crf_b.apply({"params": {"kernel": jnp.array(kb)}},
                                   jnp.array(logits), st, jnp.array(colors)))
    out_t0 = np.asarray(crf.apply({"params": {"kernel": jnp.array(kernel)}},
                                  jnp.array(logits), st, jnp.array(colors),
                                  jnp.zeros(m_cap, jnp.int32)))
    np.testing.assert_allclose(out_t0[:n], out_b[:n], rtol=1e-5, atol=1e-5)


def test_trilateral_registry(rng):
    from seggroup_tpu.models import get_model

    model = get_model("TrilateralCRF-Res16UNet14A", out_channels=8,
                      level_caps=[128, 128, 64, 32, 32])
    assert model.temporal


@pytest.mark.slow
def test_crf_wrapped_registry_and_forward(rng):
    from seggroup_tpu.models import get_model

    st, _, colors = make_input(rng, m_cap=128, n=80, c=3)
    st = st._replace(feats=jnp.array(
        rng.normal(size=(128, 3)).astype(np.float32)))
    model = get_model("BilateralCRF-Res16UNet14A", out_channels=8,
                      level_caps=[128, 128, 64, 32, 32])
    variables = model.init(jax.random.PRNGKey(0), st, colors, train=False)
    out = model.apply(variables, st, colors, train=False)
    out = np.asarray(out)
    assert out.shape == (128, 8)
    assert np.isfinite(out[:80]).all()
    # filter can be bypassed (the reference skips it with p=0.5 in training)
    out2 = model.apply(variables, st, colors, train=False, apply_filter=False)
    assert not np.allclose(out, np.asarray(out2))
