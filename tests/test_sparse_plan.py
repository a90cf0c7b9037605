"""Host-built UNet plans == device-built rulebooks/down-maps (bit parity)."""

import jax.numpy as jnp
import numpy as np

from seggroup_tpu import native
from seggroup_tpu.sparse.conv import build_subm_rulebook, downsample_coords
from seggroup_tpu.sparse.plan import build_unet_plan
from seggroup_tpu.sparse.tensor import SparseTensor
from tests.test_sparse_conv import make_sparse


def test_host_rulebook_matches_device(rng):
    st, coords, _ = make_sparse(rng, n=90, m_cap=256, grid=8)
    dev = np.asarray(build_subm_rulebook(st, 3))
    host = native.subm_rulebook3(np.asarray(st.coords), int(st.num), 256)
    np.testing.assert_array_equal(host, dev)


def test_host_downsample_matches_device(rng):
    st, coords, _ = make_sparse(rng, n=90, m_cap=256, grid=8)
    d_coords, d_valid, d_num, d_row, d_delta = (
        np.asarray(x) for x in downsample_coords(st, 128))
    h_coords, h_num, h_row, h_delta = native.downsample_plan(
        np.asarray(st.coords), int(st.num), 128)
    assert h_num == int(d_num)
    np.testing.assert_array_equal(h_coords[:h_num], d_coords[:h_num])
    # rows/deltas only meaningful for valid inputs
    v = np.asarray(st.valid)
    np.testing.assert_array_equal(h_row[v], d_row[v])
    np.testing.assert_array_equal(h_delta[v], d_delta[v])


def test_unet_plan_end_to_end_parity(rng):
    """MinkUNet(plan=host_plan) output == MinkUNet(plan=None) output."""
    import jax

    from seggroup_tpu.models.minkunet import make_minkunet

    st, _, _ = make_sparse(rng, n=200, m_cap=512, cin=3, grid=16)
    caps = [512, 256, 128, 64, 64]
    model = make_minkunet("Res16UNet14A", out_channels=5, level_caps=caps)
    variables = model.init(jax.random.PRNGKey(0), st, train=False)

    plan_np = build_unet_plan(np.asarray(st.coords), int(st.num), caps)
    plan = jax.tree.map(jnp.asarray, plan_np)

    out_dev = np.asarray(model.apply(variables, st, train=False))
    out_plan = np.asarray(model.apply(variables, st, train=False, plan=plan))
    np.testing.assert_array_equal(out_plan, out_dev)


def test_prefetcher_order_and_errors():
    from seggroup_tpu.utils.prefetch import HostPrefetcher

    pf = HostPrefetcher(lambda step: step * step, depth=3, workers=2)
    got = [next(pf) for _ in range(10)]
    assert got == [i * i for i in range(10)]
    pf.close()

    def boom(step):
        if step == 2:
            raise ValueError("boom")
        return step

    pf = HostPrefetcher(boom, depth=1, workers=1)
    assert next(pf) == 0
    assert next(pf) == 1
    try:
        next(pf)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    finally:
        pf.close()
