import jax.numpy as jnp
import numpy as np
import pytest

from tpuflow3d.grid import HaloCtx
from tpuflow3d.median import median3
from tpuflow3d.pallas.median3 import median3_pallas


@pytest.mark.parametrize("shape", [(8, 16, 16), (6, 24, 10), (5, 7, 9)])
def test_median_matches_xla(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, *shape)).astype(np.float32))
    ctx = HaloCtx()
    ref = median3(x, ctx)
    got = median3_pallas(ctx.zpad(x, 1), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0,
                               rtol=0)


def test_median_constant_and_impulse():
    x = jnp.ones((1, 6, 8, 8), jnp.float32).at[0, 3, 4, 4].set(100.0)
    ctx = HaloCtx()
    got = np.asarray(median3_pallas(ctx.zpad(x, 1), interpret=True))
    assert np.allclose(got, 1.0)  # impulse rejected
