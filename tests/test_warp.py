import jax.numpy as jnp
import numpy as np

from tpuflow3d.warp import warp_volume


def _vol(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(
        size=shape).astype(np.float32))


def test_zero_flow_identity():
    v = _vol((12, 12, 12))
    flow = jnp.zeros((3, 12, 12, 12), jnp.float32)
    out = warp_volume(v, flow)
    assert np.allclose(np.asarray(out), np.asarray(v), atol=1e-6)


def test_integer_shift_matches_roll():
    v = _vol((16, 16, 16))
    flow = jnp.zeros((3, 16, 16, 16), jnp.float32).at[0].set(2.0)
    out = np.asarray(warp_volume(v, flow))
    vn = np.asarray(v)
    # out[z] = v[z+2] in the interior
    assert np.allclose(out[:14], vn[2:], atol=1e-6)
    # clamp at the far edge
    assert np.allclose(out[14:], vn[15], atol=1e-6)


def test_halfvoxel_shift_is_average():
    v = _vol((10, 10, 10))
    flow = jnp.zeros((3, 10, 10, 10), jnp.float32).at[2].set(0.5)
    out = np.asarray(warp_volume(v, flow))
    vn = np.asarray(v)
    expected = 0.5 * (vn[:, :, :-1] + vn[:, :, 1:])
    assert np.allclose(out[:, :, :9], expected, atol=1e-6)
