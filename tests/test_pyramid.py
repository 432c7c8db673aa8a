import jax.numpy as jnp
import numpy as np

from tpuflow3d.grid import HaloCtx
from tpuflow3d.params import FlowParams
from tpuflow3d import pyramid


def test_smooth_preserves_constant():
    x = jnp.full((10, 12, 14), 3.25, jnp.float32)
    y = pyramid.smooth(x, 1.0)
    assert np.allclose(np.asarray(y), 3.25, atol=1e-5)


def test_smooth_reduces_variance():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 16, 16)).astype(np.float32))
    y = pyramid.smooth(x, 1.0)
    assert float(jnp.std(y)) < float(jnp.std(x)) * 0.5


def test_resize_constant_and_shapes():
    x = jnp.full((16, 16, 16), 2.0, jnp.float32)
    y = pyramid.resize3(x, (9, 11, 13))
    assert y.shape == (9, 11, 13)
    assert np.allclose(np.asarray(y), 2.0, atol=1e-5)


def test_resize_linear_ramp_preserved():
    # A linear ramp is reproduced exactly by linear interpolation away from
    # the clamped half-pixel edges.
    d = 32
    ramp = jnp.broadcast_to(
        jnp.arange(d, dtype=jnp.float32).reshape(d, 1, 1), (d, 8, 8))
    y = pyramid.resize_z(ramp, 16, HaloCtx())
    expected = (np.arange(16) + 0.5) * 2.0 - 0.5
    got = np.asarray(y)[:, 0, 0]
    assert np.allclose(got[1:-1], expected[1:-1], atol=1e-4)


def test_upsample_flow_scales_values():
    flow = jnp.ones((3, 8, 8, 8), jnp.float32)
    up = pyramid.upsample_flow(flow, (16, 16, 16))
    assert up.shape == (3, 16, 16, 16)
    assert np.allclose(np.asarray(up), 2.0, atol=1e-4)


def test_level_shapes_ladder():
    p = FlowParams(levels=3, scale_factor=0.5)
    assert p.level_shapes((64, 64, 64)) == [(64, 64, 64), (32, 32, 32),
                                            (16, 16, 16)]
    p8 = p.replace(z_multiple=8)
    shapes = p8.level_shapes((64, 64, 64))
    assert all(s[0] % 8 == 0 for s in shapes)


def test_pyramid_build():
    p = FlowParams(levels=3, scale_factor=0.5)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(32, 32, 32)).astype(np.float32))
    shapes = p.level_shapes(x.shape)
    pyr = pyramid.build_pyramid(x, shapes, p)
    assert [tuple(a.shape) for a in pyr] == shapes
