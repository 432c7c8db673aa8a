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


# ---- tricubic (Catmull-Rom) warp ----

def _catmull_rom_1d(p0, p1, p2, p3, f):
    """Scalar Catmull-Rom reference."""
    return (0.5 * (-f**3 + 2*f**2 - f) * p0
            + 0.5 * (3*f**3 - 5*f**2 + 2) * p1
            + 0.5 * (-3*f**3 + 4*f**2 + f) * p2
            + 0.5 * (f**3 - f**2) * p3)


def test_tricubic_matches_scalar_reference():
    """Interior samples vs a triple-nested scalar Catmull-Rom oracle."""
    rng = np.random.default_rng(3)
    v = rng.normal(size=(10, 10, 10)).astype(np.float32)
    pts = rng.uniform(2.0, 7.0, size=(20, 3))  # interior: all taps in range
    from tpuflow3d.warp import _tricubic_gather
    cz = jnp.asarray(pts[:, 0], jnp.float32)
    cy = jnp.asarray(pts[:, 1], jnp.float32)
    cx = jnp.asarray(pts[:, 2], jnp.float32)
    got = np.asarray(_tricubic_gather(jnp.asarray(v), cz, cy, cx))
    for i, (tz, ty, tx) in enumerate(pts):
        z0, y0, x0 = int(np.floor(tz)), int(np.floor(ty)), int(np.floor(tx))
        fz, fy, fx = tz - z0, ty - y0, tx - x0
        zs = []
        for dz in range(-1, 3):
            ys = []
            for dy in range(-1, 3):
                xs = [v[z0 + dz, y0 + dy, x0 + dx] for dx in range(-1, 3)]
                ys.append(_catmull_rom_1d(*xs, fx))
            zs.append(_catmull_rom_1d(*ys, fy))
        want = _catmull_rom_1d(*zs, fz)
        assert abs(got[i] - want) < 1e-4, (i, got[i], want)


def test_tricubic_exact_at_integers():
    v = _vol((12, 12, 12))
    flow = jnp.zeros((3, 12, 12, 12), jnp.float32).at[1].set(3.0)
    out = np.asarray(warp_volume(v, flow, interp="tricubic"))
    vn = np.asarray(v)
    assert np.allclose(out[:, :9], vn[:, 3:], atol=1e-5)


def test_tricubic_bias_below_trilinear_on_smooth_field():
    """Half-voxel sampling of a smooth (band-limited) volume: cubic's
    interpolation error must be far below linear's local-averaging bias."""
    z, y, x = np.meshgrid(np.arange(24.), np.arange(24.), np.arange(24.),
                          indexing="ij")
    vol = np.cos(0.5 * z + 0.3 * y) * np.sin(0.4 * x) + np.cos(0.35 * x + 0.2 * z)
    vol = vol.astype(np.float32)
    truth = (np.cos(0.5 * (z + 0.5) + 0.3 * y) * np.sin(0.4 * x)
             + np.cos(0.35 * x + 0.2 * (z + 0.5))).astype(np.float32)
    flow = jnp.zeros((3, 24, 24, 24), jnp.float32).at[0].set(0.5)
    sl = (slice(4, 20),) * 3
    lin = np.abs(np.asarray(warp_volume(jnp.asarray(vol), flow))
                 - truth)[sl].mean()
    cub = np.abs(np.asarray(warp_volume(jnp.asarray(vol), flow,
                                        interp="tricubic")) - truth)[sl].mean()
    assert cub < 0.25 * lin, (cub, lin)


def test_tricubic_streamed_path_matches_unrolled(monkeypatch):
    """The large-volume Z-chunk-streamed gather must equal the one-shot
    unrolled gather — including a partial (clamped, overlapping) last
    chunk: 12 planes at 5-plane chunks -> starts 0, 5, 7."""
    import tpuflow3d.warp as W
    v = _vol((12, 12, 12), seed=7)
    rng = np.random.default_rng(8)
    flow = jnp.asarray(np.clip(rng.normal(size=(3, 12, 12, 12)), -1.5,
                               1.5).astype(np.float32))
    a = np.asarray(warp_volume(v, flow, interp="tricubic"))
    monkeypatch.setattr(W, "_TRICUBIC_ROLL_BYTES", 1)
    monkeypatch.setattr(W, "_TRICUBIC_CHUNK_BYTES", 5 * 12 * 12 * 4)
    b = np.asarray(warp_volume(v, flow, interp="tricubic"))
    np.testing.assert_allclose(a, b, atol=1e-6)
