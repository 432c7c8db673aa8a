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


def test_vmem_feasibility_guard_and_fallback():
    """median3_pallas_fits: shapes whose Y has a multiple-of-8 divisor use
    small blocks (fits); awkward-but-moderate shapes (180/164 — real
    eta=0.7/0.8 pyramid levels that used to fail to compile) fit with the
    lazy selection network; extreme awkward shapes must fall back, and
    median3_op must still produce the XLA result there."""
    from tpuflow3d.median import median3, median3_op
    from tpuflow3d.pallas.median3 import _pick_by, median3_pallas_fits

    assert median3_pallas_fits((3, 64, 256, 256))
    # 180/164: no multiple-of-8 divisor of H -> one huge Y block whose
    # ~41-block Mosaic stack exceeds the 16 MB scoped limit (observed
    # in-pipeline at eta=0.7/0.8 pyramid levels) -> XLA fallback.
    assert not median3_pallas_fits((3, 180, 180, 180))
    assert not median3_pallas_fits((3, 164, 164, 164))
    assert not median3_pallas_fits((3, 509, 509, 509))
    # Wide W forces a smaller aligned BY instead of overflowing.
    assert _pick_by(1024, 1024) in (16, 32)
    assert median3_pallas_fits((3, 8, 1024, 1024))

    # Dispatch falls back to XLA (no crash) for an infeasible H/W on a
    # pallas-forced params object.
    class P:
        backend = "pallas"

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(3, 2, 509, 509)).astype(np.float32))
    assert median3_pallas_fits((3, 4, 41, 40))  # small awkward H fits
    assert not median3_pallas_fits(x.shape)     # 509x509: one huge block
    got = median3_op(x, HaloCtx(), P())
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(median3(x, HaloCtx())))
