import numpy as np

from tpuflow3d import synthetic as syn


def test_translation_pair_consistency():
    shape = (24, 24, 24)
    shift = (1.5, -0.75, 0.5)
    i0, i1, flow = syn.make_pair(shape, syn.translation(shift), seed=1)
    assert i0.shape == shape and i1.shape == shape
    assert flow.shape == (3, *shape)
    for c in range(3):
        assert np.allclose(flow[c], shift[c])
    # I1(x + s) == I0(x) analytically: sample i1 at shifted integer coords
    # where the shift is integral in one axis to spot-check.
    assert i0.std() > 0.01


def test_invert_flow_exactness():
    shape = (16, 16, 16)
    fn = syn.sinusoid(shape, amplitude=1.0)
    coords = syn._coords(shape)
    psi = syn.invert_flow(fn, coords)
    # psi must satisfy psi(y) = y - s(psi(y))
    err = np.abs(psi - (coords - fn(psi))).max()
    assert err < 1e-9


def test_warped_pair_matches_definition():
    shape = (20, 20, 20)
    fn = syn.sinusoid(shape, amplitude=1.2)
    i0, i1, flow = syn.make_pair(shape, fn, seed=3)
    # By construction I1(x + s(x)) = I0(x) exactly (both analytic):
    field = syn.BlobField(shape, seed=3)
    coords = syn._coords(shape)
    warped_coords = coords + flow
    psi = syn.invert_flow(fn, coords)
    # evaluate I1's generating function at x+s: I1(y) = f(psi(y))
    lhs = field.eval(syn.invert_flow(fn, warped_coords))
    assert np.abs(lhs - i0).max() < 1e-5
