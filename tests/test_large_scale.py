"""Top-of-ladder machinery evidence (BASELINE.json configs 4-5): a 512^3
Z-sharded run on the 8-virtual-device CPU mesh must match the unsharded
run. Slow (~1 h on 4 CPU cores, peak ~90 GB RAM), so it runs only when
TPUFLOW_RUN_512=1 (bench/run_large_evidence.sh). Committed output of the
r3 run: LARGE512_r03.log + the 512^3 row in VALIDATION.md ("Top-of-ladder
sharded equality": max|d| 9.95e-07 vs the unsharded oracle)."""

import os

import jax
import numpy as np
import pytest

from tpuflow3d import FlowParams, compute_flow
from tpuflow3d import synthetic as syn
from tpuflow3d.sharding import (compute_flow_sharded, make_z_mesh,
                                prepare_params)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(os.environ.get("TPUFLOW_RUN_512") != "1",
                       reason="set TPUFLOW_RUN_512=1 (minutes + ~20 GB RAM)"),
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs 8 virtual devices"),
]


def test_sharded_512_matches_unsharded():
    shape = (512, 512, 512)
    n = 8
    syn.set_coord_dtype(np.float32)
    i0, i1, true = syn.make_pair(shape, syn.translation((1.0, -0.5, 0.75)),
                                 n_blobs=40, seed=0)
    # Minimal-but-real config: enough levels that resample windows span
    # shard boundaries repeatedly; coarse tolerance per the ulp-seed
    # amplification documented in tests/test_piecewise.py's module
    # docstring.
    p = FlowParams(levels=4, warps=1, inner_iterations=1, sweeps=3,
                   alpha=0.05, flow_clamp=2.0)
    p_sharded = prepare_params(p, n)
    ref = np.asarray(compute_flow(i0, i1, p_sharded))
    got = np.asarray(compute_flow_sharded(i0, i1, p, mesh=make_z_mesh(n)))
    d = np.abs(got - ref)
    assert d.max() < 5e-2 and d.mean() < 1e-3, (d.max(), d.mean())
    # Both runs see the same ground truth quality on textured voxels.
    zc = shape[0] // 2
    sl = slice(zc - 4, zc + 4)
    mask = syn.gradient_mask(i0[sl], 0.75) & syn.interior_mask(
        (8, *shape[1:]), 2)
    e_ref = syn.epe(ref[:, sl], true[:, sl], mask)
    e_got = syn.epe(got[:, sl], true[:, sl], mask)
    assert abs(e_got - e_ref) < 5e-3, (e_got, e_ref)
    print(f"512^3 sharded-vs-unsharded: max|d|={d.max():.2e}, "
          f"mean|d|={d.mean():.2e}, EPE sharded={e_got:.4f} "
          f"unsharded={e_ref:.4f}")
