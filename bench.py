"""Benchmark harness: end-to-end voxels/s/chip on the ladder config.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "voxel/s", "vs_baseline": N}

vs_baseline is the fraction of the derived HBM-roofline end-to-end bound
(BASELINE.md "Derived speed-of-light model") — there are no published
reference numbers (BASELINE.json "published": {}).

Env knobs: TPUFLOW_BENCH_SIZE (default 256), TPUFLOW_BENCH_REPS (default 2),
TPUFLOW_BENCH_LEVELS, TPUFLOW_BENCH_SWEEPS.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "src"))

import numpy as np


def main() -> int:
    import jax

    size = int(os.environ.get("TPUFLOW_BENCH_SIZE", "256"))
    reps = int(os.environ.get("TPUFLOW_BENCH_REPS", "2"))

    from tpuflow3d.params import FlowParams
    from tpuflow3d.pipeline import compute_flow
    from tpuflow3d import synthetic as syn
    from tpuflow3d.utils import roofline

    levels = int(os.environ.get("TPUFLOW_BENCH_LEVELS",
                                {64: 3, 128: 4}.get(size, 5)))
    sweeps = int(os.environ.get("TPUFLOW_BENCH_SWEEPS", "20"))
    p = FlowParams(levels=levels, scale_factor=0.5, warps=3,
                   inner_iterations=3, sweeps=sweeps, alpha=0.05)

    shape = (size, size, size)
    print(f"bench: generating {shape} pair...", file=sys.stderr, flush=True)
    i0, i1, true = syn.make_pair(shape, syn.translation((1.5, -1.0, 0.75)),
                                 n_blobs=30, seed=0)

    dev = jax.devices()[0]
    print(f"bench: device {dev.device_kind}, compiling...", file=sys.stderr,
          flush=True)
    t0 = time.perf_counter()
    flow = compute_flow(i0, i1, p)
    flow.block_until_ready()
    t_compile = time.perf_counter() - t0
    print(f"bench: first run (incl compile) {t_compile:.1f}s",
          file=sys.stderr, flush=True)

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        flow = compute_flow(i0, i1, p)
        flow.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    voxels = float(np.prod(shape))
    vps = voxels / dt

    mask = syn.gradient_mask(i0, 0.75) & syn.interior_mask(shape, 4)
    err = syn.epe(np.asarray(flow), true, mask)

    shapes = p.level_shapes(shape)
    bound = roofline.end_to_end_roofline(shapes, p)
    rec = {
        "metric": f"voxels_per_sec_{size}c",
        "value": round(vps, 1),
        "unit": "voxel/s",
        "vs_baseline": round(vps / bound, 4),
    }
    print(f"bench: {dt:.2f}s/run, EPE={err:.4f}, roofline bound "
          f"{bound:.3e} vox/s, fraction {vps / bound:.3f}",
          file=sys.stderr, flush=True)
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
