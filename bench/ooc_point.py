"""One steady-state out-of-core (piecewise) measurement point with
per-phase timings (VERDICT r2 weak #7: the OOC progression stops at 96^3
on the attached TPU — extend it to >=256^3).

Runs compute_flow_piecewise on an analytic pair at --size with the same
config family as the 96^3 progression (VALIDATION.md: levels=3, warps=2,
inner=1, sweeps=6), one warmup pass (compiles cached across passes since
chunk shapes are static) + one timed pass, and emits a JSON row with the
PhaseTimer breakdown. Flow sanity-gated against the prescribed shift.

Usage: python bench/ooc_point.py [--size 256] [--chunk-z 32] [--out F]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import numpy as np

# (sz, sy, sx): gen_pair shifts by demo_1024_piecewise.SHIFT; keep in sync.
from demo_1024_piecewise import SHIFT  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--chunk-z", type=int, default=32)
    ap.add_argument("--out", default=None)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--interp", default="trilinear",
                    choices=["trilinear", "tricubic"])
    ap.add_argument("--solver", default="sor",
                    choices=["sor", "jacobi", "multigrid"],
                    help="multigrid = the r5 streamed V-cycle "
                         "(piecewise._stream_mg_solve: fine level "
                         "streamed, coarse chain device-resident)")
    ap.add_argument("--mg-cycles", type=int, default=2)
    args = ap.parse_args()

    import jax

    from demo_1024_piecewise import gen_pair
    from tpuflow3d.params import FlowParams
    from tpuflow3d.piecewise import compute_flow_piecewise
    from tpuflow3d.utils.profiling import PhaseTimer

    shape = (args.size,) * 3
    print(f"ooc_point: generating {shape} pair...", file=sys.stderr,
          flush=True)
    # Dense analytic sum-of-cosines texture (demo_1024_piecewise.gen_pair,
    # which shifts by its own module SHIFT): the data term constrains every
    # voxel, so the shallow perf config's flow check is meaningful at any
    # volume size (sparse blob texture leaves the volume between features
    # to the smoothness prior, which 2 warps cannot propagate 100+ voxels).
    i0, i1 = gen_pair(shape)
    # The demo_1024_piecewise "accurate" config family, calibrated to
    # recover the prescribed shift on this texture (96^3 probe: med err
    # <0.02) — a meaningful flow gate AND a representative steady-state
    # work mix.
    p = FlowParams(levels=5, warps=2, inner_iterations=1, sweeps=12,
                   alpha=0.02, flow_clamp=2.0,
                   penalizer_data="quadratic",
                   penalizer_smooth="quadratic", interp=args.interp,
                   solver=args.solver, mg_cycles=args.mg_cycles)

    for k in range(args.warmup):
        print(f"ooc_point: warmup pass {k}...", file=sys.stderr, flush=True)
        compute_flow_piecewise(i0, i1, p, chunk_z=args.chunk_z)

    timer = PhaseTimer()
    t0 = time.perf_counter()
    flow = compute_flow_piecewise(i0, i1, p, chunk_z=args.chunk_z,
                                  timer=timer)
    dt = time.perf_counter() - t0

    c = args.size // 2
    sl = (slice(None), slice(c - 8, c + 8)) * 1
    med = [float(np.median(flow[i, c - 8:c + 8])) for i in range(3)]
    ok = all(abs(m - s) < 0.25 for m, s in zip(med, SHIFT))
    row = {"bench": "ooc_point", "size": args.size, "chunk_z": args.chunk_z,
           "platform": jax.default_backend(),
           "device": str(jax.devices()[0].device_kind),
           "seconds": round(dt, 2),
           "voxels_per_s": round(float(np.prod(shape)) / dt, 1),
           "params": {"levels": p.levels, "warps": p.warps,
                      "interp": p.interp, "solver": p.solver,
                      "inner_iterations": p.inner_iterations,
                      "sweeps": p.sweeps},
           "central_flow_median": [round(m, 4) for m in med],
           "expected": list(SHIFT), "ok": ok,
           "phases": {k: round(v["seconds"], 2)
                      for k, v in timer.report().items()}}
    line = json.dumps(row)
    print(line, flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
