"""Weak-scaling harness (BASELINE.md measurement points).

Runs the Z-sharded pipeline at a fixed per-device volume over increasing
device counts and reports voxels/s and weak-scaling efficiency as JSON
lines (+ CSV). On a real pod slice, run once per slice size (1 chip, 1
host, N hosts); on this dev box the mesh is the virtual-CPU fleet, which
validates the scaling *machinery* (halo exchange, collectives), not the
absolute numbers.

Usage:
  python bench/scaling.py [--per-dev-z 32] [--hw 128] [--devices 1 2 4 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-dev-z", type=int, default=32)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual-CPU fleet")
    ap.add_argument("--csv", default=None)
    ap.add_argument("--sweeps", type=int, default=10)
    ap.add_argument("--ablate-comm", action="store_true",
                    help="also time each row with collectives replaced by "
                         "local fallbacks (HaloCtx.comm_ablate) and report "
                         "the communication share of step time")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    if args.cpu:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from tpuflow3d import FlowParams
    from tpuflow3d import synthetic as syn
    from tpuflow3d.sharding import (compute_flow_sharded, make_z_mesh,
                                    prepare_params)

    n_avail = len(jax.devices())
    counts = args.devices or [n for n in (1, 2, 4, 8, 16, 32)
                              if n <= n_avail]
    rows = []
    base_vps = None
    for n in counts:
        d = args.per_dev_z * n
        shape = (d, args.hw, args.hw)
        p = FlowParams(levels=3, warps=2, inner_iterations=2,
                       sweeps=args.sweeps, alpha=0.05)
        p = prepare_params(p, n)
        i0, i1, _ = syn.make_pair(shape, syn.translation((1.0, -0.5, 0.5)),
                                  n_blobs=20, seed=0)
        mesh = make_z_mesh(n)

        def timed(ablate=False):
            flow = compute_flow_sharded(i0, i1, p, mesh,
                                        _comm_ablate=ablate)  # warmup
            flow.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(args.reps):
                flow = compute_flow_sharded(i0, i1, p, mesh,
                                            _comm_ablate=ablate)
                flow.block_until_ready()
            return (time.perf_counter() - t0) / args.reps

        dt = timed()
        vps = float(np.prod(shape)) / dt
        if base_vps is None:
            base_vps = vps
        eff = vps / (base_vps * n)
        # On an oversubscribed host (virtual devices > physical cores) the
        # achievable weak-scaling ceiling is cores/devices: n virtual
        # devices share ncores threads, so perfect machinery still loses
        # (n - cores)/n of throughput to timeslicing.
        ncores = os.cpu_count() or 1
        ceiling = min(1.0, ncores / n) if args.cpu else 1.0
        row = {"devices": n, "shape": list(shape), "seconds": round(dt, 4),
               "voxels_per_s": round(vps, 1),
               "weak_scaling_efficiency": round(eff, 4),
               "host_ceiling": round(ceiling, 4),
               "efficiency_vs_ceiling": round(eff / ceiling, 4)}
        if args.ablate_comm:
            dt_nc = timed(ablate=True)
            row["seconds_no_comm"] = round(dt_nc, 4)
            row["comm_share"] = round(max(0.0, 1.0 - dt_nc / dt), 4)
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.csv:
        import csv
        with open(args.csv, "w", newline="") as f:
            wr = csv.DictWriter(f, fieldnames=list(rows[0]))
            wr.writeheader()
            for r in rows:
                wr.writerow({k: (json.dumps(v) if isinstance(v, list) else v)
                             for k, v in r.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())
