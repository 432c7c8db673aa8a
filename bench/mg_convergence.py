"""Multigrid-vs-SOR convergence study (solver='multigrid' evidence).

Freezes one linearized Euler-Lagrange system from real image data (the
same construction as the solver tests) and measures the residual norm as
a function of FINE-SWEEP-EQUIVALENT cost for (a) plain red-black SOR at
omega=1.9 (the reference's solver) and (b) V(mg_pre,mg_post) multigrid
cycles. Sweep-equivalents count HBM passes over fine-voxel volumes: one
V-cycle = (pre+post) * sum(level_voxels)/fine_voxels sweeps + 1 residual
pass + restriction/prolongation (~0.4); plain SOR = sweep count. This
cost metric is wall-clock-free on purpose: the dev box's emulated TPU has
no execution-time model (BASELINE.md), while HBM passes ARE the cost on
real hardware for this memory-bound solver.

Usage: python bench/mg_convergence.py [--size 96] [--out MG_CONV.jsonl]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--out", default=None)
    ap.add_argument("--alpha", type=float, default=0.05)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpuflow3d import FlowParams
    from tpuflow3d.derivatives import derivatives
    from tpuflow3d.grid import HaloCtx
    from tpuflow3d.mgsolver import build_mg_levels, mg_residual, mg_solve
    from tpuflow3d.solver import compute_terms, parity_mask, sor_halfsweep
    from tpuflow3d.warp import warp_volume

    shape = (args.size,) * 3
    rng = np.random.default_rng(0)
    i0 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    shift = jnp.zeros((3, *shape), jnp.float32).at[2].set(0.7)
    i1 = warp_volume(i0, -shift)
    g, it = derivatives(i0, i1)
    p0 = FlowParams(alpha=args.alpha)
    flow = jnp.zeros((3, *shape), jnp.float32)
    du0 = jnp.zeros_like(flow)
    ctx = HaloCtx()
    t = compute_terms(g, it, flow, du0, p0, ctx)

    lvl0 = build_mg_levels(t, p0, ctx)[0]

    def rnorm(du):
        return float(jnp.mean(jnp.abs(mg_residual(du, lvl0, t.c, ctx))))

    r0 = rnorm(du0)
    parity = parity_mask(du0.shape[1:], ctx)

    @jax.jit
    def sor_sweep(du):
        du = sor_halfsweep(du, t, 1.9, parity, 0, ctx)
        return sor_halfsweep(du, t, 1.9, parity, 1, ctx)

    rows = []
    du = du0
    sor_curve = []
    for s in range(1, 65):
        du = sor_sweep(du)
        if s in (2, 4, 8, 12, 16, 24, 32, 48, 64):
            sor_curve.append({"sweep_equivalents": s,
                              "residual_rel": rnorm(du) / r0})

    # V-cycle cost in fine-sweep equivalents (HBM passes over fine-voxel
    # volumes): smoothing over all levels + 1 residual + ~0.4 resampling.
    pmg = FlowParams(solver="multigrid", mg_cycles=1, alpha=args.alpha)
    levels = build_mg_levels(t, pmg, ctx)
    voxsum = sum(float(np.prod(l.shape_global)) for l in levels)
    fine_vox = float(np.prod(shape))
    cyc_cost = ((pmg.mg_pre + pmg.mg_post) * voxsum / fine_vox + 1.0 + 0.4)

    mg_curve = []
    du = du0
    for k in range(1, 7):
        du, _ = mg_solve(du, t, pmg, ctx)
        mg_curve.append({"cycles": k,
                         "sweep_equivalents": round(k * cyc_cost, 2),
                         "residual_rel": rnorm(du) / r0})

    # Headline: sweep-equivalents for each solver to cut the residual
    # 100x, and the residual ratio at matched ~2-cycle cost.
    target = 1e-2
    sor_at = next((r["sweep_equivalents"] for r in sor_curve
                   if r["residual_rel"] < target), None)
    mg_at = next((r["sweep_equivalents"] for r in mg_curve
                  if r["residual_rel"] < target), None)
    rec = {"bench": "mg_convergence", "size": args.size,
           "alpha": args.alpha,
           "platform": jax.default_backend(),
           "mg_levels": [list(l.shape_global) for l in levels],
           "vcycle_cost_sweep_equivalents": round(cyc_cost, 2),
           "sor_curve": sor_curve, "mg_curve": mg_curve,
           "sweeps_to_100x": {"sor": sor_at, "multigrid": mg_at},
           "speedup_to_100x": (round(sor_at / mg_at, 2)
                               if sor_at and mg_at else
                               f">{64 / mg_at:.1f}x (SOR never reached "
                               "1e-2 in 64 sweeps)" if mg_at else None)}
    line = json.dumps(rec)
    print(line, flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
