"""Gate-quality EPE through the Z-SHARDED path at sizes one chip cannot
hold (VERDICT r4 missing #1; SURVEY.md §6 tiers 4-5; BASELINE.json:9-11).

The record solver (multigrid + tricubic) OOMs in-core beyond ~320^3 on a
16G chip, so at >=384^3 its only route is auto-mode's sharded handoff —
which until this run had only ever been exercised as a machinery-config
equality check. This runner executes a FULL accuracy config Z-sharded over
an 8-device mesh on an analytic translation and records textured-voxel EPE,
demonstrating that the handoff preserves gate accuracy, not just bitwise
sharded==unsharded equality at toy settings.

No real multi-chip hardware exists here, so the mesh is 8 virtual CPU
devices (XLA_FLAGS=--xla_force_host_platform_device_count) — the same
programs/collectives a real 8-chip ICI ring would run (sharded==unsharded
at 1e-6 is separately established at 512^3, LARGE512_r04.log); wall-clock
is host-bound and NOT hardware-representative.

Usage:
  python bench/sharded_accuracy.py --size 384 --config warps8_mg_tricubic \
      [--devices 8] [--out STUDY_384.jsonl] [--ckpt DIR] [--shift Z Y X]

Per-level checkpoints land in --ckpt (resume on rerun).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--config", default="warps8_mg_tricubic")
    ap.add_argument("--out", default=None)
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir (per-level resume)")
    ap.add_argument("--shift", type=float, nargs=3,
                    default=(1.5, -1.0, 0.75))
    args = ap.parse_args()

    # A 4-core host running 8 virtual device threads can starve one
    # thread past XLA:CPU's default 40 s collective-rendezvous kill
    # (observed once at 448^3: 'Termination timeout for collective
    # permute ... 7 of 8 arrived'); raise the terminate/warn timeouts —
    # purely a host-emulation artifact mitigation, meaningless on real
    # meshes.
    flags = os.environ.get("XLA_FLAGS", "")
    for f in (f"--xla_force_host_platform_device_count={args.devices}",
              "--xla_cpu_collective_call_warn_stuck_timeout_seconds=120",
              "--xla_cpu_collective_call_terminate_timeout_seconds=1200"):
        # Merge (not setdefault): a caller-set XLA_FLAGS must not
        # silently drop the timeout mitigation.
        if f.split("=")[0] not in flags:
            flags = f"{flags} {f}".strip()
    os.environ["XLA_FLAGS"] = flags
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from tpuflow3d import synthetic as syn
    from tpuflow3d.params import FlowParams
    from tpuflow3d.sharding import compute_flow_sharded, make_z_mesh

    size = args.size
    shape = (size, size, size)
    if size >= 256:
        syn.set_coord_dtype(np.float32)
    print(f"sharded study: generating {shape} pair...", file=sys.stderr,
          flush=True)
    i0, i1, _ = syn.make_pair(shape, syn.translation(tuple(args.shift)),
                              n_blobs=30, seed=0)

    levels = {64: 3, 128: 4}.get(size, 5)
    base = FlowParams(levels=levels, scale_factor=0.5, warps=3,
                      inner_iterations=3, sweeps=20, alpha=0.05,
                      flow_clamp=2.0)
    configs = {
        # The two gate-winning configs (STUDY_256.jsonl r4: 3.4e-4 mg,
        # 9.4e-4 SOR) — identical knobs, run sharded.
        "warps8_mg_tricubic": base.replace(
            warps=8, solver="multigrid", mg_cycles=3, residual_tol=1e-6,
            interp="tricubic"),
        "tricubic_warps8_restol": base.replace(
            interp="tricubic", warps=8, sweeps=60, residual_tol=1e-6),
        # Large-motion regime (VERDICT r4 missing #4): clamp 6 routes the
        # warp to the XLA fallback with 7-plane halos under shard_map.
        "mg_tricubic_clamp6": base.replace(
            warps=8, solver="multigrid", mg_cycles=3, residual_tol=1e-6,
            interp="tricubic", flow_clamp=6.0),
        # Full composition stack at scale (r5): gamma x tricubic x mg —
        # the 256^3 3.37e-4 config, sharded.
        "warps8_mg_tricubic_gamma": base.replace(
            warps=8, solver="multigrid", mg_cycles=3, residual_tol=1e-6,
            interp="tricubic", gamma=1.0),
        # Cheap smoke config for calibration.
        "smoke": base.replace(warps=2, inner_iterations=2, sweeps=8),
    }
    p = configs[args.config]

    mesh = make_z_mesh(args.devices)
    t0 = time.perf_counter()
    flow = compute_flow_sharded(i0, i1, p, mesh, checkpoint_dir=args.ckpt)
    flow.block_until_ready()
    seconds = time.perf_counter() - t0

    # Textured-voxel EPE on host (same mask definition as
    # bench/accuracy_study.py epe_device; CPU RAM holds the globals).
    fl = np.asarray(flow)
    gz, gy, gx = np.gradient(i0.astype(np.float32))
    mag = np.sqrt(gz * gz + gy * gy + gx * gx)
    del gz, gy, gx
    thr = 1.5 * float(np.mean(mag))
    b = 4
    mask = (mag > thr)[b:-b, b:-b, b:-b]
    del mag
    sh = np.asarray(args.shift, np.float32).reshape(3, 1, 1, 1)
    err = np.sqrt(np.sum((fl - sh) ** 2, axis=0))[b:-b, b:-b, b:-b]
    mean = float(np.sum(np.where(mask, err, 0.0)) / np.sum(mask))
    mx = float(np.max(np.where(mask, err, 0.0)))
    n = int(np.sum(mask))

    row = {"config": args.config + "_sharded",
           "size": size, "epe_mean": round(mean, 6),
           "epe_max": round(mx, 4), "textured_voxels": n,
           "seconds": round(seconds, 1),
           "sharded": True, "n_devices": args.devices,
           "platform": jax.devices()[0].platform,
           "dispatch": ("level_stepped_ckpt" if args.ckpt else "one_jit"),
           "shift": list(args.shift),
           "params": {k: getattr(p, k) for k in
                      ("levels", "scale_factor", "warps",
                       "inner_iterations", "sweeps", "alpha",
                       "eps_data", "eps_smooth", "deriv_order",
                       "residual_tol", "interp", "solver",
                       "backend", "flow_clamp", "mg_cycles",
                       "gamma", "terms_dtype", "sweep_layout")}}
    out_path = args.out or f"STUDY_{size}.jsonl"
    with open(out_path, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
