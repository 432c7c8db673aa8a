"""Command-line app.

TPU-native counterpart of the reference's ``main()`` (cuda-flow3d
``src/main.cpp``, SURVEY.md §5.1): parse args/settings, load two raw
volumes, pick the execution path (single-chip vs Z-sharded — the analog of
the reference's entire-vs-piecewise choice by GPU memory), compute flow,
write u/v/w raw outputs (+ magnitude).

Example:
    tpuflow3d --frame0 a.raw --frame1 b.raw --dims 256 256 256 \
        --dtype uint8 --alpha 0.1 --levels 5 --out flow_
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

from tpuflow3d.params import FlowParams, PRESETS
from tpuflow3d.utils.logging import JsonlLogger, summarize_residuals
from tpuflow3d import volume as vio


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="tpuflow3d",
        description="TPU-native dense 3D optical flow (variational, "
                    "coarse-to-fine).")
    ap.add_argument("--frame0", required=True, help="fixed volume (.raw)")
    ap.add_argument("--frame1", required=True, help="moving volume (.raw)")
    ap.add_argument("--dims", type=int, nargs=3, metavar=("D", "H", "W"),
                    help="volume dims, z y x order (or use a .json sidecar)")
    ap.add_argument("--dtype", default=None,
                    help="input dtype (uint8/uint16/float32/...)")
    ap.add_argument("--out", default="flow_", help="output path prefix")
    ap.add_argument("--no-magnitude", action="store_true")
    ap.add_argument("--preset", choices=sorted(PRESETS), default=None)
    ap.add_argument("--settings", default=None,
                    help="JSON file of FlowParams overrides")
    # Individual parameter overrides (reference exposes the same set,
    # SURVEY.md §2 "Key tunables").
    for name, typ in [("alpha", float), ("levels", int),
                      ("scale_factor", float), ("warps", int),
                      ("inner_iterations", int), ("sweeps", int),
                      ("omega", float), ("presmooth_sigma", float),
                      ("eps_data", float), ("eps_smooth", float),
                      ("flow_clamp", float),
                      ("residual_tol", float)]:
        ap.add_argument(f"--{name.replace('_', '-')}", type=typ, default=None,
                        dest=name)
    ap.add_argument("--penalizer-data", choices=["charbonnier", "quadratic"],
                    default=None, dest="penalizer_data")
    ap.add_argument("--penalizer-smooth", choices=["charbonnier", "quadratic"],
                    default=None, dest="penalizer_smooth")
    ap.add_argument("--no-median", action="store_true")
    ap.add_argument("--solver", choices=["sor", "jacobi"], default=None)
    ap.add_argument("--sharded", action="store_true",
                    help="Z-shard across all visible devices")
    ap.add_argument("--devices", type=int, default=None,
                    help="number of devices for --sharded")
    ap.add_argument("--piecewise", action="store_true",
                    help="out-of-core: stream Z-chunks through one device "
                         "(for volumes larger than device memory)")
    ap.add_argument("--chunk-z", type=int, default=64,
                    help="Z-chunk planes for --piecewise")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="save/resume the flow at pyramid-level boundaries")
    ap.add_argument("--residuals", action="store_true",
                    help="log per-sweep residual curves")
    ap.add_argument("--report-fit", action="store_true",
                    help="log the data-term fit |I1(x+s) - I0| after the "
                         "solve (registration quality diagnostic)")
    ap.add_argument("--log-json", default=None, help="JSONL log file path")
    ap.add_argument("--profile-dir", default=None,
                    help="write a jax.profiler trace to this directory")
    ap.add_argument("--traceback", action="store_true",
                    help="show full tracebacks instead of one-line errors")
    return ap


def params_from_args(args) -> FlowParams:
    p = PRESETS[args.preset] if args.preset else FlowParams()
    overrides = {}
    if args.settings:
        with open(args.settings) as f:
            overrides.update(json.load(f))
    for name in ["alpha", "levels", "scale_factor", "warps",
                 "inner_iterations", "sweeps", "omega", "presmooth_sigma",
                 "eps_data", "eps_smooth", "flow_clamp", "residual_tol",
                 "penalizer_data",
                 "penalizer_smooth", "solver"]:
        v = getattr(args, name, None)
        if v is not None:
            overrides[name] = v
    if args.no_median:
        overrides["median"] = False
    if args.residuals:
        overrides["track_residuals"] = True
    return p.replace(**overrides)


def _load(path: str, dims, dtype) -> np.ndarray:
    meta = None
    if dims is not None:
        meta = vio.VolumeMeta(tuple(dims), dtype or "float32")
    arr = vio.read_raw(path, meta)
    if arr.dtype != np.float32:
        from tpuflow3d.utils import native
        widened = native.to_f32(arr)  # threaded C++ fast path
        arr = widened if widened is not None else arr.astype(np.float32)
    return arr


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    try:
        return _run(args)
    except (ValueError, OSError) as e:
        if args.traceback:
            raise
        print(f"tpuflow3d: error: {e}", file=sys.stderr)
        return 2


def _run(args) -> int:
    log = JsonlLogger(path=args.log_json)
    params = params_from_args(args)
    log.log("start", params=params, frame0=args.frame0, frame1=args.frame1)

    i0 = _load(args.frame0, args.dims, args.dtype)
    i1 = _load(args.frame1, args.dims, args.dtype)
    if i0.shape != i1.shape:
        print(f"frame shapes differ: {i0.shape} vs {i1.shape}",
              file=sys.stderr)
        return 2

    import contextlib

    from tpuflow3d.utils.profiling import xla_trace

    t0 = time.perf_counter()
    diagnostics = params.track_residuals
    stack = contextlib.ExitStack()
    stack.enter_context(xla_trace(args.profile_dir))
    if args.piecewise:
        from tpuflow3d.piecewise import compute_flow_piecewise
        flow = compute_flow_piecewise(i0, i1, params, chunk_z=args.chunk_z,
                                      checkpoint_dir=args.checkpoint_dir)
        diag = {}
    elif args.checkpoint_dir:
        from tpuflow3d.pipeline import compute_flow_checkpointed
        flow = compute_flow_checkpointed(i0, i1, params,
                                         checkpoint_dir=args.checkpoint_dir)
        diag = {}
    elif args.sharded:
        from tpuflow3d.sharding import (compute_flow_sharded, make_z_mesh,
                                        prepare_params)
        mesh = make_z_mesh(args.devices)
        n = mesh.devices.size
        pp = prepare_params(params, n)
        i0p = vio.pad_to_multiple(i0, n)
        i1p = vio.pad_to_multiple(i1, n)
        out = compute_flow_sharded(i0p, i1p, pp, mesh,
                                   diagnostics=diagnostics)
        flow = (out[0] if diagnostics else out)[:, :i0.shape[0]]
        diag = out[1] if diagnostics else {}
    else:
        from tpuflow3d.pipeline import compute_flow
        out = compute_flow(i0, i1, params, diagnostics=diagnostics)
        flow = out[0] if diagnostics else out
        diag = out[1] if diagnostics else {}
    flow = np.asarray(flow)
    stack.close()
    dt = time.perf_counter() - t0

    voxels = float(np.prod(i0.shape))
    log.log("done", seconds=dt, voxels_per_s=voxels / dt)
    if diagnostics and "residuals" in diag:
        log.log("residuals",
                summary=summarize_residuals(np.asarray(diag["residuals"])))

    if args.report_fit:
        import jax
        import jax.numpy as jnp

        from tpuflow3d.warp import warp_volume

        @jax.jit
        def fit(i0a, i1a, fl):
            r = jnp.abs(warp_volume(i1a, fl) - i0a)
            return jnp.mean(r), jnp.max(r), jnp.mean(jnp.abs(i1a - i0a))

        mean_r, max_r, before = fit(jnp.asarray(i0), jnp.asarray(i1),
                                    jnp.asarray(flow))
        log.log("fit", mean_residual=float(mean_r), max_residual=float(max_r),
                mean_abs_diff_unwarped=float(before))

    vio.write_flow(args.out, flow, magnitude=not args.no_magnitude)
    log.log("written", prefix=args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
