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
    ap.add_argument("--frame0", help="fixed volume (.raw)")
    ap.add_argument("--frame1", help="moving volume (.raw)")
    ap.add_argument("--frames", nargs="+", metavar="RAW", default=None,
                    help="time series: N>=2 volumes -> N-1 flow fields "
                         "(frame t -> t+1), written as <out><t>_u.raw etc. "
                         "The solve is traced/compiled once and the "
                         "executable is reused for every pair (the "
                         "reference reloads and relaunches per pair)")
    ap.add_argument("--list-ops", action="store_true",
                    help="print the device-op catalog (halo rule, HBM byte "
                         "model, reference counterpart) and exit")
    ap.add_argument("--dims", type=int, nargs=3, metavar=("D", "H", "W"),
                    help="volume dims, z y x order (or use a .json sidecar)")
    ap.add_argument("--dtype", default=None,
                    help="input dtype (uint8/uint16/float32/...)")
    ap.add_argument("--out", default="flow_", help="output path prefix")
    ap.add_argument("--no-magnitude", action="store_true")
    ap.add_argument("--export-vtk", action="store_true",
                    help="also write <out>flow.vtk (legacy-VTK VECTORS, "
                         "ParaView drag-and-drop; + <out>magnitude.vtk "
                         "unless --no-magnitude). The reference emits only "
                         "headerless raw, forcing hand-built readers")
    ap.add_argument("--track", default=None, metavar="SEEDS.csv",
                    help="with --frames: Lagrangian particle tracking — "
                         "advance the seed points (CSV lines z,y,x) "
                         "through each pair's flow (p += s_t(p), flow "
                         "sampled trilinearly at the moving points) and "
                         "write <out>tracks.csv (t,point,z,y,x)")
    ap.add_argument("--apply-flow", default=None, metavar="PREFIX",
                    help="no solve: backward-warp --frame1 by an existing "
                         "flow (<PREFIX>{u,v,w}.raw) and write "
                         "<out>warped.raw — motion compensation of any "
                         "volume (e.g. a segmentation) by a computed "
                         "field; honors --interp")
    ap.add_argument("--derived", default=None, metavar="FIELDS",
                    help="comma list of derived fields to write next to "
                         "u/v/w: divergence (expansion rate), curl "
                         "(vorticity, 3 raws), jacdet (det(I+grad s), "
                         "local volume ratio — the 4D-CT strain measure)")
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
                      ("flow_clamp", float), ("deriv_order", int),
                      ("residual_tol", float), ("gamma", float),
                      ("eps_grad", float), ("mg_cycles", int),
                      ("mg_pre", int), ("mg_post", int),
                      ("mg_coarse_sweeps", int), ("mg_omega", float)]:
        ap.add_argument(f"--{name.replace('_', '-')}", type=typ, default=None,
                        dest=name)
    ap.add_argument("--interp", choices=["trilinear", "tricubic"],
                    default=None,
                    help="warp sampling: trilinear (reference behavior) or "
                         "tricubic Catmull-Rom (lower sub-voxel "
                         "interpolation bias)")
    ap.add_argument("--penalizer-data", choices=["charbonnier", "quadratic"],
                    default=None, dest="penalizer_data")
    ap.add_argument("--penalizer-smooth", choices=["charbonnier", "quadratic"],
                    default=None, dest="penalizer_smooth")
    ap.add_argument("--penalizer-grad", choices=["charbonnier", "quadratic"],
                    default=None, dest="penalizer_grad",
                    help="penalizer for the gradient-constancy term "
                         "(--gamma > 0: Brox-style robustness to additive "
                         "intensity changes; in-core/sharded paths only)")
    ap.add_argument("--no-median", action="store_true")
    ap.add_argument("--solver", choices=["sor", "jacobi", "multigrid"],
                    default=None)
    ap.add_argument("--sharded", action="store_true",
                    help="Z-shard across all visible devices")
    ap.add_argument("--devices", type=int, default=None,
                    help="number of devices for --sharded")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-process run: jax.distributed bring-up, "
                         "host-local slab IO, Z-sharded solve over every "
                         "device in the job")
    ap.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                    help="coordinator address for --distributed (omit on "
                         "TPU pods with auto-detected metadata)")
    ap.add_argument("--num-processes", type=int, default=None,
                    help="process count for --distributed manual launches")
    ap.add_argument("--process-id", type=int, default=None,
                    help="this process's id for --distributed manual "
                         "launches")
    ap.add_argument("--piecewise", action="store_true",
                    help="out-of-core: stream Z-chunks through one device "
                         "(for volumes larger than device memory)")
    ap.add_argument("--incore", action="store_true",
                    help="pin the single-device in-core path (disables the "
                         "automatic memory-based path selection)")
    ap.add_argument("--chunk-z", type=int, default=None,
                    help="Z-chunk planes for --piecewise (default: sized "
                         "automatically from device memory; 64 when the "
                         "budget is unknown)")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="save/resume the flow at pyramid-level boundaries")
    ap.add_argument("--check-consistency", action="store_true",
                    help="also solve the reverse pair and write the "
                         "forward-backward consistency error map "
                         "(<out>consistency.raw, voxels) — the standard "
                         "flow-reliability/occlusion diagnostic. Doubles "
                         "solve time")
    ap.add_argument("--residuals", action="store_true",
                    help="log per-sweep residual curves")
    ap.add_argument("--timings", action="store_true",
                    help="log per-phase wall times (pyramid build + each "
                         "level; the reference's per-op timing prints). "
                         "Levels run as separate jit steps")
    ap.add_argument("--report-fit", action="store_true",
                    help="log the data-term fit |I1(x+s) - I0| after the "
                         "solve (registration quality diagnostic)")
    ap.add_argument("--stats", action="store_true",
                    help="log min/max/mean/L2 of each input volume and of "
                         "the flow magnitude (the reference's volume-info "
                         "prints; ops registry 'statistics' op)")
    ap.add_argument("--log-json", default=None, help="JSONL log file path")
    ap.add_argument("--profile-dir", default=None,
                    help="write a jax.profiler trace to this directory")
    ap.add_argument("--traceback", action="store_true",
                    help="show full tracebacks instead of one-line errors")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="force the JAX platform (default: the "
                         "environment's; e.g. --platform cpu runs the "
                         "out-of-core path against host memory when no "
                         "TPU is attached)")
    return ap


def params_from_args(args) -> FlowParams:
    p = PRESETS[args.preset] if args.preset else FlowParams()
    overrides = {}
    if args.settings:
        with open(args.settings) as f:
            overrides.update(json.load(f))
    for name in ["alpha", "levels", "scale_factor", "warps",
                 "inner_iterations", "sweeps", "omega", "presmooth_sigma",
                 "eps_data", "eps_smooth", "flow_clamp", "deriv_order",
                 "residual_tol", "gamma", "eps_grad", "penalizer_data",
                 "penalizer_smooth", "penalizer_grad", "solver", "interp",
                 "mg_cycles", "mg_pre", "mg_post", "mg_coarse_sweeps",
                 "mg_omega"]:
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


def _list_ops() -> int:
    from tpuflow3d.ops import OPS
    for name, spec in OPS.items():
        print(f"{name:16s}  {spec.bytes_per_voxel:5.0f} B/vox  "
              f"halo: {spec.z_halo:42s}  ref: {spec.reference}")
        if spec.byte_variants:
            var = ", ".join(f"{k}: {v:.0f}"
                            for k, v in spec.byte_variants.items())
            print(f"{'':16s}  byte model by layout — {var}")
    return 0


def _apply_flow(args) -> int:
    """Warp --frame1 by an already-computed flow field (no solve).

    Backward warp Ĩ(x) = I(x + s(x)) — the same registration operation the
    solver applies internally (SURVEY.md §2 step 2a), exposed standalone so
    a computed field can motion-compensate other volumes of the same grid
    (segmentations, later frames, other channels)."""
    import jax

    from tpuflow3d.warp import warp_volume

    if not args.frame1:
        raise ValueError("--apply-flow needs --frame1 (the volume to warp)")
    vol = _load(args.frame1, args.dims, args.dtype)
    comps = {}
    for name, ci in vio.FLOW_COMPONENT_FILES.items():
        comps[ci] = vio.read_raw(f"{args.apply_flow}{name}.raw",
                                 vio.VolumeMeta(vol.shape, "float32")
                                 if args.dims else None)
    flow = np.stack([comps[0], comps[1], comps[2]])
    if flow.shape[1:] != vol.shape:
        raise ValueError(f"flow grid {flow.shape[1:]} != volume grid "
                         f"{vol.shape}")
    interp = args.interp or "trilinear"
    warped = jax.jit(warp_volume, static_argnames=("interp",))(
        vol, flow, interp=interp)
    out = f"{args.out}warped.raw"
    vio.write_raw(out, np.asarray(warped))
    print(f"tpuflow3d: warped {args.frame1} by {args.apply_flow} "
          f"({interp}) -> {out}", file=sys.stderr)
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.list_ops:
        return _list_ops()
    if args.apply_flow:
        try:
            conflicts = [name for name, on in [
                ("--frames", bool(args.frames)),
                ("--piecewise", args.piecewise),
                ("--sharded", args.sharded),
                ("--distributed", args.distributed),
                ("--track", bool(args.track)),
                ("--derived", bool(args.derived))] if on]
            if conflicts:
                raise ValueError(
                    f"--apply-flow is a standalone post-processing mode; "
                    f"it cannot be combined with {' or '.join(conflicts)}")
            return _apply_flow(args)
        except (ValueError, OSError) as e:
            if args.traceback:
                raise
            print(f"tpuflow3d: error: {e}", file=sys.stderr)
            return 2
    if not args.frames and (not args.frame0 or not args.frame1):
        print("tpuflow3d: error: --frame0 and --frame1 (or --frames) are "
              "required", file=sys.stderr)
        return 2
    if args.frames and (args.frame0 or args.frame1):
        print("tpuflow3d: error: --frames and --frame0/--frame1 are "
              "mutually exclusive", file=sys.stderr)
        return 2
    try:
        return _run(args)
    except (ValueError, OSError) as e:
        if args.traceback:
            raise
        print(f"tpuflow3d: error: {e}", file=sys.stderr)
        return 2


def _check_path_flags(args) -> None:
    """The execution paths are mutually exclusive (except checkpointing,
    which composes with all of them) — reject ambiguous combinations
    instead of silently picking one (a --sharded --checkpoint-dir run used
    to fall through to the UNSHARDED checkpointed path)."""
    modes = [name for name, on in [("--piecewise", args.piecewise),
                                   ("--sharded", args.sharded),
                                   ("--distributed", args.distributed),
                                   ("--incore", args.incore)]
             if on]
    if len(modes) > 1:
        raise ValueError(f"{' and '.join(modes)} are mutually exclusive")
    # Validate --derived BEFORE the (potentially hours-long) solve.
    _parse_derived(args)
    if args.track and not args.frames:
        raise ValueError("--track requires --frames (a time series to "
                         "integrate the seed points through)")
    if args.derived and args.distributed:
        raise ValueError(
            "--derived needs the assembled global flow; the distributed "
            "path writes per-process slabs. Compute derived fields from "
            "the written u/v/w raws afterwards (tpuflow3d.postproc).")
    if getattr(args, "export_vtk", False) and args.distributed:
        raise ValueError(
            "--export-vtk needs the assembled global flow; the distributed "
            "path writes per-process slabs. Export VTK from the written "
            "u/v/w raws afterwards (tpuflow3d.vtkio).")
    if args.check_consistency and (args.distributed or args.frames):
        raise ValueError(
            "--check-consistency supports the single-pair paths only "
            "(solve each direction explicitly for series/distributed "
            "runs and use tpuflow3d.postproc.consistency_error)")


def _parse_derived(args) -> tuple:
    if not getattr(args, "derived", None):
        return ()
    from tpuflow3d.postproc import DERIVED_FIELDS
    which = tuple(s.strip() for s in args.derived.split(",") if s.strip())
    for name in which:
        if name not in DERIVED_FIELDS:
            raise ValueError(f"unknown --derived field {name!r}; choose "
                             f"from {', '.join(DERIVED_FIELDS)}")
    return which


def _export_vtk(args, log, prefix: str, flow) -> None:
    if not getattr(args, "export_vtk", False):
        return
    from tpuflow3d import vtkio
    flow = np.asarray(flow)
    files = [f"{prefix}flow.vtk"]
    vtkio.write_vtk_flow(files[0], flow)
    if not args.no_magnitude:
        mag = np.sqrt((flow ** 2).sum(axis=0, dtype=np.float32))
        files.append(f"{prefix}magnitude.vtk")
        vtkio.write_vtk_scalar(files[1], mag, name="flow_magnitude")
    log.log("vtk_written", files=files)


def _write_derived(args, log, prefix: str, flow) -> None:
    which = _parse_derived(args)
    if not which:
        return
    from tpuflow3d.postproc import write_derived
    files = write_derived(prefix, np.asarray(flow), which)
    log.log("derived_written", fields=list(which), files=files)


def _auto_mode(args, shape, params, log) -> None:
    """Memory-based execution-path selection — the reference's main() picks
    entire-data vs piecewise by free GPU memory (SURVEY.md §5.1); this is
    the same decision against the in-core peak-HBM model. Explicit mode
    flags (--incore/--piecewise/--sharded/--distributed) pin the path."""
    if args.incore or args.piecewise or args.sharded or args.distributed:
        return
    from tpuflow3d.utils import memory as mem

    budget = mem.device_budget_bytes()
    if budget is None:  # CPU backend: in-core IS host memory
        return
    need = mem.incore_peak_bytes(shape, params)
    if need <= budget:
        return
    import jax

    n = len(jax.local_devices())
    if n > 1 and need <= budget * n:
        args.sharded = True
        mode = f"sharded over {n} devices"
    else:
        args.piecewise = True
        mode = (f"piecewise (chunk_z={args.chunk_z})"
                if args.chunk_z is not None else "piecewise (auto chunk)")
    log.log("auto_mode", selected="sharded" if args.sharded else "piecewise",
            need_bytes=need, device_budget_bytes=budget, devices=n)

    def gib(b):
        return (f"{b / 2**30:.1f} GiB" if b >= 2**29
                else f"{b / 2**20:.1f} MiB")

    print(f"tpuflow3d: note: in-core peak ~{gib(need)} exceeds device "
          f"memory ~{gib(budget)}; selected {mode} "
          "(pin a path with --incore/--piecewise/--sharded)",
          file=sys.stderr)


def _distributed_setup(args, log, first_frame: str):
    """Shared --distributed bring-up: jax.distributed init, volume meta
    resolution (f32 slab-IO constraint), global mesh. Returns (dist module,
    meta, mesh)."""
    if args.timings:
        print("tpuflow3d: note: --timings is not supported with "
              "--distributed (phase timers are per-process); ignoring",
              file=sys.stderr)
    from tpuflow3d import distributed as dist

    dist.initialize(args.coordinator, args.num_processes, args.process_id)
    import jax
    log.log("distributed", process=jax.process_index(),
            n_processes=jax.process_count(), n_devices=len(jax.devices()))
    meta = None
    if args.dims is not None:
        meta = vio.VolumeMeta(tuple(args.dims), args.dtype or "float32")
    else:
        meta = vio.read_sidecar(first_frame)
        if meta is None:
            raise ValueError(f"--distributed needs --dims or a .json "
                             f"sidecar for {first_frame}")
    if meta.dtype != "float32":
        raise ValueError("--distributed reads slabs directly from the raw "
                         "files; convert inputs to float32 first "
                         "(non-f32 widening happens in-memory otherwise)")
    return dist, meta, dist.global_z_mesh()


def _run_distributed(args, params, log) -> int:
    """Multi-process entry: the reference's single main() covers its whole
    surface (SURVEY.md §5.1); this flag gives the multi-host path the same
    front door instead of requiring a hand-written worker script."""
    dist, meta, mesh = _distributed_setup(args, log, args.frame0)
    import jax
    params = _notice_flow_clamp(params, mesh.devices.size, log)
    t0 = time.perf_counter()
    flow = dist.compute_flow_distributed(
        args.frame0, args.frame1, meta, params, mesh,
        out_prefix=args.out, checkpoint_dir=args.checkpoint_dir)
    flow.block_until_ready()
    dt = time.perf_counter() - t0
    voxels = float(np.prod(meta.shape))
    log.log("done", seconds=dt, voxels_per_s=voxels / dt,
            process=jax.process_index())
    log.log("written", prefix=args.out, note="u/v/w slabs per process")
    return 0


def _notice_flow_clamp(params, n, log):
    from tpuflow3d.sharding import DEFAULT_FLOW_CLAMP, prepare_params
    pp = prepare_params(params, n)
    if params.flow_clamp <= 0.0 and pp.flow_clamp == DEFAULT_FLOW_CLAMP:
        log.log("notice", flow_clamp=pp.flow_clamp,
                message=f"sharded run defaulted flow_clamp to "
                        f"{pp.flow_clamp} (bounds the warp halo); raise "
                        "--flow-clamp if per-level motion exceeds it")
        print(f"tpuflow3d: note: sharded run caps per-level flow at "
              f"{pp.flow_clamp} voxels (warp halo bound); pass "
              "--flow-clamp to raise", file=sys.stderr)
    return pp


def _solve_pair(args, params, i0, i1, log, timer, checkpoint_dir):
    """One frame pair through the selected execution path. Returns
    (flow ndarray, diagnostics dict). Under --frames the jitted solve is
    traced once on the first pair; later pairs hit the executable cache
    (identical shapes/params -> identical trace)."""
    diagnostics = params.track_residuals
    if args.piecewise:
        from tpuflow3d.piecewise import compute_flow_piecewise
        if args.chunk_z is None:
            from tpuflow3d.utils import memory as mem
            budget = mem.device_budget_bytes()
            args.chunk_z = (mem.pick_chunk_z(i0.shape, params, budget)
                            if budget else 64)
            log.log("auto_chunk", chunk_z=args.chunk_z,
                    device_budget_bytes=budget)
        flow = compute_flow_piecewise(i0, i1, params, chunk_z=args.chunk_z,
                                      checkpoint_dir=checkpoint_dir,
                                      timer=timer)
        diag = {}
    elif args.sharded:
        from tpuflow3d.sharding import compute_flow_sharded, make_z_mesh
        mesh = make_z_mesh(args.devices)
        n = mesh.devices.size
        pp = _notice_flow_clamp(params, n, log)
        i0p = vio.pad_to_multiple(i0, n)
        i1p = vio.pad_to_multiple(i1, n)
        out = compute_flow_sharded(i0p, i1p, pp, mesh,
                                   diagnostics=diagnostics,
                                   checkpoint_dir=checkpoint_dir,
                                   timer=timer)
        flow = (out[0] if diagnostics else out)[:, :i0.shape[0]]
        diag = out[1] if diagnostics else {}
    elif checkpoint_dir or timer is not None:
        from tpuflow3d.pipeline import compute_flow_checkpointed
        flow = compute_flow_checkpointed(i0, i1, params,
                                         checkpoint_dir=checkpoint_dir,
                                         timer=timer)
        diag = {}
    else:
        from tpuflow3d.pipeline import compute_flow
        out = compute_flow(i0, i1, params, diagnostics=diagnostics)
        flow = out[0] if diagnostics else out
        diag = out[1] if diagnostics else {}
    return np.asarray(flow), diag


def _log_stats(log, arrays: dict, device: bool = True, **extra):
    """Volume statistics (--stats) via the ops-registry 'statistics' op —
    the reference prints per-volume info at startup; here it is one JSONL
    event per array. device=False computes host-side in chunks (piecewise
    runs: a full volume must never land on the device)."""
    if not device:
        for name, a in arrays.items():
            flat = np.asarray(a).reshape(-1)
            tot = ssq = 0.0
            step = 1 << 24
            for off in range(0, flat.size, step):
                c = flat[off:off + step]
                tot += float(c.sum(dtype=np.float64))
                ssq += float(np.square(c, dtype=np.float64).sum())
            log.log("statistics", volume=name, min=float(flat.min()),
                    max=float(flat.max()), mean=tot / flat.size,
                    l2=float(np.sqrt(ssq)), **extra)
        return
    import jax

    from tpuflow3d.ops import get_op

    fn = jax.jit(get_op("statistics").fn)
    for name, a in arrays.items():
        s = {k: float(v) for k, v in fn(a).items()}
        log.log("statistics", volume=name, **s, **extra)


def _log_fit(log, i0, i1, flow, params=None, chunk_z=None, **extra):
    """Registration-fit diagnostic (--report-fit): |warp(i1, flow) - i0|
    vs the unwarped difference. chunk_z streams the diagnostic in Z-chunks
    (piecewise runs: the in-core form needs i0+i1+flow+warped resident —
    ~7 full volumes — which would OOM the device right after an
    out-of-core solve)."""
    if chunk_z:
        from tpuflow3d.piecewise import registration_fit_streamed
        mean_r, max_r, before = registration_fit_streamed(
            i0, i1, flow, params, chunk_z)
        log.log("fit", mean_residual=mean_r, max_residual=max_r,
                mean_abs_diff_unwarped=before, **extra)
        return
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
            mean_abs_diff_unwarped=float(before), **extra)


def _pair_diagnostics(args, log, params, i0, i1, flow,
                      include_frames: bool, **extra):
    """The shared --report-fit/--stats block for a solved pair; streams on
    piecewise runs so diagnostics can never OOM the device after an
    out-of-core solve."""
    chunk = args.chunk_z if args.piecewise else None
    if args.report_fit:
        _log_fit(log, i0, i1, flow, params=params, chunk_z=chunk, **extra)
    if args.stats:
        mag = np.sqrt(np.sum(np.square(flow, dtype=np.float64), axis=0))
        arrays = {"flow_magnitude": mag.astype(np.float32)}
        if include_frames:
            arrays = {"frame0": i0, "frame1": i1, **arrays}
        _log_stats(log, arrays, device=not args.piecewise, **extra)


def _run_sequence_distributed(args, params, log) -> int:
    """Time-series mode over a multi-process cluster: each consecutive
    pair runs the host-local-IO sharded solve; the jitted executable is
    shared across pairs (sharding._sharded_fn is memoized), and per-pair
    checkpoint dirs make long 4D runs resumable at pair granularity."""
    import jax

    dist, meta, mesh = _distributed_setup(args, log, args.frames[0])
    params = _notice_flow_clamp(params, mesh.devices.size, log)
    voxels = float(np.prod(meta.shape))
    for t in range(len(args.frames) - 1):
        ck = (f"{args.checkpoint_dir.rstrip('/')}/pair{t:04d}"
              if args.checkpoint_dir else None)
        prefix = f"{args.out}{t:04d}_"
        t0 = time.perf_counter()
        flow = dist.compute_flow_distributed(
            args.frames[t], args.frames[t + 1], meta, params, mesh,
            out_prefix=prefix, checkpoint_dir=ck)
        flow.block_until_ready()
        dt = time.perf_counter() - t0
        log.log("pair_done", t=t, frame0=args.frames[t],
                frame1=args.frames[t + 1], seconds=dt,
                voxels_per_s=voxels / dt, prefix=prefix,
                process=jax.process_index())
        if jax.process_index() == 0:
            print(f"tpuflow3d: pair {t} ({dt:.2f}s) -> {prefix}",
                  file=sys.stderr)
    return 0


def _run_sequence(args, params, log) -> int:
    """Time-series mode: consecutive-pair flows over N frames (the
    reference's 4D-tomography workflow is exactly this loop of per-pair
    runs; here the compiled executable is shared across pairs)."""
    if len(args.frames) < 2:
        raise ValueError("--frames needs at least 2 volumes")
    if args.distributed:
        if args.track:
            raise ValueError(
                "--track needs the assembled global flow; run it on the "
                "written flows afterwards (tpuflow3d.postproc)")
        return _run_sequence_distributed(args, params, log)
    tracks = None
    if args.track:
        from tpuflow3d import postproc
        pts = postproc.read_seed_csv(args.track)
        tracks = [pts]
    timer = None
    if args.timings:
        from tpuflow3d.utils.profiling import PhaseTimer
        timer = PhaseTimer()
    import contextlib

    from tpuflow3d.utils.profiling import xla_trace

    # `with` (not a bare stack.close() at the end) so a mid-sequence error
    # still finalizes the profiler trace and joins the IO pools.
    with contextlib.ExitStack() as stack:
        stack.enter_context(xla_trace(args.profile_dir))
        # Frame IO overlaps the solve: frame t+2 loads (threaded C++ pread
        # + widening) while pair t computes on-device — the disk-bound
        # phase of the reference's per-pair reload loop (SURVEY.md §5.1)
        # disappears from the critical path for all but the first two
        # frames.
        from concurrent.futures import ThreadPoolExecutor
        pool = stack.enter_context(ThreadPoolExecutor(max_workers=1))
        writer = stack.enter_context(ThreadPoolExecutor(max_workers=1))
        wfut = None
        i0 = _load(args.frames[0], args.dims, args.dtype)
        _auto_mode(args, i0.shape, params, log)
        pending = pool.submit(_load, args.frames[1], args.dims, args.dtype)
        for t, path in enumerate(args.frames[1:]):
            i1 = pending.result()
            if t + 2 < len(args.frames):
                pending = pool.submit(_load, args.frames[t + 2], args.dims,
                                      args.dtype)
            if i0.shape != i1.shape:
                raise ValueError(f"frame shapes differ at t={t}: "
                                 f"{i0.shape} vs {i1.shape} ({path})")
            ck = (f"{args.checkpoint_dir.rstrip('/')}/pair{t:04d}"
                  if args.checkpoint_dir else None)
            t0 = time.perf_counter()
            flow, diag = _solve_pair(args, params, i0, i1, log, timer, ck)
            dt = time.perf_counter() - t0
            prefix = f"{args.out}{t:04d}_"
            # Writes also overlap the next pair's solve (at most one
            # pending, bounding host memory to one retained flow field).
            if wfut is not None:
                wfut.result()
            def _write_outputs(prefix=prefix, flow=flow):
                vio.write_flow(prefix, flow,
                               magnitude=not args.no_magnitude)
                _write_derived(args, log, prefix, flow)
                _export_vtk(args, log, prefix, flow)

            wfut = writer.submit(_write_outputs)
            if tracks is not None:
                from tpuflow3d import postproc
                tracks.append(
                    postproc.advance_points(np.asarray(flow), tracks[-1]))
            log.log("pair_done", t=t, frame0=args.frames[t], frame1=path,
                    seconds=dt, voxels_per_s=float(np.prod(i0.shape)) / dt,
                    prefix=prefix)
            if params.track_residuals and "residuals" in diag:
                log.log("residuals", t=t, summary=summarize_residuals(
                    np.asarray(diag["residuals"])))
            _pair_diagnostics(args, log, params, i0, i1, flow,
                              include_frames=False, t=t)
            print(f"tpuflow3d: pair {t} ({dt:.2f}s) -> {prefix}",
                  file=sys.stderr)
            i0 = i1
        if wfut is not None:
            wfut.result()  # surface writer errors before declaring success
    if tracks is not None:
        from tpuflow3d import postproc
        path = f"{args.out}tracks.csv"
        postproc.write_tracks_csv(path, np.stack(tracks))
        log.log("tracks_written", path=path, points=len(tracks[0]),
                steps=len(tracks) - 1)
        print(f"tpuflow3d: {len(tracks[0])} tracks over "
              f"{len(tracks) - 1} steps -> {path}", file=sys.stderr)
    if timer is not None:
        log.log("timings", phases=timer.report())
    return 0


def _run(args) -> int:
    if args.platform:
        # Must happen before any jax backend init; env JAX_PLATFORMS is
        # overridden by some environments' sitecustomize, so set the config
        # directly.
        import jax
        jax.config.update("jax_platforms", args.platform)
    log = JsonlLogger(path=args.log_json)
    params = params_from_args(args)
    log.log("start", params=params, frame0=args.frame0, frame1=args.frame1,
            frames=args.frames)
    _check_path_flags(args)

    if args.frames:
        return _run_sequence(args, params, log)
    if args.distributed:
        return _run_distributed(args, params, log)

    i0 = _load(args.frame0, args.dims, args.dtype)
    i1 = _load(args.frame1, args.dims, args.dtype)
    if i0.shape != i1.shape:
        print(f"frame shapes differ: {i0.shape} vs {i1.shape}",
              file=sys.stderr)
        return 2
    _auto_mode(args, i0.shape, params, log)

    from tpuflow3d.utils.profiling import xla_trace

    t0 = time.perf_counter()
    diagnostics = params.track_residuals
    timer = None
    if args.timings:
        from tpuflow3d.utils.profiling import PhaseTimer
        timer = PhaseTimer()
    with xla_trace(args.profile_dir):
        flow, diag = _solve_pair(args, params, i0, i1, log, timer,
                                 args.checkpoint_dir)
    dt = time.perf_counter() - t0
    if timer is not None:
        report = timer.report()
        log.log("timings", phases=report)
        for name, rec in report.items():
            print(f"tpuflow3d: {name}: {rec['seconds']:.3f}s",
                  file=sys.stderr)

    voxels = float(np.prod(i0.shape))
    log.log("done", seconds=dt, voxels_per_s=voxels / dt)
    if diagnostics and "residuals" in diag:
        log.log("residuals",
                summary=summarize_residuals(np.asarray(diag["residuals"])))

    # Outputs first, diagnostics after: a failing/OOM-ing diagnostic must
    # never discard the completed flow of a long run.
    vio.write_flow(args.out, flow, magnitude=not args.no_magnitude)
    log.log("written", prefix=args.out)
    _write_derived(args, log, args.out, flow)
    _export_vtk(args, log, args.out, flow)
    if args.check_consistency:
        from tpuflow3d.postproc import consistency_error
        # Reverse solve reuses the compiled executable (same shapes/params).
        flow_bwd, _ = _solve_pair(args, params, i1, i0, log, None,
                                  checkpoint_dir=None)
        err = consistency_error(flow, flow_bwd, interp=params.interp)
        vio.write_raw(f"{args.out}consistency.raw", err.astype(np.float32))
        frac = float((err > 1.0).mean())
        log.log("consistency", mean=float(err.mean()), max=float(err.max()),
                frac_above_1vox=frac, path=f"{args.out}consistency.raw")
        print(f"tpuflow3d: fwd-bwd consistency mean {err.mean():.4f} vox, "
              f"{100 * frac:.2f}% above 1 voxel", file=sys.stderr)
    _pair_diagnostics(args, log, params, i0, i1, flow, include_frames=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
