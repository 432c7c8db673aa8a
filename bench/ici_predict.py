"""ICI weak-scaling prediction from MEASURED on-chip sweep times
(VERDICT r3 missing #2: the claim that real ICI closes the virtual-CPU
weak-scaling gap rested on a pure byte model; its testable half — how
per-half-sweep time scales with per-device slab depth on the attached
chip — was unmeasured).

Measures the production packed-SOR half-sweep at per_dev_z in {16, 32,
64, 128} (fixed H=W, K chained sweeps in one program), then combines the
measured rates with the halo byte model to emit a predicted 2-8-chip
weak-scaling curve.

Model and stated assumptions (all recorded in the output):
- per half-sweep, each interior chip ppermutes 1 Z-plane of the
  other-color packed du in each direction: bytes = 2 * 3 * H * (W/2) * 4.
  psi_s halos move once per nonlinearity update (amortized ~1/(2*sweeps),
  ignored). Residual psum: one scalar latency per sweep (folded into
  --coll-latency-us).
- comm does NOT overlap compute (conservative; XLA can overlap ppermute
  with interior compute).
- ICI effective bandwidth per neighbor exchange: --ici-gbps (default 45
  GB/s, a conservative public per-link v5e figure); per-collective
  latency --coll-latency-us (default 2).
- the compute time per half-sweep is taken three ways: (a) measured on
  the attached chip (timing model may be 'emulated' — recorded), (b) the
  v5e HBM-spec byte model 36 B/voxel / 819 GB/s, (c) the byte model
  derated by --sor-fraction (the bench's measured HBM fraction).
  efficiency_N = t_comp / (t_comp + t_halo) for interior chips.

Usage: python bench/ici_predict.py [--hw 256] [--out SCALING_r04.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import numpy as np


def measure_halfsweep(jnp, per_dev_z: int, hw: int, K: int = 10):
    """Best per-half-sweep seconds for a (per_dev_z, hw, hw) slab, packed
    kernel, K chained full sweeps in one program (bench.py footing)."""
    import jax
    from jax import lax

    from tpuflow3d.derivatives import derivatives
    from tpuflow3d.grid import HaloCtx
    from tpuflow3d.pallas.sor_packed import pack_color, sor_halfsweep_packed
    from tpuflow3d.params import FlowParams
    from tpuflow3d.solver import compute_terms
    from tpuflow3d.warp import warp_volume

    p = FlowParams(alpha=0.05)
    shape = (per_dev_z, hw, hw)
    rng = np.random.default_rng(0)
    i0 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    shift = jnp.zeros((3, *shape), jnp.float32).at[2].set(0.7)
    i1 = warp_volume(i0, -shift)
    g, it = derivatives(i0, i1)
    flow = jnp.zeros((3, *shape), jnp.float32)
    du = jnp.asarray(rng.normal(size=(3, *shape)).astype(np.float32)) * .05
    t = compute_terms(g, it, flow, du, p)
    ctx = HaloCtx()
    d = per_dev_z

    @jax.jit
    def pack_all(du, t):
        pk = lambda a, col: pack_color(a, col, 0)
        return ([pk(du, c) for c in (0, 1)], [pk(t.c, c) for c in (0, 1)],
                [pk(t.g, c) for c in (0, 1)],
                [pk(t.psi_s, c) for c in (0, 1)],
                [pk(t.psi_d, c) for c in (0, 1)])

    du_pk, c_pk, g_pk, ps_pk, pd_pk = pack_all(du, t)
    import jax as _j
    _j.block_until_ready((du_pk, c_pk))
    ps_halos = [ctx.z_halo_planes(ps_pk[c]) for c in (0, 1)]

    @jax.jit
    def loop(dp, c_pk, g_pk, ps_pk, pd_pk, ps_halos):
        def body(i, dp):
            d0, d1 = dp
            lo, hi = ctx.z_halo_planes(d1)
            d0 = sor_halfsweep_packed(
                d0, d1, c_pk[0], g_pk[0], ps_pk[0], ps_pk[1], pd_pk[0],
                lo, hi, ps_halos[1][0], ps_halos[1][1], 0,
                p.alpha, p.omega, 0, d)
            lo, hi = ctx.z_halo_planes(d0)
            d1 = sor_halfsweep_packed(
                d1, d0, c_pk[1], g_pk[1], ps_pk[1], ps_pk[0], pd_pk[1],
                lo, hi, ps_halos[0][0], ps_halos[0][1], 0,
                p.alpha, p.omega, 1, d)
            return (d0, d1)
        return lax.fori_loop(0, K, body, dp)

    args_ = (c_pk, g_pk, ps_pk, pd_pk, ps_halos)
    o = loop(tuple(du_pk), *args_)
    _j.block_until_ready(o)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = loop(o, *args_)
        _j.block_until_ready(o)
        best = min(best, time.perf_counter() - t0)
    return best / (K * 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--per-dev-z", type=int, nargs="+",
                    default=[16, 32, 64, 128])
    ap.add_argument("--ici-gbps", type=float, default=45.0)
    ap.add_argument("--coll-latency-us", type=float, default=2.0)
    ap.add_argument("--dcn-gbps", type=float, default=12.5,
                    help="effective per-direction host-boundary DCN "
                         "bandwidth (conservative public v5e-class figure:"
                         " ~100-200 Gbps NICs per host => ~12.5-25 GB/s; "
                         "the stated assumption of the N>=2-host leg)")
    ap.add_argument("--dcn-latency-us", type=float, default=20.0)
    ap.add_argument("--chips-per-host", type=int, default=4)
    ap.add_argument("--sor-fraction", type=float, default=0.787,
                    help="measured packed-SOR HBM fraction (bench.py)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpuflow3d.utils import roofline

    model, bw, ratio = roofline.probe_timing_model()
    sweep_bytes = roofline.SweepByteModel(packed=True).per_half_sweep
    v5e_bw = 819e9
    hw = args.hw

    measured = []
    for z in args.per_dev_z:
        dt = measure_halfsweep(jnp, z, hw)
        vox = z * hw * hw
        measured.append({
            "per_dev_z": z, "halfsweep_ms": round(dt * 1e3, 4),
            "gvox_per_s": round(vox / dt / 1e9, 3),
            "implied_gbps": round(vox * sweep_bytes / dt / 1e9, 1)})
        print(json.dumps(measured[-1]), flush=True)

    plane_bytes = 3 * hw * (hw // 2) * 4  # one packed du plane, per dir
    halo_bytes = 2 * plane_bytes          # interior chip: both directions
    t_lat = args.coll_latency_us * 1e-6
    ici = args.ici_gbps * 1e9

    def curve(t_comp_fn):
        rows = []
        for n in (1, 2, 4, 8):
            per = []
            # Worst (slowest) chip sets step time. At n=2 BOTH chips
            # border a global face and exchange in ONE direction; at
            # n>=3 interior chips exchange both directions.
            dirs = 0 if n == 1 else (1 if n == 2 else 2)
            for m in measured:
                t_comp = t_comp_fn(m)
                t_halo = (0.0 if dirs == 0
                          else dirs * plane_bytes / ici + t_lat)
                per.append({"per_dev_z": m["per_dev_z"],
                            "efficiency": round(
                                t_comp / (t_comp + t_halo), 4)})
            rows.append({"devices": n, "per_config": per})
        return rows

    v5e_t = lambda m: m["per_dev_z"] * hw * hw * sweep_bytes / v5e_bw
    frac_t = lambda m: v5e_t(m) / max(args.sor_fraction, 1e-6)
    meas_t = lambda m: m["halfsweep_ms"] * 1e-3

    def dcn_curve(t_comp_fn):
        """N >= 2 HOSTS (the BASELINE weak-scaling gate's own wording):
        Z sharded across chips-per-host * n_hosts chips; the step time is
        set by a HOST-BOUNDARY chip, whose lo/hi halos ride DCN one way
        and ICI the other — per half-sweep
        t_halo = plane/dcn + lat_dcn + plane/ici + lat_ici (no overlap,
        conservative). With Z sharding this worst-chip bound is
        HOST-COUNT-INDEPENDENT (every added host adds one more boundary
        pair but the slowest chip's halo cost is unchanged), so ONE row
        covers every N >= 2."""
        dcn = args.dcn_gbps * 1e9
        t_dcn_lat = args.dcn_latency_us * 1e-6
        per = []
        for m in measured:
            t_comp = t_comp_fn(m)
            t_halo = (plane_bytes / dcn + t_dcn_lat
                      + plane_bytes / ici + t_lat)
            per.append({"per_dev_z": m["per_dev_z"],
                        "efficiency": round(
                            t_comp / (t_comp + t_halo), 4)})
        return [{"hosts": ">=2 (host-count-independent worst-chip bound)",
                 "chips_per_host": args.chips_per_host,
                 "per_config": per}]

    rec = {
        "kind": "predicted_ici",
        "hw": hw,
        "timing_model": model,
        "work_scale_ratio": round(ratio, 2),
        "measured_halfsweeps": measured,
        "halo_bytes_per_halfsweep": halo_bytes,
        "assumptions": {
            "ici_gbps": args.ici_gbps,
            "coll_latency_us": args.coll_latency_us,
            "sor_fraction": args.sor_fraction,
            "overlap": "none (conservative)",
            "notes": "interior-chip halo = 1 packed du plane each "
                     "direction per half-sweep; psi_s halos amortized "
                     "out; v5e spec HBM 819 GB/s"},
        "predicted_weak_scaling": {
            "from_measured_on_chip": curve(meas_t),
            "from_v5e_byte_model": curve(v5e_t),
            "from_v5e_derated_by_measured_fraction": curve(frac_t)},
        "predicted_dcn": {
            "assumptions": {"dcn_gbps": args.dcn_gbps,
                            "dcn_latency_us": args.dcn_latency_us,
                            "chips_per_host": args.chips_per_host,
                            "worst_chip": "host-boundary (one DCN + one "
                                          "ICI direction, no overlap)"},
            "from_v5e_byte_model": dcn_curve(v5e_t),
            "from_v5e_derated_by_measured_fraction": dcn_curve(frac_t)},
    }
    line = json.dumps(rec)
    print(line, flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
