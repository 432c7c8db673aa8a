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


def _kernel_fractions(shape, p):
    """Per-kernel HBM-roofline fractions (BASELINE.md): SOR half-sweep and
    fused warp+derivatives, measured standalone. Reported to stderr."""
    import jax
    import jax.numpy as jnp

    from tpuflow3d.derivatives import derivatives
    from tpuflow3d.grid import HaloCtx
    from tpuflow3d.pallas.sor import sor_halfsweep_pallas
    from tpuflow3d.pallas.warp_grad import warp_grad_pallas
    from tpuflow3d.solver import compute_terms
    from tpuflow3d.utils import roofline

    rng = np.random.default_rng(0)
    i0 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    i1 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    flow = jnp.zeros((3, *shape), jnp.float32)
    du = jnp.asarray(rng.normal(size=(3, *shape)).astype(np.float32)) * .05

    @jax.jit
    def make_terms(i0, i1, flow, du):
        g, it = derivatives(i0, i1)
        return compute_terms(g, it, flow, du, p)

    t = make_terms(i0, i1, flow, du)
    jax.block_until_ready(t)
    ctx = HaloCtx()
    lo, hi = ctx.z_halo_planes(du)
    plo, phi = ctx.z_halo_planes(t.psi_s)
    d = shape[0]
    vox = float(np.prod(shape))
    bw = roofline.device_hbm_bw()

    def half(duv):
        return sor_halfsweep_pallas(duv, t.c, t.g, t.psi_s, t.psi_d, lo, hi,
                                    plo, phi, 0, p.alpha, p.omega, 0, d)

    o = half(du)
    o.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        o = half(o)
    o.block_until_ready()
    dt = (time.perf_counter() - t0) / 10
    bytes_model = roofline.SweepByteModel().per_half_sweep
    frac = (vox * bytes_model / dt) / bw
    print(f"bench: SOR half-sweep {dt * 1e3:.2f} ms, "
          f"{vox / dt / 1e9:.2f} Gvox/s, HBM fraction {frac:.3f}",
          file=sys.stderr, flush=True)

    clamp = 2.0
    fl = jnp.clip(du * 40, -clamp, clamp)

    def wg():
        return warp_grad_pallas(i1, fl, i0, ctx, max_disp=clamp)

    o = wg()
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(5):
        o = wg()
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / 5
    # warp+deriv reads i1 slab + flow(12) + i0(4), writes g(12)+it(4)
    frac = (vox * (4 + 12 + 4 + 16) / dt) / bw
    print(f"bench: warp+deriv {dt * 1e3:.2f} ms, "
          f"{vox / dt / 1e9:.2f} Gvox/s, HBM fraction {frac:.3f}",
          file=sys.stderr, flush=True)


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
    # flow_clamp=2 engages the fused Pallas warp+derivative kernel (the
    # XLA gather path materializes several full-volume coordinate temps,
    # which matters near HBM capacity); the bench motion is |s| <= 1.5.
    p = FlowParams(levels=levels, scale_factor=0.5, warps=3,
                   inner_iterations=3, sweeps=sweeps, alpha=0.05,
                   flow_clamp=2.0)

    shape = (size, size, size)
    if size >= 256:
        syn.set_coord_dtype(np.float32)  # several-x faster generation
    print(f"bench: generating {shape} pair...", file=sys.stderr, flush=True)
    i0, i1, true = syn.make_pair(shape, syn.translation((1.5, -1.0, 0.75)),
                                 n_blobs=30, seed=0)

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    voxels = float(np.prod(shape))
    print(f"bench: device {dev.device_kind}, compiling...", file=sys.stderr,
          flush=True)
    t0 = time.perf_counter()
    flow = compute_flow(i0, i1, p)
    flow.block_until_ready()
    print(f"bench: first run (incl compile) {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    times = []
    for _ in range(reps):
        flow = None  # release the previous output: a retained multi-GB
        # flow plus the program's temps can exceed single-chip HBM
        t0 = time.perf_counter()
        flow = compute_flow(i0, i1, p)
        flow.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    vps = voxels / dt

    # EPE entirely on-device (the ground truth is a constant translation):
    # pulling a multi-GB flow field to the host is exactly what the
    # piecewise/sharded IO paths exist to avoid.
    import jax
    import jax.numpy as jnp

    @jax.jit
    def epe_device(fl, i0d, shift):
        gz = jnp.gradient(i0d, axis=0)
        gy = jnp.gradient(i0d, axis=1)
        gx = jnp.gradient(i0d, axis=2)
        mag = jnp.sqrt(gz * gz + gy * gy + gx * gx)
        # mean-based gradient threshold (a large device sort for a true
        # quantile faults the emulated chip at 512^3)
        thr = 1.5 * jnp.mean(mag)
        b = 4
        mask = (mag > thr)[b:-b, b:-b, b:-b]
        err = jnp.sqrt(jnp.sum(
            (fl - shift.reshape(3, 1, 1, 1)) ** 2, axis=0))[b:-b, b:-b, b:-b]
        return jnp.sum(jnp.where(mask, err, 0.0)) / jnp.sum(mask)

    def _slab_epe():
        # Small-D2H path: a 4-plane central slab (a few MB) instead of the
        # full field — re-transferring i0 and allocating EPE temps after a
        # near-HBM-peak program trips the emulated device at 512^3.
        zc = shape[0] // 2
        slab = np.asarray(flow[:, zc - 2:zc + 2])
        mask = (syn.gradient_mask(i0[zc - 2:zc + 2], 0.75)
                & syn.interior_mask(slab.shape[1:], 2))
        return syn.epe(slab, true[:, zc - 2:zc + 2], mask)

    if voxels >= 512 ** 3:
        err = _slab_epe()
    else:
        try:
            err = float(epe_device(
                flow, jnp.asarray(i0),
                jnp.asarray([1.5, -1.0, 0.75], jnp.float32)))
        except Exception as e:
            print(f"bench: on-device EPE failed ({type(e).__name__}); "
                  "falling back to a central-slab host EPE",
                  file=sys.stderr, flush=True)
            err = _slab_epe()

    if os.environ.get("TPUFLOW_BENCH_KERNELS") == "1":
        _kernel_fractions(shape, p)

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
