"""One 1024-class finest-level chunk launch ON THE ATTACHED TPU
(VERDICT r4 weak #2 / next-round #8: the 1024^3 rung had never touched
the chip; the full run is tunnel-bound at ~36 h, but a single chunk can
transit).

Executes exactly the production launch the 1024^3 piecewise run performs
at its finest level — piecewise._ph_fused_warp_iter (fused warp +
derivatives + terms + 2*sweeps wavefront half-sweeps + median +
accumulate + clamp) on a (chunk + 2S + 2*mw, 1024, 1024) slab — and
records, on real silicon: compile time, per-launch device wall time
(steady-state, inputs resident), the H2D/D2H transfer time of one chunk
round-trip through the tunnel, and the device memory highwater.

Scope is PARTIAL by construction and labeled so in the record: one
interior chunk column (kbase=512), carry entering as zeros (a mid-column
launch would carry the graded frontier band; identical shapes/program).
The slab inputs are the true analytic 1024^3 texture restricted to the
slab's Z window (demo_1024_piecewise's generator, windowed), so the
launch computes real data, not zeros.

Usage: python bench/chunk1024_tpu.py [--hw 1024] [--chunk 32] [--out F]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import numpy as np

from demo_1024_piecewise import SHIFT, gen_pair  # noqa: E402


def gen_window(z_lo, size_z, hw):
    """Planes [z_lo, z_lo + size_z) of demo_1024_piecewise.gen_pair's
    analytic texture — the SAME generator (z_lo window parameter), so
    the slab is exactly what the full 1024^3 run would stream."""
    return gen_pair((size_z, hw, hw), z_lo=z_lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--sweeps", type=int, default=6)
    ap.add_argument("--kbase", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpuflow3d.params import FlowParams
    from tpuflow3d.piecewise import _ph_fused_warp_iter, stream_margin

    dg = 1024
    p = FlowParams(levels=5, warps=2, inner_iterations=1,
                   sweeps=args.sweeps, alpha=0.02, flow_clamp=2.0,
                   penalizer_data="quadratic",
                   penalizer_smooth="quadratic")
    mw = stream_margin(p)
    s2 = 2 * p.sweeps
    chunk = args.chunk
    size = chunk + s2 + 2 * mw
    lo = args.kbase - chunk - mw
    hw = args.hw
    print(f"chunk1024: slab ({size}, {hw}, {hw}) at z0={lo}, "
          f"kbase={args.kbase}, margin {mw}", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    i0s_h, i1s_h = gen_window(lo, size, hw)
    fls_h = np.broadcast_to(
        np.asarray(SHIFT, np.float32).reshape(3, 1, 1, 1),
        (3, size, hw, hw)).copy()
    gen_s = time.perf_counter() - t0

    carry = jnp.zeros((3, s2 + 2, hw, hw), jnp.float32)

    # H2D of one chunk's inputs through the tunnel, timed.
    t0 = time.perf_counter()
    i0s = jnp.asarray(i0s_h)
    i1s = jnp.asarray(i1s_h)
    fls = jnp.asarray(fls_h)
    jax.block_until_ready((i0s, i1s, fls))
    h2d_s = time.perf_counter() - t0
    h2d_bytes = i0s_h.nbytes + i1s_h.nbytes + fls_h.nbytes

    run = lambda: _ph_fused_warp_iter(
        i0s, i1s, fls, carry, jnp.int32(lo), jnp.int32(args.kbase),
        dg=dg, p=p, sweeps=p.sweeps, chunk=chunk)

    t0 = time.perf_counter()
    fl_new, carry_out = run()
    jax.block_until_ready((fl_new, carry_out))
    first_s = time.perf_counter() - t0

    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        o = run()
        jax.block_until_ready(o)
        best = min(best, time.perf_counter() - t0)

    t0 = time.perf_counter()
    out_np = np.asarray(fl_new)
    d2h_s = time.perf_counter() - t0

    # Flow sanity on the finalized window (the host driver would write
    # planes [kbase - chunk - 1, kbase - 1) of this result).
    w0 = args.kbase - chunk - 1 - lo
    med = [float(np.median(out_np[i, w0:w0 + chunk, 256:768, 256:768]))
           for i in range(3)]
    # One warp iteration from a SHIFT initialization: flow must stay at
    # the true shift (fixed point) — drift means the launch is broken.
    ok = all(abs(m - s) < 0.25 for m, s in zip(med, SHIFT))

    stats = jax.devices()[0].memory_stats() or {}
    row = {"bench": "chunk1024_tpu", "size": 1024, "hw": hw,
           "chunk_z": chunk, "sweeps": p.sweeps,
           "platform": jax.default_backend(),
           "device": str(jax.devices()[0].device_kind),
           "scope": "ONE finest-level fused-warp-iteration chunk launch "
                    "(interior column, carry=0) — partial by design; "
                    "full-run wall time is tunnel-transfer-bound",
           "slab_shape": [size, hw, hw],
           "gen_seconds": round(gen_s, 2),
           "h2d_seconds": round(h2d_s, 2),
           "h2d_gbytes": round(h2d_bytes / 1e9, 3),
           "compile_plus_first_seconds": round(first_s, 2),
           "launch_seconds_best": round(best, 3),
           "d2h_seconds": round(d2h_s, 2),
           "d2h_gbytes": round(out_np.nbytes / 1e9, 3),
           "per_chunk_roundtrip_seconds": round(h2d_s + best + d2h_s, 2),
           "device_bytes_in_use": int(stats.get("bytes_in_use", -1)),
           "device_peak_bytes": int(stats.get("peak_bytes_in_use", -1)),
           "central_flow_median": [round(m, 4) for m in med],
           "expected": list(SHIFT), "ok": ok}
    line = json.dumps(row)
    print(line, flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
