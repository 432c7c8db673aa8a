"""Dispatch-mode A/B (VERDICT r3 weak #6): one-jit vs level-stepped vs
warp-stepped execution of the same config, steady-state wall times.

The r3 256^3 gate rows ran warp-stepped (each warp iteration its own
device program + host sync) because the emulated chip kills long programs
— the XLA tricubic gather made one level's program exceed its cap. The r4
fused tricubic Pallas kernel shrinks per-warp device time ~90x, so the
gate config should no longer need warp-stepping; this script quantifies
what each dispatch mode costs at a size where all three run, so the
policy ("prefer fused/level dispatch; warp-step only when the device
demands it") rests on a measurement.

Writes JSONL rows {mode, seconds_best, seconds_all, dispatches}.
Usage: python bench/dispatch_ab.py [--size 128] [--reps 3]
       [--out DISPATCH_AB_r04.jsonl]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpuflow3d import synthetic as syn
    from tpuflow3d.params import FlowParams
    from tpuflow3d.pipeline import compute_flow, compute_flow_checkpointed

    size = args.size
    shape = (size, size, size)
    levels = {64: 3, 128: 4}.get(size, 5)
    # The gate config's shape at this size: tricubic fused warp, warps=8.
    p = FlowParams(levels=levels, scale_factor=0.5, warps=8,
                   inner_iterations=3, sweeps=30, alpha=0.05,
                   interp="tricubic", flow_clamp=2.0)
    i0, i1, _ = syn.make_pair(shape, syn.translation((1.5, -1.0, 0.75)),
                              n_blobs=30, seed=0)
    i0d, i1d = jnp.asarray(i0), jnp.asarray(i1)

    modes = [
        ("one_jit", lambda: compute_flow(i0d, i1d, p)),
        ("level_stepped",
         lambda: compute_flow_checkpointed(i0d, i1d, p)),
        ("warp_stepped",
         lambda: compute_flow_checkpointed(i0d, i1d, p,
                                           warp_stepped=True)),
    ]
    # Dispatch counts: one_jit = 1 program; level_stepped = pyramids +
    # one program per level; warp_stepped = pyramids + warps programs per
    # level + upsample programs.
    n_lv = len(p.level_shapes(shape))
    dispatches = {"one_jit": 1, "level_stepped": 1 + n_lv,
                  "warp_stepped": 1 + n_lv * p.warps + (n_lv - 1)}

    out_path = args.out or "DISPATCH_AB_r04.jsonl"
    f = open(out_path, "a")
    dev = jax.devices()[0]
    ok = True
    results = {}
    for name, fn in modes:
        try:
            t0 = time.perf_counter()
            flow = fn()
            flow.block_until_ready()
            t_first = time.perf_counter() - t0
            ts = []
            for _ in range(args.reps):
                flow = None
                t0 = time.perf_counter()
                flow = fn()
                flow.block_until_ready()
                ts.append(time.perf_counter() - t0)
            flow = None
            results[name] = min(ts)
            row = {"mode": name, "size": size,
                   "seconds_best": round(min(ts), 3),
                   "seconds_all": [round(t, 3) for t in ts],
                   "first_call_s": round(t_first, 1),
                   "dispatches": dispatches[name],
                   "device": str(dev.device_kind),
                   "params": {"warps": p.warps, "sweeps": p.sweeps,
                              "levels": p.levels, "interp": p.interp}}
        except Exception as e:
            ok = False
            row = {"mode": name, "size": size, "failed":
                   f"{type(e).__name__}: {e}"}
        f.write(json.dumps(row) + "\n")
        f.flush()
        print(json.dumps(row), flush=True)
    if "one_jit" in results and "warp_stepped" in results:
        extra = results["warp_stepped"] - results["one_jit"]
        n_extra = dispatches["warp_stepped"] - dispatches["one_jit"]
        row = {"summary": "warp_stepped_overhead", "size": size,
               "extra_seconds_vs_one_jit": round(extra, 3),
               "extra_dispatches": n_extra,
               "per_dispatch_ms": round(extra / n_extra * 1e3, 2)}
        f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)
    f.close()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
