"""Parameter exploration on the ladder configs (dev tool, not a test)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import time

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")  # sitecustomize forces axon

from tpuflow3d import FlowParams, compute_flow
from tpuflow3d import synthetic as syn


def run(shape, fn, p, seed=0):
    i0, i1, true = syn.make_pair(shape, fn, seed=seed)
    t0 = time.time()
    est = np.asarray(compute_flow(i0, i1, p))
    dt = time.time() - t0
    mask = syn.gradient_mask(i0, 0.75) & syn.interior_mask(shape, 4)
    return syn.epe(est, true, mask), dt, est


if __name__ == "__main__":
    shape = (64, 64, 64)
    cases = {
        "tx2": syn.translation((0.0, 0.0, 2.0)),
        "t3d": syn.translation((1.5, -1.0, 0.75)),
        "sin": syn.sinusoid((48, 48, 48), amplitude=1.0),
    }
    base = FlowParams(levels=3, scale_factor=0.5, warps=3,
                      inner_iterations=3, sweeps=20, alpha=0.1)
    grids = {
        "alpha": [0.02, 0.05, 0.1, 0.2, 0.5],
        "warps": [3, 5, 8],
        "sweeps": [20, 40],
        "penalizer_smooth": ["charbonnier", "quadratic"],
    }
    import json
    if len(sys.argv) > 1 and sys.argv[1] == "json":
        # bench/tune.py json '[{"alpha":0.02,"warps":5}, ...]' [cases...]
        configs = json.loads(sys.argv[2])
        sel = sys.argv[3:] or list(cases)
        for ov in configs:
            p = base.replace(**ov)
            msgs = []
            for cname in sel:
                shp = (48, 48, 48) if cname == "sin" else shape
                err, dt, _ = run(shp, cases[cname], p)
                msgs.append(f"{cname}={err:.4f}({dt:.1f}s)")
            print(f"{ov}: " + " ".join(msgs), flush=True)
        sys.exit(0)

    name = sys.argv[1] if len(sys.argv) > 1 else "alpha"
    for val in grids[name]:
        p = base.replace(**{name: val})
        msgs = []
        for cname, fn in cases.items():
            shp = (48, 48, 48) if cname == "sin" else shape
            err, dt, _ = run(shp, fn, p)
            msgs.append(f"{cname}={err:.4f}({dt:.1f}s)")
        print(f"{name}={val}: " + " ".join(msgs), flush=True)
