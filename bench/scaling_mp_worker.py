"""Worker for the multi-process weak-scaling point (bench/scaling.py's
gloo leg): one JAX process of an N-process CPU cluster running the
Z-sharded pipeline at a fixed per-device volume; rank 0 prints a JSON row.

Usage: scaling_mp_worker.py <rank> <nproc> <port> <per_dev_z> <hw> <sweeps>
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main():
    rank, nproc = int(sys.argv[1]), int(sys.argv[2])
    port = sys.argv[3]
    per_dev_z, hw, sweeps = (int(a) for a in sys.argv[4:7])

    import numpy as np

    from tpuflow3d import FlowParams
    from tpuflow3d import distributed as dist
    from tpuflow3d import synthetic as syn
    from tpuflow3d.sharding import (_sharded_fn, prepare_params,
                                    shard_volume)

    dist.initialize(f"localhost:{port}", num_processes=nproc,
                    process_id=rank)
    mesh = dist.global_z_mesh()
    n = mesh.devices.size
    shape = (per_dev_z * n, hw, hw)
    p = FlowParams(levels=3, warps=2, inner_iterations=2, sweeps=sweeps,
                   alpha=0.05)
    p = prepare_params(p, n)
    # Every process generates the same global volume (small bench shapes;
    # real runs use host-local slab IO via distributed.load_sharded_volume).
    i0, i1, _ = syn.make_pair(shape, syn.translation((1.0, -0.5, 0.5)),
                              n_blobs=20, seed=0)
    i0 = shard_volume(np.asarray(i0), mesh)
    i1 = shard_volume(np.asarray(i1), mesh)
    reps = int(os.environ.get("TPUFLOW_MP_REPS", "2"))
    ablate = os.environ.get("TPUFLOW_MP_ABLATE", "0") == "1"

    def timed(comm_ablate):
        fn = _sharded_fn(p, mesh, False, comm_ablate)
        flow = fn(i0, i1)
        flow.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(reps):
            flow = fn(i0, i1)
            flow.block_until_ready()
        return (time.perf_counter() - t0) / reps

    dt = timed(False)
    # Comm-ablated twin (collectives swapped for local fallbacks --
    # numerically wrong across process boundaries by construction, timing
    # diagnostic only): the gloo analog of scaling.py --ablate-comm.
    dt_nc = timed(True) if ablate else None
    if rank == 0:
        vps = float(np.prod(shape)) / dt
        row = {"devices": n, "processes": nproc, "backend": "gloo",
               "shape": list(shape), "seconds": round(dt, 4),
               "voxels_per_s": round(vps, 1), "reps": reps}
        if dt_nc is not None:
            row["seconds_no_comm"] = round(dt_nc, 4)
            row["comm_share"] = round(max(0.0, 1.0 - dt_nc / dt), 4)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
