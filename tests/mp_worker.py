"""Multi-process worker for test_multiprocess.py: one JAX process of a
2-process CPU 'cluster' (gloo collectives), running the distributed
end-to-end path: host-local slab load -> Z-sharded solve over the global
mesh -> host-local slab write. Mirrors a real multi-host pod launch
(SURVEY.md §5.4 process boundary #0)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


DIE_EXIT_CODE = 17  # injected-fault marker (test_multiprocess fault test)


def _arm_fault_injection(ckdir: str):
    """Fault injection (SURVEY.md §7 failure detection): a daemon thread
    kills THIS process the moment the first pyramid-level checkpoint
    appears — i.e. mid-solve, between collectives. The surviving ranks'
    next ppermute/psum then has a dead peer; the framework's failure
    contract is that this surfaces as a prompt distributed-runtime ERROR
    (never a silent hang), and recovery is relaunch + checkpoint resume."""
    import threading
    import time as _t

    from tpuflow3d import checkpoint as ckpt

    def watch():
        while ckpt.peek_level_checkpoint(ckdir) is None:
            _t.sleep(0.02)
        os._exit(DIE_EXIT_CODE)

    threading.Thread(target=watch, daemon=True).start()


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    workdir = sys.argv[4]
    ckdir = sys.argv[5] if len(sys.argv) > 5 else None
    mode = sys.argv[6] if len(sys.argv) > 6 else ""

    from tpuflow3d import distributed as dist
    from tpuflow3d import volume as vio
    from tpuflow3d.params import FlowParams

    dist.initialize(f"localhost:{port}", num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    meta = vio.read_sidecar(os.path.join(workdir, "a.raw"))
    levels = int(os.environ.get("MP_WORKER_LEVELS", "2"))
    sweeps = int(os.environ.get("MP_WORKER_SWEEPS", "5"))
    solver = os.environ.get("MP_WORKER_SOLVER", "sor")
    # mg_cycles stays at its default (2), matching the test's reference.
    p = FlowParams(levels=levels, warps=1, inner_iterations=1, sweeps=sweeps,
                   alpha=0.05, solver=solver)
    mesh = dist.global_z_mesh()
    args = (os.path.join(workdir, "a.raw"), os.path.join(workdir, "b.raw"),
            meta, p, mesh)
    if mode in ("die", "die0") and ckdir is not None:
        # "die" kills rank 1 (a worker); "die0" kills rank 0 — the
        # COORDINATOR process, so survivors lose both a collective peer
        # and the distributed-service endpoint at once.
        if (pid != 0) == (mode == "die"):
            _arm_fault_injection(ckdir)
        flow = dist.compute_flow_distributed(
            *args, out_prefix=os.path.join(workdir, "mpflow_"),
            checkpoint_dir=ckdir)
        flow.block_until_ready()
    elif ckdir is not None:
        # Checkpointed first pass (leaves "ready for level 0" state), then
        # a second pass that RESUMES from it — each process reading only
        # its own Z slab — and writes the outputs.
        dist.compute_flow_distributed(*args, checkpoint_dir=ckdir)
        from tpuflow3d import checkpoint as ckpt
        assert ckpt.peek_level_checkpoint(ckdir) is not None
        flow = dist.compute_flow_distributed(
            *args, out_prefix=os.path.join(workdir, "mpflow_"),
            checkpoint_dir=ckdir)
    else:
        flow = dist.compute_flow_distributed(
            *args, out_prefix=os.path.join(workdir, "mpflow_"))
    flow.block_until_ready()
    print(f"[proc {pid}] ok", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
