"""Device-memory footprint model and budget probe.

The reference's ``main()`` picks the entire-data vs piecewise execution
path by free GPU memory (cuda-flow3d ``src/main.cpp``, SURVEY.md §5.1).
This module provides the TPU-side analog: a peak-HBM model of the in-core
pipeline plus a per-device budget, consumed by the CLI's automatic path
selection (cli._auto_mode).
"""

from __future__ import annotations

import os

import numpy as np

# Live f32 fields per finest-level voxel in the in-core pipeline
# (pipeline.compute_flow_impl at the finest level): flow(3) + du(3) +
# SolveTerms c(3)/g(3)/sw/smt/psi_s/psi_d (solver.SolveTerms) + warped
# volume + It transient. The two input pyramids are counted separately
# (all levels stay resident).
_FIELDS_PER_VOXEL = 3 + 3 + 10 + 2

# XLA scheduling slack: concurrent temporaries beyond the live-field model
# (fusion keeps this small; 512^3 at 85 B/voxel model + 15% fits the
# demonstrated single-chip run).
_SLACK = 1.15


def incore_peak_bytes(shape, p) -> int:
    """Model of peak device bytes for the in-core path on a (D, H, W)
    volume with FlowParams ``p`` (dominated by the finest level)."""
    shapes = p.level_shapes(tuple(shape))
    itemsize = np.dtype(p.dtype).itemsize
    pyramids = 2 * sum(int(np.prod(s)) for s in shapes)
    finest = int(np.prod(shapes[0]))
    fields = _FIELDS_PER_VOXEL
    if p.gamma > 0.0:
        # Gradient-constancy mode: gc_g(9) + gc_it(3) live across the
        # inner solve, plus the symmetric A^-1 (6) replacing smt/sw_inv's
        # role (those two stay in the terms tuple but are dead).
        fields += 9 + 3 + 6
    # Config-dependent surcharges, calibrated against the measured 512^3
    # HBM OOM of the r4 gate config (XLA: 16.96G needed vs 15.75G usable,
    # ~126 padded B/voxel vs the base model's ~85 with slack; the plain
    # packed config demonstrably fits at 512^3, so the pressure is the
    # tricubic warp pads + the early-stop while_loop's double-buffered du
    # carries, not the packed relayout):
    if p.interp == "tricubic":
        # Fused-warp Z/Y/X-padded input copies (flow pad is flow-sized).
        fields += 4
    if p.residual_tol > 0.0:
        # The early-stop while_loop double-buffers its du carry.
        fields += 6
    if p.solver == "multigrid":
        # MG hierarchy at the finest level: d6(6) + w(6) + ainv(6) + sw
        # + psi_s + V-cycle residual/correction/resize temps. Calibrated
        # against the measured 384^3 tricubic+mg OOM on a 16G chip
        # (fits at 256^3, ResourceExhausted at 384^3).
        fields += 34
    return int((pyramids + fields * finest) * itemsize * _SLACK)


# Fallbacks when the runtime exposes no memory_stats (keyed on substrings
# of jax's device_kind). Spec HBM per chip.
_KIND_BYTES = [
    ("v5 lite", 16 << 30), ("v5litepod", 16 << 30), ("v5e", 16 << 30),
    ("v4", 32 << 30), ("v5p", 95 << 30), ("v6", 32 << 30),
]


# Live fields per slab voxel in the fused streamed launch (piecewise
# _ph_fused_warp_iter): i0/i1 slabs (2) + flow (3) + g (3) + It (1) +
# SolveTerms c/g/w/sw_inv/smt/psi_s/psi_d (3+3+6+1+1+1+1) + du (3) +
# warped transient (1).
_STREAM_FIELDS_PER_VOXEL = 29


def pick_chunk_z(shape, p, budget: int, lo: int = 8) -> int:
    """Largest streamed Z-chunk whose fused-launch slab footprint fits in
    half the device budget (the other half covers the resident du frontier
    band, XLA temporaries, and double-buffered transfers).

    solver="multigrid" (r5): the streamed V-cycle keeps the coarse chain
    device-RESIDENT (mg_coarse_resident_bytes); carve that out of the
    budget before sizing the slab, and FAIL LOUDLY when the chain itself
    cannot fit — silently flooring the budget would let a doomed run
    stream for hours before the device OOMs at the finest level."""
    from tpuflow3d.piecewise import DEFAULT_FLOW_CLAMP, stream_margin

    pp = p if p.flow_clamp > 0 else p.replace(flow_clamp=DEFAULT_FLOW_CLAMP)
    d, h, w = shape
    itemsize = np.dtype(p.dtype).itemsize
    if p.solver == "multigrid":
        reserve = mg_coarse_resident_bytes(shape, p)
        if reserve > budget * 0.75:
            raise ValueError(
                f"streamed multigrid at {shape} needs a device-resident "
                f"coarse hierarchy of ~{reserve / 2**30:.1f} GiB against "
                f"a ~{budget / 2**30:.1f} GiB device: it cannot run "
                "piecewise on this chip — use the Z-sharded path "
                "(--sharded over enough devices) or solver='sor' "
                "(fully streamed) at this size")
        budget -= reserve
    per_plane = (h * w * itemsize * _STREAM_FIELDS_PER_VOXEL * _SLACK)
    chunk = int(budget * 0.5 / per_plane) - 2 * stream_margin(pp)
    return max(lo, min(chunk, d))


def mg_coarse_resident_bytes(shape, p) -> int:
    """Device-resident footprint of the streamed V-cycle's coarse chain
    (piecewise._stream_mg_solve): c/psi_s/d6 (10) + w/ainv/sw (13) +
    du/rhs/resize temps (~9) ~= 32 channels at the half-resolution level,
    summed down the chain: ~32 * (1/8 + 1/64 + ...) ~= 4.6
    fine-VOLUME-equivalents of bytes."""
    d, h, w = shape
    itemsize = np.dtype(p.dtype).itemsize
    return int(4.6 * d * h * w * itemsize * _SLACK)


def device_budget_bytes(device=None):
    """Usable bytes on one accelerator, or None when the question is moot
    (CPU backend: 'device memory' is host memory, the thing the piecewise
    path exists to stream *from*). Env TPUFLOW_DEVICE_BYTES overrides —
    also the test hook for exercising auto selection off-TPU."""
    env = os.environ.get("TPUFLOW_DEVICE_BYTES")
    if env:
        return int(env)
    import jax

    dev = device or jax.local_devices()[0]
    if dev.platform == "cpu":
        return None
    stats = None
    try:
        stats = dev.memory_stats()
    except Exception:
        pass
    if stats and stats.get("bytes_limit"):
        return int(stats["bytes_limit"])
    kind = getattr(dev, "device_kind", "").lower()
    for key, nbytes in _KIND_BYTES:
        if key in kind:
            return nbytes
    return 16 << 30  # conservative default for an unknown accelerator
