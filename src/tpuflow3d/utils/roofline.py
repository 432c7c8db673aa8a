"""HBM-roofline ("stencil speed-of-light") model.

BASELINE.md requires the bench harness to report measured voxels/s against a
derived HBM-bandwidth roofline: one red-black half-sweep reads the increment
fields + penalizer weights and writes the increments (~40-60 B/voxel per
full sweep at f32), so sweep throughput is bandwidth-bound. This module
holds the byte model and chip bandwidth table.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax

# Peak HBM bandwidth per chip, bytes/s. Conservative public numbers.
HBM_BW = {
    "TPU v4": 1.2e12,
    "TPU v5 lite": 819e9,   # v5e
    "TPU v5e": 819e9,
    "TPU v5": 2.76e12,      # v5p
    "TPU v6 lite": 1.64e12,  # v6e / Trillium
    "cpu": 5.0e10,           # placeholder for CPU-backend smoke runs
}


def device_hbm_bw() -> float:
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "cpu")
    for k, v in HBM_BW.items():
        if kind.lower().startswith(k.lower()):
            return v
    return HBM_BW.get(kind, 819e9)


@dataclass(frozen=True)
class SweepByteModel:
    """f32 bytes/voxel for one FULL red-black sweep (two half-sweeps) in the
    compact-terms Pallas formulation (pallas/sor.py): each half-sweep reads
    du (12 B streaming; the 6-neighbor reuse is on-chip), constant RHS c
    (12 B), gradient g (12 B), psi_s + psi_d (8 B) and writes du (12 B);
    directional weights and Sherman-Morrison factors are recomputed in VMEM.
    (The XLA fallback streams precomputed weights instead: 80 B/half.)"""
    per_half_sweep: float = 12 + 12 + 12 + 8 + 12

    @property
    def per_sweep(self) -> float:
        return 2 * self.per_half_sweep


def sweep_roofline_voxels_per_s(bw: float | None = None) -> float:
    """Upper bound on voxel updates/s for one full sweep."""
    bw = bw or device_hbm_bw()
    return bw / SweepByteModel().per_sweep


def pipeline_sweep_equivalents(levels_shapes, params) -> float:
    """Total 'fine-voxel sweep equivalents' of a full run: sum over levels of
    voxels(level) * warps * inner * sweeps, in units of finest-level voxels.
    Dividing the sweep roofline by this gives an end-to-end voxels/s bound
    (ignoring warp/median/pyramid cost, so it is a true upper bound)."""
    fine = 1.0 * levels_shapes[0][0] * levels_shapes[0][1] * levels_shapes[0][2]
    total = 0.0
    for (d, h, w) in levels_shapes:
        total += (d * h * w) / fine
    return total * params.warps * params.inner_iterations * params.sweeps


def end_to_end_roofline(levels_shapes, params, bw: float | None = None) -> float:
    """Roofline end-to-end voxels/s for the full coarse-to-fine run."""
    per_sweep = sweep_roofline_voxels_per_s(bw)
    return per_sweep / pipeline_sweep_equivalents(levels_shapes, params)
