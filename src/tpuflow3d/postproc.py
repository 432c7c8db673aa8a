"""Derived-field post-processing of a computed flow.

Tomography motion analysis (the reference's application domain,
SURVEY.md §1) consumes the flow field through derived quantities:
divergence (volumetric expansion rate), curl (vorticity), and the
Jacobian determinant det(I + grad s) (local volume-change ratio of the
deformation x -> x + s, the strain measure used in 4D-CT deformation
analysis). The reference CLI writes only u/v/w/magnitude (SURVEY.md
§5.1); these are a capability extension on the same output convention:
one headerless ``.raw`` per scalar field.

Host-side numpy on purpose: one streaming pass over the finished flow
(IO-adjacent, runs once per job), memory-safe for out-of-core results
that never fit on the device, and identical across all execution paths.
Stencils match the solver's convention (central differences with
replicate edges -> half-slope at the boundary, SURVEY.md §10).
"""

from __future__ import annotations

import numpy as np

DERIVED_FIELDS = ("divergence", "curl", "jacdet")

# Flow channel c holds the displacement along volume axis c, in voxels,
# with axes (0, 1, 2) = (z, y, x) — volume.FLOW_COMPONENT_FILES maps
# channel 2 to u (x), 1 to v (y), 0 to w (z).


def _cdiff(x: np.ndarray, axis: int) -> np.ndarray:
    """Central difference with replicate edges (half-slope boundary),
    matching derivatives.central_diff."""
    xp = np.concatenate([np.take(x, [0], axis=axis), x,
                         np.take(x, [-1], axis=axis)], axis=axis)
    n = x.shape[axis]
    fwd = np.take(xp, range(2, n + 2), axis=axis)
    bwd = np.take(xp, range(0, n), axis=axis)
    return ((fwd - bwd) * 0.5).astype(x.dtype)


def divergence(flow: np.ndarray) -> np.ndarray:
    """div s = sum_a d(s_a)/d(axis_a): positive where the material locally
    expands between frames."""
    flow = np.asarray(flow)
    out = _cdiff(flow[0], 0)
    for a in (1, 2):
        out += _cdiff(flow[a], a)
    return out


def curl(flow: np.ndarray) -> np.ndarray:
    """Vorticity curl s, components in the same (z, y, x) channel order as
    the flow: curl[i] = eps_ijk d_j s_k over axis indices (0,1,2)=(z,y,x).
    For a rigid rotation of angular velocity vector omega (in that basis),
    curl = 2*omega."""
    flow = np.asarray(flow)
    d = {(j, k): _cdiff(flow[k], j)
         for j in range(3) for k in range(3) if j != k}
    return np.stack([
        d[(1, 2)] - d[(2, 1)],
        d[(2, 0)] - d[(0, 2)],
        d[(0, 1)] - d[(1, 0)],
    ])


def jacobian_det(flow: np.ndarray) -> np.ndarray:
    """det(I + grad s) of the deformation x -> x + s(x): the local volume
    ratio (1 = incompressible, <1 compression, >1 expansion)."""
    flow = np.asarray(flow)
    j = np.empty((3, 3) + flow.shape[1:], flow.dtype)
    for c in range(3):
        for a in range(3):
            j[c, a] = _cdiff(flow[c], a)
            if c == a:
                j[c, a] += 1.0
    return (j[0, 0] * (j[1, 1] * j[2, 2] - j[1, 2] * j[2, 1])
            - j[0, 1] * (j[1, 0] * j[2, 2] - j[1, 2] * j[2, 0])
            + j[0, 2] * (j[1, 0] * j[2, 1] - j[1, 1] * j[2, 0]))


def consistency_error(flow_fwd: np.ndarray, flow_bwd: np.ndarray,
                      interp: str = "trilinear") -> np.ndarray:
    """Forward-backward consistency error map (voxels).

    e(x) = | s_f(x) + s_b(x + s_f(x)) |  — zero wherever the forward and
    backward solves agree (for a diffeomorphic true motion,
    s_b(x + s_f(x)) = -s_f(x)); large where matching failed or material
    became occluded/disoccluded between frames. The standard flow
    reliability/occlusion diagnostic; thresholding this map gives an
    occlusion mask. Runs the same trilinear sampling as the solver's warp
    op (device-jitted, one pass)."""
    import jax.numpy as jnp

    from tpuflow3d.warp import warp_volume

    ff = jnp.asarray(flow_fwd)
    fb = jnp.asarray(flow_bwd)
    bw = jnp.stack([warp_volume(fb[c], ff, interp=interp)
                    for c in range(3)])
    return np.asarray(jnp.sqrt(jnp.sum((ff + bw) ** 2, axis=0)))


def write_derived(prefix: str, flow: np.ndarray, which) -> list[str]:
    """Compute and write the requested derived fields next to the flow
    outputs. ``which``: iterable of names from DERIVED_FIELDS. Returns the
    written file paths. curl writes one raw per component using the u/v/w
    (x/y/z) suffix convention of volume.write_flow."""
    from tpuflow3d import volume as vio

    written = []
    for name in which:
        if name == "divergence":
            vio.write_raw(f"{prefix}divergence.raw", divergence(flow))
            written.append(f"{prefix}divergence.raw")
        elif name == "curl":
            c = curl(flow)
            for suffix, ci in vio.FLOW_COMPONENT_FILES.items():
                vio.write_raw(f"{prefix}curl_{suffix}.raw", c[ci])
                written.append(f"{prefix}curl_{suffix}.raw")
        elif name == "jacdet":
            vio.write_raw(f"{prefix}jacdet.raw", jacobian_det(flow))
            written.append(f"{prefix}jacdet.raw")
        else:
            raise ValueError(f"unknown derived field {name!r}; "
                             f"choose from {DERIVED_FIELDS}")
    return written
