"""Spatiotemporal derivative stencils.

TPU-native equivalent of the reference's derivative kernels (SURVEY.md §5.2
step "derivative stencils"): central differences of the averaged volume
Ī = (I0 + Ĩ1)/2 for the spatial gradient (Iz, Iy, Ix) and It = Ĩ1 − I0 for
the temporal derivative (SURVEY.md §10 "Derivatives"). Neumann boundaries
via replicate padding; Z margins through HaloCtx.zpad.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuflow3d.grid import HaloCtx, Z_AXIS, neighbor_slices, replicate_pad


def central_diff(x: jax.Array, axis: int, ctx: HaloCtx = HaloCtx()) -> jax.Array:
    """0.5 * (x[p + e] - x[p - e]) with replicate edges (one-sided halves at
    the global boundary)."""
    if axis in (Z_AXIS, x.ndim + Z_AXIS):
        xp = ctx.zpad(x, 1)
        axis = Z_AXIS
    else:
        xp = replicate_pad(x, 1, axis=axis)
    return 0.5 * (neighbor_slices(xp, 1, axis, +1)
                  - neighbor_slices(xp, 1, axis, -1))


def central_diff4(x: jax.Array, axis: int,
                  ctx: HaloCtx = HaloCtx()) -> jax.Array:
    """4th-order 5-point stencil (-x[p+2] + 8x[p+1] - 8x[p-1] + x[p-2])/12
    with replicate edges. The reference family sometimes uses the 5-point
    form (SURVEY.md §11 risk item 3); exposed via FlowParams.deriv_order."""
    if axis in (Z_AXIS, x.ndim + Z_AXIS):
        xp = ctx.zpad(x, 2)
        axis = Z_AXIS
    else:
        xp = replicate_pad(x, 2, axis=axis)
    nb = {d: neighbor_slices(xp, 2, axis, d) for d in (-2, -1, 1, 2)}
    return (-nb[2] + 8.0 * nb[1] - 8.0 * nb[-1] + nb[-2]) * (1.0 / 12.0)


def grad_constancy_terms(i0: jax.Array, i1w: jax.Array,
                         ctx: HaloCtx = HaloCtx(),
                         order: int = 2,
                         g: jax.Array | None = None
                         ) -> tuple[jax.Array, jax.Array]:
    """Linearization terms of the gradient-constancy assumption (Brox et
    al. 2004; a capability EXTENSION over the reference's intensity-only
    data term — SURVEY.md §2 lists no gamma term).

    For each spatial axis a the constancy of the image derivative
    d_a I gives a residual r_a = gc_it[a] + gc_g[a] . du, with

        gc_it[a] = d_a(I1w) - d_a(I0)            (temporal part)
        gc_g[a]  = grad( d_a((I0 + I1w)/2) )      (3-vector, 2nd derivs)

    Returns (gc_g, gc_it): gc_g (3, 3, D, H, W) indexed [a, component],
    gc_it (3, D, H, W). Same averaged-volume / replicate-edge conventions
    as ``derivatives``; Z margins through HaloCtx so the sharded path is
    halo-correct. Pass ``g`` (the gradient ``derivatives`` already
    produced from the same (i0, i1w)) to reuse it as the inner first
    derivative instead of recomputing diff(ibar, a)."""
    diff = central_diff if order == 2 else central_diff4
    axes = (Z_AXIS, -2, -1)
    if g is None:
        ibar = 0.5 * (i0 + i1w)
        g = jnp.stack([diff(ibar, a, ctx) for a in axes])
    gc_g = []
    gc_it = []
    for i, a in enumerate(axes):
        gc_g.append(jnp.stack([diff(g[i], b, ctx) for b in axes]))
        gc_it.append(diff(i1w, a, ctx) - diff(i0, a, ctx))
    return jnp.stack(gc_g), jnp.stack(gc_it)


def derivatives(i0: jax.Array, i1w: jax.Array,
                ctx: HaloCtx = HaloCtx(),
                order: int = 2) -> tuple[jax.Array, jax.Array]:
    """Returns (g, it): g = (3, D, H, W) spatial gradient (Iz, Iy, Ix) of
    the averaged volume, it = Ĩ1 − I0. order: 2 (3-point central) or 4
    (5-point, SURVEY.md §11 risk item 3)."""
    diff = central_diff if order == 2 else central_diff4
    ibar = 0.5 * (i0 + i1w)
    g = jnp.stack([
        diff(ibar, Z_AXIS, ctx),
        diff(ibar, -2, ctx),
        diff(ibar, -1, ctx),
    ])
    it = i1w - i0
    return g, it
