"""Grid utilities: Neumann padding, Z-halo exchange, shard context.

This is the TPU-native replacement for the reference's "piecewise" chunk
margin machinery (cuda-flow3d ``OpticalFlowP3D`` + ``*_p`` op variants,
SURVEY.md §5.3): instead of streaming Z-chunks with host<->device copies,
volumes stay resident and sharded along Z, and each stencil op obtains its
margin planes either by local edge replication (unsharded / global faces) or
by ``jax.lax.ppermute`` from the neighboring shard (interior faces).

Every stencil op in the framework is written against a single entry point,
``HaloCtx.zpad``: unsharded and sharded execution therefore run *identical*
arithmetic, which is what makes the sharded-vs-unsharded equality gate
(SURVEY.md §6 tier 4) structural rather than accidental.

Axis convention: volumes are (D, H, W) = (z, y, x); flow fields are
(3, D, H, W) with component c displacing along array axis c. Z is always
axis -3 so volumes and flow fields share all helpers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

Z_AXIS = -3  # z axis for both (D,H,W) volumes and (3,D,H,W) flow fields


def replicate_pad(x: jax.Array, nh: int, axis: int) -> jax.Array:
    """Edge-replicate pad by nh on both sides of one axis (Neumann BC)."""
    if nh == 0:
        return x
    lo = jnp.take(x, jnp.zeros(nh, jnp.int32), axis=axis)
    hi = jnp.take(x, jnp.full(nh, x.shape[axis] - 1, jnp.int32), axis=axis)
    return jnp.concatenate([lo, x, hi], axis=axis)


def pad_yx(x: jax.Array, nh: int) -> jax.Array:
    """Edge-replicate pad the y and x axes (always local, never sharded)."""
    return replicate_pad(replicate_pad(x, nh, axis=-1), nh, axis=-2)


def _edge_planes(x: jax.Array, nh: int, side: str) -> jax.Array:
    if side == "lo":
        idx = jnp.zeros(nh, jnp.int32)
    else:
        idx = jnp.full(nh, x.shape[Z_AXIS] - 1, jnp.int32)
    return jnp.take(x, idx, axis=Z_AXIS)


@dataclass(frozen=True)
class HaloCtx:
    """Execution context: unsharded (axis_name None), Z-sharded, or a
    streamed window of a larger volume (out-of-core "piecewise" mode).

    In the sharded case this object lives inside a ``shard_map`` body; all
    arrays seen through it are the local Z-slab. ``n_shards`` and the global
    Z extent are static; the shard index is traced.

    In window mode (``window_z0``/``window_d_global`` set, see
    tpuflow3d.piecewise) the "local volume" is a Z-chunk slab that already
    carries its margin planes; ``z0`` may be negative (slab pad region
    hanging below the volume) and is a traced value. zpad stays replicate —
    ops over-pad the slab and the driver crops the contaminated margin.
    """

    axis_name: Optional[str] = None
    n_shards: int = 1
    window_z0: object = None       # traced global z of slab plane 0, or None
    window_d_global: Optional[int] = None
    # Diagnostic switch (bench/scaling.py --ablate-comm): replace every
    # collective with its local fallback (replicate-pad halos, identity
    # reductions) while keeping the per-shard program otherwise identical.
    # Numerically WRONG across shard boundaries by construction — only for
    # measuring the communication share of step time (comm share =
    # 1 - t_ablated / t_full), never for real runs.
    comm_ablate: bool = False

    # ---- topology ----

    def shard_index(self):
        if self.axis_name is None:
            return 0
        return lax.axis_index(self.axis_name)

    def z0(self, d_local: int):
        """Global z index of local plane 0."""
        if self.window_z0 is not None:
            return self.window_z0
        if self.axis_name is None:
            return 0
        return lax.axis_index(self.axis_name) * d_local

    def z_global(self, d_local: int):
        """Global z index of each local plane, shape (d_local, 1, 1)."""
        idx = jnp.arange(d_local).reshape(d_local, 1, 1)
        return idx + self.z0(d_local)

    def d_global(self, d_local: int) -> int:
        if self.window_d_global is not None:
            return self.window_d_global
        return d_local * self.n_shards

    @property
    def is_window(self) -> bool:
        return self.window_z0 is not None

    # ---- halo exchange / padding ----

    def zpad(self, x: jax.Array, nh: int) -> jax.Array:
        """Pad Z by nh planes per side: neighbor-shard planes on interior
        faces (via collective-permute), edge replication on global faces."""
        if nh == 0:
            return x
        if (self.axis_name is None or self.n_shards == 1
                or self.comm_ablate):
            return replicate_pad(x, nh, axis=Z_AXIS)

        d_local = x.shape[Z_AXIS]
        if d_local < nh:
            # Coarse level whose local slab is thinner than the halo: the
            # margin spans multiple shards. These levels are tiny, so gather
            # the full Z extent and slice the padded slab out of it.
            xg = self._all_gather_z(x)
            xg = replicate_pad(xg, nh, axis=Z_AXIS)
            start = self.z0(d_local)  # the nh pad cancels the -nh offset
            return jnp.take(xg, start + jnp.arange(d_local + 2 * nh),
                            axis=Z_AXIS)

        n = self.n_shards
        up = [(i, i + 1) for i in range(n - 1)]    # send towards higher z
        down = [(i + 1, i) for i in range(n - 1)]  # send towards lower z
        top = jnp.take(x, x.shape[Z_AXIS] - nh + jnp.arange(nh), axis=Z_AXIS)
        bot = jnp.take(x, jnp.arange(nh), axis=Z_AXIS)
        lo = lax.ppermute(top, self.axis_name, up)    # prev shard's top
        hi = lax.ppermute(bot, self.axis_name, down)  # next shard's bottom
        i = lax.axis_index(self.axis_name)
        lo = jnp.where(i == 0, _edge_planes(x, nh, "lo"), lo)
        hi = jnp.where(i == n - 1, _edge_planes(x, nh, "hi"), hi)
        return jnp.concatenate([lo, x, hi], axis=Z_AXIS)

    def z_halo_planes(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        """One-plane Z halos as separate arrays (lo, hi), each of z-extent 1:
        neighbor-shard planes on interior faces, edge replication on global
        faces. Used by Pallas kernels, which take halos as separate inputs
        instead of a concatenated pad."""
        lo_rep = _edge_planes(x, 1, "lo")
        hi_rep = _edge_planes(x, 1, "hi")
        if (self.axis_name is None or self.n_shards == 1
                or self.comm_ablate):
            return lo_rep, hi_rep
        n = self.n_shards
        up = [(i, i + 1) for i in range(n - 1)]
        down = [(i + 1, i) for i in range(n - 1)]
        top = jnp.take(x, jnp.asarray([x.shape[Z_AXIS] - 1]), axis=Z_AXIS)
        bot = jnp.take(x, jnp.asarray([0]), axis=Z_AXIS)
        lo = lax.ppermute(top, self.axis_name, up)
        hi = lax.ppermute(bot, self.axis_name, down)
        i = lax.axis_index(self.axis_name)
        lo = jnp.where(i == 0, lo_rep, lo)
        hi = jnp.where(i == n - 1, hi_rep, hi)
        return lo, hi

    def _all_gather_z(self, x: jax.Array) -> jax.Array:
        g = lax.all_gather(x, self.axis_name, axis=0)  # (n, ...) leading
        # Move shard axis next to z and merge.
        nd = x.ndim
        z_pos = nd + Z_AXIS  # absolute z axis in x
        g = jnp.moveaxis(g, 0, z_pos)  # (..., n, D_local, H, W)
        shape = list(x.shape)
        shape[Z_AXIS] = x.shape[Z_AXIS] * self.n_shards
        return g.reshape(shape)

    # ---- collectives over the Z mesh ----

    def psum(self, v):
        if self.axis_name is None or self.comm_ablate:
            return v
        return lax.psum(v, self.axis_name)

    def pmin(self, v):
        if self.axis_name is None or self.comm_ablate:
            return v
        return lax.pmin(v, self.axis_name)

    def pmax(self, v):
        if self.axis_name is None or self.comm_ablate:
            return v
        return lax.pmax(v, self.axis_name)

    def pmean_of_sum(self, local_sum, global_count: float):
        return self.psum(local_sum) / global_count


UNSHARDED = HaloCtx()


def neighbor_slices(xp: jax.Array, nh: int, axis: int, delta: int) -> jax.Array:
    """Shifted view of a padded array: value at p + delta*e_axis.

    xp must be padded by >= |delta| (and by nh on the slicing window's axis).
    Returns an array of the unpadded length along ``axis``.
    """
    n = xp.shape[axis] - 2 * nh
    start = nh + delta
    return lax.slice_in_dim(xp, start, start + n, axis=axis)
