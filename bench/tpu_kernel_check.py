"""Compiled (non-interpret) Pallas kernel checks in the SHARDED
configuration, on the attached single TPU chip (VERDICT r2 weak #5).

All sharded/dryrun coverage of the packed SOR kernel runs interpret-mode at
W <= 48, and the TPU bench runs it unsharded — so before this script the
packed kernel had never executed *compiled* with its sharded inputs
(z0 != 0, dg > D, nontrivial halo planes, W >= 256, where the packed layout
actually engages on real TPUs; solver.py dispatch). A real multi-shard run
needs chips we don't have; this closes the remaining surface on one chip by
the restriction argument:

  a Z-slab of a red-black half-sweep over a GLOBAL volume equals the
  half-sweep over the slab alone, provided the slab kernel is fed the
  neighbor planes (halos) and global bookkeeping (z0, dg) it would receive
  from ppermute in a sharded run.

So: build a (24, 256, 256) global problem, run the XLA oracle
(solver.sor_halfsweep) on the whole volume, then run the packed Pallas
kernel compiled on the MIDDLE slab [8:16) with z0=8, dg=24 and halo planes
sliced from the global arrays — exactly the tensors HaloCtx.z_halo_planes
delivers in a sharded run — and demand the slab of the oracle. Same for
the fused warp+derivative kernel with z_sharded=True (its sharded indexing
path), fed via a shard-simulating HaloCtx whose zpad slices true neighbor
planes from the global volume.

Writes one JSON line per check; exits nonzero on any failure.
Usage: python bench/tpu_kernel_check.py [--out TPU_KERNELS.jsonl]
"""

import argparse
import json
import math
import os
import sys
import time
from dataclasses import dataclass

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import numpy as np


def check_packed_sor(jnp, out):
    from tpuflow3d.derivatives import derivatives
    from tpuflow3d.grid import HaloCtx
    from tpuflow3d.pallas.sor_packed import (pack_color, sor_halfsweep_packed,
                                             unpack_colors)
    from tpuflow3d.params import FlowParams
    from tpuflow3d.solver import compute_terms, parity_mask, sor_halfsweep
    from tpuflow3d.warp import warp_volume

    alpha, omega = 0.05, 1.8
    dg, h, w = 24, 256, 256          # W >= 256: the real-TPU packed regime
    z0, d = 8, 8                     # middle slab of a 3-shard split
    rng = np.random.default_rng(0)
    shape = (dg, h, w)
    i0 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    shift = jnp.zeros((3, *shape), jnp.float32).at[2].set(0.7)
    i1 = warp_volume(i0, -shift)
    g, it = derivatives(i0, i1)
    p = FlowParams(alpha=alpha)
    flow = jnp.asarray(rng.normal(size=(3, *shape)).astype(np.float32)) * 0.1
    du = jnp.asarray(rng.normal(size=(3, *shape)).astype(np.float32)) * 0.05
    t = compute_terms(g, it, flow, du, p)

    ctx = HaloCtx()
    parity = parity_mask(shape, ctx)
    ref_red = sor_halfsweep(du, t, omega, parity, 0, ctx)
    ref_full = sor_halfsweep(ref_red, t, omega, parity, 1, ctx)

    sl = slice(z0, z0 + d)

    def pk(x, color):
        # Global pack then slab-slice == slab pack with z0 offset
        # (tests/test_pallas_sor_packed.py::test_pack_respects_global_parity)
        return pack_color(x, color, 0)

    def plane(xp, z):  # one z-plane of a packed global array, keepdims
        return xp[..., z:z + 1, :, :]

    c0, c1 = pk(t.c, 0)[:, sl], pk(t.c, 1)[:, sl]
    g0, g1 = pk(t.g, 0)[:, sl], pk(t.g, 1)[:, sl]
    ps0g, ps1g = pk(t.psi_s, 0), pk(t.psi_s, 1)
    pd0, pd1 = pk(t.psi_d, 0)[sl], pk(t.psi_d, 1)[sl]

    # --- red half-sweep on the slab: active color 0, other color 1
    du0 = pk(du, 0)[:, sl]
    du1g = pk(du, 1)
    t0 = time.perf_counter()
    d0_new = sor_halfsweep_packed(
        du0, du1g[:, sl], c0, g0, ps0g[sl], ps1g[sl], pd0,
        plane(du1g, z0 - 1), plane(du1g, z0 + d),
        plane(ps1g, z0 - 1), plane(ps1g, z0 + d),
        z0, alpha, omega, 0, dg, interpret=False)
    d0_new.block_until_ready()
    t_red = time.perf_counter() - t0

    # --- black half-sweep: other color is the UPDATED red field; its halo
    # planes come from the globally-updated oracle (what ppermute would
    # deliver after the red sweep in a real sharded run).
    red_g = pk(ref_red, 0)
    du1 = pk(du, 1)[:, sl]
    d1_new = sor_halfsweep_packed(
        du1, d0_new, c1, g1, ps1g[sl], ps0g[sl], pd1,
        plane(red_g, z0 - 1), plane(red_g, z0 + d),
        plane(ps0g, z0 - 1), plane(ps0g, z0 + d),
        z0, alpha, omega, 1, dg, interpret=False)

    got = unpack_colors(d0_new, d1_new, z0)
    ref = ref_full[:, sl]
    err = float(jnp.max(jnp.abs(got - ref)))
    row = {"check": "packed_sor_sharded_compiled", "shape": [dg, h, w],
           "slab": [z0, z0 + d], "W": w, "z0": z0, "dg": dg,
           "max_abs_err": err, "tol": 5e-5, "ok": err < 5e-5,
           "first_call_s": round(t_red, 2)}
    out(row)
    return row["ok"]


def check_packed_gc(jnp, out):
    """Packed gradient-constancy kernel (r4, pallas/sor_gc_packed.py)
    compiled in the sharded configuration: middle slab, z0/dg bookkeeping,
    halo planes from the global arrays, W >= 256."""
    from tpuflow3d.derivatives import derivatives, grad_constancy_terms
    from tpuflow3d.grid import HaloCtx
    from tpuflow3d.pallas.sor_gc_packed import sor_halfsweep_gc_packed
    from tpuflow3d.pallas.sor_packed import pack_color, unpack_colors
    from tpuflow3d.params import FlowParams
    from tpuflow3d.solver import compute_terms, parity_mask, sor_halfsweep
    from tpuflow3d.warp import warp_volume

    alpha, omega = 0.05, 1.8
    dg, h, w = 24, 256, 256
    z0, d = 8, 8
    rng = np.random.default_rng(2)
    shape = (dg, h, w)
    i0 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    shift = jnp.zeros((3, *shape), jnp.float32).at[2].set(0.7)
    i1 = warp_volume(i0, -shift)
    g, it = derivatives(i0, i1)
    gc = grad_constancy_terms(i0, i1, g=g)
    p = FlowParams(alpha=alpha, gamma=1.5)
    flow = jnp.asarray(rng.normal(size=(3, *shape)).astype(np.float32)) * 0.1
    du = jnp.asarray(rng.normal(size=(3, *shape)).astype(np.float32)) * 0.05
    t = compute_terms(g, it, flow, du, p, gc=gc)

    ctx = HaloCtx()
    parity = parity_mask(shape, ctx)
    ref_red = sor_halfsweep(du, t, omega, parity, 0, ctx)
    ref_full = sor_halfsweep(ref_red, t, omega, parity, 1, ctx)

    sl = slice(z0, z0 + d)
    pk = lambda x, color: pack_color(x, color, 0)

    def plane(xp, z):
        return xp[..., z:z + 1, :, :]

    c0, c1 = pk(t.c, 0)[:, sl], pk(t.c, 1)[:, sl]
    a0, a1 = pk(t.ainv, 0)[:, sl], pk(t.ainv, 1)[:, sl]
    ps0g, ps1g = pk(t.psi_s, 0), pk(t.psi_s, 1)

    du0 = pk(du, 0)[:, sl]
    du1g = pk(du, 1)
    t0 = time.perf_counter()
    d0_new = sor_halfsweep_gc_packed(
        du0, du1g[:, sl], c0, a0, ps0g[sl], ps1g[sl],
        plane(du1g, z0 - 1), plane(du1g, z0 + d),
        plane(ps1g, z0 - 1), plane(ps1g, z0 + d),
        z0, alpha, omega, 0, dg, interpret=False)
    d0_new.block_until_ready()
    t_red = time.perf_counter() - t0

    red_g = pk(ref_red, 0)
    du1 = pk(du, 1)[:, sl]
    d1_new = sor_halfsweep_gc_packed(
        du1, d0_new, c1, a1, ps1g[sl], ps0g[sl],
        plane(red_g, z0 - 1), plane(red_g, z0 + d),
        plane(ps0g, z0 - 1), plane(ps0g, z0 + d),
        z0, alpha, omega, 1, dg, interpret=False)

    got = unpack_colors(d0_new, d1_new, z0)
    ref = ref_full[:, sl]
    err = float(jnp.max(jnp.abs(got - ref)))
    row = {"check": "packed_gc_sharded_compiled", "shape": [dg, h, w],
           "slab": [z0, z0 + d], "W": w, "z0": z0, "dg": dg,
           "max_abs_err": err, "tol": 5e-5, "ok": err < 5e-5,
           "first_call_s": round(t_red, 2)}
    out(row)
    return row["ok"]


def check_warp_grad_sharded(jnp, out, interp="trilinear"):
    from tpuflow3d.derivatives import derivatives
    from tpuflow3d.grid import HaloCtx, replicate_pad
    from tpuflow3d.pallas.warp_grad import warp_grad_pallas
    from tpuflow3d.warp import warp_volume

    dg, h, w = 24, 128, 128
    z0, d = 8, 8
    clamp = 2.0
    rng = np.random.default_rng(1)
    i0g = jnp.asarray(rng.normal(size=(dg, h, w)).astype(np.float32))
    i1g = jnp.asarray(rng.normal(size=(dg, h, w)).astype(np.float32))
    flowg = jnp.asarray(
        rng.uniform(-clamp, clamp, size=(3, dg, h, w)).astype(np.float32))

    globals_by_key = {(3, False): i1g, (4, True): flowg, (3, True): i0g}

    @dataclass(frozen=True)
    class ShardSimCtx(HaloCtx):
        """Simulates the middle shard of a 3-way Z split on one chip: zpad
        returns the true neighbor planes (sliced from the global volume)
        that ppermute would deliver; z0/d_global carry the global frame.
        Duck-types the HaloCtx surface warp_grad_pallas touches."""
        n_shards: int = 3
        axis_name: str = "__sim__"    # only checked for None-ness

        def zpad(self, x, nh):
            key = (x.ndim, nh == 1)
            gl = globals_by_key[key]
            assert x.shape[-3] == d
            return gl[..., z0 - nh:z0 + d + nh, :, :]

        def z0(self, d_local):
            return jnp.asarray(z0, jnp.int32)

        def d_global(self, d_local):
            return dg

    ctx = ShardSimCtx()
    sctx = HaloCtx()
    i1w = warp_volume(i1g, flowg, sctx, interp=interp)
    g_ref, it_ref = derivatives(i0g, i1w, sctx)

    t0 = time.perf_counter()
    g, it = warp_grad_pallas(i1g[z0:z0 + d], flowg[:, z0:z0 + d],
                             i0g[z0:z0 + d], ctx, max_disp=clamp,
                             interp=interp, interpret=False)
    it.block_until_ready()
    dt = time.perf_counter() - t0
    err_it = float(jnp.max(jnp.abs(it - it_ref[z0:z0 + d])))
    err_g = float(jnp.max(jnp.abs(g - g_ref[:, z0:z0 + d])))
    err = max(err_it, err_g)
    name = ("warp_grad_sharded_compiled" if interp == "trilinear"
            else "warp_grad_tricubic_sharded_compiled")
    row = {"check": name, "shape": [dg, h, w],
           "slab": [z0, z0 + d], "z0": z0, "dg": dg, "clamp": clamp,
           "interp": interp,
           "max_abs_err": err, "tol": 1e-5, "ok": err < 1e-5,
           "first_call_s": round(dt, 2)}
    out(row)
    return row["ok"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    f = open(args.out, "a") if args.out else None

    def out(row):
        row = dict(row, backend=backend,
                   device=str(jax.devices()[0].device_kind))
        line = json.dumps(row)
        print(line, flush=True)
        if f:
            f.write(line + "\n")
            f.flush()

    ok = check_packed_sor(jnp, out)
    ok = check_packed_gc(jnp, out) and ok
    ok = check_warp_grad_sharded(jnp, out) and ok
    ok = check_warp_grad_sharded(jnp, out, interp="tricubic") and ok
    if f:
        f.close()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
