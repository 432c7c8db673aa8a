"""Cross-check the halo byte MODEL against the COUNTED comm bytes of the
compiled sharded program (VERDICT r4 missing #2a / next-round #3a).

The weak-scaling prediction (bench/ici_predict.py) multiplies an analytic
halo model — "one du plane per direction per half-sweep" — by an assumed
ICI bandwidth. The bandwidth is not measurable here (no multi-chip
hardware), but the BYTES half of the product is: XLA's compiled HLO lists
every collective-permute / all-reduce / all-gather instruction with its
operand shape, and that is exactly what executes on every backend (the
same per-shard program runs under the single-process 8-device mesh, the
2/4-process gloo cluster of tests/test_multiprocess.py, and a real ICI
ring — process count does not change the traced program, which this
script also verifies by lowering at two mesh sizes).

Counts, per one inner iteration (terms + K full sweeps) of the Z-sharded
solve at (per_dev_z, hw, hw) per shard:
- XLA sweep path: zpad(du, 1) per half-sweep -> 2 ppermutes of a
  (3, 1, H, W) f32 plane; terms build adds flow/psi_s halos.
- packed Pallas path (production): z_halo_planes per half-sweep -> 2
  ppermutes of a (3, 1, H, W/2) packed plane; psi_s halos once per pack.
- residual psum: one f32 scalar all-reduce per sweep (residual_tol > 0).

Emits one JSON record with counted-vs-model bytes and the ratio; the gate
is |ratio - 1| small for the du-plane-dominated sweep loop (the model
deliberately ignores the amortized terms/psi_s halos, so counted >= model
by that known margin, which the record itemizes).

Usage: python bench/comm_bytes.py [--per-dev-z 32] [--hw 128] [--sweeps 6]
       [--out COMM_BYTES_r05.json]
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "f64": 8, "s32": 4,
                "u32": 4, "pred": 1, "s8": 1, "u8": 1}


def hlo_collective_bytes(hlo_text: str) -> dict:
    """Per-shard payload bytes of every cross-device collective in a
    compiled HLO module, by op kind. Shapes are parsed from the
    instruction result type (collective-permute and all-reduce results
    equal their operand payload; all-gather results are n_shards x the
    per-shard contribution, counted as the result size — an upper bound
    on the per-shard receive volume)."""
    out = {"collective-permute": 0, "all-reduce": 0, "all-gather": 0,
           "counts": {"collective-permute": 0, "all-reduce": 0,
                      "all-gather": 0}}
    # e.g. "%collective-permute.3 = f32[3,1,128,128] collective-permute("
    pat = re.compile(
        r"=\s+(?:\()?([a-z0-9]+)\[([0-9,]*)\][^=]*?"
        r"(collective-permute|all-reduce|all-gather)\(")
    for m in pat.finditer(hlo_text):
        dt, dims, kind = m.group(1), m.group(2), m.group(3)
        nbytes = _DTYPE_BYTES.get(dt, 4)
        for d in dims.split(","):
            if d:
                nbytes *= int(d)
        out[kind] += nbytes
        out["counts"][kind] += 1
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-dev-z", type=int, default=32)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--sweeps", type=int, default=6)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    os.environ.setdefault(
        "XLA_FLAGS",
        f"--xla_force_host_platform_device_count={args.devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from tpuflow3d.grid import HaloCtx
    from tpuflow3d.params import FlowParams
    from tpuflow3d.sharding import Z_AXIS_NAME, make_z_mesh
    from tpuflow3d.solver import (compute_terms, parity_mask, sor_halfsweep)
    from tpuflow3d.derivatives import derivatives

    n = args.devices
    z, hw, K = args.per_dev_z, args.hw, args.sweeps
    p = FlowParams(alpha=0.05, sweeps=K)
    mesh = make_z_mesh(n)
    ctx = HaloCtx(axis_name=Z_AXIS_NAME, n_shards=n)

    def inner_iter_xla(i0, i1, flow, du):
        """terms + K full sweeps, the XLA sweep path. Sweeps are
        PYTHON-unrolled (not lax.fori_loop) so every executed collective
        appears textually in the compiled HLO — a fori_loop body's
        collectives would be counted once regardless of trip count."""
        g, it = derivatives(i0, i1, ctx)
        t = compute_terms(g, it, flow, du, p, ctx)
        parity = parity_mask(du.shape[1:], ctx)
        for _ in range(K):
            du = sor_halfsweep(du, t, p.omega, parity, 0, ctx)
            du = sor_halfsweep(du, t, p.omega, parity, 1, ctx)
        # residual psum per inner iteration (the early-stop norm)
        return du, ctx.psum(jnp.sum(jnp.abs(du)))

    vol_spec = P(Z_AXIS_NAME, None, None)
    flow_spec = P(None, Z_AXIS_NAME, None, None)
    fn = jax.jit(jax.shard_map(
        inner_iter_xla, mesh=mesh,
        in_specs=(vol_spec, vol_spec, flow_spec, flow_spec),
        out_specs=(flow_spec, P()), check_vma=False))

    shape_g = (z * n, hw, hw)
    i0 = jnp.zeros(shape_g, jnp.float32)
    fl = jnp.zeros((3, *shape_g), jnp.float32)
    hlo = fn.lower(i0, i0, fl, fl).compile().as_text()
    counted = hlo_collective_bytes(hlo)

    # Analytic model, same itemization as ici_predict.py but for the XLA
    # path: du zpad(1) per half-sweep = 2 dirs x (3,1,H,W) f32 — the
    # sweep-loop term the weak-scaling prediction uses. On top of it,
    # once per inner iteration: flow + psi_s zpads (compute_terms) and
    # one (3,.)-channel + one 1-channel zpad pair in the derivative
    # stencils — both verified against the count below (ratio 1.0 when
    # itemized; ratio_sweep_loop_only shows the amortized-term margin the
    # prediction deliberately ignores).
    plane = hw * hw * 4
    du_model = 2 * K * 2 * 3 * plane          # the sweep-loop term
    terms_model = 2 * (3 + 1) * plane         # flow + psi_s zpads
    deriv_model = 2 * (3 + 1) * plane         # derivative-stencil zpads
    model_total = du_model + terms_model + deriv_model

    # Process-count independence: the per-shard program at n=2 must carry
    # identical per-collective payloads (counts differ only via mesh size
    # in the permute pair lists, not payload bytes).
    mesh2 = make_z_mesh(2)
    ctx2 = HaloCtx(axis_name=Z_AXIS_NAME, n_shards=2)

    def inner2(i0, i1, flow, du):
        g, it = derivatives(i0, i1, ctx2)
        t = compute_terms(g, it, flow, du, p, ctx2)
        parity = parity_mask(du.shape[1:], ctx2)
        for _ in range(K):
            du = sor_halfsweep(du, t, p.omega, parity, 0, ctx2)
            du = sor_halfsweep(du, t, p.omega, parity, 1, ctx2)
        return du, ctx2.psum(jnp.sum(jnp.abs(du)))

    fn2 = jax.jit(jax.shard_map(
        inner2, mesh=mesh2,
        in_specs=(vol_spec, vol_spec, flow_spec, flow_spec),
        out_specs=(flow_spec, P()), check_vma=False))
    shape2 = (z * 2, hw, hw)
    hlo2 = fn2.lower(jnp.zeros(shape2, jnp.float32),
                     jnp.zeros(shape2, jnp.float32),
                     jnp.zeros((3, *shape2), jnp.float32),
                     jnp.zeros((3, *shape2), jnp.float32)
                     ).compile().as_text()
    counted2 = hlo_collective_bytes(hlo2)

    rec = {
        "kind": "comm_bytes_measured_vs_model",
        "method": "collective payloads counted from the COMPILED HLO of "
                  "the sharded inner iteration (the same per-shard "
                  "program the gloo cluster and a real ICI ring run)",
        "config": {"per_dev_z": z, "hw": hw, "sweeps": K, "devices": n},
        "counted": counted,
        "counted_ppermute_bytes": counted["collective-permute"],
        "model": {"du_sweep_loop": du_model, "terms_halos": terms_model,
                  "deriv_halos": deriv_model, "total": model_total},
        "ratio_counted_over_model": round(
            counted["collective-permute"] / model_total, 4),
        "ratio_sweep_loop_only": round(
            counted["collective-permute"] / du_model, 4),
        "allreduce_bytes": counted["all-reduce"],
        "n2_counted": counted2,
        "per_collective_payload_matches_n2":
            counted["collective-permute"] // max(
                counted["counts"]["collective-permute"], 1)
            == counted2["collective-permute"] // max(
                counted2["counts"]["collective-permute"], 1),
    }
    line = json.dumps(rec)
    print(line, flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
