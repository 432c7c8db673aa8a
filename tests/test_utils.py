import json

import jax.numpy as jnp
import numpy as np

from tpuflow3d.params import FlowParams
from tpuflow3d.utils import roofline
from tpuflow3d.utils.logging import JsonlLogger, summarize_residuals
from tpuflow3d.utils.profiling import PhaseTimer, time_fn


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        sum(range(1000))
    with t.phase("a"):
        pass
    rep = t.report()
    assert rep["a"]["calls"] == 2
    assert rep["a"]["seconds"] >= 0


def test_time_fn():
    f = lambda x: x + 1
    dt = time_fn(f, jnp.ones((8, 8)), warmup=1, iters=2)
    assert dt >= 0


def test_roofline_model():
    p = FlowParams(levels=3, warps=3, inner_iterations=3, sweeps=20)
    shapes = p.level_shapes((64, 64, 64))
    per_sweep = roofline.sweep_roofline_voxels_per_s(bw=800e9)
    assert per_sweep > 0
    bound = roofline.end_to_end_roofline(shapes, p, bw=800e9)
    # end-to-end bound must be far below the per-sweep bound
    assert bound < per_sweep / (p.warps * p.inner_iterations * p.sweeps)
    # byte models match the kernels: packed (production) and flat
    assert roofline.SweepByteModel(packed=True).per_half_sweep == 36
    assert roofline.SweepByteModel(packed=False).per_half_sweep == 56
    # bf16 terms storage shrinks only c and g
    assert roofline.SweepByteModel(packed=True,
                                   terms_bytes=2).per_half_sweep == 30
    assert roofline.SweepByteModel(packed=False,
                                   terms_bytes=2).per_half_sweep == 44


def test_jsonl_logger(tmp_path, capsys):
    path = str(tmp_path / "log.jsonl")
    log = JsonlLogger(path=path)
    log.log("evt", params=FlowParams(), arr=np.arange(3))
    log.close()
    rec = json.loads(open(path).read().strip())
    assert rec["event"] == "evt"
    assert rec["params"]["alpha"] == 0.05
    assert rec["arr"] == [0, 1, 2]


def test_summarize_residuals():
    res = np.zeros((2, 2, 4))
    res[0, 0] = [0.5, 0.4, 0.3, 0.2]
    s = summarize_residuals(res)
    assert s[0]["warps"][0] == {"first": 0.5, "last": 0.2}


def test_ops_registry_statistics():
    import jax

    from tpuflow3d.ops import get_op

    stats = jax.jit(get_op("statistics").fn)(jnp.asarray([[1.0, 2.0],
                                                          [3.0, 4.0]]))
    assert float(stats["min"]) == 1.0
    assert float(stats["max"]) == 4.0
    assert abs(float(stats["mean"]) - 2.5) < 1e-6


def test_pick_chunk_z_mg_infeasible_raises():
    """A streamed-mg run whose device-resident coarse chain cannot fit
    the device must fail LOUDLY at sizing time, not stream for hours and
    OOM at the finest level (r5 code review)."""
    import pytest

    from tpuflow3d.params import FlowParams
    from tpuflow3d.utils import memory as mem

    p = FlowParams(solver="multigrid", mg_cycles=2)
    shape = (1024, 1024, 1024)
    need = mem.mg_coarse_resident_bytes(shape, p)
    assert need > 16 * 2**30  # ~23 GB: genuinely does not fit a v5e
    with pytest.raises(ValueError, match="coarse hierarchy"):
        mem.pick_chunk_z(shape, p, budget=16 * 2**30)
    # sor at the same size sizes fine (fully streamed).
    assert mem.pick_chunk_z(shape, FlowParams(), budget=16 * 2**30) >= 8
