from tpuflow3d.ops.registry import OPS, OpSpec, get_op

__all__ = ["OPS", "OpSpec", "get_op"]
