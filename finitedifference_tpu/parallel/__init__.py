from finitedifference_tpu.parallel.sweep import (
    sweep_fom,
    sweep_lspg,
    make_sweep_mesh,
)
from finitedifference_tpu.parallel.spatial import (
    make_sharded_residual,
    sharded_fom_step,
)

__all__ = [
    "sweep_fom",
    "sweep_lspg",
    "make_sweep_mesh",
    "sharded_fom_step",
    "make_sharded_residual",
]
