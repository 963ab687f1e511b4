from finitedifference_tpu.training.monitor import TrainingMonitor
from finitedifference_tpu.training.data import (
    get_snapshot_params,
    load_training_data,
    random_split,
)

__all__ = [
    "TrainingMonitor",
    "get_snapshot_params",
    "load_training_data",
    "random_split",
]
