from orv_tpu.data.dataset import (
    DatasetConfig,
    RobotDataset,
    CascadedRobotDataset,
    MultiViewRobotDataset,
    BucketSampler,
    collate_control,
)

__all__ = [
    "DatasetConfig",
    "RobotDataset",
    "CascadedRobotDataset",
    "MultiViewRobotDataset",
    "BucketSampler",
    "collate_control",
]
