from orv_tpu.data.dataset import (
    DatasetConfig,
    DemoRobotDataset,
    RobotDataset,
    CascadedRobotDataset,
    MultiViewRobotDataset,
    BucketSampler,
    collate_control,
)

__all__ = [
    "DatasetConfig",
    "DemoRobotDataset",
    "RobotDataset",
    "CascadedRobotDataset",
    "MultiViewRobotDataset",
    "BucketSampler",
    "collate_control",
]
