"""Grain input pipeline (the north-star's "Grain + JAX pipeline feeding
HBM-resident latents", BASELINE.json).

Wraps RobotDataset (and subclasses) as a grain RandomAccessDataSource and
builds a grain.DataLoader with process-sharding (ShardByJaxProcess),
worker-process parallel decode, and batch collation via the same
collate_control the threaded loader uses — so the batch layout feeding the
jitted train step is identical either way.

Two loader regimes:
  * `make_grain_loader`: the common fixed-(ref_num, n_view) configuration —
    grain owns sampling/sharding/epochs/workers. This is the production
    path for raw-frame decode (CPU-heavy, benefits from worker processes).
  * bucketed multi-ref/multiview runs keep `BucketSampler` + the threaded
    prefetcher (`pipelines/train.prefetch_batches`): grain's index sampler
    cannot express shape-homogeneous (ref_num, n_view) buckets.

The train entry selects grain via `train.loader: grain` (yaml or CLI).
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Optional

import numpy as np

from orv_tpu.data.dataset import collate_control


class _DatasetSource:
    """grain RandomAccessDataSource view of a RobotDataset."""

    def __init__(self, dataset):
        self._ds = dataset

    def __len__(self) -> int:
        return len(self._ds)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        return self._ds[int(idx)]


def make_grain_loader(
    dataset,
    batch_size: int,
    seed: int = 0,
    num_epochs: Optional[int] = None,
    worker_count: int = 0,
    shuffle: bool = True,
    drop_remainder: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """-> iterator of collated batches (same layout as prefetch_batches).

    `worker_count=0` runs in-process (tests, latents-on-disk runs where IO
    is cheap); >0 spawns grain worker processes for parallel raw-frame
    decode. Sharding across jax processes is automatic.
    """
    import grain.python as grain

    sampler = grain.IndexSampler(
        num_records=len(dataset),
        shard_options=grain.ShardByJaxProcess(drop_remainder=True),
        shuffle=shuffle,
        num_epochs=num_epochs,
        seed=seed,
    )
    loader = grain.DataLoader(
        data_source=_DatasetSource(dataset),
        sampler=sampler,
        operations=[grain.Batch(batch_size=batch_size, drop_remainder=drop_remainder)],
        worker_count=worker_count,
    )

    def batches():
        for batch in loader:
            # grain's Batch stacks arrays; lists (metainfo/prompt) arrive as
            # per-key lists already — normalize through collate_control's
            # naming by rebuilding per-sample dicts only when grain returned
            # stacked arrays is wasteful, so map keys directly instead.
            yield _normalize(batch)

    return batches()


def _normalize(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Align grain's stacked-batch naming with collate_control's output
    (metainfo -> metainfos, prompt -> prompts, num_views scalar)."""
    out: Dict[str, Any] = {}
    for k, v in batch.items():
        if k == "metainfo":
            out["metainfos"] = list(v) if not isinstance(v, dict) else _unstack_dicts(v)
        elif k == "prompt":
            out["prompts"] = list(v)
        elif k == "num_views":
            out[k] = int(np.asarray(v).reshape(-1)[0])
        else:
            out[k] = np.asarray(v)
    return out


def _unstack_dicts(d: Dict[str, Any]):
    """grain batches dict leaves into [B] arrays; rebuild the per-sample
    scalar dicts collate_control emits."""
    arrs = {k: np.asarray(v) for k, v in d.items()}
    n = len(next(iter(arrs.values())))
    return [{k: (a[i].item() if a[i].ndim == 0 else a[i]) for k, a in arrs.items()}
            for i in range(n)]
