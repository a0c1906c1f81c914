"""grain-backed input pipeline (SURVEY.md L107/L130: "grain MapDataset").

An alternative to data/loader.py built on google/grain: deterministic global
shuffle, batching as a MapDataset transformation, and optional checkpointable
iteration. The SegmentDataset is the random-access source; padding/masking
happen in the dataset itself so batches are shape-static.

Interface-compatible with BatchLoader (epoch(n) / steps(n)); select with
DataConfig.pipeline = "grain".
"""

from __future__ import annotations

import numpy as np


class GrainLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_remainder: bool = True,
                 prefetch: int = 2, use_native: bool = False):
        import grain
        self._grain = grain
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder

    def _pipeline(self, epoch: int):
        g = self._grain
        buckets = getattr(self.dataset, "frame_buckets", None)
        if buckets and len(buckets) > 1:
            # bucket-homogeneous batches: the source elements are the batch
            # index lists (already bucket-pure and epoch-shuffled, identical
            # order to BatchLoader), mapped to stacked batches
            from nafae_tpu.data.loader import epoch_batches
            idx_lists = epoch_batches(self.dataset, self.batch_size,
                                      self.shuffle, self.seed,
                                      self.drop_remainder, epoch)
            ds = g.MapDataset.source(idx_lists)
            return ds.map(lambda idxs: _stack_samples(
                [self.dataset[int(i)] for i in idxs]))
        ds = g.MapDataset.source(self.dataset)
        if self.shuffle:
            ds = ds.shuffle(seed=self.seed + epoch)
        ds = ds.batch(self.batch_size, drop_remainder=self.drop_remainder,
                      batch_fn=_stack_samples)
        return ds

    def batches_per_epoch(self) -> int:
        return len(self._pipeline(0))

    def epoch(self, epoch: int = 0, skip: int = 0):
        ds = self._pipeline(epoch)
        # random access skips without building the dropped batches
        for i in range(skip, len(ds)):
            yield ds[i]

    def __iter__(self):
        return self.epoch(0)

    def steps(self, num_steps: int, start_epoch: int = 0, skip: int = 0):
        """Same contract as BatchLoader.steps (incl. mid-epoch resume)."""
        from nafae_tpu.data.loader import steps_over_epochs
        return steps_over_epochs(self, num_steps, start_epoch, skip)


def _stack_samples(samples):
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def make_loader(cfg_data, dataset, seed: int = 0, pipeline: str = "thread"):
    """Factory: "thread" -> BatchLoader (native C++ packer capable),
    "grain" -> GrainLoader."""
    if pipeline == "grain":
        return GrainLoader(dataset, cfg_data.batch_size, shuffle=True,
                           seed=seed, prefetch=cfg_data.prefetch)
    from nafae_tpu.data.loader import BatchLoader
    return BatchLoader(dataset, cfg_data.batch_size, shuffle=True, seed=seed,
                       prefetch=cfg_data.prefetch,
                       use_native=cfg_data.use_native_io)
