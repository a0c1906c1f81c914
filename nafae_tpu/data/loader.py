"""Batch loader: bucketing, shuffling, background prefetch, device transfer.

Replaces the reference's `torch.utils.data.DataLoader` worker-process stack
(SURVEY.md L97, L175). Two backends:
  * Python: a daemon thread stacks numpy samples into batches ahead of compute.
  * Native: the C++ packer in `native/` (see `nafae_tpu.utils.native_io`) reads
    the .npz segment files and packs padded batches in worker threads, off the
    Python GIL — mirrors where the reference leaned on native dataloaders.

Batches are dicts of numpy arrays with static shapes (one [T,R,D] bucket), so
`jax.jit` compiles the train step exactly once (SURVEY.md L352: bucketing +
masking discipline).
"""

from __future__ import annotations

import queue
import threading

import numpy as np


def steps_over_epochs(loader, num_steps: int, start_epoch: int = 0,
                      skip: int = 0):
    """Yield exactly num_steps (i, batch) pairs, cycling loader.epoch(n).
    `skip` resumes mid-epoch: the first `skip` batches of `start_epoch` are
    skipped without being built (deterministic dataloader-position resume).
    Shared by BatchLoader and GrainLoader so resume semantics cannot drift."""
    done, epoch = 0, start_epoch
    while done < num_steps:
        made = 0
        for batch in loader.epoch(epoch, skip=skip):
            yield done, batch
            done += 1
            made += 1
            if done >= num_steps:
                return
        if made == 0 and skip == 0:
            # a zero-batch epoch can never make progress — without this the
            # loop spins forever spawning a prefetch thread per iteration
            raise ValueError(
                "epoch produced no batches: the dataset is smaller than one "
                "batch (drop_remainder) or every bucket is empty — shrink "
                "data.batch_size or add data")
        skip = 0
        epoch += 1


def epoch_batches(dataset, batch_size: int, shuffle: bool, seed: int,
                  drop_remainder: bool, epoch: int) -> list:
    """Batch index lists for one epoch; every batch is bucket-homogeneous
    (one jit specialization per bucket, no straddling, no recompiles).
    Shared by BatchLoader and GrainLoader so bucketing semantics (and the
    seeded order) are identical across pipelines."""
    def chunk(order):
        nb = (len(order) // batch_size if drop_remainder
              else -(-len(order) // batch_size))
        return [order[b * batch_size:(b + 1) * batch_size]
                for b in range(nb)]

    rng = np.random.RandomState(seed + epoch)
    order = np.arange(len(dataset))
    if shuffle:
        rng.shuffle(order)
    buckets = getattr(dataset, "frame_buckets", None)
    if buckets and len(buckets) > 1:
        keys = np.asarray([dataset.bucket_of(int(i)) for i in order])
        batches = []
        for b in buckets:
            grp = order[keys == b]
            batches += chunk(grp)
        if shuffle:
            rng.shuffle(batches)              # interleave buckets across steps
        return batches
    return chunk(order)


class BatchLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_remainder: bool = True,
                 prefetch: int = 2, use_native: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.prefetch = prefetch
        self._native = None
        if use_native and not hasattr(dataset, "dir"):
            # by-design skip, not a failure: the packer packs FEATURE-file
            # datasets (.npz under dataset.dir); video datasets carry raw
            # frames and do their native work at decode time
            # (native decode_video_seg inside VideoSegmentDataset)
            use_native = False
        if use_native and str(getattr(dataset, "transfer_dtype", "float32")) \
                not in ("float32", "float16", "bfloat16"):
            use_native = False  # dtypes the native packer cannot emit
        if use_native and getattr(dataset, "keep_int8", False):
            # int8pre passthrough (int8 feats + scales to the device): the
            # packer emits float batches only — by-design skip, the Python
            # loader moves ¼ the feature bytes anyway
            use_native = False
        if use_native:
            try:
                from nafae_tpu.utils.native_io import NativePacker
                self._native = NativePacker(dataset)
            except Exception as e:
                # graceful fallback to the Python path — but say so: a
                # silent fallback reads as "native engaged" at 1/Nth speed
                import warnings
                warnings.warn(f"native IO packer unavailable, using the "
                              f"Python loader: {type(e).__name__}: {e}")
                self._native = None

    def _epoch_batches(self, epoch: int) -> list:
        return epoch_batches(self.dataset, self.batch_size, self.shuffle,
                             self.seed, self.drop_remainder, epoch)

    def _make_batch(self, idxs) -> dict[str, np.ndarray]:
        if self._native is not None:
            return self._native.pack(idxs)
        samples = [self.dataset[int(i)] for i in idxs]
        return {k: np.stack([s[k] for s in samples]) for k in samples[0]}

    def batches_per_epoch(self) -> int:
        """Constant across epochs: shuffling permutes within fixed buckets."""
        return len(self._epoch_batches(0))

    def epoch(self, epoch: int = 0, skip: int = 0):
        """Yield batches for one epoch, prefetched by a background thread.
        `skip` drops the first batches cheaply (before building them) —
        exact deterministic resume from a mid-epoch checkpoint position.
        Worker exceptions re-raise in the consumer (a swallowed error would
        look like a short/empty epoch and hang or corrupt training)."""
        batch_idxs = self._epoch_batches(epoch)[skip:]
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_polling(item) -> bool:
            while not stop.is_set():  # poll stop: never block forever on a
                try:                  # full queue after consumer abandoned us
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    pass
            return False

        def worker():
            sentinel = None           # normal end-of-epoch
            try:
                for idxs in batch_idxs:
                    if stop.is_set():
                        return
                    try:
                        item = self._make_batch(idxs)
                    except BaseException as e:  # propagate to the consumer
                        sentinel = e
                        return
                    if not put_polling(item):
                        return
            finally:
                # the sentinel must never be dropped (a Full queue here
                # would leave the consumer blocked on q.get() forever)
                put_polling(sentinel)

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    def __iter__(self):
        return self.epoch(0)

    def steps(self, num_steps: int, start_epoch: int = 0, skip: int = 0):
        """See steps_over_epochs."""
        return steps_over_epochs(self, num_steps, start_epoch, skip)
