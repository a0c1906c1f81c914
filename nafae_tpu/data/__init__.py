"""Data layer: vocab, annotation parsing, feature files, batching.

Replaces the reference's torch Dataset/DataLoader stack (SURVEY.md L97, L130-135)
with a packed, padded, device-ready pipeline: fixed [T,R,D] buckets, bool masks,
threaded (or native C++) prefetch.
"""

from nafae_tpu.data.vocab import Vocab, DEFAULT_CLASSES  # noqa: F401
from nafae_tpu.data.youcook2 import SegmentDataset, pad_sample  # noqa: F401
from nafae_tpu.data.loader import BatchLoader  # noqa: F401
from nafae_tpu.data.synthetic import generate_synthetic_dataset  # noqa: F401
