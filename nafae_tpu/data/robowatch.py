"""RoboWatch transfer-evaluation dataset (BASELINE config 5; SURVEY.md L132).

Same on-disk layout as YouCook2 (the extraction pipeline is shared); eval-only.
The NAFAE authors annotated a RoboWatch subset with boxes for cross-dataset
transfer evaluation — the rebuild evaluates a YouCook2-trained checkpoint on it
with the identical metric path (SURVEY.md L199-203). To ingest the authors'
annotation release, run `nafae-extract --robowatch-json <file> --out <dir>`
(data/annotations.py: segments_from_robowatch + gt_from_robowatch derive the
segment list AND merge the GT boxes into the extracted features).
"""

from __future__ import annotations

from nafae_tpu.data.youcook2 import SegmentDataset


class RoboWatchDataset(SegmentDataset):
    def __init__(self, root: str, max_frames: int, num_regions: int,
                 feat_dim: int, max_words: int):
        super().__init__(root, "val", max_frames, num_regions, feat_dim,
                         max_words, with_gt=True)
