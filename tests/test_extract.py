"""End-to-end extraction test: synthetic videos -> decode -> detector ->
feature files -> SegmentDataset roundtrip (BASELINE config 5 skeleton)."""

import json
import os

import numpy as np
import pytest

from nafae_tpu.config import load_config


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    d = tmp_path_factory.mktemp("videos")
    paths = []
    for n in range(2):
        path = str(d / f"vid{n}.avi")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                            (96, 96))
        rng = np.random.RandomState(n)
        for i in range(40):
            w.write(rng.randint(0, 255, (96, 96, 3), np.uint8))
        w.release()
        paths.append(path)
    return paths


def test_extract_pipeline_roundtrip(video_dir, tmp_path):
    from nafae_tpu.data import SegmentDataset
    from nafae_tpu.extract import extract_segments

    cfg = load_config(preset_name="config5", overrides=[
        "detector.image_size=64", "detector.num_proposals=5",
        "detector.rpn_pre_nms_topk=32", "detector.frame_rate=1.0",
        "data.max_frames=4", "data.max_words=4",
    ])
    cfg.detector.anchor_scales = (16, 32)
    anns = [
        {"id": f"seg{n}", "video": v,
         "sentence": "heat the oil in a pan and add onions",
         "split": "train"}
        for n, v in enumerate(video_dir)
    ]
    out_dir = str(tmp_path / "extracted")
    index = extract_segments(cfg, anns, out_dir, frame_batch=4)
    assert os.path.exists(index)
    lines = [json.loads(ln) for ln in open(index)]
    assert len(lines) == 2

    with np.load(os.path.join(out_dir, "seg0.npz")) as z:
        assert z["feats"].shape[1:] == (5, 2048)
        assert z["feats"].shape[0] == 4          # 4s at 1 fps
        assert z["boxes"].shape[1:] == (5, 4)
        words = list(z["word_ids"])
    # vocab extraction picked up oil/pan/onion
    from nafae_tpu.data.vocab import Vocab
    v = Vocab()
    assert [v.classes[i] for i in words] == ["oil", "pan", "onion"]

    # extracted features load through the standard dataset
    ds = SegmentDataset(out_dir.rsplit("/", 1)[0], "extracted",
                        max_frames=4, num_regions=5, feat_dim=2048,
                        max_words=4)
    s = ds[0]
    assert s["feats"].shape == (4, 5, 2048)
    assert s["frame_mask"].sum() == 4


def test_extract_cli_with_converted_ckpt(video_dir, tmp_path):
    """--ckpt with a faster-rcnn.pytorch-lineage .pth: converted RPN +
    backbone weights drive extraction end-to-end, and the proposals differ
    from a random-init run (the converted RPN is live)."""
    import torch

    from nafae_tpu.extract import main as extract_main
    from tests.test_torch_convert_frcnn import make_frcnn_sd

    sd = {k: torch.from_numpy(v)
          for k, v in make_frcnn_sd(np.random.RandomState(4)).items()}
    pth = str(tmp_path / "frcnn.pth")
    torch.save({"model": sd}, pth)
    anns_path = str(tmp_path / "segments.jsonl")
    with open(anns_path, "w") as f:
        f.write(json.dumps({"id": "seg0", "video": video_dir[0],
                            "sentence": "slice the onion"}) + "\n")
    ov = ["detector.image_size=64", "detector.num_proposals=5",
          "detector.rpn_pre_nms_topk=32", "detector.rpn_channels=512",
          "detector.anchor_scales=[16,32]",
          "data.max_frames=2", "data.max_words=4"]
    outs = {}
    for name, extra in (("rand", []), ("conv", ["--ckpt", pth])):
        out_dir = str(tmp_path / name)
        args = ["--annotations", anns_path, "--out", out_dir,
                "--override"] + ov + extra
        extract_main(args)
        with np.load(os.path.join(out_dir, "seg0.npz")) as z:
            outs[name] = {"boxes": z["boxes"].copy(),
                          "feats": z["feats"].copy()}
    assert np.isfinite(outs["conv"]["feats"].astype(np.float32)).all()
    assert not np.allclose(outs["rand"]["boxes"], outs["conv"]["boxes"])


def test_decode_segment_start_end(video_dir):
    """start/end trim to the annotated window (YouCook2-style long videos)."""
    from nafae_tpu.extract import decode_segment
    whole = decode_segment(video_dir[0], 10.0, 40, 32)        # all 40 frames
    mid = decode_segment(video_dir[0], 10.0, 40, 32, start=1.0, end=2.0)
    assert whole.shape[0] == 40
    assert 8 <= mid.shape[0] <= 12                            # ~1s at 10 fps
    np.testing.assert_allclose(mid[0], whole[10], atol=1e-6)


def test_inline_video_training(video_dir, tmp_path):
    """config-5 inline fit: decode in loader workers -> frozen detector in
    the train step -> all losses; no feature files on disk."""
    from nafae_tpu.train import fit
    anns_path = str(tmp_path / "segments.jsonl")
    with open(anns_path, "w") as f:
        for n, v in enumerate(video_dir):
            f.write(json.dumps({
                "id": f"seg{n}", "video": v,
                "sentence": "heat the oil in a pan and add onions"}) + "\n")
    cfg = load_config(preset_name="config5", overrides=[
        "data.from_videos=true", f"data.annotations={anns_path}",
        "data.batch_size=2", "data.max_frames=3", "data.max_words=3",
        "data.num_regions=4", "model.feat_dim=2048", "model.embed_dim=32",
        "detector.image_size=64", "detector.num_proposals=4",
        "detector.rpn_pre_nms_topk=16", "loss.num_clusters=4",
        "loss.ctx_window=2", "loss.kmeans_interval=2", "train.steps=2",
        "train.steps_per_call=2",   # covers bucket-grouping on frames batches
        "train.warmup_steps=0", "train.log_every=1", "train.ckpt_every=100",
        "train.eval_every=1000", "train.donate=false",
        f"train.ckpt_dir={tmp_path}/ivt"])
    cfg.detector.anchor_scales = (16, 32)
    state, metrics = fit(cfg)
    assert int(state.step) == 2
    assert np.isfinite(float(metrics["loss"]))
    assert {"l_rank", "l_ctx", "l_clu"} <= set(metrics)
