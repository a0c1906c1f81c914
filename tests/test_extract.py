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


def test_extract_quantize_int8(video_dir, tmp_path, monkeypatch):
    """extract --quantize int8 (the int8pre storage/wire format —
    docs/PERF.md "r5 inference work"): features land as int8 + per-region
    scales, SegmentDataset dequantizes by default (within one quantization
    step of the unquantized pipeline) and passes int8+scales through under
    keep_int8. The detector is faked (deterministic frame-dependent feats)
    — quantization/IO is the surface under test, not the detector."""
    import nafae_tpu.extract as extract_mod
    from nafae_tpu.data import SegmentDataset
    from nafae_tpu.extract import extract_segments, quantize_feats_np

    r, d = 5, 32

    def fake_extract_fn(cfg, params=None, key=None):
        def fn(params, frames):
            t = frames.shape[0]
            base = np.asarray(frames).reshape(t, -1)
            rng = np.random.RandomState(0)
            proj = rng.randn(base.shape[1], d).astype(np.float32)
            feats = np.repeat((base @ proj)[:, None, :], r, axis=1)
            feats += rng.randn(1, r, d).astype(np.float32)
            return {"boxes": np.tile(np.arange(4, dtype=np.float32),
                                     (t, r, 1)),
                    "feats": feats.astype(np.float32),
                    "region_valid": np.ones((t, r), np.float32)}
        return fn, {}

    monkeypatch.setattr(extract_mod, "make_extract_fn", fake_extract_fn)
    cfg = load_config(preset_name="config5", overrides=[
        "detector.image_size=64", "detector.frame_rate=1.0",
        "data.max_frames=4", "data.max_words=4",
        f"data.feat_dim={d}", f"data.num_regions={r}"])
    anns = [{"id": f"seg{n}", "video": v, "sentence": "add the onions",
             "split": "val"}
            for n, v in enumerate(video_dir)]

    root, root8 = str(tmp_path / "f32"), str(tmp_path / "i8")
    extract_segments(cfg, anns, os.path.join(root, "val"), frame_batch=4)
    extract_segments(cfg, anns, os.path.join(root8, "val"), frame_batch=4,
                     quantize="int8")

    with np.load(os.path.join(root8, "val", "seg0.npz")) as z:
        assert z["feats"].dtype == np.int8
        assert z["feats_scale"].dtype == np.float32
        assert z["feats_scale"].shape == z["feats"].shape[:2]
    # quantizer agreement: the npz carries quantize_feats_np of the same
    # detector output (the f32 pipeline stores f16 on disk, so codes can
    # differ by the f16 rounding — at most one step)
    with np.load(os.path.join(root, "val", "seg0.npz")) as z32, \
            np.load(os.path.join(root8, "val", "seg0.npz")) as z8:
        q, sf = quantize_feats_np(z32["feats"].astype(np.float32))
        np.testing.assert_allclose(sf, z8["feats_scale"], rtol=1e-3)
        assert np.abs(q.astype(np.int32)
                      - z8["feats"].astype(np.int32)).max() <= 1

    args = (4, r, d, 4)
    ds32 = SegmentDataset(root, "val", *args)
    ds8 = SegmentDataset(root8, "val", *args)                 # dequantizes
    ds8k = SegmentDataset(root8, "val", *args, keep_int8=True)
    s32, s8, s8k = ds32[0], ds8[0], ds8k[0]
    # default load: dequantized f32, within one quantization step.
    # (f32 files store f16 feats, so compare against the f16-rounded
    # values the f32 pipeline actually serves)
    assert s8["feats"].dtype == np.float32 and "feats_scale" not in s8
    scale = np.maximum(s8k["feats_scale"][..., None], 1e-12)
    err = np.abs(s8["feats"] - s32["feats"]) / scale
    assert err.max() <= 0.6, err.max()   # ½ int8 step + the f16 rounding
    # keep_int8: passthrough + padded scales
    assert s8k["feats"].dtype == np.int8
    assert s8k["feats_scale"].dtype == np.float32
    deq = s8k["feats"].astype(np.float32) * s8k["feats_scale"][..., None]
    np.testing.assert_allclose(deq, s8["feats"], rtol=0, atol=0)
