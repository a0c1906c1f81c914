"""One-run official-data rehearsal (VERDICT r2 #5; SURVEY.md §4.1-4.3).

Drives the ENTIRE chain scripts/repro_youcook2.sh encodes — official-schema
YouCook2 + YC2-BB fixtures -> strict-parsed extraction -> config-4 training
-> per-class eval -> visualization — through the real CLI mains in one test,
so a schema or plumbing break anywhere in the chain fails a single, obvious
test instead of five passing stage tests hiding a broken seam.
"""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def official_fixtures(tmp_path_factory):
    """Official-schema annotation files + synthetic videos."""
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("yc2")
    vdir = root / "videos"
    vdir.mkdir()
    rngv = np.random.RandomState(0)
    for vid in ("trainvidA", "valvidB"):
        w = cv2.VideoWriter(str(vdir / f"{vid}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (96, 96))
        if not w.isOpened():        # container support varies; avi fallback
            w = cv2.VideoWriter(str(vdir / f"{vid}.avi"),
                                cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                                (96, 96))
        for _ in range(30):
            w.write(rngv.randint(0, 255, (96, 96, 3), np.uint8))
        w.release()
    ext = ".mp4" if (vdir / "trainvidA.mp4").stat().st_size > 0 else ".avi"

    yc2 = {"database": {
        "trainvidA": {"duration": 3.0, "subset": "training", "annotations": [
            {"id": 0, "segment": [0, 1],
             "sentence": "heat the oil in a pan"},
            {"id": 1, "segment": [1, 3], "sentence": "add the onions"},
        ]},
        "valvidB": {"duration": 3.0, "subset": "validation", "annotations": [
            {"id": 0, "segment": [0, 3], "sentence": "slice the tomato"},
        ]},
    }}
    bb = {"database": {
        "valvidB": {"rwidth": 96, "rheight": 96, "segments": {"0": {
            "objects": [{"label": "tomato", "boxes": [
                {"x1": 8, "y1": 8, "x2": 72, "y2": 72, "outside": 0}
                for _ in range(4)]}],
        }}},
    }}
    yc2_path = root / "youcookii_annotations_trainval.json"
    yc2_path.write_text(json.dumps(yc2))
    bb_path = root / "yc2bb_val.json"
    bb_path.write_text(json.dumps(bb))
    return {"root": root, "video_dir": str(vdir), "ext": ext,
            "yc2": str(yc2_path), "bb": str(bb_path)}


# small-shape overrides shared by every stage (the fixture videos are 96x96,
# a few seconds long)
EXTRACT_OV = ["detector.image_size=64", "detector.num_proposals=5",
              "detector.rpn_pre_nms_topk=32", "detector.frame_rate=2.0",
              "detector.anchor_scales=[16,32]",
              "data.max_frames=6", "data.max_words=4"]
TRAIN_OV = ["model.feat_dim=2048", "model.embed_dim=32",
            "data.batch_size=2", "data.max_frames=6", "data.num_regions=5",
            "data.max_words=4", "loss.num_clusters=4", "loss.ctx_window=2",
            "loss.kmeans_interval=1", "train.steps=2",
            "train.warmup_steps=0", "train.log_every=1",
            "train.ckpt_every=2", "train.eval_every=1000"]


def test_repro_pipeline_one_run(official_fixtures, tmp_path, capsys):
    from nafae_tpu.evaluate import main as eval_main
    from nafae_tpu.extract import main as extract_main
    from nafae_tpu.train import main as train_main
    from nafae_tpu.visualize import main as viz_main

    fx = official_fixtures
    out = tmp_path / "repro"
    feats = str(out / "feats")
    ckpt = str(out / "ckpt")

    # [1/5] + [2/5]: strict-parsed official-schema extraction
    extract_main(["--youcook2-json", fx["yc2"], "--video-dir",
                  fx["video_dir"], "--subset", "train", "--strict",
                  "--video-ext", fx["ext"],
                  "--out", f"{feats}/train", "--override"] + EXTRACT_OV)
    extract_main(["--youcook2-json", fx["yc2"], "--video-dir",
                  fx["video_dir"], "--subset", "val", "--video-ext", fx["ext"],
                  "--yc2bb-json", fx["bb"], "--strict",
                  "--out", f"{feats}/val", "--override"] + EXTRACT_OV)
    got = capsys.readouterr().out.strip().splitlines()
    assert json.loads(got[-1])["gt_merged"] == 1
    assert os.path.exists(f"{feats}/train/index.jsonl")
    assert os.path.exists(f"{feats}/val/index.jsonl")

    # [3/5] config-4 training on the extracted features
    train_main(["--preset", "config4", "--override",
                f"data.root={feats}", f"train.ckpt_dir={ckpt}"] + TRAIN_OV)
    capsys.readouterr()

    # [4/5] per-class eval from the saved checkpoint
    eval_main(["--preset", "config4", "--per-class", "--override",
               f"data.root={feats}", f"train.ckpt_dir={ckpt}"] + TRAIN_OV)
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["num_annotations"] > 0
    assert result["num_classes_seen"] == 1                     # tomato
    assert 0.0 <= result["box_acc_macro"] <= 1.0
    assert 0.0 <= result["box_acc_micro"] <= 1.0
    assert "per_class_acc" in result
    (out / "eval.json").write_text(json.dumps(result))

    # [5/5] rendered visualizations from the same checkpoint
    viz_main(["--preset", "config4", "--out", str(out / "viz"),
              "--override", f"data.root={feats}",
              f"train.ckpt_dir={ckpt}"] + TRAIN_OV)
    viz = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert viz["records"] >= 1
    preds = [json.loads(ln) for ln in open(viz["predictions"])]
    assert all("boxes" in p or "regions" in p or len(p) > 0 for p in preds)
    rendered = [os.path.join(d, f)
                for d, _, fs in os.walk(out / "viz")
                for f in fs if f.endswith(".jpg")]
    assert rendered, "no rendered frames written"


def test_extract_cli_strict_rejects_drifted_schema(official_fixtures,
                                                   tmp_path):
    """--strict end-to-end: a drifted official file (renamed field) fails
    the CLI instead of silently extracting nothing."""
    from nafae_tpu.data.annotations import SchemaError
    from nafae_tpu.extract import main as extract_main

    fx = official_fixtures
    drifted = json.loads(open(fx["yc2"]).read())
    for meta in drifted["database"].values():
        for ann in meta["annotations"]:
            ann["caption"] = ann.pop("sentence")       # renamed field
    p = tmp_path / "drifted.json"
    p.write_text(json.dumps(drifted))
    with pytest.raises(SchemaError, match="sentence"):
        extract_main(["--youcook2-json", str(p), "--video-dir",
                      fx["video_dir"], "--strict", "--video-ext", fx["ext"],
                      "--out", str(tmp_path / "x"), "--override"]
                     + EXTRACT_OV)
