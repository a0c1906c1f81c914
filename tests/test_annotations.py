"""YouCook2 / YouCook2-BB / RoboWatch annotation parsing (schema fixtures)."""

import json

import numpy as np

import pytest

from nafae_tpu.data.annotations import (SchemaError, gt_from_robowatch,
                                        gt_from_youcook2bb,
                                        merge_gt_into_features,
                                        segments_from_robowatch,
                                        segments_from_youcook2)
from nafae_tpu.data.vocab import Vocab

YC2 = {"database": {
    "vidA": {"duration": 120.0, "subset": "training", "annotations": [
        {"id": 0, "segment": [10, 25], "sentence": "heat oil in a pan"},
        {"id": 1, "segment": [30, 50], "sentence": "add the onions"},
    ]},
    "vidB": {"duration": 60.0, "subset": "validation", "annotations": [
        {"id": 0, "segment": [5, 15], "sentence": "slice the tomato"},
    ]},
}}

YC2BB = {"database": {
    "vidB": {"rwidth": 720, "rheight": 405, "segments": {
        "0": {"objects": [
            {"label": "tomato", "boxes": [
                {"x1": 10, "y1": 20, "x2": 110, "y2": 120, "outside": 0},
                {"x1": 12, "y1": 22, "x2": 112, "y2": 122, "outside": 0},
                {"outside": 1},
            ]},
            {"label": "not_a_known_object", "boxes": []},
        ]},
    }},
}}


def test_segments_from_youcook2(tmp_path):
    p = tmp_path / "yc2.json"
    p.write_text(json.dumps(YC2))
    segs = segments_from_youcook2(str(p), "/videos")
    assert len(segs) == 3
    a0 = segs[0]
    assert a0["id"] == "vidA_0" and a0["split"] == "train"
    assert a0["video"] == "/videos/vidA.mp4"
    assert a0["start"] == 10 and a0["end"] == 25
    val = segments_from_youcook2(str(p), "/videos", subset="val")
    assert [s["id"] for s in val] == ["vidB_0"]


def test_gt_from_youcook2bb(tmp_path):
    p = tmp_path / "bb.json"
    p.write_text(json.dumps(YC2BB))
    gt = gt_from_youcook2bb(str(p), max_words=4, max_frames=5)
    assert set(gt) == {"vidB_0"}
    g = gt["vidB_0"]
    v = Vocab()
    assert list(g["word_ids"]) == [v.word_to_id["tomato"]]
    # boxes normalized by the annotation resolution (rwidth=720, rheight=405)
    assert g["normalized"]
    np.testing.assert_allclose(g["gt_boxes"][0, 0],
                               [10 / 720, 20 / 405, 110 / 720, 120 / 405],
                               rtol=1e-6)
    np.testing.assert_allclose(g["gt_mask"][0, :3], [1, 1, 0])  # frame 2 outside


def test_merge_gt_into_features(tmp_path):
    # fake extracted features for vidB_0
    d = tmp_path / "feats"
    d.mkdir()
    np.savez(d / "vidB_0.npz",
             feats=np.zeros((3, 4, 8), np.float16),
             boxes=np.zeros((3, 4, 4), np.float32),
             word_ids=np.asarray([0], np.int32))
    (d / "index.jsonl").write_text(json.dumps(
        {"id": "vidB_0", "file": "vidB_0.npz", "num_frames": 3,
         "num_words": 1, "split": "val"}) + "\n")
    p = tmp_path / "bb.json"
    p.write_text(json.dumps(YC2BB))
    gt = gt_from_youcook2bb(str(p), max_words=4, max_frames=5)
    n = merge_gt_into_features(str(d), gt, image_size=160)
    assert n == 1
    with np.load(d / "vidB_0.npz") as z:
        assert z["gt_boxes"].shape == (1, 3, 4)   # K x T(=3 frames) x 4
        assert z["gt_mask"].shape == (1, 3)
        # normalized GT rescaled into the extraction frame space (160px)
        np.testing.assert_allclose(
            z["gt_boxes"][0, 0],
            [10 / 720 * 160, 20 / 405 * 160, 110 / 720 * 160, 120 / 405 * 160],
            rtol=1e-5)
        v = Vocab()
        assert list(z["word_ids"]) == [v.word_to_id["tomato"]]
    # merged file loads through the standard eval dataset
    from nafae_tpu.data import SegmentDataset
    ds = SegmentDataset(str(tmp_path), "feats", max_frames=5, num_regions=4,
                        feat_dim=8, max_words=4, with_gt=True)
    s = ds[0]
    assert s["gt_mask"].sum() == 2


ROBOWATCH = {
    # bare mapping (no "database" wrapper); vidC has explicit segments with
    # sentences, vidD is a flat whole-video object list with list-form boxes
    "vidC": {"rwidth": 640, "rheight": 480, "segments": {
        "2": {"segment": [3, 9], "sentence": "wipe the pan with oil",
              "objects": [
                  {"label": "pan", "boxes": [
                      {"x1": 0, "y1": 0, "x2": 64, "y2": 48, "outside": 0},
                      {"outside": 1},
                  ]},
              ]},
    }},
    "vidD": {"objects": [
        {"label": "Bowl", "boxes": [[5, 6, 50, 60], [7, 8, 52, 62, 1]]},
        {"label": "unknown thing", "boxes": [[1, 1, 2, 2]]},
    ]},
}


def test_segments_from_robowatch(tmp_path):
    p = tmp_path / "rw.json"
    p.write_text(json.dumps(ROBOWATCH))
    segs = segments_from_robowatch(str(p), "/rw")
    assert [s["id"] for s in segs] == ["vidC_2", "vidD_0"]
    c = segs[0]
    assert c["video"] == "/rw/vidC.mp4" and c["split"] == "val"
    assert c["sentence"] == "wipe the pan with oil"
    assert c["start"] == 3 and c["end"] == 9
    # sentence synthesized from object labels when the release has none
    d = segs[1]
    assert "Bowl" in d["sentence"]
    assert d["start"] is None
    # "database" wrapper accepted too
    p2 = tmp_path / "rw2.json"
    p2.write_text(json.dumps({"database": ROBOWATCH}))
    assert [s["id"] for s in segments_from_robowatch(str(p2), "/rw")] \
        == ["vidC_2", "vidD_0"]


def test_segments_from_robowatch_null_and_list_variants(tmp_path):
    """Lenient-parsing contract (r2 review fix): a present-but-null
    "segment" span falls back to whole-video, null "objects" synthesizes
    an empty sentence, and a list-valued "segments" release variant is
    accepted."""
    raw = {
        "vidE": {"segments": {"0": {"segment": None, "objects": None,
                                    "sentence": "stir the soup"}}},
        "vidF": {"segments": [{"segment": [1, 4], "objects":
                               [{"label": "Cup"}]}]},
    }
    p = tmp_path / "rw3.json"
    p.write_text(json.dumps(raw))
    segs = segments_from_robowatch(str(p), "/rw")
    assert [s["id"] for s in segs] == ["vidE_0", "vidF_0"]
    assert segs[0]["start"] is None and segs[0]["end"] is None
    assert segs[0]["sentence"] == "stir the soup"
    assert segs[1]["start"] == 1 and "Cup" in segs[1]["sentence"]


def test_gt_from_robowatch(tmp_path):
    p = tmp_path / "rw.json"
    p.write_text(json.dumps(ROBOWATCH))
    gt = gt_from_robowatch(str(p), max_words=4, max_frames=5)
    assert set(gt) == {"vidC_2", "vidD_0"}
    v = Vocab()
    c = gt["vidC_2"]
    assert list(c["word_ids"]) == [v.word_to_id["pan"]]
    assert c["normalized"]
    np.testing.assert_allclose(c["gt_boxes"][0, 0],
                               [0, 0, 64 / 640, 48 / 480], rtol=1e-6)
    np.testing.assert_allclose(c["gt_mask"][0, :2], [1, 0])  # frame 1 outside
    d = gt["vidD_0"]     # flat video; list boxes; unknown label skipped
    assert list(d["word_ids"]) == [v.word_to_id["bowl"]]
    assert not d["normalized"]
    np.testing.assert_allclose(d["gt_boxes"][0, 0], [5, 6, 50, 60])
    np.testing.assert_allclose(d["gt_mask"][0, :2], [1, 0])  # outside flag


def test_merge_robowatch_gt_roundtrip(tmp_path):
    """RoboWatch GT merges into extracted features and loads through
    RoboWatchDataset (the config-5 transfer-eval data path)."""
    from nafae_tpu.data.robowatch import RoboWatchDataset
    d = tmp_path / "val"
    d.mkdir()
    np.savez(d / "vidD_0.npz",
             feats=np.zeros((2, 4, 8), np.float16),
             boxes=np.zeros((2, 4, 4), np.float32),
             word_ids=np.asarray([0], np.int32))
    (d / "index.jsonl").write_text(json.dumps(
        {"id": "vidD_0", "file": "vidD_0.npz", "num_frames": 2,
         "num_words": 1, "split": "val"}) + "\n")
    p = tmp_path / "rw.json"
    p.write_text(json.dumps(ROBOWATCH))
    gt = gt_from_robowatch(str(p), max_words=4, max_frames=5)
    assert merge_gt_into_features(str(d), gt) == 1
    ds = RoboWatchDataset(str(tmp_path), max_frames=5, num_regions=4,
                          feat_dim=8, max_words=4)
    s = ds[0]
    assert s["gt_mask"].sum() == 1
    v = Vocab()
    assert int(s["word_ids"][0]) == v.word_to_id["bowl"]


# ---------------------------------------------------------------------------
# strict mode (VERDICT r2 #5): unknown/missing schema fields raise loudly
# instead of being silently skipped — the schema-drift tripwire for when the
# real release files arrive.

def _write(tmp_path, name, obj):
    p = tmp_path / name
    p.write_text(json.dumps(obj))
    return str(p)


def test_strict_passes_on_clean_fixtures(tmp_path):
    """The canonical fixtures ARE the expected schema minus known warts —
    strict accepts them once the warts are removed."""
    yc2 = _write(tmp_path, "yc2.json", YC2)
    assert len(segments_from_youcook2(yc2, "/v", strict=True)) == 3
    clean_bb = json.loads(json.dumps(YC2BB))
    objs = clean_bb["database"]["vidB"]["segments"]["0"]["objects"]
    del objs[1]                     # the deliberately-unknown label
    bb = _write(tmp_path, "bb.json", clean_bb)
    assert set(gt_from_youcook2bb(bb, strict=True)) == {"vidB_0"}
    rw = _write(tmp_path, "rw.json", ROBOWATCH)
    assert len(segments_from_robowatch(rw, "/v", strict=True)) == 2


def test_strict_youcook2_schema_drift(tmp_path):
    bad_subset = {"database": {"v": {"subset": "train",    # not "training"
                                     "annotations": []}}}
    with pytest.raises(SchemaError, match="subset"):
        segments_from_youcook2(_write(tmp_path, "a.json", bad_subset),
                               "/v", strict=True)
    no_anns = {"database": {"v": {"subset": "training"}}}
    with pytest.raises(SchemaError, match="annotations"):
        segments_from_youcook2(_write(tmp_path, "b.json", no_anns),
                               "/v", strict=True)
    bad_seg = {"database": {"v": {"subset": "training", "annotations": [
        {"id": 0, "segment": [1], "sentence": "x"}]}}}
    with pytest.raises(SchemaError, match="segment"):
        segments_from_youcook2(_write(tmp_path, "c.json", bad_seg),
                               "/v", strict=True)
    missing_sentence = {"database": {"v": {"subset": "training",
                                           "annotations": [
        {"id": 0, "segment": [1, 2]}]}}}
    with pytest.raises(SchemaError, match="sentence"):
        segments_from_youcook2(_write(tmp_path, "d.json", missing_sentence),
                               "/v", strict=True)
    # lenient default: unknown subset falls back to train, missing
    # annotations parse as empty
    assert segments_from_youcook2(_write(tmp_path, "a.json", bad_subset),
                                  "/v") == []
    assert len(segments_from_youcook2(
        _write(tmp_path, "d.json", missing_sentence), "/v")) == 1


def test_strict_yc2bb_schema_drift(tmp_path):
    with pytest.raises(SchemaError, match="unknown label"):
        gt_from_youcook2bb(_write(tmp_path, "bb.json", YC2BB), strict=True)
    no_res = {"database": {"v": {"segments": {"0": {"objects": [
        {"label": "pan", "boxes": [[1, 2, 3, 4]]}]}}}}}
    with pytest.raises(SchemaError, match="rwidth"):
        gt_from_youcook2bb(_write(tmp_path, "r.json", no_res), strict=True)
    overflow = {"database": {"v": {"rwidth": 10, "rheight": 10,
        "segments": {"0": {"objects": [
            {"label": "pan", "boxes": []},
            {"label": "bowl", "boxes": []}]}}}}}
    with pytest.raises(SchemaError, match="max_words"):
        gt_from_youcook2bb(_write(tmp_path, "o.json", overflow),
                           max_words=1, strict=True)
    bad_box = {"database": {"v": {"rwidth": 10, "rheight": 10,
        "segments": {"0": {"objects": [
            {"label": "pan", "boxes": [{"x1": 1, "y1": 2, "x2": 3}]}]}}}}}
    with pytest.raises(SchemaError, match="coordinates"):
        gt_from_youcook2bb(_write(tmp_path, "x.json", bad_box), strict=True)
    # lenient default: the malformed box is skipped quietly — the track
    # survives but with no visible frame
    g = gt_from_youcook2bb(_write(tmp_path, "x.json", bad_box))
    assert g["v_0"]["gt_mask"].sum() == 0


def test_strict_robowatch_schema_drift(tmp_path):
    nothing_to_ground = {"v": {"segments": {"0": {}}}}
    with pytest.raises(SchemaError, match="nothing to ground"):
        segments_from_robowatch(_write(tmp_path, "n.json",
                                       nothing_to_ground), "/v", strict=True)
    with pytest.raises(SchemaError, match="unknown label"):
        gt_from_robowatch(_write(tmp_path, "rw.json", ROBOWATCH),
                          strict=True)
    no_objects = {"v": {"segments": {"0": {"sentence": "x"}}}}
    with pytest.raises(SchemaError, match="objects"):
        gt_from_robowatch(_write(tmp_path, "no.json", no_objects),
                          strict=True)
    # lenient default: parses the same files without raising
    assert len(segments_from_robowatch(
        _write(tmp_path, "rw.json", ROBOWATCH), "/v")) == 2


def test_strict_scalar_segment_raises_schema_error(tmp_path):
    """A present-but-scalar (or 2-char-string) 'segment' must raise
    SchemaError in strict mode — not TypeError — and fall back to the
    whole-video span leniently."""
    scalar_seg = {"database": {"v": {"subset": "training", "annotations": [
        {"id": 0, "segment": 12.5, "sentence": "x"}]}}}
    p = _write(tmp_path, "scalar.json", scalar_seg)
    with pytest.raises(SchemaError, match="start, end"):
        segments_from_youcook2(p, "/v", strict=True)
    segs = segments_from_youcook2(p, "/v")          # lenient: whole video
    assert segs[0]["start"] is None and segs[0]["end"] is None
    str_seg = {"database": {"v": {"subset": "training", "annotations": [
        {"id": 0, "segment": "12", "sentence": "x"}]}}}
    with pytest.raises(SchemaError, match="start, end"):
        segments_from_youcook2(_write(tmp_path, "s2.json", str_seg),
                               "/v", strict=True)
    rw = {"v": {"segments": {"0": {"segment": 3.0, "sentence": "x"}}}}
    p3 = _write(tmp_path, "rw_scalar.json", rw)
    with pytest.raises(SchemaError, match="start, end"):
        segments_from_robowatch(p3, "/v", strict=True)
    assert segments_from_robowatch(p3, "/v")[0]["start"] is None
