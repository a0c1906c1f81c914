"""Data layer tests: vocab extraction, synthetic fixtures, dataset, loader."""

import numpy as np

from nafae_tpu.data import BatchLoader, SegmentDataset, Vocab


def test_vocab_extract():
    v = Vocab()
    ids = v.extract("Heat the oil in a pan and add the onions and garlic.")
    words = [v.classes[i] for i in ids]
    assert words == ["oil", "pan", "onion", "garlic"]
    assert v.extract("nothing relevant here") == []
    assert len(v) == 67


def test_vocab_multiword(tmp_path):
    """Multi-word classes match as n-grams, longest first, incl. plurals and
    the from_file path (VERDICT r1 #7; real YC2-BB lists have such entries)."""
    p = tmp_path / "classes.txt"
    p.write_text("pepper\nBell Pepper\ncutting board\nknife\n")
    v = Vocab.from_file(str(p))
    assert len(v) == 4
    # longest match wins; bare word still matches alone
    assert [v.classes[i] for i in v.extract("chop the bell pepper finely")] \
        == ["bell pepper"]
    assert [v.classes[i] for i in v.extract("add pepper and salt")] \
        == ["pepper"]
    # plural alias applies to the last token of the phrase
    assert [v.classes[i] for i in v.extract("two bell peppers on the "
                                            "cutting boards")] \
        == ["bell pepper", "cutting board"]
    # lookup accepts space or underscore phrase forms
    assert v.lookup("bell pepper") == 1
    assert v.lookup("bell_pepper") == 1
    assert v.lookup("Bell Peppers") == 1
    assert v.lookup("pepper") == 0
    assert v.lookup("bell") is None
    # underscore tokens inside sentences split and match the phrase
    assert [v.classes[i] for i in v.extract("use the bell_pepper now")] \
        == ["bell pepper"]
    # default vocab still matches its underscore-named class
    d = Vocab()
    assert [d.classes[i] for i in d.extract("add the pepper_bell now")] \
        == ["pepper_bell"]


def test_vocab_exact_name_beats_plural_alias():
    """A class whose literal name equals another class's auto-plural keeps
    its own id: exact names are registered before any alias (r2 review
    fix — a single setdefault pass let 'pepper's alias shadow a literal
    'peppers' class)."""
    v = Vocab(["pepper", "peppers", "onion"])
    assert v.lookup("pepper") == 0
    assert v.lookup("peppers") == 1          # exact name, not 0's alias
    assert v.lookup("onions") == 2           # aliases still work
    assert [v.classes[i] for i in v.extract("add peppers to the onions")] \
        == ["peppers", "onion"]


def test_dataset_shapes(synth_root):
    ds = SegmentDataset(synth_root, "train", max_frames=8, num_regions=6,
                        feat_dim=64, max_words=3)
    s = ds[0]
    assert s["feats"].shape == (8, 6, 64)
    assert s["boxes"].shape == (8, 6, 4)
    assert s["word_ids"].shape == (3,)
    assert s["frame_mask"].shape == (8,)
    assert 0 < s["frame_mask"].sum() <= 8
    assert 0 < s["word_mask"].sum() <= 3


def test_dataset_gt(synth_root):
    ds = SegmentDataset(synth_root, "val", max_frames=8, num_regions=6,
                        feat_dim=64, max_words=3, with_gt=True)
    s = ds[0]
    assert s["gt_boxes"].shape == (3, 8, 4)
    assert s["gt_mask"].shape == (3, 8)
    # GT only where both word and frame are valid
    assert (s["gt_mask"] <= s["word_mask"][:, None] * s["frame_mask"][None, :]).all()


def test_loader_batches(synth_root):
    ds = SegmentDataset(synth_root, "train", max_frames=8, num_regions=6,
                        feat_dim=64, max_words=3)
    dl = BatchLoader(ds, batch_size=4, shuffle=True, seed=0)
    batches = list(dl.epoch(0))
    assert len(batches) == len(ds) // 4
    b = batches[0]
    assert b["feats"].shape == (4, 8, 6, 64)
    assert b["word_ids"].dtype == np.int32
    # determinism: same epoch -> same order
    again = list(dl.epoch(0))
    np.testing.assert_array_equal(b["feats"], again[0]["feats"])
    # different epoch -> different order (with overwhelming probability)
    other = list(dl.epoch(1))
    assert not np.array_equal(b["feats"], other[0]["feats"])


def test_loader_steps_cycles(synth_root):
    ds = SegmentDataset(synth_root, "train", max_frames=8, num_regions=6,
                        feat_dim=64, max_words=3)
    dl = BatchLoader(ds, batch_size=4, shuffle=False)
    seen = [i for i, _ in dl.steps(7)]
    assert seen == list(range(7))


def test_grain_loader_matches_interface(synth_root):
    import pytest
    pytest.importorskip("grain")
    from nafae_tpu.data.grain_loader import GrainLoader
    ds = SegmentDataset(synth_root, "train", max_frames=8, num_regions=6,
                        feat_dim=64, max_words=3)
    dl = GrainLoader(ds, batch_size=4, shuffle=True, seed=0)
    batches = list(dl.epoch(0))
    assert len(batches) == len(ds) // 4
    assert batches[0]["feats"].shape == (4, 8, 6, 64)
    again = list(dl.epoch(0))
    np.testing.assert_array_equal(batches[0]["feats"], again[0]["feats"])
    steps = [i for i, _ in dl.steps(5)]
    assert steps == list(range(5))


def test_loader_propagates_worker_errors(synth_root):
    """A failing sample must raise in the consumer, not silently end the
    epoch (a swallowed error looks like a short epoch and hangs training)."""
    import pytest
    ds = SegmentDataset(synth_root, "train", max_frames=8, num_regions=6,
                        feat_dim=64, max_words=3)

    class Broken:
        frame_buckets = (8,)
        def __len__(self):
            return len(ds)
        def __getitem__(self, i):
            if i == 5:
                raise IOError("decode failed for segment 5")
            return ds[i]

    dl = BatchLoader(Broken(), batch_size=4, shuffle=False, use_native=False)
    with pytest.raises(IOError, match="segment 5"):
        for _ in dl.epoch(0):
            pass


def test_loader_mid_epoch_resume(synth_root):
    """steps(start_epoch, skip) continues the exact deterministic sequence —
    both loaders (SURVEY §6: checkpoint the dataloader position)."""
    import pytest
    ds = SegmentDataset(synth_root, "train", max_frames=8, num_regions=6,
                        feat_dim=64, max_words=3)
    loaders = [BatchLoader(ds, batch_size=4, shuffle=True, seed=3)]
    try:
        import grain  # noqa: F401
        from nafae_tpu.data.grain_loader import GrainLoader
        loaders.append(GrainLoader(ds, batch_size=4, shuffle=True, seed=3))
    except ImportError:
        pass
    for dl in loaders:
        eb = dl.batches_per_epoch()
        pos = eb - 5                      # resume 5 batches before epoch end
        full = [b["segment_id"].tolist() for _, b in dl.steps(eb + 3)]
        resumed = [b["segment_id"].tolist()
                   for _, b in dl.steps(len(full) - pos,
                                        start_epoch=pos // eb,
                                        skip=pos % eb)]
        assert resumed == full[pos:]


def test_grain_loader_frame_buckets(synth_root):
    """GrainLoader yields bucket-homogeneous batches, same order semantics as
    BatchLoader, no segment lost beyond per-bucket remainders."""
    import pytest
    pytest.importorskip("grain")
    from nafae_tpu.data.grain_loader import GrainLoader
    ds = SegmentDataset(synth_root, "train", max_frames=8, num_regions=6,
                        feat_dim=64, max_words=3, frame_buckets=(4, 8))
    dl = GrainLoader(ds, batch_size=2, shuffle=True, seed=1)
    seen = []
    for b in dl.epoch(0):
        assert b["feats"].shape[1] in (4, 8)
        seen.extend(b["segment_id"].tolist())
    assert len(seen) >= len(ds) - 2 * (2 - 1)
    assert len(set(seen)) == len(seen)
    # identical batch composition to the thread loader (shared index logic)
    tb = [sorted(b["segment_id"].tolist())
          for b in BatchLoader(ds, batch_size=2, shuffle=True, seed=1).epoch(0)]
    gb = [sorted(b["segment_id"].tolist()) for b in dl.epoch(0)]
    assert gb == tb


def test_grain_pipeline_trains(synth_root, tmp_path):
    import pytest
    pytest.importorskip("grain")
    from nafae_tpu.config import load_config
    from nafae_tpu.train import fit
    cfg = load_config(preset_name="config2", overrides=[
        "data.feat_dim=64", "model.feat_dim=64", "model.embed_dim=32",
        "data.batch_size=4", "data.max_frames=8", "data.num_regions=6",
        "data.max_words=3", "train.steps=3", "train.log_every=1000",
        "train.ckpt_every=100000", "train.eval_every=100000",
        "data.pipeline=grain",
        f"train.ckpt_dir={tmp_path}/gck", f"data.root={synth_root}"])
    state, _ = fit(cfg)
    assert int(state.step) == 3


def test_frame_buckets(synth_root):
    ds = SegmentDataset(synth_root, "train", max_frames=8, num_regions=6,
                        feat_dim=64, max_words=3, frame_buckets=(4, 8))
    shapes = {ds[i]["feats"].shape[0] for i in range(len(ds))}
    assert shapes <= {4, 8} and len(shapes) == 2
    # short segments land in the small bucket with full frames preserved
    for i in range(len(ds)):
        t = ds.index[i]["num_frames"]
        assert ds.bucket_of(i) >= min(t, 8)
        assert ds[i]["frame_mask"].sum() == min(t, ds.bucket_of(i))
    # loader batches are shape-homogeneous
    dl = BatchLoader(ds, batch_size=4, shuffle=True, seed=0)
    for b in dl.epoch(0):
        assert b["feats"].shape[1] in (4, 8)


def test_frame_buckets_no_straddling_and_full_epoch(synth_root):
    """Every batch is bucket-homogeneous and no segment is silently lost."""
    ds = SegmentDataset(synth_root, "train", max_frames=8, num_regions=6,
                        feat_dim=64, max_words=3, frame_buckets=(4, 8))
    dl = BatchLoader(ds, batch_size=2, shuffle=True, seed=1)
    seen = []
    for b in dl.epoch(0):
        ts = b["feats"].shape[1]
        assert ts in (4, 8)
        assert (b["frame_mask"].sum(1) <= ts).all()
        seen.extend(b["segment_id"].tolist())
    # with drop_remainder, at most (batch_size-1) lost PER BUCKET, no more
    assert len(seen) >= len(ds) - 2 * (2 - 1)
    assert len(set(seen)) == len(seen)
