"""Native C++ IO runtime vs the Python path (bitwise equality) + video decode."""

import os

import numpy as np
import pytest

native_io = pytest.importorskip("nafae_tpu.utils.native_io")

try:
    native_io.load_library()
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native toolchain unavailable")


def test_native_packer_matches_python(synth_root):
    from nafae_tpu.data import SegmentDataset
    ds = SegmentDataset(synth_root, "val", max_frames=8, num_regions=6,
                        feat_dim=64, max_words=3, with_gt=True)
    packer = native_io.NativePacker(ds)
    idxs = [0, 3, 5, 1]
    nb = packer.pack(idxs)
    samples = [ds[i] for i in idxs]
    pb = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
    for key in ("feats", "boxes", "word_ids", "frame_mask", "word_mask",
                "region_mask", "gt_boxes", "gt_mask"):
        np.testing.assert_array_equal(nb[key], pb[key], err_msg=key)


def test_native_packer_single_submax_bucket(synth_root):
    """A single frame bucket SMALLER than max_frames: the native packer
    must emit the bucket's [B,T,...] exactly like the Python loader (r2
    review fix — it previously packed to max_frames, silently training on
    frames the Python path drops)."""
    from nafae_tpu.data import SegmentDataset
    ds = SegmentDataset(synth_root, "val", max_frames=8, num_regions=6,
                        feat_dim=64, max_words=3, with_gt=True,
                        frame_buckets=(5,))
    packer = native_io.NativePacker(ds)
    idxs = [0, 3, 5, 1]
    nb = packer.pack(idxs)
    samples = [ds[i] for i in idxs]
    pb = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
    assert nb["feats"].shape[1] == 5
    for key in ("feats", "boxes", "word_ids", "frame_mask", "word_mask",
                "region_mask", "gt_boxes", "gt_mask"):
        np.testing.assert_array_equal(nb[key], pb[key], err_msg=key)


def test_native_packer_rejects_damaged_cache(synth_root):
    """A .nbin truncated inside the GT block, or with a feat dim that
    disagrees with the dataset, must raise (r2 review fix: truncation at
    the GT flag used to read as 'no GT', silently shrinking the eval
    accuracy denominator; a D mismatch used to memcpy a truncated
    prefix)."""
    import pytest

    from nafae_tpu.data import SegmentDataset
    ds = SegmentDataset(synth_root, "val", max_frames=8, num_regions=6,
                        feat_dim=64, max_words=3, with_gt=True)
    packer = native_io.NativePacker(ds)
    packer.pack([0])                                    # cache built, sane
    cache = os.path.join(ds.dir, "nbin_cache")
    victim = os.path.join(cache, ds.index[0]["id"] + ".nbin")
    blob = open(victim, "rb").read()
    # truncate just after the region-mask block (inside/at the GT flag):
    # recompute the GT block size from the header and chop it + the flag
    t, r, d, k = np.frombuffer(blob[8:24], np.int32)
    gt_bytes = 4 + 4 * (k * t * 4 + k * t)
    open(victim, "wb").write(blob[:len(blob) - gt_bytes])
    os.utime(victim)                                    # keep it "fresh"
    with pytest.raises(IOError):
        packer.pack([0])
    # wrong feat dim in the header -> error, not silent truncation
    hdr = np.frombuffer(blob[:24], np.int32).copy()
    hdr[4] = d * 2
    open(victim, "wb").write(hdr.tobytes() + blob[24:])
    os.utime(victim)
    with pytest.raises(IOError):
        packer.pack([0])
    # restore: synth_root is session-scoped and later tests share this cache
    open(victim, "wb").write(blob)
    os.utime(victim)


def test_native_packer_ragged_region_mask_with_gt(tmp_path):
    """v3 .nbin layout: ragged region_mask AND GT blocks in one file — the
    packer's offset bookkeeping must match the Python loader bitwise."""
    import json
    from nafae_tpu.data import SegmentDataset
    root = tmp_path / "rm" / "val"
    root.mkdir(parents=True)
    rng = np.random.RandomState(0)
    idx_lines = []
    for n, t in enumerate((5, 3, 8)):                  # ragged frame counts
        r, d, k = 6, 16, 3
        np.savez(root / f"s{n}.npz",
                 feats=rng.randn(t, r, d).astype(np.float32),
                 boxes=rng.rand(t, r, 4).astype(np.float32),
                 word_ids=rng.randint(0, 67, (k,)).astype(np.int32),
                 region_mask=(rng.rand(t, r) > 0.4).astype(np.float32),
                 gt_boxes=rng.rand(k, t, 4).astype(np.float32),
                 gt_mask=(rng.rand(k, t) > 0.5).astype(np.float32))
        idx_lines.append({"id": f"s{n}", "file": f"s{n}.npz",
                          "num_frames": t, "num_words": k})
    with open(root / "index.jsonl", "w") as f:
        f.write("\n".join(json.dumps(l) for l in idx_lines) + "\n")
    ds = SegmentDataset(str(tmp_path / "rm"), "val", max_frames=8,
                        num_regions=6, feat_dim=16, max_words=3, with_gt=True)
    packer = native_io.NativePacker(ds)
    idxs = [2, 0, 1]
    nb = packer.pack(idxs)
    samples = [ds[i] for i in idxs]
    pb = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
    for key in ("feats", "boxes", "word_ids", "frame_mask", "word_mask",
                "region_mask", "gt_boxes", "gt_mask"):
        np.testing.assert_array_equal(nb[key], pb[key], err_msg=key)


def test_loader_native_backend(synth_root):
    from nafae_tpu.data import BatchLoader, SegmentDataset
    ds = SegmentDataset(synth_root, "train", max_frames=8, num_regions=6,
                        feat_dim=64, max_words=3)
    py = BatchLoader(ds, 4, shuffle=True, seed=3, use_native=False)
    nat = BatchLoader(ds, 4, shuffle=True, seed=3, use_native=True)
    assert nat._native is not None, "native backend did not engage"
    for (a, b) in zip(py.epoch(0), nat.epoch(0)):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_decode_video(tmp_path):
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (64, 48))
    assert w.isOpened()
    for i in range(30):  # 3 seconds at 10 fps
        frame = np.full((48, 64, 3), i * 8 % 255, np.uint8)
        w.write(frame)
    w.release()
    frames = native_io.decode_video(path, sample_fps=2.0, max_frames=10,
                                    size=32)
    # 3s at 2fps -> 6 frames
    assert frames.shape == (6, 32, 32, 3)
    assert 0.0 <= frames.min() and frames.max() <= 1.0
    # brightness must increase over time (frames sampled in order)
    means = frames.mean(axis=(1, 2, 3))
    assert (np.diff(means) > 0).all()


def test_loader_native_backend_bucketed(synth_root):
    """Multi-bucket datasets pack natively too (r3: one C++ handle per
    frame bucket) — every batch bitwise-equal to the Python loader, and
    batch shapes follow each batch's bucket T."""
    from nafae_tpu.data import BatchLoader, SegmentDataset
    ds = SegmentDataset(synth_root, "train", max_frames=8, num_regions=6,
                        feat_dim=64, max_words=3, frame_buckets=(4, 8))
    py = BatchLoader(ds, 4, shuffle=True, seed=3, use_native=False)
    nat = BatchLoader(ds, 4, shuffle=True, seed=3, use_native=True)
    assert nat._native is not None, "native backend did not engage"
    seen_t = set()
    for (a, b) in zip(py.epoch(0), nat.epoch(0)):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        seen_t.add(a["feats"].shape[1])
    assert seen_t == {4, 8}, seen_t

    # a hand-mixed batch (never produced by epoch_batches) must error, not
    # silently pack to the wrong T
    small = next(i for i in range(len(ds)) if ds.bucket_of(i) == 4)
    big = next(i for i in range(len(ds)) if ds.bucket_of(i) == 8)
    with pytest.raises(ValueError, match="homogeneous"):
        nat._native.pack([small, big])


@pytest.mark.parametrize("dtype", ["float16", "bfloat16"])
def test_native_packer_transfer_dtype(synth_root, dtype):
    """f16/bf16 transfer dtypes pack natively (r3: C++ RNE converters) —
    feats bitwise-equal to the Python loader's `astype`, other keys f32."""
    from nafae_tpu.data import SegmentDataset
    ds = SegmentDataset(synth_root, "val", max_frames=8, num_regions=6,
                        feat_dim=64, max_words=3, with_gt=True,
                        transfer_dtype=dtype)
    packer = native_io.NativePacker(ds)
    idxs = [0, 3, 5, 1]
    nb = packer.pack(idxs)
    samples = [ds[i] for i in idxs]
    pb = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
    assert nb["feats"].dtype == np.dtype(dtype)
    np.testing.assert_array_equal(nb["feats"].view(np.uint16),
                                  pb["feats"].view(np.uint16))
    for key in ("boxes", "word_ids", "frame_mask", "word_mask",
                "region_mask", "gt_boxes", "gt_mask"):
        np.testing.assert_array_equal(nb[key], pb[key], err_msg=key)


@pytest.mark.parametrize("dtype", ["float16", "bfloat16"])
def test_native_packer_dtype_special_values(tmp_path, dtype):
    """Conversion edge cases: inf, every NaN encoding numpy/ml_dtypes treat
    specially (sNaN payload truncation vs fixed qNaN), subnormal boundary,
    RNE ties, overflow-to-inf — all bitwise vs the numpy reference."""
    import json
    import warnings
    from nafae_tpu.data import SegmentDataset
    root = tmp_path / "sv" / "val"
    root.mkdir(parents=True)
    bits = np.asarray([
        0x7f800000, 0xff800000,              # +-inf
        0x7fc00000, 0x7f800001, 0x7f801fff,  # qNaN, sNaN payload edges
        0xffb46feb, 0x7fc00001,              # signed/quiet payload mixes
        0x33800000, 0x33800001, 0x38000000,  # f16 subnormal/underflow edges
        0x477ff000, 0x477ff001, 0xc77ff000,  # f16 overflow-to-inf ties
        0x3f800001, 0x3f807fff, 0x3f808000,  # RNE tie patterns
        0x00000001, 0x80000001, 0x00000000, 0x80000000,  # f32 subnormals, +-0
    ], np.uint32)
    rng = np.random.RandomState(7)
    pad = rng.randint(0, 2**32, 4 * 6 * 16 - bits.size, np.uint64)
    feats = np.concatenate([bits, pad.astype(np.uint32)]) \
        .view(np.float32).reshape(4, 6, 16)
    np.savez(root / "s0.npz", feats=feats,
             boxes=np.zeros((4, 6, 4), np.float32),
             word_ids=np.zeros((2,), np.int32))
    with open(root / "index.jsonl", "w") as f:
        f.write(json.dumps({"id": "s0", "file": "s0.npz",
                            "num_frames": 4, "num_words": 2}) + "\n")
    ds = SegmentDataset(str(tmp_path / "sv"), "val", max_frames=4,
                        num_regions=6, feat_dim=16, max_words=2,
                        transfer_dtype=dtype)
    nb = native_io.NativePacker(ds).pack([0])["feats"][0]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # overflow/invalid casts on purpose
        ref = feats.astype(np.dtype(dtype))
    np.testing.assert_array_equal(nb.view(np.uint16), ref.view(np.uint16))


def test_loader_native_backend_bf16(synth_root):
    """transfer_dtype=bfloat16 keeps the native path engaged (r3; it used
    to silently fall back to Python), batches bitwise-equal."""
    from nafae_tpu.data import BatchLoader, SegmentDataset
    ds = SegmentDataset(synth_root, "train", max_frames=8, num_regions=6,
                        feat_dim=64, max_words=3, transfer_dtype="bfloat16")
    py = BatchLoader(ds, 4, shuffle=True, seed=3, use_native=False)
    nat = BatchLoader(ds, 4, shuffle=True, seed=3, use_native=True)
    assert nat._native is not None, "native backend did not engage"
    for (a, b) in zip(py.epoch(0), nat.epoch(0)):
        assert b["feats"].dtype == np.dtype("bfloat16")
        for k in a:
            np.testing.assert_array_equal(
                a[k].view(np.uint16) if a[k].dtype.itemsize == 2 else a[k],
                b[k].view(np.uint16) if b[k].dtype.itemsize == 2 else b[k],
                err_msg=k)


def test_video_dataset_skips_packer_without_warning():
    """Frame datasets (no `.dir` of .npz features) skip the native packer
    BY DESIGN — silently, not via an AttributeError-driven fallback
    warning — and NativePacker itself rejects them with a clear error."""
    import warnings

    from nafae_tpu.data import BatchLoader

    class FramesOnly:           # VideoSegmentDataset-shaped: no .dir
        frame_buckets = ()

        def __len__(self):
            return 4

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning fails the test
        dl = BatchLoader(FramesOnly(), batch_size=2, shuffle=False,
                         use_native=True)
    assert dl._native is None

    import pytest as _pytest
    with _pytest.raises(TypeError, match="feature-file datasets"):
        native_io.NativePacker(FramesOnly())
