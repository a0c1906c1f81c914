"""ctypes bindings for the native C++ IO runtime (native/nafae_native.cpp).

- NativePacker: batch packing in C++ worker threads over a flat binary
  segment cache (built once from the .npz files). Plugs into
  data/loader.py's `use_native` hook.
- decode_video(): OpenCV C++ frame sampling (SURVEY.md L135).

The .so is built lazily with `make -C native` on first use; every caller
falls back to the Python path when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libnafae_native.so")
_MAGIC = 0x4E414641
_lib = None


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_SO_PATH)
    lib.decode_video.restype = ctypes.c_int
    lib.decode_video.argtypes = [ctypes.c_char_p, ctypes.c_double,
                                 ctypes.c_int, ctypes.c_int,
                                 ctypes.POINTER(ctypes.c_float)]
    lib.decode_video_seg.restype = ctypes.c_int
    lib.decode_video_seg.argtypes = [ctypes.c_char_p, ctypes.c_double,
                                     ctypes.c_int, ctypes.c_int,
                                     ctypes.c_double, ctypes.c_double,
                                     ctypes.POINTER(ctypes.c_float)]
    lib.packer_create.restype = ctypes.c_void_p
    lib.packer_create.argtypes = [ctypes.c_char_p] + [ctypes.c_int] * 6
    try:
        lib.packer_create2.restype = ctypes.c_void_p
        lib.packer_create2.argtypes = [ctypes.c_char_p] + [ctypes.c_int] * 7
    except AttributeError:
        # stale pre-r3 .so: keep decode_video working; NativePacker raises
        # (and BatchLoader falls back to the Python packer with a warning)
        pass
    lib.packer_pack.restype = ctypes.c_int
    lib.packer_pack.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
                                ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.POINTER(ctypes.c_int32),
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.POINTER(ctypes.c_float)]
    lib.packer_num_segments.restype = ctypes.c_int
    lib.packer_num_segments.argtypes = [ctypes.c_void_p]
    lib.packer_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def decode_video(path: str, sample_fps: float, max_frames: int,
                 size: int, start: float = 0.0,
                 end: float = -1.0) -> np.ndarray:
    """Decode + sample frames natively -> [n, size, size, 3] float32 RGB.

    start/end (seconds) trim to one annotated segment of a longer video
    (end <= 0 reads to EOF) — YouCook2-style many-segments-per-video."""
    lib = load_library()
    out = np.zeros((max_frames, size, size, 3), np.float32)
    n = lib.decode_video_seg(path.encode(), float(sample_fps),
                             int(max_frames), int(size), float(start),
                             float(end),
                             out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if n < 0:
        raise IOError(f"decode failed: {path}")
    return out[:n]


def write_nbin(path: str, feats: np.ndarray, boxes: np.ndarray,
               word_ids: np.ndarray, gt_boxes: np.ndarray | None = None,
               gt_mask: np.ndarray | None = None,
               region_mask: np.ndarray | None = None) -> None:
    """Write one segment in the flat binary cache format (see .cpp header).

    Version 3 adds an optional per-region validity block after word_ids.
    """
    t, r, d = feats.shape
    k = len(word_ids)
    if (gt_boxes is None) != (gt_mask is None):
        raise ValueError("write_nbin: gt_boxes and gt_mask must be given "
                         "together (got exactly one)")
    with_gt = gt_boxes is not None
    # write to a temp file + atomic rename: a process killed mid-write must
    # not leave a truncated .nbin whose fresh mtime defeats the rebuild
    # check forever (the C++ loader rejects truncation with rc=2)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        hdr = np.asarray([_MAGIC, 3, t, r, d, k], np.int32)
        hdr.tofile(f)
        feats.astype(np.float32).tofile(f)
        boxes.astype(np.float32).tofile(f)
        word_ids.astype(np.int32).tofile(f)
        np.asarray([1 if region_mask is not None else 0], np.int32).tofile(f)
        if region_mask is not None:
            region_mask.astype(np.float32).tofile(f)
        np.asarray([1 if with_gt else 0], np.int32).tofile(f)
        if with_gt:
            gt_boxes.astype(np.float32).tofile(f)
            gt_mask.astype(np.float32).tofile(f)
    os.replace(tmp, path)


# transfer dtypes the C++ packer can emit (codes match FeatDtype in the .cpp;
# conversions there are bitwise-identical to numpy/ml_dtypes `astype`)
_FEAT_DTYPE_CODES = {"float32": 0, "float16": 1, "bfloat16": 2}


class NativePacker:
    """C++ threaded batch packer over the binary cache of `dataset`.

    Builds the .nbin cache next to the .npz files on first use (one-time),
    then serves `pack(idxs)` entirely from native code. The .nbin cache is
    always float32; `dataset.transfer_dtype` (f16/bf16 halve the host->device
    copy) is converted at pack time in the worker threads.
    """

    def __init__(self, dataset, num_threads: int = 2):
        if not hasattr(dataset, "dir"):
            raise TypeError(
                f"NativePacker packs feature-file datasets (needs "
                f"`dataset.dir` holding the .npz features); got "
                f"{type(dataset).__name__}. Video datasets use the native "
                f"decoder at decode time instead.")
        self.ds = dataset
        self._feat_dtype = np.dtype(getattr(dataset, "transfer_dtype",
                                            "float32"))
        self._feat_code = _FEAT_DTYPE_CODES.get(str(self._feat_dtype))
        if self._feat_code is None:
            raise ValueError(f"native packer cannot emit transfer_dtype="
                             f"{self._feat_dtype} (supported: "
                             f"{sorted(_FEAT_DTYPE_CODES)})")
        lib = load_library()
        if not hasattr(lib, "packer_create2"):
            raise RuntimeError(
                "libnafae_native.so predates packer_create2 — rebuild with "
                "`make -C native` (video decode still works; only the "
                "packer is unavailable)")
        cache_dir = os.path.join(dataset.dir, "nbin_cache")
        os.makedirs(cache_dir, exist_ok=True)
        manifest = os.path.join(cache_dir, "manifest.txt")
        paths = []
        for meta in dataset.index:
            src = os.path.join(dataset.dir, meta["file"])
            dst = os.path.join(cache_dir, meta["id"] + ".nbin")
            if not os.path.exists(dst) or (os.path.getmtime(dst)
                                           < os.path.getmtime(src)):
                with np.load(src) as z:
                    if dataset.with_gt and "gt_boxes" not in z:
                        # the Python loader raises KeyError here — serving
                        # all-zero gt_mask instead would silently drop the
                        # segment from the eval denominator (CLAUDE.md
                        # native==python bitwise invariant)
                        raise KeyError(
                            f"{src}: with_gt=True but no gt_boxes — run "
                            "merge_gt_into_features (or drop with_gt)")
                    raw = z["feats"]      # npz decompresses per access
                    f = raw.astype(np.float32)
                    if raw.dtype == np.int8 and "feats_scale" in z.files:
                        # int8 feature files (extract --quantize int8):
                        # the cache stores the DEQUANTIZED values — the
                        # same expression the Python loader uses, so the
                        # bitwise native==python invariant holds. (int8
                        # passthrough datasets — keep_int8 — skip the
                        # packer in BatchLoader instead.)
                        f = f * z["feats_scale"][..., None]
                    write_nbin(dst, f,
                               z["boxes"], z["word_ids"],
                               z["gt_boxes"] if "gt_boxes" in z else None,
                               z["gt_mask"] if "gt_mask" in z else None,
                               z["region_mask"] if "region_mask" in z
                               else None)
            paths.append(dst)
        with open(manifest, "w") as f:
            f.write("\n".join(paths) + "\n")
        self._lib = lib
        self._manifest = manifest
        self._num_threads = num_threads
        # one C++ handle (with its own worker pool) per frame bucket: the
        # packer pads to a fixed T, and epoch_batches guarantees each batch
        # is bucket-homogeneous, so per-bucket handles serve multi-bucket
        # datasets with the same [B, T, ...] shapes the Python loader emits.
        # A single configured bucket may be SMALLER than max_frames.
        buckets = tuple(getattr(dataset, "frame_buckets", ()) or ())
        self._buckets = buckets or (dataset.max_frames,)
        self._handles: dict[int, int] = {}
        # eager-create the largest bucket so construction fails fast when
        # packer_create cannot (BatchLoader falls back to Python on error)
        self._handle(self._buckets[-1])
        # the C++ Packer keeps per-call output pointers + a pending counter
        # on the shared handle: two concurrent pack() calls (e.g. an
        # abandoned epoch's prefetch worker overlapping a new epoch's) would
        # corrupt each other's buffers — serialize them
        self._pack_lock = threading.Lock()

    def _handle(self, t: int):
        h = self._handles.get(t)
        if h is None:
            ds = self.ds
            h = self._lib.packer_create2(
                self._manifest.encode(), t, ds.num_regions, ds.feat_dim,
                ds.max_words, 1 if ds.with_gt else 0, self._num_threads,
                self._feat_code)
            if not h:
                raise RuntimeError("packer_create failed")
            self._handles[t] = h
        return h

    def _batch_t(self, idxs) -> int:
        """Frame bucket of a (bucket-homogeneous) batch."""
        if len(self._buckets) == 1:
            return self._buckets[0]
        ts = {self.ds.bucket_of(int(i)) for i in idxs}
        if len(ts) != 1:
            raise ValueError(
                f"native pack() needs a bucket-homogeneous batch; got "
                f"buckets {sorted(ts)} (epoch_batches never mixes buckets)")
        return ts.pop()

    def pack(self, idxs) -> dict[str, np.ndarray]:
        with self._pack_lock:
            return self._pack_locked(idxs)

    def _pack_locked(self, idxs) -> dict[str, np.ndarray]:
        ds = self.ds
        n = len(idxs)
        t, r, d, k = self._batch_t(idxs), ds.num_regions, ds.feat_dim, \
            ds.max_words
        feats = np.empty((n, t, r, d), self._feat_dtype)
        boxes = np.empty((n, t, r, 4), np.float32)
        word_ids = np.empty((n, k), np.int32)
        frame_mask = np.empty((n, t), np.float32)
        word_mask = np.empty((n, k), np.float32)
        gt_boxes = np.empty((n, k, t, 4), np.float32) if ds.with_gt else None
        gt_mask = np.empty((n, k, t), np.float32) if ds.with_gt else None
        region_mask = np.empty((n, t, r), np.float32)
        idx_arr = np.ascontiguousarray(idxs, dtype=np.int32)
        fptr = ctypes.POINTER(ctypes.c_float)
        rc = self._lib.packer_pack(
            self._handle(t),
            idx_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n, ctypes.c_void_p(feats.ctypes.data),
            boxes.ctypes.data_as(fptr),
            word_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            frame_mask.ctypes.data_as(fptr), word_mask.ctypes.data_as(fptr),
            region_mask.ctypes.data_as(fptr),
            gt_boxes.ctypes.data_as(fptr) if gt_boxes is not None else None,
            gt_mask.ctypes.data_as(fptr) if gt_mask is not None else None)
        if rc != 0:
            raise IOError(f"packer_pack failed rc={rc}")
        batch = {"feats": feats, "boxes": boxes, "word_ids": word_ids,
                 "frame_mask": frame_mask, "word_mask": word_mask,
                 "region_mask": region_mask, "segment_id": idx_arr.copy()}
        if ds.with_gt:
            batch["gt_boxes"] = gt_boxes
            batch["gt_mask"] = gt_mask
        return batch

    def __del__(self):
        try:
            for h in getattr(self, "_handles", {}).values():
                self._lib.packer_destroy(h)
        except Exception:
            pass
