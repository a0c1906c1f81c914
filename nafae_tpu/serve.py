"""Serving: batch grounding inference, AOT export, HTTP endpoint.

The reference is research code with no deployment story (train/test CLIs
only — SURVEY.md §1 "shell scripts + argparse as the UX"); this module is
the production counterpart the north star asks for: the same jitted
grounding forward that eval uses (ops/grounding.ground_forward), packaged
three ways:

1. ``GroundingServer`` — an in-process batch-inference engine: pad ragged
   segments to the compiled [B,T,R,D] bucket, run ONE jitted program per
   batch, return per-(word, frame) best boxes + scores + frame-attention
   weights as JSON-able dicts.
2. ``export_grounding`` / ``load_exported`` — AOT export via
   ``jax.export``: the compiled inference program is serialized to
   portable StableHLO bytes + a params .npz + a shape manifest, so a
   deployment host can run inference without the model-building Python
   (and a newer jax can refuse/accept it along official compatibility
   guarantees). ``load_exported`` round-trips it.
3. ``python -m nafae_tpu.serve`` / ``nafae-serve`` — a stdlib HTTP
   endpoint (POST /ground, GET /healthz) over 1+2. Concurrency model:
   handler threads (ThreadingHTTPServer) parse/validate requests and
   block on a future; ONE dispatcher thread owns the device queue (the
   TPU chip is exclusive, CLAUDE.md) and coalesces segments across
   in-flight requests into compiled-size batches — cross-request
   micro-batching, so N concurrent small requests cost ~ceil(total/B)
   device programs instead of N. Requests are bounded (body bytes,
   segments per request, wall timeout) so one client cannot wedge the
   endpoint.

No new math lives here — everything routes through ops/grounding so the
torch-oracle parity tests cover the serving path's numerics too.
"""

from __future__ import annotations

import concurrent.futures
import functools
import json
import os

# On Python 3.11+ concurrent.futures.TimeoutError IS the builtin
# TimeoutError; on 3.10 (pyproject allows >=3.10) they are distinct classes
# and `except TimeoutError` would MISS a Future.result timeout — the request
# would 500 instead of 503 and fut.cancel() would never run (ADVICE r4 #1).
_TIMEOUT_ERRORS = (TimeoutError, concurrent.futures.TimeoutError)

import jax
import jax.numpy as jnp
import numpy as np

from nafae_tpu.config import Config
from nafae_tpu.ops import grounding as G

MANIFEST = "manifest.json"
STABLEHLO = "grounding.stablehlo"
PARAMS_NPZ = "params.npz"


# ---------------------------------------------------------------- inference


def make_ground_fn(cfg: Config):
    """Build the serving forward: (params, batch arrays) -> grounding dict.

    Returns a pure function (not yet jitted) computing, per (video, word,
    frame): the argmax region index, its box, its similarity score, plus
    the frame-attention weights beta [B,T]. Static model/loss choices
    (pool form, similarity form, ctx window, dtype) are baked in from cfg
    so the traced program matches what eval/train compiled.
    """
    mc, lc = cfg.model, cfg.loss
    cdt = jnp.bfloat16 if mc.dtype == "bfloat16" else jnp.float32
    ctx_w = lc.ctx_window if mc.frame_pool == "context" else 0

    def fn(params, feats, boxes, word_ids, frame_mask, word_mask,
           region_mask, feats_scale=None):
        # feats_scale: per-region scales when feats arrive PRE-quantized
        # int8 (the offline serving path — ops/grounding.quantize_feats_int8;
        # 4x less HBM/transfer than f32 features). Optional trailing arg so
        # the exported f32 artifact signature is unchanged.
        out = G.ground_forward(
            params, feats, word_ids, frame_mask, word_mask,
            temp=mc.frame_attn_temp, pool=mc.frame_pool,
            ctx_window=ctx_w, ctx_temp=lc.ctx_temp,
            compute_dtype=cdt, region_mask=region_mask,
            feats_scale=feats_scale)
        s = out["s"].astype(jnp.float32)            # [B,K,T,R]
        best = jnp.argmax(s, axis=-1)                # [B,K,T]
        # one-hot einsum box selection (exact: 0/1 weights under HIGHEST) —
        # the R-gather becomes a tiny MXU contraction instead of a
        # serialized TPU gather; same form as ops/iou.grounding_hits.
        # Sanitize first: the contraction multiplies every slot by 0/1, so
        # a non-finite padded slot would poison the result via 0·inf=NaN
        # (identity on finite boxes — ADVICE r4 #4).
        boxes = jnp.nan_to_num(boxes, posinf=0.0, neginf=0.0)
        onehot = jax.nn.one_hot(best, s.shape[-1], dtype=boxes.dtype)
        best_box = jnp.einsum("bktr,btrc->bktc", onehot, boxes,
                              precision=G.PRECISION)
        return {
            "region": best.astype(jnp.int32),                 # [B,K,T]
            "score": jnp.max(s, axis=-1),                     # [B,K,T]
            "box": best_box.astype(jnp.float32),              # [B,K,T,4]
            "beta": out["beta"].astype(jnp.float32),          # [B,T]
            "video_score": out["score"].astype(jnp.float32),  # [B]
        }

    return fn


# ------------------------------------------------------------- AOT export

# weight-only int8: per-row symmetric scales. Matrices (word_emb [V,E],
# w_v [D,E], m_sim [E,E]) quantize; tiny vectors (b_v, attn_w) stay f32.
_QUANT_MIN_NDIM = 2


def quantize_params(params: dict) -> dict:
    """f32 params -> {k+".q" int8, k+".scale" f32} (vectors pass through).

    Per-row symmetric: scale = max|row| / 127, q = round(w / scale). The
    artifact shrinks ~4x; dequantization happens once at load, so the
    exported StableHLO program itself is unchanged (and shape-checked)."""
    out = {}
    for k, v in params.items():
        arr = np.asarray(v)
        if (arr.ndim < _QUANT_MIN_NDIM
                or not np.issubdtype(arr.dtype, np.floating)
                or k.endswith((".q8", ".scale8"))):
            # pass through small vectors, already-integer tensors, and the
            # COMPUTE-quantized projection pair (model.quantize=int8 —
            # program params, not storage artifacts)
            out[k] = arr
            continue
        w = arr.astype(np.float32)
        scale = np.max(np.abs(w), axis=-1, keepdims=True) / 127.0
        scale = np.maximum(scale, 1e-12)
        out[k + ".q"] = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
        out[k + ".scale"] = scale.astype(np.float32)
    return out


def dequantize_params(stored: dict) -> dict:
    out = {}
    for k, v in stored.items():
        if k.endswith(".scale"):
            continue
        if k.endswith(".q"):
            base = k[:-2]
            out[base] = (np.asarray(v, np.float32)
                         * stored[base + ".scale"]).astype(np.float32)
        else:
            out[k] = np.asarray(v)
    return out


def _params_npz_dict(params: dict) -> dict:
    return {k: np.asarray(v) for k, v in params.items()}


def export_grounding(cfg: Config, params: dict, out_dir: str,
                     batch_size: int | None = None,
                     quantize: str | None = None) -> str:
    """AOT-export the serving program to `out_dir` (StableHLO + params).

    The artifact is self-contained for a deployment host: the serialized
    jax.export blob (shape-checked at call time), the weights as .npz, and
    a manifest recording the compiled shapes + the config choices baked
    into the trace. quantize="int8" stores weight matrices as per-row
    symmetric int8 (~4x smaller artifact; dequantized at load, program
    unchanged). Returns out_dir.
    """
    if quantize not in (None, "int8"):
        raise ValueError(f"quantize must be None or 'int8', got {quantize!r}")
    from jax import export as jex

    if cfg.model.quantize in ("int8", "int8pre") and "w_v.q8" not in params:
        # int8 COMPUTE baked into the exported program: the trace sees the
        # "w_v.q8"/"w_v.scale8" params, so the StableHLO artifact itself
        # runs the int8 projection dot (distinct from the storage-only
        # `quantize` arg below, which compresses float matrices in the
        # .npz and dequantizes at load). int8pre additionally bakes the
        # int8 feats + feats_scale CALLING CONVENTION into the artifact —
        # a deployment host feeds pre-quantized features straight through.
        params = G.quantize_params_int8(params)
    b = batch_size or cfg.data.batch_size
    t, r = cfg.data.max_frames, cfg.data.num_regions
    d, k = cfg.data.feat_dim, cfg.data.max_words
    f32, i32 = jnp.float32, jnp.int32
    aval = jax.ShapeDtypeStruct
    p_avals = {key: aval(np.asarray(v).shape, np.asarray(v).dtype)
               for key, v in params.items()}
    int8pre = cfg.model.quantize == "int8pre"
    arg_avals = (p_avals,
                 aval((b, t, r, d), jnp.int8 if int8pre else f32),
                 aval((b, t, r, 4), f32),
                 aval((b, k), i32), aval((b, t), f32), aval((b, k), f32),
                 aval((b, t, r), f32)) \
        + ((aval((b, t, r), f32),) if int8pre else ())
    exported = jex.export(jax.jit(make_ground_fn(cfg)))(*arg_avals)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, STABLEHLO), "wb") as f:
        f.write(bytes(exported.serialize()))
    stored = (quantize_params(params) if quantize == "int8"
              else _params_npz_dict(params))
    np.savez(os.path.join(out_dir, PARAMS_NPZ), **stored)
    manifest = {
        "quantize": quantize,
        "batch_size": b, "max_frames": t, "num_regions": r,
        "feat_dim": d, "max_words": k,
        "model": {"frame_pool": cfg.model.frame_pool,
                  "similarity": cfg.model.similarity,
                  "compute_quantize": cfg.model.quantize,
                  "dtype": cfg.model.dtype,
                  "vocab_size": cfg.model.vocab_size,
                  "embed_dim": cfg.model.embed_dim},
        "loss": {"ctx_window": cfg.loss.ctx_window,
                 "ctx_temp": cfg.loss.ctx_temp},
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return out_dir


def load_exported(out_dir: str):
    """Load an export_grounding artifact -> (call(feats, boxes, word_ids,
    frame_mask, word_mask, region_mask) -> dict, manifest dict).

    The params saved alongside are bound as the first argument; the
    deserialized program shape-checks the remaining args against the
    compiled avals.
    """
    from jax import export as jex

    with open(os.path.join(out_dir, STABLEHLO), "rb") as f:
        exported = jex.deserialize(bytearray(f.read()))
    with np.load(os.path.join(out_dir, PARAMS_NPZ)) as z:
        stored = {k: z[k] for k in z.files}
    with open(os.path.join(out_dir, MANIFEST)) as f:
        manifest = json.load(f)
    params = {k: jnp.asarray(v)
              for k, v in dequantize_params(stored).items()}

    def call(feats, boxes, word_ids, frame_mask, word_mask, region_mask,
             feats_scale=None):
        args = (params, feats, boxes, word_ids, frame_mask,
                word_mask, region_mask)
        if feats_scale is not None:      # int8pre artifact calling convention
            args += (feats_scale,)
        return exported.call(*args)

    # expose the raw pieces for callers that need params as an explicit
    # argument (bench.make_artifact_serve_program's LICM guard perturbs
    # the projection weight per step, which requires calling
    # exported.call(params, ...) directly)
    call.exported = exported
    call.params = params
    call.manifest = manifest
    return call, manifest


# ----------------------------------------------------------------- server


class GroundingServer:
    """Batch grounding inference over ragged request segments.

    Pads each segment to the config's fixed [T,R,D] bucket (the same
    pad_sample the training loader uses), groups them into compiled-size
    batches (final ragged batch zero-padded — padded rows are dropped from
    the response), and runs the jitted serving program once per batch.
    """

    def __init__(self, cfg: Config, params: dict,
                 batch_size: int | None = None):
        from nafae_tpu.data.vocab import vocab_from_config

        self.cfg = cfg
        if cfg.model.quantize in ("int8", "int8pre") \
                and "w_v.q8" not in params:
            # int8 COMPUTE (model.quantize=int8|int8pre): quantize once at
            # init; ground_forward dispatches on the "w_v.q8" key (and on
            # int8 batch feats for the int8pre form)
            params = G.quantize_params_int8(params)
        # int8pre: every batch the device sees carries int8 feats + scales
        # (¼ the feature bytes + the int8 MXU dot — the measured +30% serve
        # win, docs/PERF.md "r5 inference work"). Requests may arrive
        # pre-quantized (feats int8 + feats_scale, the extract --quantize
        # int8 wire format) or f32 (quantized once at ingest, on host).
        self.int8pre = cfg.model.quantize == "int8pre"
        self.params = params
        self.batch_size = batch_size or cfg.data.batch_size
        self.vocab = vocab_from_config(cfg.data)
        self._fn = jax.jit(make_ground_fn(cfg))

    # -- request handling

    def _pad_segment(self, seg: dict) -> dict:
        from nafae_tpu.data.youcook2 import pad_sample

        dc = self.cfg.data
        fscale = None
        if "feats_scale" in seg:
            # pre-quantized request (extract --quantize int8 wire format)
            feats = np.asarray(seg["feats"], np.int8)
            sf = np.asarray(seg["feats_scale"], np.float32)
            if sf.shape != feats.shape[:2]:
                raise ValueError(
                    f"feats_scale must be [T,R]={feats.shape[:2]}, "
                    f"got {sf.shape}")
            if self.int8pre:
                fscale = sf
            else:   # f32 server: dequantize at ingest
                feats = feats.astype(np.float32) * sf[..., None]
        else:
            feats = np.asarray(seg["feats"], np.float32)
            if self.int8pre and feats.ndim == 3:
                from nafae_tpu.extract import quantize_feats_np
                feats, fscale = quantize_feats_np(feats)
        if feats.ndim != 3 or feats.shape[-1] != dc.feat_dim:
            raise ValueError(
                f"feats must be [T,R,{dc.feat_dim}], got {feats.shape}")
        # Over-length segments are REJECTED, not silently truncated
        # (pad_sample clamps — a clamp here would ground only a prefix of
        # the request with no indication anything was dropped).
        if feats.shape[0] > dc.max_frames:
            raise ValueError(
                f"segment has {feats.shape[0]} frames > max_frames="
                f"{dc.max_frames}; split it or serve a larger bucket")
        if feats.shape[1] > dc.num_regions:
            raise ValueError(
                f"segment has {feats.shape[1]} regions > num_regions="
                f"{dc.num_regions}")
        boxes = np.asarray(seg.get("boxes",
                                   np.zeros(feats.shape[:2] + (4,))),
                           np.float32)
        if "word_ids" in seg:
            word_ids = np.asarray(seg["word_ids"], np.int32)
        elif "words" in seg:
            ids = [self.vocab.lookup(w) for w in seg["words"]]
            unknown = [w for w, i in zip(seg["words"], ids) if i is None]
            if unknown:
                raise ValueError(f"unknown object words: {unknown}")
            word_ids = np.asarray(ids, np.int32)
        elif "sentence" in seg:
            word_ids = np.asarray(
                self.vocab.extract(seg["sentence"]), np.int32)
        else:
            raise ValueError(
                "segment needs one of: word_ids | words | sentence")
        if word_ids.size == 0:
            raise ValueError("segment has no known object words")
        if word_ids.size > dc.max_words:
            raise ValueError(
                f"segment has {word_ids.size} object words > max_words="
                f"{dc.max_words}")
        rm = seg.get("region_mask")
        if rm is not None:
            rm = np.asarray(rm, np.float32)
        return pad_sample(feats, boxes, word_ids, dc.max_frames,
                          dc.num_regions, dc.max_words, region_mask=rm,
                          feats_scale=fscale)

    def ground_segments(self, segments: list[dict]) -> list[dict]:
        """segments: [{feats [T,R,D], boxes [T,R,4]?, words|word_ids|
        sentence, region_mask?}] -> per-segment grounding dicts."""
        return self._ground_samples([self._pad_segment(s)
                                     for s in segments])

    def _ground_samples(self, samples: list[dict]) -> list[dict]:
        """Run already-padded samples through the compiled program in
        batch_size chunks (the dispatcher's entry point — exactly one
        thread may call the device at a time)."""
        results: list[dict] = []
        bs = self.batch_size
        for lo in range(0, len(samples), bs):
            chunk = samples[lo:lo + bs]
            batch = {key: np.stack([s[key] for s in chunk])
                     for key in chunk[0]}
            n = len(chunk)
            if n < bs:   # keep ONE compiled shape (retrace costs minutes
                         # through the remote-compile service, CLAUDE.md)
                batch = {key: np.concatenate(
                    [v, np.zeros((bs - n,) + v.shape[1:], v.dtype)])
                    for key, v in batch.items()}
            out = jax.device_get(self._fn(
                self.params, batch["feats"], batch["boxes"],
                batch["word_ids"], batch["frame_mask"], batch["word_mask"],
                batch["region_mask"],
                feats_scale=batch.get("feats_scale")))
            for i in range(n):
                results.append(self._to_response(
                    {key: v[i] for key, v in out.items()},
                    samples[lo + i]))
        return results

    def _to_response(self, out: dict, sample: dict) -> dict:
        k_valid = sample["word_mask"] > 0
        t_valid = sample["frame_mask"] > 0
        words = []
        for ki in np.nonzero(k_valid)[0]:
            wid = int(sample["word_ids"][ki])
            frames = [{
                "frame": int(ti),
                "region": int(out["region"][ki, ti]),
                "box": [float(x) for x in out["box"][ki, ti]],
                "score": float(out["score"][ki, ti]),
            } for ti in np.nonzero(t_valid)[0]]
            words.append({"word_id": wid,
                          "word": self.vocab.classes[wid]
                          if 0 <= wid < len(self.vocab.classes) else "?",
                          "frames": frames})
        return {"words": words,
                "frame_weights": [float(b) for b, m in
                                  zip(out["beta"], sample["frame_mask"])
                                  if m > 0],
                "video_score": float(out["video_score"])}

    # -- HTTP front end: ThreadingHTTPServer handlers parse + validate,
    #    then hand padded samples to ONE dispatcher thread that owns the
    #    device queue (the chip is exclusive) and micro-batches across
    #    concurrent requests.

    def serve_http(self, host: str = "127.0.0.1", port: int = 8000,
                   ready_cb=None, max_request_bytes: int = 64 << 20,
                   max_segments: int = 64, request_timeout: float = 120.0):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        server_ref = self
        dispatcher = _BatchDispatcher(self)

        class Handler(BaseHTTPRequestHandler):
            timeout = 60                          # socket read timeout

            def log_message(self, fmt, *args):   # quiet by default
                pass

            def _send(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, {"ok": True,
                                     "backend": jax.default_backend(),
                                     "batch_size": server_ref.batch_size,
                                     "queue_depth": dispatcher.depth()})
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/ground":
                    self._send(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                except (TypeError, ValueError):
                    self._send(400, {"error": "bad Content-Length"})
                    return
                if n <= 0:
                    self._send(411, {"error": "Content-Length required"})
                    return
                if n > max_request_bytes:
                    self._send(413, {
                        "error": f"request body {n} bytes > limit "
                                 f"{max_request_bytes}"})
                    return
                try:
                    req = json.loads(self.rfile.read(n))
                    segs = req["segments"]
                    if not isinstance(segs, list) or not segs:
                        raise ValueError("segments must be a non-empty list")
                    if len(segs) > max_segments:
                        raise ValueError(
                            f"{len(segs)} segments > max_segments="
                            f"{max_segments} per request")
                    # validate/pad in the handler thread so a bad segment
                    # 400s THIS request without failing coalesced peers
                    samples = [server_ref._pad_segment(s) for s in segs]
                except (KeyError, ValueError, TypeError) as e:
                    self._send(400, {"error": str(e)})
                    return
                try:
                    out = dispatcher.submit(samples, segs,
                                            timeout=request_timeout)
                except _TIMEOUT_ERRORS:
                    self._send(503, {"error": "inference timed out"})
                    return
                except Exception as e:           # device-side failure
                    self._send(500, {"error": str(e)})
                    return
                self._send(200, {"results": out})

        class _Server(ThreadingHTTPServer):
            daemon_threads = True

        httpd = _Server((host, port), Handler)
        if ready_cb is not None:
            ready_cb(httpd)
        try:
            httpd.serve_forever()
        finally:
            httpd.server_close()
            dispatcher.close()


class _BatchDispatcher:
    """Single device-owner thread + request queue with cross-request
    micro-batching.

    ``submit`` enqueues one request's padded samples and blocks on a
    future; the dispatcher thread drains everything currently queued,
    concatenates the samples, runs them through
    ``GroundingServer._ground_samples`` (which chunks to the compiled
    batch size), and scatters per-request result slices back to each
    future. Coalescing means N concurrent 1-segment requests execute as
    ~ceil(N / batch_size) device programs rather than N.
    """

    def __init__(self, server: "GroundingServer"):
        import queue
        import threading

        self._server = server
        self._q: "queue.Queue" = queue.Queue()
        self._closed = False
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="nafae-serve-dispatcher")
        self._thread.start()

    def depth(self) -> int:
        return self._q.qsize()

    def submit(self, samples: list[dict], segs: list[dict],
               timeout: float | None = None) -> list[dict]:
        from concurrent.futures import Future

        if self._closed:
            raise RuntimeError("dispatcher closed")
        fut: Future = Future()
        self._q.put((samples, segs, fut))
        try:
            return fut.result(timeout=timeout)
        except _TIMEOUT_ERRORS:
            fut.cancel()          # un-started work is dropped, not run
            raise

    def close(self):
        self._closed = True
        self._q.put(None)
        self._thread.join(timeout=10)

    def _run(self):
        import queue

        while True:
            item = self._q.get()
            if item is None:
                return
            items = [item]
            # coalesce whatever else is already queued (up to a few
            # compiled batches' worth — keep per-iteration latency bounded)
            cap = 4 * self._server.batch_size
            while sum(len(s) for s, _, _ in items) < cap:
                try:
                    nxt = self._q.get_nowait()
                except queue.Empty:
                    break
                if nxt is None:
                    self._q.put(None)     # re-post the close sentinel
                    break
                items.append(nxt)
            items = [(s, g, f) for s, g, f in items
                     if f.set_running_or_notify_cancel()]
            if not items:
                continue
            flat = [s for ss, _, _ in items for s in ss]
            try:
                results = self._server._ground_samples(flat)
            except Exception as e:
                for _, _, fut in items:
                    fut.set_exception(e)
                continue
            lo = 0
            for ss, _, fut in items:
                fut.set_result(results[lo:lo + len(ss)])
                lo += len(ss)


# -------------------------------------------------------------------- CLI


def _load_params(cfg: Config, checkpoint: str | None):
    from nafae_tpu.utils.checkpoint import load_eval_params

    params = load_eval_params(cfg, checkpoint)
    if params is None:
        raise FileNotFoundError(
            f"no checkpoint in {checkpoint or cfg.train.ckpt_dir!r} — "
            "refusing to serve randomly initialized parameters")
    return params


def main(argv=None):
    import argparse

    from nafae_tpu.config import load_config

    p = argparse.ArgumentParser("nafae_tpu.serve")
    p.add_argument("--preset", default="config1")
    p.add_argument("--config", default=None)
    p.add_argument("--override", nargs="*", action="extend", default=None)
    p.add_argument("--checkpoint", default=None,
                   help="orbax ckpt dir or converted .npz (required)")
    p.add_argument("--export", default=None, metavar="DIR",
                   help="write an AOT artifact (StableHLO + params + "
                        "manifest) instead of serving")
    p.add_argument("--quantize", default=None, choices=["int8"],
                   help="with --export: store weight matrices as per-row "
                        "symmetric int8 (~4x smaller artifact)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--max-request-mb", type=int, default=64,
                   help="reject request bodies larger than this (413)")
    p.add_argument("--max-segments", type=int, default=64,
                   help="reject requests with more segments (400)")
    p.add_argument("--request-timeout", type=float, default=120.0,
                   help="seconds before an in-flight request 503s")
    args = p.parse_args(argv)
    from nafae_tpu.utils import cli_startup
    cli_startup()
    cfg = load_config(args.config, args.preset, args.override or [])
    params = _load_params(cfg, args.checkpoint)
    if args.export:
        out = export_grounding(cfg, params, args.export,
                               batch_size=args.batch_size,
                               quantize=args.quantize)
        print(json.dumps({"exported": out, "quantize": args.quantize}))
        return
    srv = GroundingServer(cfg, params, batch_size=args.batch_size)

    def ready(httpd):
        print(json.dumps({"serving": f"http://{args.host}:{httpd.server_address[1]}",
                          "backend": jax.default_backend()}), flush=True)

    srv.serve_http(args.host, args.port, ready_cb=ready,
                   max_request_bytes=args.max_request_mb << 20,
                   max_segments=args.max_segments,
                   request_timeout=args.request_timeout)


if __name__ == "__main__":
    main()
