"""Serving path: batch inference, AOT export round-trip, HTTP endpoint.

The serving forward routes through ops/grounding.ground_forward (already
torch-oracle-tested); these tests pin the serving-specific surfaces: argmax
box selection, ragged-batch padding, jax.export serialization, and the
stdlib HTTP front end."""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from nafae_tpu.config import Config
from nafae_tpu.models.grounding import init_params
from nafae_tpu.serve import (GroundingServer, export_grounding,
                             load_exported, make_ground_fn)


def _tiny_cfg(**model_over):
    cfg = Config()
    cfg.data.feat_dim = 16
    cfg.data.max_frames = 4
    cfg.data.num_regions = 3
    cfg.data.max_words = 2
    cfg.data.batch_size = 2
    cfg.model.feat_dim = 16
    cfg.model.embed_dim = 8
    for k, v in model_over.items():
        setattr(cfg.model, k, v)
    return cfg


def _segments(cfg, n, seed=0):
    rng = np.random.default_rng(seed)
    dc = cfg.data
    segs = []
    for i in range(n):
        t = int(rng.integers(2, dc.max_frames + 1))
        segs.append({
            "feats": rng.normal(size=(t, dc.num_regions,
                                      dc.feat_dim)).astype(np.float32),
            "boxes": rng.uniform(0, 100, size=(t, dc.num_regions,
                                               4)).astype(np.float32),
            "word_ids": [int(rng.integers(0, cfg.model.vocab_size))
                         for _ in range(int(rng.integers(1,
                                                         dc.max_words + 1)))],
        })
    return segs


def test_ground_segments_argmax_box():
    """The served box is the argmax-similarity region's box (the eval
    protocol's region choice, SURVEY.md §1 evaluation)."""
    cfg = _tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg.model)
    srv = GroundingServer(cfg, params)
    segs = _segments(cfg, 3)           # 3 segments, batch 2 -> ragged batch
    res = srv.ground_segments(segs)
    assert len(res) == 3

    fn = jax.jit(make_ground_fn(cfg))
    for seg, r in zip(segs, res):
        t = np.asarray(seg["feats"]).shape[0]
        k = len(seg["word_ids"])
        assert len(r["frame_weights"]) == t
        assert len(r["words"]) == k
        for ki, w in enumerate(r["words"]):
            assert w["word_id"] == seg["word_ids"][ki]
            assert len(w["frames"]) == t
            for fr in w["frames"]:
                # box must be one of this frame's candidate boxes
                cand = np.asarray(seg["boxes"])[fr["frame"]]
                assert any(np.allclose(fr["box"], c) for c in cand)
                assert fr["region"] == int(np.argmax([
                    np.allclose(fr["box"], c) for c in cand]))


def test_ground_fn_matches_manual_argmax():
    cfg = _tiny_cfg()
    params = init_params(jax.random.PRNGKey(1), cfg.model)
    dc = cfg.data
    rng = np.random.default_rng(3)
    b, t, r, d, k = 2, dc.max_frames, dc.num_regions, dc.feat_dim, dc.max_words
    feats = rng.normal(size=(b, t, r, d)).astype(np.float32)
    boxes = rng.uniform(size=(b, t, r, 4)).astype(np.float32)
    word_ids = rng.integers(0, cfg.model.vocab_size,
                            size=(b, k)).astype(np.int32)
    ones = np.ones
    out = jax.jit(make_ground_fn(cfg))(
        params, feats, boxes, word_ids, ones((b, t), np.float32),
        ones((b, k), np.float32), ones((b, t, r), np.float32))
    from nafae_tpu.ops import grounding as G
    w = G.embed_words(word_ids, params["word_emb"])
    v = G.project_regions(feats, params["w_v"], params["b_v"])
    s = np.asarray(G.similarity_tensor(w, v))
    np.testing.assert_array_equal(np.asarray(out["region"]),
                                  s.argmax(-1))
    np.testing.assert_allclose(np.asarray(out["score"]), s.max(-1),
                               rtol=1e-6)


@pytest.mark.parametrize("model_over", [
    {},
    {"frame_pool": "learned", "similarity": "bilinear"},
])
def test_export_roundtrip(tmp_path, model_over):
    """jax.export artifact reproduces the jitted program's outputs."""
    cfg = _tiny_cfg(**model_over)
    params = init_params(jax.random.PRNGKey(2), cfg.model)
    out_dir = export_grounding(cfg, params, str(tmp_path / "art"))
    call, manifest = load_exported(out_dir)
    assert manifest["batch_size"] == cfg.data.batch_size
    assert manifest["model"]["frame_pool"] == cfg.model.frame_pool

    dc = cfg.data
    rng = np.random.default_rng(5)
    b, t, r = dc.batch_size, dc.max_frames, dc.num_regions
    args = (rng.normal(size=(b, t, r, dc.feat_dim)).astype(np.float32),
            rng.uniform(size=(b, t, r, 4)).astype(np.float32),
            rng.integers(0, cfg.model.vocab_size,
                         size=(b, dc.max_words)).astype(np.int32),
            np.ones((b, t), np.float32),
            np.ones((b, dc.max_words), np.float32),
            np.ones((b, t, r), np.float32))
    got = call(*args)
    want = jax.jit(make_ground_fn(cfg))(params, *args)
    for key in want:
        np.testing.assert_allclose(np.asarray(got[key]),
                                   np.asarray(want[key]),
                                   rtol=1e-6, atol=1e-6, err_msg=key)


def test_export_shape_check(tmp_path):
    cfg = _tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg.model)
    call, _ = load_exported(export_grounding(cfg, params,
                                             str(tmp_path / "a")))
    dc = cfg.data
    bad = np.zeros((dc.batch_size, dc.max_frames + 1, dc.num_regions,
                    dc.feat_dim), np.float32)
    with pytest.raises(ValueError):
        call(bad,
             np.zeros((dc.batch_size, dc.max_frames, dc.num_regions, 4),
                      np.float32),
             np.zeros((dc.batch_size, dc.max_words), np.int32),
             np.ones((dc.batch_size, dc.max_frames), np.float32),
             np.ones((dc.batch_size, dc.max_words), np.float32),
             np.ones((dc.batch_size, dc.max_frames, dc.num_regions),
                     np.float32))


def test_http_endpoint():
    """POST /ground returns the same grounding the in-process API gives;
    /healthz reports the backend; malformed requests get 400."""
    cfg = _tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg.model)
    srv = GroundingServer(cfg, params)
    segs = _segments(cfg, 2, seed=7)
    want = srv.ground_segments(segs)

    httpd_box = {}
    ready = threading.Event()

    def run():
        srv.serve_http("127.0.0.1", 0,
                       ready_cb=lambda h: (httpd_box.update(h=h),
                                           ready.set()))

    th = threading.Thread(target=run, daemon=True)
    th.start()
    assert ready.wait(30)
    port = httpd_box["h"].server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["backend"] == "cpu"

        body = json.dumps({"segments": [
            {"feats": np.asarray(s["feats"]).tolist(),
             "boxes": np.asarray(s["boxes"]).tolist(),
             "word_ids": s["word_ids"]} for s in segs]}).encode()
        req = urllib.request.Request(base + "/ground", data=body,
                                     headers={"Content-Type":
                                              "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            got = json.loads(r.read())["results"]
        assert got == json.loads(json.dumps(want))   # same JSON payload

        bad = urllib.request.Request(base + "/ground", data=b"{}",
                                     headers={"Content-Type":
                                              "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
    finally:
        httpd_box["h"].shutdown()
        th.join(timeout=10)


def _start_http(srv, **kw):
    httpd_box = {}
    ready = threading.Event()

    def run():
        srv.serve_http("127.0.0.1", 0,
                       ready_cb=lambda h: (httpd_box.update(h=h),
                                           ready.set()), **kw)

    th = threading.Thread(target=run, daemon=True)
    th.start()
    assert ready.wait(30)
    port = httpd_box["h"].server_address[1]
    return httpd_box["h"], th, f"http://127.0.0.1:{port}"


def _post(base, payload: dict, timeout=60):
    body = json.dumps(payload).encode()
    req = urllib.request.Request(base + "/ground", data=body,
                                 headers={"Content-Type":
                                          "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def test_http_concurrent_clients():
    """N parallel POSTs through the dispatcher: every client gets exactly
    its own segments' grounding (no interleaving corruption), byte-equal
    to the in-process API."""
    cfg = _tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg.model)
    srv = GroundingServer(cfg, params)
    n_clients = 6
    all_segs = [_segments(cfg, 1 + (i % 2), seed=100 + i)
                for i in range(n_clients)]
    # expected values computed BEFORE the server starts (one device owner)
    want = [json.loads(json.dumps(srv.ground_segments(s)))
            for s in all_segs]

    httpd, th, base = _start_http(srv)
    got = [None] * n_clients
    errs = []

    def client(i):
        try:
            payload = {"segments": [
                {"feats": np.asarray(s["feats"]).tolist(),
                 "boxes": np.asarray(s["boxes"]).tolist(),
                 "word_ids": s["word_ids"]} for s in all_segs[i]]}
            got[i] = _post(base, payload)["results"]
        except Exception as e:            # pragma: no cover
            errs.append((i, e))

    try:
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(n_clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errs, errs
        for i in range(n_clients):
            assert got[i] == want[i], f"client {i} got wrong results"
    finally:
        httpd.shutdown()
        th.join(timeout=10)


def test_http_request_limits():
    """Oversized bodies 413, too many segments 400, over-length segment
    400 (rejected, never silently truncated), slow inference 503."""
    import urllib.error

    cfg = _tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg.model)
    srv = GroundingServer(cfg, params)
    httpd, th, base = _start_http(srv, max_request_bytes=10_000,
                                  max_segments=2, request_timeout=1.0)
    dc = cfg.data

    def post_raises(payload, code, match=None):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base, payload, timeout=30)
        assert ei.value.code == code
        if match:
            assert match in json.loads(ei.value.read())["error"]

    try:
        seg_ok = {"feats": np.zeros((2, dc.num_regions,
                                     dc.feat_dim)).tolist(),
                  "word_ids": [0]}
        # baseline: a request inside every limit succeeds
        assert len(_post(base, {"segments": [seg_ok]})["results"]) == 1
        # body over max_request_bytes -> 413
        big = {"segments": [seg_ok], "pad": "x" * 20_000}
        post_raises(big, 413)
        # more than max_segments -> 400
        post_raises({"segments": [seg_ok] * 3, }, 400, "max_segments")
        # over-length segment -> 400 naming the limit, not truncation
        too_long = {"feats": np.zeros((dc.max_frames + 1, dc.num_regions,
                                       dc.feat_dim)).tolist(),
                    "word_ids": [0]}
        post_raises({"segments": [too_long]}, 400, "max_frames")
        too_wordy = {"feats": np.zeros((2, dc.num_regions,
                                        dc.feat_dim)).tolist(),
                     "word_ids": [0] * (dc.max_words + 1)}
        post_raises({"segments": [too_wordy]}, 400, "max_words")
        # inference slower than request_timeout -> 503
        orig = srv._ground_samples

        def slow(samples):
            import time
            time.sleep(2.0)
            return orig(samples)

        srv._ground_samples = slow
        try:
            post_raises({"segments": [seg_ok]}, 503)
        finally:
            srv._ground_samples = orig
    finally:
        httpd.shutdown()
        th.join(timeout=10)


def test_over_length_segment_rejected_in_process():
    """The library API rejects over-length segments too (ADVICE r3: the
    old path silently clamped to the bucket)."""
    cfg = _tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg.model)
    srv = GroundingServer(cfg, params)
    dc = cfg.data
    with pytest.raises(ValueError, match="max_frames"):
        srv.ground_segments([{
            "feats": np.zeros((dc.max_frames + 1, dc.num_regions,
                               dc.feat_dim), np.float32),
            "word_ids": [0]}])
    with pytest.raises(ValueError, match="num_regions"):
        srv.ground_segments([{
            "feats": np.zeros((2, dc.num_regions + 2, dc.feat_dim),
                              np.float32),
            "word_ids": [0]}])


def test_words_and_sentence_requests():
    cfg = _tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg.model)
    srv = GroundingServer(cfg, params)
    name0, name1 = srv.vocab.classes[0], srv.vocab.classes[1]
    dc = cfg.data
    feats = np.zeros((2, dc.num_regions, dc.feat_dim), np.float32)
    res = srv.ground_segments([
        {"feats": feats, "words": [name0, name1]},
        {"feats": feats, "sentence": f"add the {name1} now"},
    ])
    assert [w["word"] for w in res[0]["words"]] == [name0, name1]
    assert [w["word_id"] for w in res[1]["words"]] == [1]
    with pytest.raises(ValueError, match="unknown object words"):
        srv.ground_segments([{"feats": feats, "words": ["zzz-nonsense"]}])
    with pytest.raises(ValueError, match="no known object words"):
        srv.ground_segments([{"feats": feats,
                              "sentence": "nothing matches here"}])


def test_quantized_export_roundtrip(tmp_path):
    """int8 artifact: ~4x smaller params file, dequantized weights within
    per-row quantization error, and a planted strong signal still grounds
    to the right region."""
    import os

    from nafae_tpu.serve import dequantize_params, quantize_params

    cfg = _tiny_cfg()
    params = init_params(jax.random.PRNGKey(4), cfg.model)

    stored = quantize_params({k: np.asarray(v) for k, v in params.items()})
    deq = dequantize_params(stored)
    for k, v in params.items():
        w = np.asarray(v)
        if w.ndim >= 2:
            step = np.max(np.abs(w), axis=-1, keepdims=True) / 127.0
            assert np.all(np.abs(deq[k] - w) <= step / 2 + 1e-9), k
        else:
            np.testing.assert_array_equal(deq[k], w)

    d32 = export_grounding(cfg, params, str(tmp_path / "f32"))
    d8 = export_grounding(cfg, params, str(tmp_path / "i8"),
                          quantize="int8")
    sz32 = os.path.getsize(os.path.join(d32, "params.npz"))
    sz8 = os.path.getsize(os.path.join(d8, "params.npz"))
    assert sz8 < sz32, (sz8, sz32)
    call8, man = load_exported(d8)
    assert man["quantize"] == "int8"

    # raw-bytes ratio at production-like matrix sizes: ~4x smaller
    big = {"w_v": np.random.default_rng(0).normal(
        size=(2048, 256)).astype(np.float32)}
    q = quantize_params(big)
    assert (sum(v.nbytes for v in q.values())
            < 0.30 * big["w_v"].nbytes)

    # planted signal: region j of frame t carries class (t + j) % V's
    # direction; the argmax for word c must land on the region with c's
    # direction in every frame, f32 and int8 alike
    dc = cfg.data
    rng = np.random.default_rng(9)
    dirs = rng.normal(size=(cfg.model.vocab_size,
                            dc.feat_dim)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    b, t, r = dc.batch_size, dc.max_frames, dc.num_regions
    feats = np.zeros((b, t, r, dc.feat_dim), np.float32)
    word_ids = np.zeros((b, dc.max_words), np.int32)
    for bi in range(b):
        for ti in range(t):
            for ri in range(r):
                feats[bi, ti, ri] = dirs[(ti + ri) % cfg.model.vocab_size]
        word_ids[bi] = [bi % r, (bi + 1) % r]   # class ids < r appear
    # project dirs through w_v (b_v=0): word c's embedding EQUALS the
    # projected region vector of class c, so cosine peaks at exactly 1 on
    # the matching region — a margin far above int8 quantization error
    params2 = dict(params)
    params2["word_emb"] = dirs @ np.asarray(params["w_v"])
    params2["b_v"] = np.zeros_like(np.asarray(params["b_v"]))
    args = (feats, np.zeros((b, t, r, 4), np.float32), word_ids,
            np.ones((b, t), np.float32),
            np.ones((b, dc.max_words), np.float32),
            np.ones((b, t, r), np.float32))
    want = jax.jit(make_ground_fn(cfg))(params2, *args)
    d8b = export_grounding(cfg, params2, str(tmp_path / "i8b"),
                           quantize="int8")
    call8b, _ = load_exported(d8b)
    got = call8b(*args)
    np.testing.assert_array_equal(np.asarray(got["region"]),
                                  np.asarray(want["region"]))
    # and the planted argmax is the analytically right one
    expect = (word_ids[..., None] - np.arange(t)[None, None]) \
        % cfg.model.vocab_size
    valid = expect < r
    np.testing.assert_array_equal(
        np.asarray(want["region"])[valid.nonzero()[0],
                                   valid.nonzero()[1],
                                   valid.nonzero()[2]],
        expect[valid])


def test_int8_compute_server_and_export(tmp_path):
    """model.quantize=int8 — quantized COMPUTE (VERDICT r4 #3; distinct
    from the storage-only artifact quantization above): the projection
    runs as an int8×int8→int32 dot. Pins (a) the compiled serving program
    contains int8 operands, (b) served boxes/scores track the f32 server
    closely, (c) the AOT export bakes the int8 program in and round-trips
    to the live quantized path's outputs."""
    import os

    from nafae_tpu.ops import grounding as G

    cfg32 = _tiny_cfg()
    cfg8 = _tiny_cfg(quantize="int8")
    params = init_params(jax.random.PRNGKey(4), cfg32.model)
    srv32 = GroundingServer(cfg32, dict(params))
    srv8 = GroundingServer(cfg8, dict(params))
    assert "w_v.q8" in srv8.params and "w_v" not in srv8.params

    segs = _segments(cfg32, 4, seed=7)
    out32 = srv32.ground_segments([dict(s) for s in segs])
    out8 = srv8.ground_segments([dict(s) for s in segs])
    n_frames = n_same = 0
    for r32, r8 in zip(out32, out8):
        for w32, w8 in zip(r32["words"], r8["words"]):
            for f32_, f8 in zip(w32["frames"], w8["frames"]):
                n_frames += 1
                n_same += f32_["region"] == f8["region"]
                assert abs(f32_["score"] - f8["score"]) < 0.05
    assert n_same >= 0.9 * n_frames, (n_same, n_frames)

    # the quantized program really computes in int8
    hlo = jax.jit(make_ground_fn(cfg8)).lower(
        srv8.params,
        jax.ShapeDtypeStruct((2, 4, 3, 16), np.float32),
        jax.ShapeDtypeStruct((2, 4, 3, 4), np.float32),
        jax.ShapeDtypeStruct((2, 2), np.int32),
        jax.ShapeDtypeStruct((2, 4), np.float32),
        jax.ShapeDtypeStruct((2, 2), np.float32),
        jax.ShapeDtypeStruct((2, 4, 3), np.float32)).compile().as_text()
    assert "s8" in hlo

    # AOT export with int8 compute baked in: artifact params carry the
    # int8 weights; the program output equals the live quantized path
    d8 = export_grounding(cfg8, dict(params), str(tmp_path / "i8c"))
    call, man = load_exported(d8)
    assert man["model"]["compute_quantize"] == "int8"
    import numpy as _np
    with _np.load(os.path.join(d8, "params.npz")) as z:
        assert z["w_v.q8"].dtype == _np.int8
    rng = np.random.default_rng(3)
    dc = cfg8.data
    feats = rng.normal(size=(dc.batch_size, dc.max_frames, dc.num_regions,
                             dc.feat_dim)).astype(np.float32)
    boxes = rng.uniform(0, 50, size=(dc.batch_size, dc.max_frames,
                                     dc.num_regions, 4)).astype(np.float32)
    wid = rng.integers(0, cfg8.model.vocab_size,
                       (dc.batch_size, dc.max_words)).astype(np.int32)
    fm = np.ones((dc.batch_size, dc.max_frames), np.float32)
    wm = np.ones((dc.batch_size, dc.max_words), np.float32)
    rm = np.ones((dc.batch_size, dc.max_frames, dc.num_regions), np.float32)
    live = jax.jit(make_ground_fn(cfg8))(srv8.params, feats, boxes, wid,
                                         fm, wm, rm)
    art = call(feats, boxes, wid, fm, wm, rm)
    for k in live:
        np.testing.assert_allclose(np.asarray(art[k]), np.asarray(live[k]),
                                   atol=1e-6, err_msg=k)


def test_int8pre_server_and_export(tmp_path):
    """model.quantize=int8pre — the DEPLOYABLE int8 form (docs/PERF.md "r5
    inference work": dynamic int8 measured slower than bf16; int8pre,
    features quantized once offline, measured +30%). Pins (a) f32 requests
    quantize once at ingest and serve close to the f32 server, (b) the
    pre-quantized wire format (extract --quantize int8: feats int8 +
    feats_scale) is accepted by BOTH server modes — passthrough on the
    int8pre server (bitwise-equal responses to ingest-quantized floats),
    dequantize-at-ingest on the f32 server (bitwise-equal to sending the
    dequantized floats), (c) the int8pre AOT export bakes the int8-feats
    calling convention in and round-trips to the live path."""
    import os

    from nafae_tpu.extract import quantize_feats_np

    cfg32 = _tiny_cfg()
    cfgp = _tiny_cfg(quantize="int8pre")
    params = init_params(jax.random.PRNGKey(4), cfg32.model)
    srv32 = GroundingServer(cfg32, dict(params))
    srvp = GroundingServer(cfgp, dict(params))
    assert srvp.int8pre and "w_v.q8" in srvp.params

    segs = _segments(cfg32, 4, seed=7)
    out32 = srv32.ground_segments([dict(s) for s in segs])
    outp = srvp.ground_segments([dict(s) for s in segs])
    n_frames = n_same = 0
    for r32, rp in zip(out32, outp):
        for w32, wp in zip(r32["words"], rp["words"]):
            for f32_, fp in zip(w32["frames"], wp["frames"]):
                n_frames += 1
                n_same += f32_["region"] == fp["region"]
                assert abs(f32_["score"] - fp["score"]) < 0.05
    assert n_same >= 0.9 * n_frames, (n_same, n_frames)

    # (b) the pre-quantized wire format
    qsegs, dsegs = [], []
    for s in segs:
        q, sf = quantize_feats_np(s["feats"])
        rest = {k: v for k, v in s.items() if k != "feats"}
        qsegs.append({**rest, "feats": q, "feats_scale": sf})
        dsegs.append({**rest,
                      "feats": q.astype(np.float32) * sf[..., None]})
    # int8pre server: passthrough == ingest-quantization of the same
    # floats (the ingest quantizer IS quantize_feats_np)
    outp_q = srvp.ground_segments([dict(s) for s in qsegs])
    assert json.dumps(outp_q, sort_keys=True) \
        == json.dumps(outp, sort_keys=True)
    # f32 server: dequantized at ingest == sending the floats yourself
    out32_q = srv32.ground_segments([dict(s) for s in qsegs])
    out32_d = srv32.ground_segments([dict(s) for s in dsegs])
    assert json.dumps(out32_q, sort_keys=True) \
        == json.dumps(out32_d, sort_keys=True)

    # (c) int8pre AOT export: int8 feats + scales are the artifact's
    # calling convention
    dp = export_grounding(cfgp, dict(params), str(tmp_path / "i8p"))
    call, man = load_exported(dp)
    assert man["model"]["compute_quantize"] == "int8pre"
    with np.load(os.path.join(dp, "params.npz")) as z:
        assert z["w_v.q8"].dtype == np.int8
    rng = np.random.default_rng(3)
    dc = cfgp.data
    feats = rng.normal(size=(dc.batch_size, dc.max_frames, dc.num_regions,
                             dc.feat_dim)).astype(np.float32)
    qf, sfb = quantize_feats_np(feats)    # shape-agnostic: scales [B,T,R]
    boxes = rng.uniform(0, 50, size=(dc.batch_size, dc.max_frames,
                                     dc.num_regions, 4)).astype(np.float32)
    wid = rng.integers(0, cfgp.model.vocab_size,
                       (dc.batch_size, dc.max_words)).astype(np.int32)
    fm = np.ones((dc.batch_size, dc.max_frames), np.float32)
    wm = np.ones((dc.batch_size, dc.max_words), np.float32)
    rm = np.ones((dc.batch_size, dc.max_frames, dc.num_regions), np.float32)
    live = jax.jit(make_ground_fn(cfgp))(srvp.params, qf, boxes, wid,
                                         fm, wm, rm, feats_scale=sfb)
    art = call(qf, boxes, wid, fm, wm, rm, feats_scale=sfb)
    for k in live:
        np.testing.assert_allclose(np.asarray(art[k]), np.asarray(live[k]),
                                   atol=1e-6, err_msg=k)
