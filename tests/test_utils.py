"""Utils tests: torch converter roundtrip, metrics logger, throughput tracker."""

import os

import numpy as np


def test_torch_convert_roundtrip(tmp_path):
    import torch

    from nafae_tpu.utils.torch_convert import convert_pth, load_converted

    # emulate a reference-style checkpoint
    sd = {
        "emb.weight": torch.randn(67, 32),
        "vis_proj.weight": torch.randn(32, 64),   # [E, D] torch Linear layout
        "vis_proj.bias": torch.randn(32),
    }
    pth = str(tmp_path / "ref.pth")
    torch.save({"state_dict": sd, "epoch": 7}, pth)
    out = str(tmp_path / "conv.npz")
    params = convert_pth(pth, out)
    assert params["word_emb"].shape == (67, 32)
    assert params["w_v"].shape == (64, 32)        # transposed to [D, E]
    assert params["b_v"].shape == (32,)
    np.testing.assert_allclose(params["w_v"],
                               sd["vis_proj.weight"].numpy().T)
    loaded = load_converted(out)
    np.testing.assert_allclose(np.asarray(loaded["word_emb"]),
                               sd["emb.weight"].numpy())


def test_converted_params_run_in_model(tmp_path):
    import torch

    import jax.numpy as jnp

    from nafae_tpu.ops.grounding import ground_forward
    from nafae_tpu.utils.torch_convert import convert_pth

    sd = {"word_emb": torch.randn(67, 16), "w_v": torch.randn(24, 16),
          "b_v": torch.zeros(16)}
    pth = str(tmp_path / "m.pth")
    torch.save(sd, pth)
    params = {k: jnp.asarray(v) for k, v in convert_pth(pth).items()}
    rng = np.random.RandomState(0)
    out = ground_forward(params, jnp.asarray(rng.randn(2, 3, 4, 24)
                                             .astype(np.float32)),
                         jnp.asarray(rng.randint(0, 67, (2, 2))),
                         jnp.ones((2, 3)), jnp.ones((2, 2)))
    assert np.isfinite(np.asarray(out["score"])).all()


def test_metrics_logger(tmp_path):
    from nafae_tpu.utils.metrics_log import MetricsLogger
    lg = MetricsLogger(str(tmp_path))
    lg.log({"step": 1, "loss": 0.5})
    lg.log({"step": 2, "loss": 0.4})
    rows = lg.read()
    assert [r["step"] for r in rows] == [1, 2]
    assert all("ts" in r for r in rows)


def test_metrics_logger_tensorboard(tmp_path):
    """Optional TB sink writes event files; non-numeric fields stay JSONL-only."""
    from nafae_tpu.utils.metrics_log import MetricsLogger
    tb = str(tmp_path / "tb")
    lg = MetricsLogger(str(tmp_path), tensorboard_dir=tb)
    lg.log({"step": 1, "loss": 0.5, "note": "not-a-number"})
    assert lg.read()[0]["note"] == "not-a-number"
    events = [f for f in os.listdir(tb) if "tfevents" in f]
    assert events, "no TensorBoard event file written"
    assert os.path.getsize(os.path.join(tb, events[0])) > 0


def test_throughput_tracker():
    from nafae_tpu.utils.profiling import ThroughputTracker
    tr = ThroughputTracker(frames_per_batch=10, window=2)
    assert tr.step() is None
    assert tr.step() is None
    fps = tr.step()
    assert fps is not None and fps > 0
    s = tr.summary()
    assert s["windows"] == 1 and s["frames_per_sec"] > 0


def test_load_word_vectors_text_and_npz(tmp_path):
    import numpy as np

    from nafae_tpu.data.vocab import Vocab
    from nafae_tpu.models.grounding import load_word_vectors

    v = Vocab()
    txt = tmp_path / "glove.txt"
    txt.write_text("pan 1.0 0.0 0.0 0.0\noil 0.0 1.0 0.0 0.0\nunknownword 9 9 9 9\n")
    vecs, hits = load_word_vectors(str(txt), v, 4)
    assert hits == 2
    np.testing.assert_allclose(vecs[v.word_to_id["pan"]], [1, 0, 0, 0])
    np.testing.assert_allclose(vecs[v.word_to_id["oil"]], [0, 1, 0, 0])
    npz = tmp_path / "vecs.npz"
    np.savez(npz, pan=np.asarray([2., 0, 0, 0], np.float32))
    vecs2, hits2 = load_word_vectors(str(npz), v, 4)
    assert hits2 == 1 and vecs2[v.word_to_id["pan"]][0] == 2.0


def test_load_word_vectors_multiword_mean(tmp_path):
    """Multi-word classes get the mean of their constituent GloVe vectors
    (tables are per-token); partial coverage falls back to random init."""
    import numpy as np

    from nafae_tpu.data.vocab import Vocab
    from nafae_tpu.models.grounding import load_word_vectors

    v = Vocab(["bell pepper", "cutting_board", "pan"])
    txt = tmp_path / "glove.txt"
    txt.write_text("bell 1.0 0.0 0.0 0.0\npepper 0.0 1.0 0.0 0.0\n"
                   "cutting 4 4 4 4\npan 0 0 0 2\n")
    vecs, hits = load_word_vectors(str(txt), v, 4)
    assert hits == 2                       # "board" missing -> no hit
    np.testing.assert_allclose(vecs[0], [0.5, 0.5, 0, 0])
    np.testing.assert_allclose(vecs[2], [0, 0, 0, 2])


def make_resnet50_sd(rng, blocks=None):
    """Synthetic torchvision-style resnet state_dict (random weights);
    shared by the converter tests (torchvision itself isn't installed).
    blocks: conv2..conv4 bottleneck counts — default resnet50 (3,4,6);
    pass (3,4,23) for resnet101."""
    from nafae_tpu.utils.torch_convert import RESNET50_BLOCKS
    if blocks is None:
        blocks = RESNET50_BLOCKS

    sd = {"conv1.weight": (rng.randn(64, 3, 7, 7) * 0.05).astype(np.float32)}
    for s, n in (("bn1", 64),):
        sd[f"{s}.weight"] = rng.rand(n).astype(np.float32)
        sd[f"{s}.bias"] = rng.rand(n).astype(np.float32)
        sd[f"{s}.running_mean"] = rng.rand(n).astype(np.float32)
        sd[f"{s}.running_var"] = 1 + rng.rand(n).astype(np.float32)

    def add_block(prefix, cin, mid, downsample):
        for i, (ci, co, k) in enumerate([(cin, mid, 1), (mid, mid, 3),
                                         (mid, mid * 4, 1)], start=1):
            sd[f"{prefix}.conv{i}.weight"] = (rng.randn(co, ci, k, k)
                                              * 0.05).astype(np.float32)
            for key, val in (("weight", rng.rand(co)), ("bias", rng.rand(co)),
                             ("running_mean", rng.rand(co)),
                             ("running_var", 1 + rng.rand(co))):
                sd[f"{prefix}.bn{i}.{key}"] = val.astype(np.float32)
        if downsample:
            sd[f"{prefix}.downsample.0.weight"] = (rng.randn(
                mid * 4, cin, 1, 1) * 0.05).astype(np.float32)
            for key, val in (("weight", rng.rand(mid * 4)),
                             ("bias", rng.rand(mid * 4)),
                             ("running_mean", rng.rand(mid * 4)),
                             ("running_var", 1 + rng.rand(mid * 4))):
                sd[f"{prefix}.downsample.1.{key}"] = val.astype(np.float32)

    cin = 64
    for stage, nb in enumerate(blocks, start=1):
        mid = 64 * 2 ** (stage - 1)
        for b in range(nb):
            add_block(f"layer{stage}.{b}", cin if b == 0 else mid * 4, mid,
                      downsample=(b == 0))
        cin = mid * 4
    for b in range(3):
        add_block(f"layer4.{b}", 1024 if b == 0 else 2048, 512,
                  downsample=(b == 0))
    return sd


def test_convert_detector_resnet50(tmp_path):
    """Synthetic torchvision-style resnet50 state_dict maps onto the detector
    params with correct shapes/values."""
    import jax
    import numpy as np

    from nafae_tpu.config import DetectorConfig
    from nafae_tpu.models.detector.faster_rcnn import init_detector
    from nafae_tpu.utils.torch_convert import convert_detector_resnet50

    cfg = DetectorConfig(image_size=64, num_proposals=4, rpn_pre_nms_topk=16,
                         anchor_scales=(16, 32))
    model, params = init_detector(jax.random.PRNGKey(0), cfg)

    rng = np.random.RandomState(0)
    sd = make_resnet50_sd(rng)

    converted = convert_detector_resnet50(sd, params)
    bb = converted["params"]["backbone"]
    np.testing.assert_allclose(
        np.asarray(bb["Conv_0"]["kernel"]),
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(np.asarray(bb["FrozenBN_0"]["mean"]),
                               sd["bn1.running_mean"])
    np.testing.assert_allclose(
        np.asarray(bb["Bottleneck_3"]["Conv_1"]["kernel"]),
        np.transpose(sd["layer2.0.conv2.weight"], (2, 3, 1, 0)))
    # converted params still run end-to-end
    import jax.numpy as jnp
    out = jax.jit(model.apply)(converted, jnp.zeros((1, 64, 64, 3)))
    assert np.isfinite(np.asarray(out["feats"])).all()


def test_platform_override_env(monkeypatch):
    """NAFAE_PLATFORM applies via jax.config (the axon plugin ignores the
    plain JAX_PLATFORMS env var, so the CLIs need this knob); a literal
    JAX_PLATFORMS=axon in the shell env (the host default!) is sanitized —
    the plugin registers as 'tpu', so the raw value breaks jax init. The
    sanitize step is gated on the CONFIG still holding the boot snapshot:
    an earlier in-process override (tests/conftest.py forcing cpu) must NOT
    be undone, or a CPU test run hangs on TPU init (r3 fix)."""
    import jax

    from nafae_tpu.utils import apply_platform_override

    calls = []
    monkeypatch.setattr(jax.config, "update",
                        lambda k, v: calls.append((k, v)))
    monkeypatch.delenv("NAFAE_PLATFORM", raising=False)
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    apply_platform_override()
    assert calls == []                      # unset -> no touch
    import nafae_tpu.utils as U
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setattr(U, "_configured_platforms",
                        lambda: "axon")     # the boot snapshot of the env
    apply_platform_override()
    assert calls == [("jax_platforms", None)]   # sanitized
    assert os.environ["JAX_PLATFORMS"] == ""
    calls.clear()
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setattr(U, "_configured_platforms",
                        lambda: "cpu")      # conftest-style explicit cpu
    apply_platform_override()
    assert calls == []                      # respected, not reset to auto
    assert os.environ["JAX_PLATFORMS"] == ""
    monkeypatch.setenv("NAFAE_PLATFORM", "cpu")
    apply_platform_override()
    assert calls == [("jax_platforms", "cpu")]


def test_profile_step_trace_parser(tmp_path):
    """scripts/profile_step.parse_trace: device-plane XLA ops only, the
    steps_per_call `while` wrapper dropped, durations summed by op name."""
    import gzip
    import importlib.util
    import json
    import sys

    spec = importlib.util.spec_from_file_location(
        "profile_step", os.path.join(os.path.dirname(__file__), "..",
                                     "scripts", "profile_step.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["profile_step"] = mod
    spec.loader.exec_module(mod)

    run = tmp_path / "plugins" / "profile" / "r1"
    run.mkdir(parents=True)
    trace = {"traceEvents": [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 7, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 9, "tid": 1, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        # counted: device pid, ops tid
        {"ph": "X", "pid": 3, "tid": 7, "name": "fusion.1", "dur": 10.0,
         "args": {"long_name": "%fusion.1 = f32[2]{0} fusion(...)"}},
        {"ph": "X", "pid": 3, "tid": 7, "name": "fusion.1", "dur": 5.0},
        {"ph": "X", "pid": 3, "tid": 7, "name": "copy.2", "dur": 1.5},
        # dropped: the enclosing scan while (double-counts its body)
        {"ph": "X", "pid": 3, "tid": 7, "name": "while.9", "dur": 99.0},
        # dropped: host pid, wrong tid
        {"ph": "X", "pid": 9, "tid": 1, "name": "hostop", "dur": 50.0},
        {"ph": "X", "pid": 3, "tid": 8, "name": "otherline", "dur": 50.0},
    ]}
    with gzip.open(run / "vm.trace.json.gz", "wt") as fh:
        json.dump(trace, fh)

    per_op, hlo, total = mod.parse_trace(str(tmp_path))
    assert per_op == {"fusion.1": 15.0, "copy.2": 1.5}
    assert total == 16.5
    assert "fusion" in hlo["fusion.1"]


def test_convert_pth_optional_variant_params(tmp_path):
    """Optional [CHOICE]-variant keys (learned frame scorer, bilinear
    metric) convert when present and stay absent when not."""
    import torch

    from nafae_tpu.utils.torch_convert import convert_pth

    sd = {
        "emb.weight": torch.randn(67, 16),
        "vis_proj.weight": torch.randn(16, 24),
        "vis_proj.bias": torch.randn(16),
        "frame_attn.weight": torch.randn(1, 16),   # torch Linear(E,1) scorer
        "bilinear.weight": torch.randn(16, 16),
    }
    pth = str(tmp_path / "v.pth")
    torch.save(sd, pth)
    params = convert_pth(pth)
    assert params["attn_w"].shape == (16,)
    np.testing.assert_allclose(params["attn_w"],
                               sd["frame_attn.weight"].numpy().ravel())
    assert params["m_sim"].shape == (16, 16)
    # minimal checkpoints stay minimal
    sd2 = {k: sd[k] for k in ("emb.weight", "vis_proj.weight",
                              "vis_proj.bias")}
    pth2 = str(tmp_path / "min.pth")
    torch.save(sd2, pth2)
    p2 = convert_pth(pth2)
    assert "attn_w" not in p2 and "m_sim" not in p2
