"""Utils tests: torch converter roundtrip, metrics logger, throughput tracker."""

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
