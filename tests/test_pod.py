"""Pod-shape mesh evidence beyond the 8-device floor (VERDICT r4 #5 /
"What's missing" #5: dryrun and all mesh tests ran n=8 only).

Runs the full config-4 DP×SP train step — ranking over global in-batch
negatives, multi-hop halo context window, on-device k-means refresh — on
16- and 32-device virtual CPU meshes (data×frame = 8×2 and 8×4) in a
subprocess (the in-process backend is pinned to 8 devices by conftest),
asserting exactness against the single-device run at BOTH shapes. At 8×4
the ctx window (3) exceeds T_local (2), so the halo exchange runs its
2-hop ppermute chain at pod shape.
"""

import os
import subprocess
import sys

_POD_CODE = r"""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from nafae_tpu.config import load_config
from nafae_tpu.parallel import make_mesh
from nafae_tpu.train import TrainState, build_train_fn

assert len(jax.devices()) >= 32, len(jax.devices())

def cfg_for(data, frame):
    return load_config(preset_name="config4", overrides=[
        "data.feat_dim=64", "model.feat_dim=64", "model.embed_dim=32",
        "data.batch_size=16", "data.max_frames=8", "data.num_regions=6",
        "data.max_words=3", "loss.num_clusters=8", "loss.kmeans_interval=1",
        "loss.ctx_window=3", "train.warmup_steps=5", "train.log_every=1000",
        f"mesh.data_axis={data}", f"mesh.frame_axis={frame}",
    ])

rng = np.random.RandomState(0)
b, t, r, k = 16, 8, 6, 3
batch = {
    "feats": rng.randn(b, t, r, 64).astype(np.float32),
    "boxes": np.abs(rng.rand(b, t, r, 4)).astype(np.float32),
    "word_ids": rng.randint(0, 67, (b, k)).astype(np.int32),
    "frame_mask": np.ones((b, t), np.float32),
    "word_mask": np.ones((b, k), np.float32),
    "region_mask": np.ones((b, t, r), np.float32),
    "segment_id": np.arange(b, dtype=np.int32),
}
batch["frame_mask"][:, t - 2:] = 0.0          # exercise masking

cfg1 = cfg_for(1, 1)
s_ref = TrainState.create(jax.random.PRNGKey(0), cfg1)
fn_ref = build_train_fn(cfg1, None)
for _ in range(2):
    s_ref, m_ref = fn_ref(s_ref, batch)

for data, frame in ((8, 2), (8, 4)):
    n = data * frame
    cfg = cfg_for(data, frame)
    mesh = make_mesh(data, frame, devices=jax.devices()[:n])
    st = TrainState.create(jax.random.PRNGKey(0), cfg)
    fn = build_train_fn(cfg, mesh)
    for _ in range(2):
        st, m = fn(st, batch)
    for key in m_ref:
        np.testing.assert_allclose(float(m_ref[key]), float(m[key]),
                                   rtol=3e-4, atol=1e-5, err_msg=f"{n} {key}")
    for key in s_ref.params:
        np.testing.assert_allclose(np.asarray(s_ref.params[key]),
                                   np.asarray(st.params[key]), atol=2e-6,
                                   err_msg=f"{n} {key}")
    np.testing.assert_allclose(np.asarray(s_ref.centers),
                               np.asarray(st.centers), atol=1e-5,
                               err_msg=f"{n} centers")
    print(f"pod mesh {data}x{frame}={n}: exact vs single device, "
          f"loss={float(m['loss']):.6f}")
print("POD_OK")
"""


def test_pod_mesh_16_and_32_match_single_device():
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=32"
    env.pop("JAX_PLATFORMS", None)   # a set value breaks axon-plugin init
    r = subprocess.run([sys.executable, "-c", _POD_CODE], env=env,
                       capture_output=True, text=True, timeout=1500,
                       cwd=os.path.join(os.path.dirname(__file__), ".."))
    assert r.returncode == 0, r.stderr[-3000:]
    assert "POD_OK" in r.stdout, r.stdout[-2000:]
    assert "8x2=16: exact" in r.stdout
    assert "8x4=32: exact" in r.stdout
