"""One-way torch .pth -> nafae_tpu parameter converter (SURVEY.md L277).

Lets reference PyTorch checkpoints seed parity runs (BASELINE north star:
"same YouCook2 numbers from the same checkpointed features"). torch-cpu is
installed for exactly this purpose; no torch is used anywhere at runtime.

Key mapping (override with --map for other lineages):
  grounding model:
    word embedding  [V,E]   <- any of: emb.weight / word_emb / embedding.weight
    projection      [D,E]   <- vis_proj.weight (torch stores [E,D]; transposed)
    projection bias [E]     <- vis_proj.bias
"""

from __future__ import annotations

import json

import numpy as np

DEFAULT_MAP = {
    "word_emb": ["word_emb", "emb.weight", "embedding.weight",
                 "txt_emb.weight"],
    "w_v": ["w_v", "vis_proj.weight", "proj.weight", "visual_emb.weight"],
    "b_v": ["b_v", "vis_proj.bias", "proj.bias", "visual_emb.bias"],
}


def _to_numpy_dict(state_dict: dict) -> dict:
    """torch tensors (or arrays) -> host numpy arrays, one place to extend."""
    return {k: np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v)
            for k, v in state_dict.items()}


def convert_state_dict(state_dict: dict, key_map: dict | None = None,
                       expect: dict | None = None) -> dict:
    """torch state_dict (tensors or arrays) -> {word_emb, w_v, b_v} numpy."""
    key_map = key_map or DEFAULT_MAP
    flat = _to_numpy_dict(state_dict)
    out = {}
    for ours, candidates in key_map.items():
        found = None
        for c in candidates:
            if c in flat:
                found = flat[c]
                break
        if found is None:
            raise KeyError(
                f"no source key for {ours!r}; tried {candidates}; "
                f"checkpoint has {sorted(flat)[:20]}...")
        if ours == "w_v" and found.ndim == 2 and c != "w_v":
            # torch Linear stores [out, in] = [E, D]; ours is [D, E].
            # Always transpose torch-named sources — a max(shape) heuristic
            # would silently pick the wrong orientation for square matrices.
            found = found.T
        out[ours] = found.astype(np.float32)
    if expect:
        for k, shape in expect.items():
            if tuple(out[k].shape) != tuple(shape):
                raise ValueError(f"{k}: shape {out[k].shape} != expected {shape}")
    return out


def convert_pth(pth_path: str, out_path: str | None = None,
                key_map: dict | None = None) -> dict:
    """Load a .pth file (weights_only) and convert; optionally save .npz."""
    import torch
    obj = torch.load(pth_path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    params = convert_state_dict(obj, key_map)
    if out_path:
        np.savez(out_path, **params)
    return params


def load_converted(npz_path: str) -> dict:
    import jax.numpy as jnp
    with np.load(npz_path) as z:
        return {k: jnp.asarray(z[k]) for k in z.files}


RESNET50_BLOCKS = (3, 4, 6)   # conv2..conv4 (backbone); conv5 (3) = head


def convert_detector_resnet50(state_dict: dict, params: dict) -> dict:
    """Map a torchvision-style resnet50 state_dict onto the detector params.

    Covers the ResNetC4 backbone (conv1 + layer1-3) and the C5 RoI head
    (layer4); RPN/detection-head params are left as-is (they have no torch
    counterpart in a plain resnet50 checkpoint). Conv weights transpose
    [out,in,kh,kw] -> [kh,kw,in,out]; BN maps weight/bias/running_mean/
    running_var -> scale/bias/mean/var (FrozenBN). Returns a NEW params tree.
    """
    flat = _to_numpy_dict(state_dict)

    def conv(name):
        return np.transpose(flat[name + ".weight"], (2, 3, 1, 0))

    def bn(dst, name):
        dst["scale"] = flat[name + ".weight"].astype(np.float32)
        dst["bias"] = flat[name + ".bias"].astype(np.float32)
        dst["mean"] = flat[name + ".running_mean"].astype(np.float32)
        dst["var"] = flat[name + ".running_var"].astype(np.float32)

    out = jax.tree.map(np.array, params)   # np.array copies: a fresh tree
    bb = out["params"]["backbone"]
    bb["Conv_0"]["kernel"] = conv("conv1")
    bn(bb["FrozenBN_0"], "bn1")
    bi = 0
    for stage, n_blocks in enumerate(RESNET50_BLOCKS, start=1):
        for b in range(n_blocks):
            src = f"layer{stage}.{b}"
            dst = bb[f"Bottleneck_{bi}"]
            _copy_bottleneck(dst, src, conv, bn, flat)
            bi += 1
    head = out["params"]["head"]
    for b in range(3):
        _copy_bottleneck(head[f"Bottleneck_{b}"], f"layer4.{b}", conv, bn,
                         flat)
    return jax.tree.map(jnp_asarray, out)


def _copy_bottleneck(dst, src, conv, bn, flat):
    for i in (0, 1, 2):
        dst[f"Conv_{i}"]["kernel"] = conv(f"{src}.conv{i + 1}")
        bn(dst[f"FrozenBN_{i}"], f"{src}.bn{i + 1}")
    if f"{src}.downsample.0.weight" in flat:
        dst["Conv_3"]["kernel"] = conv(f"{src}.downsample.0")
        bn(dst["FrozenBN_3"], f"{src}.downsample.1")


def jnp_asarray(x):
    import jax.numpy as jnp
    return jnp.asarray(x)


import jax  # noqa: E402  (tree mapping in the detector converter)


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser("nafae_tpu.utils.torch_convert")
    p.add_argument("pth")
    p.add_argument("out", help="output .npz")
    p.add_argument("--map", default=None, help="JSON key map override")
    args = p.parse_args(argv)
    key_map = json.loads(args.map) if args.map else None
    params = convert_pth(args.pth, args.out, key_map)
    print(json.dumps({k: list(v.shape) for k, v in params.items()}))


if __name__ == "__main__":
    main()
