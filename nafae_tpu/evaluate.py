"""Evaluation driver: grounding inference + macro/micro box accuracy.

Replaces the reference's `test.py` / `eval_ground` (SURVEY.md L147, L190-199):
for each annotated (frame, object-word) pair, the argmax-similarity region's
box must reach IoU>0.5 with the GT box. The per-(b,k,t) correctness bits are
computed in one jitted program per batch; per-class aggregation happens on
host (tiny). Same path serves YouCook2 val and RoboWatch transfer
(BASELINE configs 1 and 5).

CLI: python -m nafae_tpu.evaluate --preset config1 --ckpt ckpt/ ...
"""

from __future__ import annotations

import functools
import json

import jax
import numpy as np

from nafae_tpu.config import Config
from nafae_tpu.ops import grounding as G
from nafae_tpu.ops.iou import grounding_hits


@functools.partial(jax.jit, static_argnames=("iou_thresh",))
def _eval_batch(params: dict, batch: dict, iou_thresh: float = 0.5):
    w_emb = G.embed_words(batch["word_ids"], params["word_emb"],
                          m_sim=params.get("m_sim"))
    # int8 when params are quantized; int8pre when the batch also carries
    # pre-quantized feats + per-region scales (SegmentDataset keep_int8)
    v_emb = G.project_params(params, batch["feats"],
                             feats_scale=batch.get("feats_scale"))
    s = G.mask_regions(G.similarity_tensor(w_emb, v_emb),
                       batch.get("region_mask"))
    # region argmax must ignore padded frames/words via gt_mask (already 0 there)
    correct, gt_mask = grounding_hits(s, batch["boxes"], batch["gt_boxes"],
                                      batch["gt_mask"], iou_thresh)
    return correct, gt_mask


def evaluate(params: dict, dataset, batch_size: int, num_classes: int,
             iou_thresh: float = 0.5, mesh=None) -> dict:
    """Run grounding eval over `dataset` (must have with_gt=True).

    mesh: optional jax Mesh — shards each eval batch over the first mesh axis
    (pure data parallelism; per-sample metric bits need no collectives).

    The ragged final batch is zero-padded to the compiled batch size on both
    paths: padded rows have gt_mask=0 and thus contribute nothing.
    """
    from nafae_tpu.data import BatchLoader

    def eval_fn(params, batch, iou_thresh):
        # zero-pad the ragged final batch to the compiled B: padded rows
        # have gt_mask=0 so they contribute nothing, and _eval_batch keeps
        # ONE compiled shape (a retrace for the leftover batch costs
        # minutes through the remote-compile service on this host)
        batch = {k: _pad_rows(v, batch_size) for k, v in batch.items()}
        return _eval_batch(params, batch, iou_thresh=iou_thresh)

    if mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P
        axis = mesh.axis_names[0]
        shard = NamedSharding(mesh, P(axis))
        rep = NamedSharding(mesh, P())
        # replicate the params ONCE — inside eval_fn it would re-transfer
        # the whole tree to every device per batch
        params = jax.device_put(params, rep)
        # the sharded batch axis must divide the mesh axis; pad EVERY batch
        # (not just the ragged one) up to the next multiple so batch_size=20
        # on 8 devices works — extra rows have gt_mask=0, contributing 0
        axis_size = mesh.shape[axis]
        padded_b = -(-batch_size // axis_size) * axis_size

        def eval_fn(params, batch, iou_thresh):   # noqa: F811
            batch = {k: jax.device_put(_pad_rows(v, padded_b), shard)
                     for k, v in batch.items()}
            return _eval_batch(params, batch, iou_thresh=iou_thresh)

    loader = BatchLoader(dataset, batch_size, shuffle=False,
                         drop_remainder=False)
    per_class_correct = np.zeros(num_classes)
    per_class_total = np.zeros(num_classes)
    for batch in loader:
        correct, gt_mask = eval_fn(params, batch, iou_thresh=iou_thresh)
        b_real = batch["word_ids"].shape[0]
        correct = np.asarray(correct)[:b_real]     # [B,K,T]
        gt_mask = np.asarray(gt_mask)[:b_real]
        word_ids = batch["word_ids"]           # [B,K]
        b, k, t = correct.shape
        cls = np.broadcast_to(word_ids[:, :, None], (b, k, t))
        np.add.at(per_class_correct, cls.ravel(),
                  (correct * gt_mask).ravel())
        np.add.at(per_class_total, cls.ravel(), gt_mask.ravel())

    seen = per_class_total > 0
    per_class_acc = np.zeros(num_classes)
    per_class_acc[seen] = per_class_correct[seen] / per_class_total[seen]
    micro = float(per_class_correct.sum() / max(per_class_total.sum(), 1.0))
    macro = float(per_class_acc[seen].mean()) if seen.any() else 0.0
    return {
        "box_acc_micro": micro,
        "box_acc_macro": macro,
        "num_annotations": int(per_class_total.sum()),
        "num_classes_seen": int(seen.sum()),
        "per_class_acc": {int(i): float(per_class_acc[i])
                          for i in np.nonzero(seen)[0]},
    }


def _pad_rows(x, n):
    if x.shape[0] >= n:
        return x
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(np.asarray(x), pad)


def evaluate_config(cfg: Config, params: dict | None = None,
                    split: str = "val", mesh=None,
                    require_checkpoint: bool = False) -> dict:
    """Config-driven eval: loads the dataset (+ checkpoint when params=None).

    require_checkpoint: error instead of silently evaluating the random
    init when no checkpoint exists in cfg.train.ckpt_dir (set when the user
    explicitly asked for one)."""
    from nafae_tpu.data import SegmentDataset

    ds = SegmentDataset(cfg.data.root, split, cfg.data.max_frames,
                        cfg.data.num_regions, cfg.data.feat_dim,
                        cfg.data.max_words, with_gt=True,
                        # int8pre: int8 features + scales flow to the device
                        # untouched (loud error on non-int8 files)
                        keep_int8=cfg.model.quantize == "int8pre")
    if params is None:
        # params-only restore with shapes from the checkpoint itself: a
        # config4-trained ckpt must be evaluable under the config1 preset
        # without replaying trainer hyperparams (cluster count, optimizer)
        from nafae_tpu.utils.checkpoint import load_eval_params
        params = load_eval_params(cfg)
        if params is None:
            if require_checkpoint:
                raise FileNotFoundError(
                    f"no checkpoint found in {cfg.train.ckpt_dir!r} — "
                    "refusing to evaluate randomly initialized parameters")
            from nafae_tpu.train import TrainState
            params = TrainState.create(jax.random.PRNGKey(0), cfg).params
    if cfg.model.quantize in ("int8", "int8pre") and "w_v.q8" not in params:
        # int8 inference compute (model.quantize=int8|int8pre): quantize
        # once at load; _eval_batch dispatches on the "w_v.q8" key (and on
        # int8 batch feats for the int8pre form)
        params = G.quantize_params_int8(params)
    return evaluate(params, ds, cfg.data.batch_size, cfg.model.vocab_size,
                    mesh=mesh)


def main(argv=None):
    import argparse

    from nafae_tpu.config import load_config

    p = argparse.ArgumentParser("nafae_tpu.evaluate")
    p.add_argument("--preset", default="config1")
    p.add_argument("--config", default=None)
    p.add_argument("--override", nargs="*", action="extend",
                   default=None)   # repeated flags ACCUMULATE: the
                                   # config scripts pass their own
                                   # --override before the user's

    p.add_argument("--split", default="val")
    p.add_argument("--checkpoint", default=None,
                   help="explicit checkpoint (reference: test.py --checkpoint)"
                        ": an orbax ckpt dir (latest step restored), or a "
                        ".npz params file from utils/torch_convert — the "
                        "reference-checkpoint parity flow")
    p.add_argument("--per-class", action="store_true",
                   help="include the per-class accuracy table (paper protocol)")
    p.add_argument("--mesh", action="store_true",
                   help="shard eval batches over all local devices (pure DP;"
                        " per-sample metric bits need no collectives)")
    args = p.parse_args(argv)
    from nafae_tpu.utils import cli_startup
    cli_startup()
    cfg = load_config(args.config, args.preset, args.override or [])
    mesh = None
    if args.mesh:
        from nafae_tpu.parallel import make_mesh
        mesh = make_mesh(cfg.mesh.data_axis, 1, cfg.mesh.data_axis_name,
                         cfg.mesh.frame_axis_name)
    params = None
    if args.checkpoint and args.checkpoint.endswith(".npz"):
        from nafae_tpu.utils.checkpoint import load_eval_params
        params = load_eval_params(cfg, args.checkpoint)
    elif args.checkpoint:
        cfg.train.ckpt_dir = args.checkpoint
    result = evaluate_config(cfg, params=params, split=args.split, mesh=mesh,
                             require_checkpoint=args.checkpoint is not None)
    if not args.per_class:
        result.pop("per_class_acc")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
