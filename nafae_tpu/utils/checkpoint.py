"""Orbax checkpointing: save/restore/auto-resume (SURVEY.md L277).

Replaces the reference's torch.save/torch.load of state dicts. Saves the full
TrainState (params, optimizer state, k-means centers, step); `restore_latest`
implements auto-resume. A one-way .pth converter lives in torch_convert.py.
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpt_dir: str, keep: int = 3):
        self.dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.dir, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep,
                                                 create=True),
        )

    def save(self, state, wait: bool = False) -> None:
        step = int(state.step)
        self.mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self.mgr.wait_until_finished()

    def restore_latest(self, template):
        """Restore the newest checkpoint into the structure of `template`.

        Returns None when no checkpoint exists.
        """
        step = self.mgr.latest_step()
        if step is None:
            return None
        target = jax.tree.map(lambda x: x, template)
        return self.mgr.restore(step, args=ocp.args.StandardRestore(target))

    def restore_params_latest(self):
        """Restore only the model params (+ step) of the newest checkpoint,
        with shapes taken from the checkpoint itself.

        Eval must not need trainer-side hyperparams (optimizer layout,
        k-means cluster count, ...) to load a checkpoint — the reference's
        torch.load had the same property. Trainer-side subtrees are never
        read from disk (PLACEHOLDER leaves — adamw state alone is 2x the
        params bytes). Returns (params, step) or None.
        """
        import jax.tree_util as jtu
        step = self.mgr.latest_step()
        if step is None:
            return None
        # a read-only manager with a PyTree handler: item_metadata needs a
        # registered handler, and PyTreeRestore is the partial-restore API
        with ocp.CheckpointManager(
                self.dir, item_handlers=ocp.PyTreeCheckpointHandler()) as ro:
            meta = ro.item_metadata(step)
            shard = jax.sharding.SingleDeviceSharding(jax.devices()[0])

            def wanted(path):
                return getattr(path[0], "key", None) in ("params", "step")

            tmpl = jtu.tree_map_with_path(
                lambda p, m: (jax.ShapeDtypeStruct(m.shape, m.dtype,
                                                   sharding=shard)
                              if wanted(p) else ocp.PLACEHOLDER), meta)
            rargs = jtu.tree_map_with_path(
                lambda p, m: (ocp.ArrayRestoreArgs(sharding=shard)
                              if wanted(p) else ocp.RestoreArgs()), meta)
            restored = ro.restore(
                step, args=ocp.args.PyTreeRestore(item=tmpl,
                                                  restore_args=rargs))
        return restored["params"], int(restored["step"])

    def close(self):
        self.mgr.wait_until_finished()
        self.mgr.close()


def load_eval_params(cfg, checkpoint: str | None = None):
    """Shared inference-side param loading (evaluate + visualize CLIs).

    checkpoint: a converted .npz (utils/torch_convert), an orbax ckpt dir,
    or None (= cfg.train.ckpt_dir). Returns params or None when no orbax
    checkpoint exists. Restored shapes are validated against the eval
    config's model — embed_words clamps out-of-range word ids and the
    per-class table is sized from cfg, so a drifted vocab/dim would
    otherwise produce plausible-looking wrong numbers silently.
    """
    import jax
    import jax.numpy as jnp

    if checkpoint and checkpoint.endswith(".npz"):
        from nafae_tpu.utils.torch_convert import load_converted
        params = {k: jnp.asarray(v)
                  for k, v in load_converted(checkpoint).items()}
    else:
        path = checkpoint or cfg.train.ckpt_dir
        if not os.path.isdir(path):
            # read path: a missing/typo'd dir must not be created (the
            # manager ctor would makedirs + drop orbax scaffolding there)
            return None
        restored = CheckpointManager(path).restore_params_latest()
        if restored is None:
            return None
        params = restored[0]
    from nafae_tpu.models.grounding import init_params
    expect = init_params(jax.random.PRNGKey(0), cfg.model)
    for k, v in expect.items():
        got = tuple(params[k].shape) if k in params else None
        if got != tuple(v.shape):
            raise ValueError(
                f"checkpoint param {k!r} has shape {got}, but the eval "
                f"config expects {tuple(v.shape)} — override "
                "model.vocab_size / model.feat_dim / model.embed_dim to "
                "match the training run")
    return params
