"""Typed configuration tree (replaces the reference's argparse `opts` module).

SURVEY.md L148 (config system) and L279 (aux subsystems): typed dataclass config +
JSON file / CLI overrides, with one named preset per BASELINE.json config 1-5.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any


@dataclass
class ModelConfig:
    vocab_size: int = 67          # YouCook2-BB object classes (SURVEY.md L46)
    feat_dim: int = 2048          # RoI feature dim D
    embed_dim: int = 256          # joint space dim E
    frame_pool: str = "attention"  # "attention" (softmax on the mean word
                                   # score) | "mean" | "context" (softmax on
                                   # the ctx-supported score) | "learned"
                                   # (softmax on a learned bias-free linear
                                   # scorer of pooled region embeddings —
                                   # docs/MATH.md step 5 [CHOICE]; adds
                                   # param attn_w)
    frame_attn_temp: float = 0.1   # τ_f in docs/MATH.md §Forward
    similarity: str = "cosine"     # word-region similarity form (docs/
                                   # MATH.md step 3 [CHOICE]): "cosine"
                                   # (ŵ·v̂) | "bilinear" (ŵᵀ·M·v̂, learned
                                   # M [E,E] identity-initialized — the
                                   # BASELINE "bilinear similarity matrix"
                                   # reading; adds param m_sim)
    dtype: str = "float32"         # compute dtype for the sim einsum ("bfloat16" on TPU)
    matmul_precision: str = "highest"  # "default" = fast bf16 MXU passes everywhere
    quantize: str = ""             # "int8": INFERENCE-only quantized compute —
                                   # the projection matmul (>99% of eval/serve
                                   # FLOPs) runs int8×int8→int32 on the MXU
                                   # (per-output-channel weights × per-row
                                   # dynamic activations; ops/grounding
                                   # project_regions_int8). Applied at param
                                   # load by eval/serve; training ignores it.
                                   # "int8pre": same int8 dot, but features
                                   # arrive PRE-quantized from disk/request
                                   # (extract --quantize int8) — ¼ the
                                   # feature bytes on top of the int8 MXU;
                                   # the measured serving win (docs/PERF.md
                                   # "r5 inference work": dynamic int8
                                   # LOSES, int8pre wins +30%).
    word_vectors: str = ""         # optional GloVe-style init file for word_emb


@dataclass
class LossConfig:
    margin: float = 0.1           # Δ, ranking loss
    rank_norm: str = "pairs"      # hinge-sum normalizer (docs/MATH.md
                                  # §Ranking [CHOICE]): "pairs" (ordered
                                  # pairs i≠j) | "hinges" (2·pairs) |
                                  # "batch" (B)
    ctx_weight: float = 0.0       # λ_ctx (config 3+)
    ctx_target: str = "stopgrad"  # ctx-loss gradient flow (docs/MATH.md
                                  # §Contextual [CHOICE]): "stopgrad"
                                  # (teacher ŝ) | "live" | "symmetric"
    ctx_window: int = 3           # half-width w of the temporal window
    ctx_temp: float = 0.1         # τ_a affinity temperature
    cluster_weight: float = 0.0   # λ_clu (config 4+)
    num_clusters: int = 67        # Kc
    kmeans_interval: int = 100    # steps between Lloyd refreshes
    kmeans_iters: int = 10        # Lloyd iterations per refresh
    kmeans_ema: float = 0.0       # ρ blend toward old centers
    kmeans_source: str = "batch"  # "batch": Lloyd over the current batch's
                                  # selections only; "bank": over a
                                  # step-granular ring of the last
                                  # bank_steps steps' selections (SURVEY.md
                                  # L176/L220-225: the reference accumulates
                                  # selected region features across the
                                  # epoch before k-means; docs/MATH.md).
                                  # Multi-bucket datasets share one bank
                                  # (smaller buckets zero-pad their slot);
                                  # bank + multiple buckets needs
                                  # mesh.frame_axis=1 (validated at load).
    bank_steps: int = 32          # ring depth W ("bank" source): k-means
                                  # sees the last W steps' selections
    kmeans_init: str = "random"   # center seeding (docs/MATH.md [CHOICE]):
                                  # "random" (unit-norm gaussian) |
                                  # "plusplus" (on-device k-means++ over
                                  # the first step's selections, Gumbel-max
                                  # weighted draws; exact under any mesh —
                                  # ops/kmeans.kmeans_plusplus_init)


@dataclass
class DataConfig:
    root: str = "data/youcook2"   # directory with index.jsonl + per-segment .npz
    split: str = "train"
    classes_file: str = ""        # object-class list (one per line) used to
                                  # build the Vocab everywhere (extract,
                                  # GloVe init, visualize); "" = the built-in
                                  # 67-class stand-in (data/vocab.py)
    max_frames: int = 20          # T bucket (upper bound)
    frame_buckets: tuple = ()     # optional ascending T buckets, e.g. (8, 20):
                                  # each segment pads to the smallest fitting
                                  # bucket; one jit specialization per bucket
    num_regions: int = 20         # R
    feat_dim: int = 2048          # D (must match model.feat_dim)
    max_words: int = 8            # K
    batch_size: int = 16
    shuffle_buffer: int = 1024
    prefetch: int = 2
    num_workers: int = 2
    use_native_io: bool = True    # C++ packer (native/); falls back to Python if .so missing
    pipeline: str = "thread"      # "thread" (BatchLoader+native) | "grain"
    transfer_dtype: str = "float32"  # feats host->device dtype ("float16" /
                                     # "bfloat16" halve transfer bytes; upcast
                                     # on device; native packer converts in C++)
    from_videos: bool = False     # config-5 inline mode: batches carry raw
                                  # frames decoded in loader workers; the
                                  # frozen detector runs inside the train step
    annotations: str = ""         # segments.jsonl for from_videos mode


@dataclass
class TrainConfig:
    steps: int = 10000
    lr: float = 1e-3
    weight_decay: float = 1e-5
    warmup_steps: int = 100
    optimizer: str = "adam"       # "adam" | "sgd"
    grad_clip: float = 1.0        # global-norm clip; <=0 disables
    seed: int = 0
    ckpt_dir: str = "ckpt"
    ckpt_every: int = 500
    keep_ckpts: int = 3
    log_every: int = 50
    eval_every: int = 1000
    use_pallas: bool = False      # legacy: True == kernels="pallas" (honored
                                  # whenever kernels is left at "auto"/"";
                                  # an explicit jnp/pallas value wins)
    kernels: str = "auto"         # "auto" (default: XLA cross path + Pallas
                                  # ctx kernel on TPU — the measured-best
                                  # mix, docs/PERF.md — and pure-XLA on CPU,
                                  # where interpret-mode kernels would crawl)
                                  # | "jnp" | "pallas" (both fused kernels)
                                  # | "" (legacy: derive from use_pallas)
    donate: bool = True
    steps_per_call: int = 1       # lax.scan this many steps inside ONE XLA call
    scoped_vmem_kib: int = 0      # raise the TPU compiler's scoped-VMEM
                                  # limit (xla_tpu_scoped_vmem_limit_kib,
                                  # default 16384 KiB = 16 MB) for this
                                  # config's jitted programs. 65536 extends
                                  # the fused-ctx Pallas kernel's long-clip
                                  # envelope T≈214 -> 320 at R=20/E=256,
                                  # measured 1.8x faster than the XLA
                                  # fallback there (docs/PERF.md "long-clip
                                  # sweep"). 0 = toolchain default; ignored
                                  # off-TPU.
                                  # (amortizes dispatch; batches stack on a lead axis)
    device_cache: bool = False    # upload the WHOLE dataset to HBM once and
                                  # gather batches on device (no per-step host
                                  # transfer; requires a single frame bucket)
    tensorboard_dir: str = ""     # also mirror metrics to TB event files

    def resolved_kernels(self) -> str:
        """Kernel routing with the legacy flag honored.

        An explicit kernels value ("jnp"/"pallas") wins; when kernels is
        left at its default ("auto") or at the legacy empty string,
        use_pallas=True selects "pallas".
        """
        if self.kernels not in ("auto", ""):
            return self.kernels
        if self.use_pallas:
            return "pallas"
        return self.kernels or "jnp"


@dataclass
class MeshConfig:
    data_axis: int = -1           # -1 = all devices on the data axis
    frame_axis: int = 1           # >1 shards the frame (sequence) axis (SP)
    data_axis_name: str = "data"
    frame_axis_name: str = "frame"


@dataclass
class DetectorConfig:
    """Faster R-CNN feature extractor (BASELINE config 5)."""
    backbone: str = "resnet50"    # resnet50 | resnet101 | vgg16 (SURVEY.md
                                  # L136 "VGG16 or ResNet-101 — VERIFY")
    image_size: int = 640
    num_proposals: int = 20       # R kept after NMS
    rpn_pre_nms_topk: int = 1024
    approx_topk: bool = True      # lax.approx_max_k for the pre-NMS top-k
                                  # (TPU-native, recall ~0.95; exact on CPU.
                                  # set False for reference-checkpoint
                                  # detection parity, docs/PARITY.md §3)
    topk_window: int = 1          # >1: windowed pre-reduction top-k — max
                                  # over windows of adjacent (same-cell)
                                  # anchors before the sort, shrinking it
                                  # by the window factor (rpn.windowed_topk;
                                  # overrides approx_topk). 1 = off.
    nms_impl: str = "jnp"         # "jnp" (XLA scan) or "pallas" (whole
                                  # greedy loop in ONE on-chip program,
                                  # all batch rows row-parallel on the
                                  # VPU — ops/pallas/nms.py). Survivors
                                  # identical (tested). "auto" = backend
                                  # routing (pallas on TPU).
    full_pool_nms: bool = False   # skip the pre-NMS top-k entirely: decode
                                  # every anchor and greedy-NMS the full
                                  # pool (textbook-exact selection, kills
                                  # the [B,N] sort — 22% of the inline
                                  # step). Pair with nms_impl pallas/auto;
                                  # overrides approx_topk/topk_window.
    nms_iou_thresh: float = 0.7
    anchor_scales: tuple = (32, 64, 128, 256, 512)
    anchor_ratios: tuple = (0.5, 1.0, 2.0)
    rpn_channels: int = 256       # RPN 3x3 conv width; set 512 to load
                                  # faster-rcnn.pytorch-lineage checkpoints
                                  # (utils/torch_convert.convert_faster_rcnn)
    dtype: str = "float32"        # conv/activation compute dtype; bfloat16
                                  # halves backbone activation HBM traffic
                                  # (safe: BN frozen, params stay f32, RPN
                                  # outputs + pooled feats return to f32)
    stem_s2d: bool = False        # compute the 7x7/s2 stem as a
                                  # space-to-depth 4x4/s1 conv (exact same
                                  # sums, checkpoint tree unchanged). The
                                  # classic TPU fix for the input-channel-
                                  # starved stem (586 us/step, 6.6% MFU) —
                                  # but MEASURED SLOWER here: 5215 vs 4055
                                  # us/step inline (ab_inline r4; this
                                  # toolchain's emitter handles the s2d
                                  # form worse). Knob kept for future
                                  # toolchains; default stays off.
    roi_impl: str = "separable"   # RoIAlign form: "separable" (two batched
                                  # matmuls, Wy@feat@Wx^T), "combined" (one
                                  # dot against the folded [PQ,HW] pooling
                                  # matrix — 4x FLOPs, no 92 MB bf16
                                  # intermediate; ops/roi_align.py), or
                                  # "pallas" (ops/pallas/roi_align.py).
    stem_pad_ch: int = 0          # zero-pad the stem conv's INPUT channels
                                  # (3 -> this) at trace time — exact, same
                                  # checkpoint tree; emitter channel-tiling
                                  # knob for the starved 3-channel input.
                                  # 0 disables.
    fold_bn: bool = False         # fold FrozenBN affines into conv kernels
                                  # at param load/init (exact-same-math
                                  # load-time transform; param tree
                                  # unchanged, idempotent —
                                  # models/detector/resnet.fold_frozen_bn)
    stem_im2col: bool = False     # compute the 7x7/s2 stem as XLA's
                                  # conv_general_dilated_patches + one
                                  # [N·Ho·Wo,147]x[147,64] matmul (exact
                                  # same sums — the im2col-by-XLA form for
                                  # the input-channel-starved stem)
    stem_nminor: bool = False     # feed the stem conv a [H,W,C,N]
                                  # transposed operand (exact, same
                                  # checkpoint tree) — the {0,3,2,1}
                                  # layout the emitter asks for, aiming to
                                  # fuse the standalone input relayout
                                  # copy into the producer fusion.
    frame_rate: float = 1.0       # sampled frames / second of video
    weights: str = ""             # optional torchvision resnet50 .pth to seed
                                  # the backbone/head (utils/torch_convert)


@dataclass
class Config:
    preset: str = "config2"
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    detector: DetectorConfig = field(default_factory=DetectorConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=list)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Config":
        def build(tp, val):
            if dataclasses.is_dataclass(tp) and isinstance(val, dict):
                fields = {f.name: f for f in dataclasses.fields(tp)}
                kwargs = {}
                for k, v in val.items():
                    if k not in fields:
                        raise KeyError(f"unknown config key {tp.__name__}.{k}")
                    ft = fields[k].type
                    sub = _DATACLASS_BY_NAME.get(ft if isinstance(ft, str) else ft.__name__)
                    kwargs[k] = build(sub, v) if sub else (tuple(v) if isinstance(v, list) else v)
                return tp(**kwargs)
            return val
        return build(cls, d)


_DATACLASS_BY_NAME = {c.__name__: c for c in
                      (ModelConfig, LossConfig, DataConfig, TrainConfig, MeshConfig,
                       DetectorConfig, Config)}


def apply_overrides(cfg: Config, overrides: list[str]) -> Config:
    """Apply `section.key=value` CLI overrides (e.g. `loss.ctx_weight=1.0`)."""
    d = dataclasses.asdict(cfg)
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got {ov!r}")
        path, _, raw = ov.partition("=")
        keys = path.split(".")
        node = d
        for k in keys[:-1]:
            if k not in node:
                raise KeyError(f"unknown config section {k!r} in override {ov!r}")
            node = node[k]
        leaf = keys[-1]
        if leaf not in node:
            raise KeyError(f"unknown config key {path!r}")
        cur = node[leaf]
        try:
            val = json.loads(raw)
        except json.JSONDecodeError:
            val = raw
        if cur is not None and not isinstance(cur, type(val)) and not (
            isinstance(cur, float) and isinstance(val, int)
        ):
            if isinstance(cur, (list, tuple)) and isinstance(val, (list, tuple)):
                pass
            else:
                raise TypeError(
                    f"override {path}={raw!r}: expected {type(cur).__name__}, "
                    f"got {type(val).__name__}")
        node[leaf] = float(val) if isinstance(cur, float) else val
    return Config.from_dict(d)


# -- Named presets: one per BASELINE.json acceptance config (SURVEY.md §7). ----------

def preset(name: str) -> Config:
    cfg = Config(preset=name)
    if name == "config1":      # eval-only, precomputed features, CPU-runnable
        cfg.data.split = "val"
        cfg.loss.ctx_weight = 0.0
        cfg.loss.cluster_weight = 0.0
    elif name == "config2":    # MIL + ranking training
        pass
    elif name == "config3":    # + contextual similarity loss
        cfg.loss.ctx_weight = 1.0
        cfg.model.frame_pool = "context"
    elif name == "config4":    # + visual clustering loss
        cfg.loss.ctx_weight = 1.0
        cfg.loss.cluster_weight = 1.0
        cfg.model.frame_pool = "context"
    elif name == "config5":    # end-to-end: decode + detector + fused losses
        cfg.loss.ctx_weight = 1.0
        cfg.loss.cluster_weight = 1.0
        cfg.model.frame_pool = "context"
        cfg.data.root = "data/robowatch"
        # textbook-exact proposal selection with no pre-NMS sort; the
        # row-parallel Pallas NMS kernel runs the full anchor pool in one
        # program (463 -> 386 us/step inline, docs/PERF.md r2). "auto"
        # routes the kernel on TPU and the jnp scan elsewhere.
        cfg.detector.full_pool_nms = True
        cfg.detector.nms_impl = "auto"
    else:
        raise ValueError(f"unknown preset {name!r}; choose config1..config5")
    return cfg


def validate(cfg: Config) -> Config:
    """Fail-fast cross-field checks that would otherwise surface as opaque
    trace-time errors (the per-field [CHOICE] validation lives next to the
    params in models/grounding._validate_choices)."""
    ctx_on = cfg.loss.ctx_weight > 0 or cfg.model.frame_pool == "context"
    if ctx_on and cfg.loss.ctx_window <= 0:
        raise ValueError(
            f"loss.ctx_window={cfg.loss.ctx_window} but the context path is "
            "on (loss.ctx_weight>0 or model.frame_pool=context) — the "
            "temporal window must be >= 1")
    if cfg.loss.kmeans_init not in ("random", "plusplus"):
        raise ValueError(
            f"unknown loss.kmeans_init {cfg.loss.kmeans_init!r}; "
            "choose random | plusplus")
    if (cfg.loss.kmeans_source == "bank" and cfg.loss.cluster_weight > 0
            and len(cfg.data.frame_buckets) > 1 and cfg.mesh.frame_axis > 1):
        # a frame-sharded ring slot lays a smaller bucket's pad out
        # per-shard, so the global bank row order would differ from the
        # single-device run — fail at config load, not at trace time
        raise ValueError(
            "loss.kmeans_source='bank' with multiple data.frame_buckets "
            "requires mesh.frame_axis=1 (the frame-sharded bank slot "
            "cannot pad smaller buckets consistently across SP shards)")
    if cfg.detector.roi_impl not in ("separable", "combined", "pallas"):
        raise ValueError(
            f"unknown detector.roi_impl {cfg.detector.roi_impl!r}; "
            "choose separable | combined | pallas")
    if cfg.model.quantize not in ("", "int8", "int8pre"):
        raise ValueError(
            f"unknown model.quantize {cfg.model.quantize!r}; "
            "choose '' | int8 | int8pre")
    if cfg.model.matmul_precision not in ("highest", "default"):
        # everything-else would silently map to DEFAULT (bf16 MXU passes,
        # ~1e-3 error) in ops.grounding.matmul_precision — a typo must not
        # silently drop oracle-parity precision
        raise ValueError(
            f"unknown model.matmul_precision {cfg.model.matmul_precision!r};"
            " choose highest | default")
    return cfg


def load_config(path: str | None = None, preset_name: str | None = None,
                overrides: list[str] | None = None) -> Config:
    if path:
        with open(path) as f:
            cfg = Config.from_dict(json.load(f))
    elif preset_name:
        cfg = preset(preset_name)
    else:
        cfg = Config()
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    return validate(cfg)
