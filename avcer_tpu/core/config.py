"""Typed configuration system.

Replaces the reference's three config mechanisms — argparse CLIs
(/root/reference/src/run.py:13-22), the gitignored plain-dict ``c_config``
module (/root/reference/src/audio/default_config.py:7-34), and hard-coded
experiment registries (/root/reference/src/get_prob_audio_8_cl.py:154-207) —
with one tree of frozen dataclasses. Everything is static so that jitted
programs see compile-time constants.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Optional


def _asdict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj):
        return {f.name: _asdict(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_asdict(x) for x in obj]
    return obj


@dataclass(frozen=True)
class DetectorConfig:
    """RetinaFace detector stage.

    Reference semantics: threshold 0.8, resnet50 backbone, conf_thresh 0.02,
    nms_thresh 0.4, nms_top_k 5000, top_k 750
    (.../retina_face/retina_face_predictor.py:18-57, get_face_images.py:27-31).
    """

    backbone: str = "resnet50"  # or "mobilenet0.25"
    threshold: float = 0.8
    conf_thresh: float = 0.02
    nms_thresh: float = 0.4
    #: Fixed candidate budget for the TPU NMS (reference nms_top_k=5000 is a
    #: cap on a variable-length list; we keep a static top-K instead).
    nms_candidates: int = 512
    top_k: int = 750
    max_faces: int = 8
    #: If >0, letterbox-resize frames so the long side equals this bucket and
    #: run the detector at fixed shape (TPU-friendly). 0 = native resolution
    #: padded to a bucket (parity mode).
    long_side: int = 640
    #: Wire format for frame upload: "i420" halves host->device bytes
    #: (lossless vs 4:2:0 video sources); "bgr" ships raw pixels.
    transfer_format: str = "i420"
    #: Detect every Nth frame (opt-in speed mode; 1 = reference parity, the
    #: reference detects every frame — get_face_images.py:44-61). Frames in
    #: between get linearly interpolated target boxes from the surrounding
    #: detections (held at chunk tails); the emotion CNN still runs on every
    #: frame. Must divide batch_size.
    stride: int = 1
    #: IoU tracker threshold (get_face_images.py:32).
    tracker_iou: float = 0.4
    min_face_size: float = 0.0
    batch_size: int = 32
    #: Compute dtype: "bfloat16" on TPU; "float32" for CPU differential runs.
    dtype: str = "bfloat16"
    #: Greedy-NMS implementation: "auto" = the XLA fori_loop (0.093 ms/batch
    #: vs 0.346 for the Pallas kernel on v5e in trustworthy in-program-loop
    #: timing — BENCH_NOTES.md round-4 table). "pallas" opts into the kernel
    #: (bit-exact, kept for study).
    nms_impl: str = "auto"
    #: Quantized serving: "int8" runs backbone+FPN+SSH convs dynamically
    #: quantized on the MXU (~1.85x conv speedup, models/retinaface.QConv);
    #: heads/decode/NMS stay bf16/fp32. "none" = exact bf16 path.
    quant: str = "none"
    #: Space-to-depth stem for the resnet50 backbone: exact reformulation of
    #: the 7x7/s2 stem conv (same parameters, same math — models/retinaface.py
    #: StemConv). Off by default: measured 0.635 vs 0.604 ms/frame on v5e at
    #: the 640 bucket (XLA's own stem lowering already wins there); kept as an
    #: option for other generations/buckets.
    s2d_stem: bool | str = False
    #: resnet50 layer1 as ONE fused Pallas program keeping all bottleneck
    #: intermediates in VMEM (ops/pallas/fused_resnet_kernel.py) — layer1 is
    #: the detector's HBM-bound worst section (~8% MFU, BENCH_NOTES round-4).
    #: Exact math over the same checkpoint tree; bf16 non-quant path only.
    fused_layer1: bool = False
    #: additionally fuse the stride-1 identity tails of layers 2-3 (their
    #: stride-2 entry bottlenecks stay in XLA) — same exactness contract.
    fused_tails: bool = False
    #: fuse the stride-2 entry bottlenecks of layers 2-3 into their chains
    #: too (models/retinaface.ResNet50Backbone.fused_entries) — layer2
    #: becomes ONE Pallas program; requires fused_tails, same exactness.
    fused_entries: bool = False
    #: each SSH context module + its three 1x1 heads as one fused Pallas
    #: program per FPN scale (models/retinaface.RetinaFace.fused_ssh) —
    #: the SSH output never touches HBM. Exact; int8 fold under quant.
    fused_ssh: bool = False
    #: with fused_ssh, fold the FPN (lateral + upsample-add + merge) into
    #: the same per-scale programs (RetinaFace.fused_fpn). Same exactness.
    fused_fpn: bool = False


@dataclass(frozen=True)
class VisualConfig:
    """Static CNN + dynamic LSTM stage (get_prob_video.py)."""

    num_classes: int = 7
    lstm_window: int = 10
    #: crop-CNN batch: 256 is the measured optimum on v5e (0.080 ms/frame vs
    #: 0.139 at 128 — BENCH_NOTES.md round-2 table)
    batch_size: int = 256
    dtype: str = "bfloat16"
    #: "int8" = quantized static-CNN serving (models/emotion_resnet.py quant;
    #: same checkpoint tree, calibrated activation scales). LSTM stays bf16.
    quant: str = "none"
    #: exact space-to-depth stem (models/emotion_resnet.py s2d_stem; same
    #: params/math). "auto" = on for bf16 TPU serving; bf16 path only.
    s2d_stem: bool | str = False
    #: bottleneck chains as fused Pallas programs (models/emotion_resnet.py
    #: fused) — same exactness contract as DetectorConfig.fused_layer1;
    #: bf16 non-quant single-chip path only.
    fused: bool = False
    #: with ``fused``, fuse the stride-2 entries of layers 2-3 too
    #: (models/emotion_resnet.py fused_entries — "s2pre" kernel blocks).
    fused_entries: bool = False
    #: run the static CNN only when the last computed present frame is
    #: >= cnn_stride frame ids old (greedy, so the <= cnn_stride-1-frame
    #: staleness bound holds even with sparse face presence), plus EVERY
    #: dynamic step frame — so the LSTM feature stream, and therefore the
    #: whole dynamic output, stays bit-exact (under int8, calibration also
    #: runs on the same leading crops as per-frame serving). Static probs
    #: on skipped frames hold the last computed row. 1 = reference-exact
    #: per-frame CNN; 0 = align to the dynamic step cadence
    #: round(5*fps/25), the reference's own legacy visual pipeline
    #: sampling rate (src/video/functions/get_face_areas.py:40). Serving
    #: approximation — drift numbers in PARITY.md (max preset).
    cnn_stride: int = 1


@dataclass(frozen=True)
class AudioConfig:
    """Audio stage (get_prob_audio_{7,8}_cl.py)."""

    num_classes: int = 8
    head: str = "v3"  # v1 | v2 | v3
    sample_rate: int = 16_000
    window_sec: float = 4.0
    step_sec: float = 0.5
    padding: str = "mean"  # mean | constant | repeat
    batch_size: int = 16
    dtype: str = "bfloat16"
    #: "int8" = quantized wav2vec2 encoder projections (Wav2Vec2Config.quant;
    #: same checkpoint tree, calibrated activation scales).
    quant: str = "none"
    #: Run the conv feature extractor once per clip instead of once per
    #: window (the 4 s / 0.5 s windows overlap 8x). Opt-in APPROXIMATION:
    #: normalization happens once per wav instead of per window
    #: (audio_stage._shared_features_impl); drift-gated in tests.
    shared_extractor: bool = False


@dataclass(frozen=True)
class FusionConfig:
    """Probability fusion + compound-expression decision (run.py:25-189)."""

    #: 3x7 per-(model, emotion) Dirichlet weights; None = plain average.
    use_published_weights: bool = True
    #: Scalar per-model weights (run.py:197 ``weights_model=[1, 1, 1]``).
    model_weights: tuple[float, float, float] = (1.0, 1.0, 1.0)
    #: Rule 2: pair-normalized prior weights (run.py:216).
    ce_weights_type: bool = False
    #: Rule 1: zero out probabilities <= 1/7 (run.py:217, CLI default True).
    ce_mask: bool = True


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh for scale-out. Inference shards the frame/window batch
    axis ("data"); training adds optional model-parallel sharding of the
    wav2vec2 encoder ("model") OR GPipe pipeline parallelism over the
    encoder layer stack ("pipe", parallel/pipeline.py) — mutually
    exclusive axes for now."""

    data: int = 1
    model: int = 1
    #: >1 = pipeline-parallel training: encoder layers stack on a leading
    #: [L] axis sharded over "pipe" (params/grads/moments scale 1/pipe);
    #: see train/trainer.py pp branch + parallel/pipeline.py.
    pipe: int = 1
    #: GPipe microbatches per step (bubble = (pipe-1)/(n_micro+pipe-1));
    #: batch_size must divide data * pipe_microbatches.
    pipe_microbatches: int = 2


@dataclass(frozen=True)
class PipelineConfig:
    detector: DetectorConfig = field(default_factory=DetectorConfig)
    visual: VisualConfig = field(default_factory=VisualConfig)
    audio: AudioConfig = field(default_factory=AudioConfig)
    fusion: FusionConfig = field(default_factory=FusionConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    #: Write face crops to ``<save>/<video>/<tid>/<frame>.jpg`` like the
    #: reference (get_face_images.py:57-60). Off by default: the TPU pipeline
    #: keeps crops in memory; this is an output-parity option only.
    save_face_crops: bool = False
    save_probs: bool = True
    save_plot: bool = True
    #: Grad-CAM heatmaps for step frames (run.py:214-215 flag_heatmaps /
    #: model_heatmaps). "" = off; "static" | "dynamic" choose which model's
    #: argmax class drives the CAM (get_prob_video.py:131-136).
    heatmaps: str = ""
    weights_dir: str = "weights"
    #: One-shot on-device batch-size calibration at build time (cached per
    #: device kind — pipeline/calibrate.py). Off by default: the checked-in
    #: defaults are the measured v5e optima.
    calibrate: bool = False

    def __post_init__(self) -> None:
        # fail at config time, not after minutes of device compiles: the
        # jpg crop dump is a per-frame parity artifact, incompatible with
        # detect-stride serving (heatmaps are fine — they use the
        # device-side step-crop fetch)
        if self.save_face_crops and self.detector.stride > 1:
            raise ValueError(
                "save_face_crops requires detector stride=1 (the jpg dump"
                " is a per-frame parity artifact); drop --save_face_crops"
                " or the stride/turbo preset"
            )
        if self.visual.cnn_stride < 0:
            raise ValueError(
                "cnn_stride must be >= 0 (0 = align to the dynamic step"
                f" cadence, 1 = per-frame); got {self.visual.cnn_stride}"
            )

    def to_json(self, **kw: Any) -> str:
        return json.dumps(_asdict(self), indent=2, **kw)


@dataclass(frozen=True)
class OptimConfig:
    """Adam + CosineAnnealingWarmRestarts with the reference's per-batch
    ``epoch + idx/iters`` stepping (net_trainer.py:437, train_c_audio.py:246-250)."""

    lr: float = 1e-4
    t0: int = 10
    t_mult: int = 1
    eta_min: float = 0.0
    weight_decay: float = 0.0


@dataclass(frozen=True)
class TrainConfig:
    model: str = "v3"
    num_classes: int = 8
    epochs: int = 100
    batch_size: int = 24
    seed: int = 0
    augmentation: bool = False
    filtered: bool = True
    label_smoothing: float = 0.2
    mixup_alpha: float = 0.3
    loss: str = "weighted_ce"  # weighted_ce | soft_focal | mse | ccc
    #: classification (EXPR) or regression (VA task, net_trainer.py:18-24)
    problem: str = "classification"
    optim: OptimConfig = field(default_factory=OptimConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    log_root: str = "logs"
    #: model-selection metric (train_c_audio.py:217)
    selection_metric: str = "f1"

    def to_json(self, **kw: Any) -> str:
        return json.dumps(_asdict(self), indent=2, **kw)


def pipeline_config_from_args(argv: Optional[list[str]] = None) -> tuple["PipelineConfig", str, str]:
    """CLI surface compatible with the reference entry point
    (``--path_video``/``--path_save``, run.py:13-22) plus framework knobs."""
    import argparse

    p = argparse.ArgumentParser(description="avcer-tpu run")
    p.add_argument("--path_video", type=str, default="video/")
    p.add_argument("--path_save", type=str, default="report/")
    p.add_argument("--long_side", type=int, default=None,
                   help="detector bucket (default 640; turbo preset: 448); "
                        "0 = native resolution (parity mode)")
    p.add_argument("--no_published_weights", action="store_true")
    p.add_argument("--ce_weights_type", action="store_true")
    p.add_argument("--no_ce_mask", action="store_true")
    p.add_argument("--save_face_crops", action="store_true")
    p.add_argument("--heatmaps", choices=["", "static", "dynamic"], default="",
                   help="write Grad-CAM overlays for step frames")
    p.add_argument("--audio_classes", type=int, choices=[7, 8], default=8)
    p.add_argument("--audio_head", choices=["v1", "v2", "v3"], default=None,
                   help="default: v3 for 8-class, v2 for 7-class (reference pairing)")
    p.add_argument("--audio_padding", choices=["mean", "constant", "repeat"],
                   default="mean")
    p.add_argument("--audio_step", type=float, default=0.5)
    p.add_argument("--weights_dir", type=str, default="weights")
    p.add_argument("--data_parallel", type=int, default=1)
    p.add_argument("--profile_dir", type=str, default="",
                   help="write a jax.profiler trace of the run here")
    p.add_argument("--calibrate", action="store_true",
                   help="one-shot on-device batch-size calibration (cached "
                        "per device kind; pipeline/calibrate.py)")
    p.add_argument("--detect_stride", type=int, default=None,
                   help="detect every Nth frame (default 1; turbo preset: "
                        "2); boxes interpolated between detections, CNN "
                        "still runs every frame")
    p.add_argument("--cnn_stride", type=int, default=None,
                   help="run the static CNN at most every N frames "
                        "(plus every dynamic step frame — the LSTM stream "
                        "stays exact); skipped frames hold the last "
                        "computed static probs for < N frame-times even "
                        "under sparse face presence. 0 = align to the "
                        "dynamic step cadence (the legacy reference "
                        "visual pipeline's own sampling rate). Default 1 "
                        "(reference-exact); the max preset sets 0.")
    p.add_argument("--serving_profile",
                   choices=["parity", "balanced", "int8", "int8_s2",
                            "int8_448", "int8_448_s2", "fast", "turbo",
                            "max"],
                   default="parity",
                   help="measured speed/quality presets (BENCH_NOTES.md "
                        "round-4 table): parity = reference-exact r50@640 "
                        "bf16; balanced = exact math/weights at the 448 "
                        "bucket (recall tradeoff below ~48 px native faces "
                        "only — PARITY.md bucket table); int8 = parity "
                        "models, calibrated int8 convs; int8_s2 = int8 + "
                        "detect stride 2 with the gap-mode tracker (full "
                        "640 bucket, ~93 v-s/s at 0.992 AV agreement — "
                        "PARITY.md frontier); int8_448 = int8 at the 448 "
                        "bucket, per-frame detection (0.992 AV agreement); "
                        "fast = int8 + the "
                        "reference's mobilenet0.25 backbone; turbo = fast "
                        "+ 448 bucket + detect stride 2; max = turbo + "
                        "static CNN at the dynamic step cadence "
                        "(--cnn_stride 0; dynamic stream stays exact). "
                        "EVERY quantized "
                        "preset (int8*, fast, turbo) shares the audio conv "
                        "feature extractor across the 8x-overlapped "
                        "windows by default (per-clip instead of the "
                        "reference's per-window normalization; measured "
                        "zero argmax drift — PARITY.md); --exact_audio "
                        "restores reference-exact per-window extraction. "
                        "Explicit flags override the preset.")
    p.add_argument("--exact_audio", action="store_true",
                   help="keep the reference's per-window audio extraction "
                        "even on quantized presets (disables the "
                        "shared-extractor default; drift bound in "
                        "PARITY.md is ~0 either way)")
    p.add_argument("--compile_cache_dir", type=str, default=None,
                   help="persistent XLA compilation cache directory "
                        "(default $AVCER_COMPILE_CACHE, else "
                        "~/.cache/avcer_tpu/xla; AVCER_COMPILE_CACHE=0 or "
                        "an empty value disables): programs compile once "
                        "per machine/jax-version and later process starts "
                        "load them from disk, eliminating the ~20-40 "
                        "s/program cold-start (measured 60 s -> 0.9 s)")
    p.add_argument("--fused", action="store_true",
                   help="run the r50 detector + emotion-CNN bottleneck "
                        "chains as fused Pallas VMEM programs (exact "
                        "reformulation for bf16 presets; int8 presets use "
                        "the quant fold — PARITY.md). No-op for the "
                        "mobilenet backbone presets.")
    a = p.parse_args(argv)
    if a.compile_cache_dir != "":  # explicit empty string disables
        from avcer_tpu.core.tpuenv import enable_compile_cache

        enable_compile_cache(a.compile_cache_dir or "")
    head = a.audio_head or ("v3" if a.audio_classes == 8 else "v2")
    quant = "none" if a.serving_profile in ("parity", "balanced") else "int8"
    backbone = (
        "mobilenet0.25" if a.serving_profile in ("fast", "turbo", "max")
        else "resnet50"
    )
    # None = flag not given -> preset decides (an EXPLICIT --long_side 640
    # with the turbo preset must stay 640, so the default is a sentinel)
    small_bucket = a.serving_profile in ("turbo", "max", "balanced",
                                         "int8_448", "int8_448_s2")
    strided = a.serving_profile in ("turbo", "max", "int8_s2",
                                    "int8_448_s2")
    long_side = a.long_side if a.long_side is not None else (
        448 if small_bucket else 640)
    stride = a.detect_stride if a.detect_stride is not None else (
        2 if strided else 1)
    cfg = PipelineConfig(
        detector=DetectorConfig(
            long_side=long_side, stride=stride, backbone=backbone, quant=quant,
            # the mnet programs underfill the chip at small batches
            # (measured exp_r9/r10): @448 0.085 ms/frame at b32 -> 0.0319
            # at b128 (knee; b256 regresses), @640 0.182 -> 0.0711 at b128
            # (knee). The mobilenet presets serve b128 (a 5 s dispatch
            # window at 25 fps — throughput profiles). r50 shows NO batch
            # win (@448 0.202 at b32 vs 0.209 at b64; @640 saturated), so
            # the r50 presets keep the calibrated 32.
            batch_size=128
            if a.serving_profile in ("fast", "turbo", "max") else 32,
            fused_layer1=a.fused, fused_tails=a.fused, fused_entries=a.fused,
            fused_ssh=a.fused, fused_fpn=a.fused,
        ),
        visual=VisualConfig(
            quant=quant, fused=a.fused, fused_entries=a.fused,
            cnn_stride=a.cnn_stride if a.cnn_stride is not None else (
                0 if a.serving_profile == "max" else 1),
        ),
        calibrate=a.calibrate,
        audio=AudioConfig(
            num_classes=a.audio_classes, head=head,
            padding=a.audio_padding, step_sec=a.audio_step, quant=quant,
            # every quantized preset shares the conv feature extractor
            # across the 8x-overlapped windows (round-4 default, VERDICT r3
            # Next #4): the only approximation is per-clip instead of
            # per-window normalization, measured at ZERO argmax flips even
            # on adversarially non-stationary audio (PARITY.md
            # shared-extractor study); --exact_audio restores the
            # reference's per-window extraction
            shared_extractor=quant == "int8" and not a.exact_audio,
        ),
        fusion=FusionConfig(
            use_published_weights=not a.no_published_weights,
            ce_weights_type=a.ce_weights_type,
            ce_mask=not a.no_ce_mask,
        ),
        mesh=MeshConfig(data=a.data_parallel),
        save_face_crops=a.save_face_crops,
        heatmaps=a.heatmaps,
        weights_dir=a.weights_dir,
    )
    return cfg, a.path_video, a.path_save, a.profile_dir
