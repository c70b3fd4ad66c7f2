"""End-to-end throughput benchmark on real hardware.

Synthesizes a 25 fps clip + audio track, runs the FULL flagship pipeline
(RetinaFace detect at the 640 bucket -> crop -> static ResNet50 + dynamic
LSTM on every frame -> wav2vec2-large ExprModelV3 over 4 s / 0.5 s windows
-> fused compound decision) and reports processed video-seconds per
wall-second — the reciprocal of the reference's real-time factor
(/root/reference/src/run.py:306-308).

Weights are randomly initialized (the reference does not vendor its
checkpoints); compute cost is identical to the published models. To force
the full visual workload on synthetic frames (random weights detect no
faces), the top-scoring detector candidate on every frame is treated as the
face — the detector still runs its complete forward + decode + NMS.

``vs_baseline`` compares against BASELINE.json's north-star target of
200 video-sec/sec/chip (>= 8x real time).

Output: ONE json line {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# persistent XLA compilation cache: repeat bench runs skip the ~10 min of
# detector/CNN/wav2vec2 compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

# fused Pallas chains need >16MiB scoped VMEM (core/tpuenv.py rationale);
# must be in env before the first backend init
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from avcer_tpu.core.tpuenv import ensure_scoped_vmem  # noqa: E402

ensure_scoped_vmem()

NORTH_STAR = 200.0  # video-sec/sec per chip (BASELINE.json)


def make_clip(path_video: str, path_wav: str, seconds: float = 20.0,
              fps: int = 25, w: int = 640, h: int = 360) -> None:
    import cv2

    from avcer_tpu.pipeline.media import write_wav

    rng = np.random.default_rng(0)
    vw = cv2.VideoWriter(path_video, cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h))
    assert vw.isOpened()
    n = int(seconds * fps)
    base = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    for i in range(n):
        frame = base.copy()
        # moving bright square (keeps JPEG sizes realistic, content dynamic)
        x0 = (i * 7) % (w - 120)
        y0 = (i * 3) % (h - 120)
        frame[y0 : y0 + 120, x0 : x0 + 120] = rng.integers(
            100, 255, size=(120, 120, 3), dtype=np.uint8
        )
        vw.write(frame)
    vw.release()
    wav = (rng.normal(size=int(seconds * 16000)) * 0.1).astype(np.float32)
    write_wav(path_wav, wav, 16000)


class ForceTopFace:
    """Wrap the real detect stage: full detector compute, but always treat
    the top-scoring candidate as a face (random weights -> no 0.8+ scores)."""

    def __init__(self, inner, h, w):
        self.inner = inner
        self.h, self.w = h, w

    def dispatch(self, frames):
        return self.inner.dispatch(frames)

    def prepare_wire(self, frames):
        return self.inner.prepare_wire(frames)

    def dispatch_wire(self, wire, scale):
        return self.inner.dispatch_wire(wire, scale)

    def unpack(self, packed_np, scale):
        det = self.inner.unpack(packed_np, scale)
        det.keep = np.array(det.keep)
        det.scores = np.array(det.scores)
        det.boxes = np.array(det.boxes)
        det.keep[:, 0] = True
        det.scores[:, 0] = np.maximum(det.scores[:, 0], 0.9)
        h, w = self.h, self.w
        for i in range(det.boxes.shape[0]):
            x1, y1, x2, y2 = det.boxes[i, 0]
            if not (0 <= x1 < x2 <= w and 0 <= y1 < y2 <= h and (x2 - x1) > 8 and (y2 - y1) > 8):
                det.boxes[i, 0] = [w * 0.25, h * 0.25, w * 0.75, h * 0.75]
        return det


def _preflight_device(timeout_s: float = 240.0) -> None:
    """Fail fast (bounded) instead of hanging forever when the TPU relay is
    unreachable: backend init through a dead tunnel blocks in C++ with no
    Python-level timeout, so probe it in a subprocess first."""
    import subprocess

    probe = (
        "import os, jax, jax.numpy as jnp;"
        "p = os.environ.get('AVCER_PLATFORM');"
        "p and jax.config.update('jax_platforms', p);"
        "d = jax.devices();"
        "(jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready();"
        "print(d[0].platform)"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", probe], capture_output=True, text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        print(json.dumps({
            "metric": "end_to_end_throughput", "value": 0.0,
            "unit": "video-sec/sec/chip", "vs_baseline": 0.0,
            "error": f"device backend init exceeded {timeout_s:.0f}s "
                     "(TPU relay unreachable) — no measurement possible",
        }))
        sys.exit(1)
    if out.returncode != 0:
        print(json.dumps({
            "metric": "end_to_end_throughput", "value": 0.0,
            "unit": "video-sec/sec/chip", "vs_baseline": 0.0,
            "error": "device backend init failed: " + out.stderr[-400:],
        }))
        sys.exit(1)


def main() -> None:
    import logging

    logging.getLogger("avcer_tpu").setLevel(logging.ERROR)

    # AVCER_PLATFORM=cpu lets the bench logic be exercised without the TPU
    # relay (numbers are then CPU numbers — for plumbing tests only)
    plat = os.environ.get("AVCER_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    _preflight_device()

    from avcer_tpu.core.config import PipelineConfig, DetectorConfig
    from avcer_tpu.pipeline.builder import build_pipeline

    workdir = os.path.join("/tmp", "avcer_bench")
    os.makedirs(workdir, exist_ok=True)
    video = os.path.join(workdir, "bench_clip.avi")
    wavp = os.path.join(workdir, "bench_clip.wav")
    seconds = float(os.environ.get("BENCH_SECONDS", "20"))
    if not os.path.exists(video):
        make_clip(video, wavp, seconds=seconds)

    cfg = PipelineConfig(
        detector=DetectorConfig(long_side=640, batch_size=32),
        weights_dir=os.path.join(workdir, "no_weights"),
        save_probs=False,
        save_plot=False,
    )
    pipe = build_pipeline(cfg)
    pipe.detect = ForceTopFace(pipe.detect, 360, 640)

    # warmup: compile all programs
    clip = pipe.run(video, "")
    # timed run
    t0 = time.perf_counter()
    clip = pipe.run(video, "")
    wall = time.perf_counter() - t0
    video_sec = clip.total_frames / max(clip.fps, 1)
    value = video_sec / wall

    print(
        json.dumps(
            {
                "metric": "end_to_end_throughput",
                "value": round(value, 3),
                "unit": "video-sec/sec/chip",
                "vs_baseline": round(value / NORTH_STAR, 4),
            }
        )
    )
    # turbo-profile e2e diagnostic (stderr): same clip through the measured
    # fastest serving preset — mnet@448 int8 stride-2, int8 CNN, int8 +
    # shared-extractor audio. Shows how e2e scales when wire bytes (2x
    # smaller letterbox) and device time drop; the stdout metric above
    # stays the parity profile. Disable with BENCH_TURBO_E2E=0.
    if os.environ.get("BENCH_TURBO_E2E", "1") == "1":
        try:
            from avcer_tpu.core.config import (
                AudioConfig, PipelineConfig as _PC, VisualConfig,
            )

            cfg_t = _PC(
                detector=DetectorConfig(
                    long_side=448, batch_size=32, stride=2,
                    backbone="mobilenet0.25", quant="int8",
                ),
                visual=VisualConfig(quant="int8"),
                audio=AudioConfig(quant="int8", shared_extractor=True),
                weights_dir=os.path.join(workdir, "no_weights"),
                save_probs=False,
                save_plot=False,
            )
            pipe_t = build_pipeline(cfg_t)
            pipe_t.detect = ForceTopFace(pipe_t.detect, 360, 640)
            pipe_t.run(video, "")  # warmup/compile
            t0 = time.perf_counter()
            clip_t = pipe_t.run(video, "")
            wall_t = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "end_to_end_turbo": round(
                            clip_t.total_frames / max(clip_t.fps, 1) / wall_t, 3
                        ),
                        "turbo_stage_seconds": {
                            k: round(v, 3) for k, v in clip_t.timings.items()
                        },
                    }
                ),
                file=sys.stderr,
            )
        except Exception as e:  # diagnostic only
            print(json.dumps({"turbo_e2e_error": str(e)[:300]}), file=sys.stderr)

    print(
        json.dumps({"detail_stage_seconds": {k: round(v, 3) for k, v in clip.timings.items()},
                    "video_seconds": video_sec}),
        file=sys.stderr,
    )

    # Secondary context metric: pure device throughput of the model stack
    # with inputs already resident (what this pipeline does on a directly
    # attached v5e, where PCIe h2d is ~10 GB/s instead of this dev harness's
    # tunneled PJRT link).
    try:
        import jax
        import jax.numpy as jnp

        def barrier(x):
            np.asarray(jax.tree.leaves(x)[0])

        def time_slope(fn, n1=3, n2=15):
            """Per-dispatch seconds via the fetch-barrier slope (cancels the
            constant fetch latency of the relay link). Only valid for
            programs >= ~5 ms/dispatch (BENCH_NOTES round-4: relay jitter
            dominates sub-ms slopes); smaller programs use time_inloop."""
            barrier(fn())
            t0 = time.perf_counter()
            out = None
            for _ in range(n1):
                out = fn()
            barrier(out)
            ta = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(n2):
                out = fn()
            barrier(out)
            tb = time.perf_counter() - t0
            return (tb - ta) / (n2 - n1)

        def time_inloop(step, iters):
            """Per-call seconds via ONE dispatch of a jitted fori_loop that
            executes the program ``iters`` times on device (the trustworthy
            method for sub-5 ms programs on this relay — BENCH_NOTES
            round-4, experiments/exp_r4b_device.py). ``step(i)`` must
            consume the loop index (anti-LICM); its outputs are reduced to
            a scalar (anti-DCE)."""

            def body(i, acc):
                y = step(i)
                return acc + sum(
                    l.astype(jnp.float32).sum() for l in jax.tree.leaves(y)
                ) * jnp.float32(1e-12)

            run = jax.jit(
                lambda: jax.lax.fori_loop(
                    0, iters, body, jnp.zeros((), jnp.float32)
                )
            )
            np.asarray(run())  # compile + warm
            t0 = time.perf_counter()
            np.asarray(run())
            return (time.perf_counter() - t0) / iters

        inner = pipe.detect.inner
        frames = np.random.default_rng(1).integers(
            0, 255, (32, 360, 640, 3), np.uint8
        )
        packed, scale, frames_dev = inner.dispatch(frames)
        jax.block_until_ready(packed)
        # time the jitted detect program on device-resident wire data at the
        # flagship bucket and the documented speed buckets (PARITY.md table)
        from avcer_tpu.pipeline.detect import DetectStage
        from avcer_tpu.core.config import DetectorConfig as _DC

        from avcer_tpu.models.retinaface import RetinaFace as _RF

        mnet_vars = _RF(backbone="mobilenet0.25", dtype=jnp.bfloat16).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
        )
        # measured serving-profile detector configs (quality tradeoffs in
        # PARITY.md): r50@640 exact = reference-parity; int8 = calibrated
        # quantized path; mobilenet0.25 = the reference's own fast backbone
        detect_ms = {}
        # inloop_iters None -> slope timing (program >= ~5 ms/dispatch);
        # otherwise in-program fori_loop repetitions (sub-5 ms programs)
        for name, backbone, bucket, quant, dvars, inloop_iters, extra in (
            ("r50_640", "resnet50", 640, "none", inner.variables, None, {}),
            # exact math, layer1 (+ layer2/3 identity tails) as fused Pallas
            # programs (ops/pallas/fused_resnet_kernel.py)
            ("r50_640_fused", "resnet50", 640, "none", inner.variables, None,
             {"fused_layer1": True, "fused_tails": True}),
            # + stride-2 entries fused ("s2ds"): layer2 as one program,
            # + SSH+heads fused per FPN scale (fused_ssh_kernel)
            ("r50_640_fusede", "resnet50", 640, "none", inner.variables, None,
             {"fused_layer1": True, "fused_tails": True,
              "fused_entries": True, "fused_ssh": True, "fused_fpn": True}),
            ("r50_448", "resnet50", 448, "none", inner.variables, None, {}),
            ("r50_448_fused", "resnet50", 448, "none", inner.variables, 150,
             {"fused_layer1": True, "fused_tails": True}),
            ("r50_448_fusede", "resnet50", 448, "none", inner.variables, 150,
             {"fused_layer1": True, "fused_tails": True,
              "fused_entries": True, "fused_ssh": True, "fused_fpn": True}),
            ("r50_640_int8", "resnet50", 640, "int8", inner.variables, None,
             {}),
            ("r50_448_int8", "resnet50", 448, "int8", inner.variables, 150,
             {}),
            # int8 weights/activations INSIDE the fused Pallas chains
            # (TVBottleneckFolded quant fold; same act_scales tree)
            ("r50_640_int8f", "resnet50", 640, "int8", inner.variables, None,
             {"fused_layer1": True, "fused_tails": True,
              "fused_entries": True, "fused_ssh": True, "fused_fpn": True}),
            ("r50_448_int8f", "resnet50", 448, "int8", inner.variables, 150,
             {"fused_layer1": True, "fused_tails": True,
              "fused_entries": True, "fused_ssh": True, "fused_fpn": True}),
            ("mnet_640_int8", "mobilenet0.25", 640, "int8", mnet_vars, 200,
             {}),
            ("mnet_448_int8", "mobilenet0.25", 448, "int8", mnet_vars, 400,
             {}),
        ):
            stage = (
                inner
                if (backbone, bucket, quant, extra) == (
                    cfg.detector.backbone, cfg.detector.long_side,
                    cfg.detector.quant, {},
                )
                else DetectStage(
                    _DC(long_side=bucket, batch_size=32, backbone=backbone,
                        quant=quant, **extra),
                    dvars,
                )
            )
            try:
                wire_np, _s = stage.prepare_wire(frames)
                wire = jnp.asarray(wire_np)
                jax.block_until_ready(wire)
                if inloop_iters:
                    sec = time_inloop(
                        lambda i, s=stage, w=wire: s._jit_forward(
                            s.variables, w + (i % 2).astype(w.dtype)
                        ),
                        inloop_iters,
                    )
                else:
                    sec = time_slope(
                        lambda s=stage, w=wire: s._jit_forward(s.variables, w),
                        n1=8, n2=40,
                    )
                detect_ms[name] = sec / 32 * 1e3
            except Exception as e:  # one failed variant must not kill the rest
                print(json.dumps({f"detect_{name}_error": str(e)[:200]}),
                      file=sys.stderr)
        per_frame_detect = detect_ms["r50_640"] / 1e3
        # crop-CNN on device-resident frames at the configured batch size
        # (256 = calibrated optimum) + sweep for reference
        sweep = {}
        for bs in (128, 256):
            idx_b = jnp.asarray((np.arange(bs) % 32).astype(np.int32))
            boxes_b = jnp.asarray(
                np.tile(np.array([[160, 90, 480, 270]], np.int32), (bs, 1))
            )
            sec = time_slope(
                lambda: pipe.visual._jit_static_from_frames(
                    pipe.visual.static_variables, frames_dev, idx_b, boxes_b
                ),
                n1=5, n2=25,
            )
            sweep[bs] = round(sec / bs * 1e3, 3)
        per_frame_cnn = sweep[256] / 1e3
        print(json.dumps({"cnn_ms_per_frame_by_batch": sweep}), file=sys.stderr)
        # int8 CNN (used by the int8/turbo profiles)
        from avcer_tpu.pipeline.visual import VisualStage as _VS

        idx_b = jnp.asarray((np.arange(256) % 32).astype(np.int32))
        boxes_b = jnp.asarray(
            np.tile(np.array([[160, 90, 480, 270]], np.int32), (256, 1))
        )
        per_frame_cnn_int8 = None
        for entries in (False, True):  # XLA int8 vs int8 fused chains
            try:
                vq = _VS(
                    pipe.visual.static_variables, pipe.visual.lstm_variables,
                    dtype=jnp.bfloat16, batch_size=256, quant="int8",
                    fused=entries, fused_entries=entries,
                )
                sec = time_slope(
                    lambda: vq._jit_static_from_frames(
                        vq.static_variables, frames_dev, idx_b, boxes_b
                    ),
                    n1=5, n2=25,
                )
                if per_frame_cnn_int8 is None or sec / 256 < per_frame_cnn_int8:
                    per_frame_cnn_int8 = sec / 256
            except Exception as e:
                if per_frame_cnn_int8 is None:
                    raise
                print(json.dumps({"cnn_int8_fused_error": str(e)[:200]}),
                      file=sys.stderr)
        # exact-math fused-chain CNN (models/emotion_resnet.py fused);
        # measure tails-only and +stride-2 entries, keep the faster
        per_frame_cnn_fused = None
        try:
            for entries in (False, True):
                vf = _VS(
                    pipe.visual.static_variables, pipe.visual.lstm_variables,
                    dtype=jnp.bfloat16, batch_size=256, fused=True,
                    fused_entries=entries,
                )
                sec = time_slope(
                    lambda: vf._jit_static_from_frames(
                        vf.static_variables, frames_dev, idx_b, boxes_b
                    ),
                    n1=5, n2=25,
                )
                if per_frame_cnn_fused is None or sec / 256 < per_frame_cnn_fused:
                    per_frame_cnn_fused = sec / 256
        except Exception as e:
            print(json.dumps({"cnn_fused_error": str(e)[:200]}),
                  file=sys.stderr)
        # audio: one 4 s window per 0.5 s of video -> 2 windows per video-sec
        wav_dev = jnp.asarray(np.random.default_rng(2).normal(size=200_001).astype(np.float32))
        starts = jnp.asarray(np.arange(16, dtype=np.int32) * 8000)
        wl = jnp.asarray(136_000, jnp.int32)
        sec = time_slope(
            lambda: pipe.audio._jit_forward_from_wav(
                pipe.audio.variables, wav_dev, wl, starts, padding="mean"
            ),
            n1=4, n2=20,
        )
        per_window_audio = sec / 16

        # turbo audio path (AudioConfig int8 + shared_extractor, the preset
        # the turbo profile actually serves): conv features ONCE per clip +
        # int8 transformer head per window. Amortize the shared extractor
        # over a 60 s wav (113 windows) so its one-per-clip cost lands where
        # it lands in serving; programs stay >5 ms/dispatch (slope validity
        # floor on this relay — BENCH_NOTES).
        from avcer_tpu.core.config import AudioConfig as _AC
        from avcer_tpu.pipeline.audio_stage import AudioStage as _AS

        aq = _AS(pipe.audio.variables, _AC(quant="int8", shared_extractor=True))
        # int8 exact per-window path (the int8/fast presets: quantized
        # encoder, reference-exact per-window extraction + normalization)
        sec = time_slope(
            lambda: aq._jit_forward_from_wav(
                aq.variables, wav_dev, wl, starts, padding="mean"
            ),
            n1=4, n2=20,
        )
        per_window_audio_int8 = sec / 16
        wav60 = jnp.asarray(
            np.random.default_rng(3).normal(size=960_000 + 64_001).astype(np.float32)
        )
        wl60 = jnp.asarray(960_000, jnp.int32)
        n_win60 = (960_000 - 64_000) // 8_000 + 1  # full 4 s windows
        sec_shared = time_slope(
            lambda: aq._jit_shared_features(aq.variables, wav60, wl60),
            n1=3, n2=12,
        )
        feats60 = aq._jit_shared_features(aq.variables, wav60, wl60)
        jax.block_until_ready(feats60)
        # head per 16-window dispatch is ~1-2 ms -> in-loop timing
        sec_head = time_inloop(
            lambda i, f=feats60: aq._jit_from_features(
                aq.variables,
                f * (1.0 + i.astype(f.dtype) * jnp.asarray(1e-7, f.dtype)),
                starts,
            ),
            300,
        )
        per_window_audio_turbo = sec_shared / n_win60 + sec_head / 16
        fps = 25.0

        def vss(det_ms_frame: float, stride: int = 1, cnn: float | None = None,
                audio: float | None = None) -> float:
            """Modelled device video-sec/sec: detect every stride-th frame,
            CNN every frame, 2 audio windows per video-sec."""
            per_sec = (
                (det_ms_frame / 1e3 / stride + (cnn or per_frame_cnn)) * fps
                + (audio or per_window_audio) * 2
            )
            return round(1.0 / per_sec, 1)

        # Documented serving profiles (quality tradeoffs in PARITY.md):
        # parity = reference-exact per-frame r50 detection at the 640
        # bucket; int8 = calibrated quantized convs (drift-gated in tests);
        # mnet = the reference's own mobilenet0.25 backbone option; stride
        # detects every Nth frame with interpolated boxes between
        # (per-detection quality preserved); the 448 bucket trades recall
        # below ~48 px native face size.
        ci = per_frame_cnn_int8
        ai = per_window_audio_int8
        at = per_window_audio_turbo
        def best_fused(base: str) -> float | None:
            """Fastest measured exact-math fused detector row for a bucket
            (tails-only vs +stride-2 entries — both bit-compatible exact
            reformulations, so min() is the honest serving pick)."""
            rows = [detect_ms[k] for k in (f"{base}_fused", f"{base}_fusede")
                    if k in detect_ms]
            return min(rows) if rows else None

        def best_int8(base: str) -> float:
            """Fastest int8 detector row (XLA QConv vs fused chains — same
            quantization semantics, drift-gated equivalent)."""
            rows = [detect_ms[k] for k in (f"{base}_int8", f"{base}_int8f")
                    if k in detect_ms]
            return min(rows)

        profiles = {
            "parity_r50_640": vss(detect_ms["r50_640"], 1),
            **({
                # exact math with the detector layer1 + layers 2-3 AND the
                # emotion CNN's chains as fused Pallas programs —
                # parity-quality (same checkpoint trees, same rounding points)
                "parity_r50_640_fused": vss(
                    best_fused("r50_640"), 1,
                    per_frame_cnn_fused or per_frame_cnn,
                ),
            } if best_fused("r50_640") else {}),
            # exact math + weights at the 448 letterbox bucket: quality cost
            # is detector recall below ~48 px native faces only (PARITY.md
            # bucket table); every model output else bit-matches parity
            "balanced_r50_448": vss(detect_ms["r50_448"], 1),
            **({
                # balanced bucket, exact math, fused Pallas chains — zero
                # quantization
                "balanced_r50_448_fused": vss(
                    best_fused("r50_448"), 1,
                    per_frame_cnn_fused or per_frame_cnn,
                ),
            } if best_fused("r50_448") else {}),
            # balanced bucket + calibrated int8 (both tradeoffs drift-gated)
            "int8_r50_448": vss(best_int8("r50_448"), 1, ci, ai),
            "int8_r50_640": vss(best_int8("r50_640"), 1, ci, ai),
            "int8_r50_640_s2": vss(best_int8("r50_640"), 2, ci, ai),
            "fast_mnet_640_int8": vss(detect_ms["mnet_640_int8"], 1, ci, ai),
            "turbo_mnet_448_int8_s2": vss(detect_ms["mnet_448_int8"], 2, ci, at),
        }
        print(
            json.dumps(
                {
                    "device_only_throughput": profiles["parity_r50_640"],
                    "unit": "video-sec/sec/chip (inputs device-resident, parity profile)",
                    "per_frame_detect_ms": {
                        str(k): round(v, 3) for k, v in detect_ms.items()
                    },
                    "per_frame_cnn_ms": round(per_frame_cnn * 1e3, 3),
                    "per_frame_cnn_int8_ms": round(per_frame_cnn_int8 * 1e3, 3),
                    **({"per_frame_cnn_fused_ms": round(
                        per_frame_cnn_fused * 1e3, 3)}
                       if per_frame_cnn_fused else {}),
                    "per_window_audio_ms": round(per_window_audio * 1e3, 3),
                    "per_window_audio_int8_ms": round(
                        per_window_audio_int8 * 1e3, 3
                    ),
                    "per_window_audio_turbo_ms": round(
                        per_window_audio_turbo * 1e3, 3
                    ),
                    "device_profiles_video_sec_per_sec": profiles,
                }
            ),
            file=sys.stderr,
        )
    except Exception as e:  # context metric only — never fail the bench
        print(json.dumps({"device_only_metric_error": str(e)}), file=sys.stderr)


if __name__ == "__main__":
    main()
