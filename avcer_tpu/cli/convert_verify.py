"""Real-weights readiness kit: one command that validates a published
checkpoint release end to end.

Pointed at a ``weights_dir`` laid out exactly like the reference's
Google-Drive release (/root/reference/README.md:15; file names per
get_prob_video.py:22,51, get_prob_audio_8_cl.py:154-158,
retina_face_predictor.py:44-46), this runs, per checkpoint family found:

1. torch state-dict load + conversion (core/convert.py) with a parameter
   accounting check (every converted scalar traced back to torch scalars);
2. activation parity against the ORIGINAL torch model classes when a
   reference source tree is importable (``--reference_src``, auto-probed):
   identical probe input through both models, max-abs logit diff asserted
   under a per-family fp32 tolerance;
3. orbax caching (core/checkpoint.save_converted) so later runs skip the
   conversion.

Then optionally:

4. ``--calib_video``: int8 activation-scale recalibration on frames/audio of
   user-supplied representative clips (the scales ship in the cache);
5. ``--golden``: a full end-to-end pipeline run on a synthetic clip with the
   converted weights, asserting the reference artifact set is produced.

Usage::

    python -m avcer_tpu.cli.convert_verify --weights_dir weights/ \
        [--reference_src /path/to/AVCER/src] [--calib_video clip.avi] [--golden]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Any, Callable, Optional

import numpy as np

FAMILIES = ("emotion_resnet50", "temporal_lstm", "retinaface",
            "expr_model_8cl", "expr_model_7cl")

#: probe tolerances: fp32 activation parity between torch and the converted
#: JAX model (same bounds the differential test suite uses)
ATOL = {
    "emotion_resnet50": 1e-3,
    "temporal_lstm": 1e-4,
    "retinaface": 2e-3,
    "expr_model_8cl": 2e-3,
    "expr_model_7cl": 2e-3,
}


def _count_params(tree: Any) -> int:
    import jax

    return int(sum(np.prod(np.shape(x)) for x in jax.tree.leaves(tree)))


def _torch_param_count(sd: dict, family: str) -> int:
    """Scalars in the torch checkpoint that the converter is expected to
    carry over (running BN stats convert; step counters and the unused
    masked_spec_embed / position_ids buffers do not)."""
    skip = ("num_batches_tracked", "masked_spec_embed", "position_ids",
            # deterministic sinusoid buffer, recomputed on the JAX side
            "positional_encoding.pe",
            # declared but never applied in the reference's forward
            # (attention_layers.py:47,50-57) — dead scalars in the release
            # files; HF wav2vec2 has no key with this substring
            "feed_forward.layer_norm")
    # weight-norm parametrizations (wav2vec2 pos_conv): the converter fuses
    # the (gain, direction) pair into ONE kernel of the direction's shape,
    # so the gain tensor is merged rather than carried — don't count it
    skip_exact = {
        k
        for k in sd
        if (k.endswith("parametrizations.weight.original0")
            and k[: -len("original0")] + "original1" in sd)
        or (k.endswith("weight_g") and k[: -len("weight_g")] + "weight_v" in sd)
    }
    return int(
        sum(
            int(np.prod(tuple(v.shape)))
            for k, v in sd.items()
            if not any(s in k for s in skip) and k not in skip_exact
        )
    )


def _add_reference_paths(reference_src: str) -> None:
    for p in (reference_src, os.path.join(reference_src, "data", "face_detection")):
        if os.path.isdir(p) and p not in sys.path:
            sys.path.insert(0, p)


def _probe_parity(
    family: str, sd: dict, variables: dict, reference_src: str
) -> dict:
    """Run the identical probe through the original torch class and the
    converted JAX model; return {max_abs_diff, status}. Degrades to
    status='skipped (<reason>)' when the torch class cannot be built (e.g.
    torchvision absent for RetinaFace)."""
    import jax
    import jax.numpy as jnp
    import torch

    _add_reference_paths(reference_src)
    rng = np.random.default_rng(0)
    # sd arrives as numpy (load_torch_state_dict output); torch's
    # load_state_dict requires tensors
    sd = {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()}
    try:
        if family == "emotion_resnet50":
            from architectures.video import ResNet50  # type: ignore

            from avcer_tpu.models.emotion_resnet import EmotionResNet50

            real = ResNet50(num_classes=7, channels=3).eval()
            real.load_state_dict(sd)
            x = rng.normal(size=(2, 224, 224, 3)).astype(np.float32) * 60
            with torch.no_grad():
                want = real(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
            got, _ = jax.jit(
                EmotionResNet50(num_classes=7, dtype=jnp.float32).apply
            )(variables, jnp.asarray(x))
        elif family == "temporal_lstm":
            from architectures.video import LSTMPyTorch  # type: ignore

            from avcer_tpu.models.temporal_lstm import TemporalLSTM

            real = LSTMPyTorch().eval()
            real.load_state_dict(sd)
            x = rng.normal(size=(2, 10, 512)).astype(np.float32)
            with torch.no_grad():
                want = real(torch.from_numpy(x)).numpy()
            got = jax.jit(TemporalLSTM(dtype=jnp.float32).apply)(
                variables, jnp.asarray(x)
            )
        elif family == "retinaface":
            from ibug.face_detection.retina_face import config as ref_cfg  # type: ignore
            from ibug.face_detection.retina_face.retina_face import (  # type: ignore
                RetinaFace as TorchRF,
            )

            from avcer_tpu.models.retinaface import RetinaFace

            backbone = (
                "resnet50"
                if any(k.startswith("body.layer4") for k in sd)
                else "mobilenet0.25"
            )
            cfg = (
                ref_cfg.cfg_re50 if backbone == "resnet50" else ref_cfg.cfg_mnet
            )
            real = TorchRF(cfg=cfg, phase="test").eval()
            real.load_state_dict(sd)
            x = rng.normal(size=(1, 3, 96, 80)).astype(np.float32) * 20
            with torch.no_grad():
                want = real(torch.from_numpy(x))[0].numpy()
            got = jax.jit(
                RetinaFace(backbone=backbone, dtype=jnp.float32).apply
            )(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))[0]
        else:  # expr_model_{8,7}cl
            num_classes = 8 if family.endswith("8cl") else 7
            if num_classes == 8:
                import architectures.audio_8_cl as mod  # type: ignore
            else:
                import architectures.audio_7_cl as mod  # type: ignore
            from transformers import Wav2Vec2Config as HFConfig

            from avcer_tpu.models.audio_heads import ExprModel
            from avcer_tpu.models.wav2vec2 import Wav2Vec2Config

            num_layers = (
                1
                + max(
                    int(k.split(".")[3])
                    for k in sd
                    if k.startswith("wav2vec2.encoder.layers.")
                )
            )
            hidden = int(sd["wav2vec2.encoder.layers.0.attention.q_proj.weight"].shape[0])
            hf_cfg = HFConfig(
                hidden_size=hidden,
                num_hidden_layers=num_layers,
                num_attention_heads=16,
                intermediate_size=4 * hidden,
                do_stable_layer_norm=True,
                feat_extract_norm="layer",
                # the robust/xlsr family the release fine-tunes ships conv
                # biases; derive from the checkpoint rather than assume
                conv_bias="wav2vec2.feature_extractor.conv_layers.0.conv.bias"
                in sd,
                apply_spec_augment=False,
                layerdrop=0.0,
            )
            variant = "v3" if num_classes == 8 else "v2"
            cls = {"v1": mod.ExprModelV1, "v2": mod.ExprModelV2,
                   "v3": mod.ExprModelV3}[variant]
            real = cls(hf_cfg).eval()
            real.load_state_dict(sd)
            x = rng.normal(size=(1, 17000)).astype(np.float32)
            with torch.no_grad():
                want = real(torch.from_numpy(x)).numpy()
            model = ExprModel(
                variant=variant, num_classes=num_classes,
                wav2vec2_config=Wav2Vec2Config(num_layers=num_layers),
                dtype=jnp.float32,
            )
            got = jax.jit(model.apply)(variables, jnp.asarray(x))
    except ImportError as e:
        return {"status": f"skipped ({e.name or e} not importable)"}
    except Exception as e:  # torch load_state_dict mismatch etc.
        return {"status": f"FAIL ({type(e).__name__}: {e})"}
    diff = float(np.max(np.abs(np.asarray(got) - want)))
    ok = diff < ATOL[family]
    return {"max_abs_diff": diff, "atol": ATOL[family],
            "status": "ok" if ok else "FAIL"}


def _expr_layers(sd: dict) -> int:
    return 1 + max(
        int(k.split(".")[3])
        for k in sd
        if k.startswith("wav2vec2.encoder.layers.")
    )


def _structure_check(family: str, sd: dict, variables: dict) -> list[str]:
    """Compare the converted variable tree against the Flax model's own
    abstract init (jax.eval_shape — no FLOPs): every leaf the model will
    look up must exist with the right shape. This is what catches a release
    file with a DROPPED tensor even without --reference_src (the parameter
    accounting can't: both sides of that comparison miss the same tensor,
    and converters tolerate optional biases)."""
    import jax
    import jax.numpy as jnp

    if family == "emotion_resnet50":
        from avcer_tpu.models.emotion_resnet import EmotionResNet50

        model = EmotionResNet50(num_classes=7, dtype=jnp.float32)
        x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    elif family == "temporal_lstm":
        from avcer_tpu.models.temporal_lstm import TemporalLSTM

        model = TemporalLSTM(dtype=jnp.float32)
        x = jnp.zeros((1, 10, 512), jnp.float32)
    elif family == "retinaface":
        from avcer_tpu.models.retinaface import RetinaFace

        backbone = (
            "resnet50"
            if any(k.startswith("body.layer4") for k in sd)
            else "mobilenet0.25"
        )
        model = RetinaFace(backbone=backbone, dtype=jnp.float32)
        x = jnp.zeros((1, 96, 80, 3), jnp.float32)
    else:  # expr_model_{8,7}cl
        from avcer_tpu.models.audio_heads import ExprModel
        from avcer_tpu.models.wav2vec2 import Wav2Vec2Config

        model = ExprModel(
            variant="v3" if family.endswith("8cl") else "v2",
            num_classes=8 if family.endswith("8cl") else 7,
            wav2vec2_config=Wav2Vec2Config(num_layers=_expr_layers(sd)),
            dtype=jnp.float32,
        )
        # the reference's real 4 s window (64000 samples -> 199 extractor
        # frames): TimeDownsample requires >= 51 frames, and eval_shape is
        # shape-only so the longer probe costs nothing
        x = jnp.zeros((1, 64000), jnp.float32)

    want = jax.eval_shape(lambda: model.init(jax.random.key(0), x))
    w = {
        jax.tree_util.keystr(p): tuple(v.shape)
        for p, v in jax.tree_util.tree_flatten_with_path(want)[0]
    }
    g = {
        jax.tree_util.keystr(p): tuple(np.shape(v))
        for p, v in jax.tree_util.tree_flatten_with_path(variables)[0]
    }
    problems = [f"missing {k} {w[k]}" for k in sorted(set(w) - set(g))]
    problems += [f"unexpected {k} {g[k]}" for k in sorted(set(g) - set(w))]
    problems += [
        f"shape {k}: converted {g[k]} != model {w[k]}"
        for k in sorted(set(w) & set(g))
        if w[k] != g[k]
    ]
    return problems


def verify_weights_dir(
    weights_dir: str,
    reference_src: Optional[str] = None,
    families: Optional[list[str]] = None,
    cache: bool = True,
    progress: Callable[[str], None] = print,
) -> dict:
    """Run the conversion + parity + caching pass. Returns the report dict
    (also what the CLI prints as JSON)."""
    from avcer_tpu.core import checkpoint, convert

    report: dict[str, Any] = {"weights_dir": os.path.abspath(weights_dir)}
    converters = {
        "emotion_resnet50": convert.convert_emotion_resnet50,
        "temporal_lstm": convert.convert_temporal_lstm,
        "retinaface": convert.convert_retinaface,
        "expr_model_8cl": lambda sd: _expr_converter(convert, sd, "v3"),
        "expr_model_7cl": lambda sd: _expr_converter(convert, sd, "v2"),
    }
    for family in families or FAMILIES:
        rec: dict[str, Any] = {}
        report[family] = rec
        torch_path = os.path.join(weights_dir, checkpoint.TORCH_FILES[family])
        if not os.path.exists(torch_path):
            rec["status"] = "missing"
            progress(f"{family}: {torch_path} missing — skipped")
            continue
        sd = convert.load_torch_state_dict(torch_path)
        variables = converters[family](sd)
        rec["torch_scalars"] = _torch_param_count(sd, family)
        rec["converted_scalars"] = _count_params(variables)
        if rec["converted_scalars"] != rec["torch_scalars"]:
            rec["status"] = "FAIL (parameter accounting mismatch)"
            progress(
                f"{family}: converted {rec['converted_scalars']} scalars from "
                f"{rec['torch_scalars']} — a layer was dropped or duplicated"
            )
            continue
        problems = _structure_check(family, sd, variables)
        if problems:
            rec["structure"] = problems
            rec["status"] = "FAIL (structure mismatch)"
            progress(f"{family}: structure mismatch: {'; '.join(problems[:5])}")
            continue
        if reference_src:
            rec["parity"] = _probe_parity(family, sd, variables, reference_src)
            progress(f"{family}: parity {rec['parity']}")
            if rec["parity"]["status"].startswith("FAIL"):
                rec["status"] = "FAIL (activation parity)"
                continue
        if cache:
            import jax.numpy as jnp
            import jax

            checkpoint.save_converted(
                weights_dir, family, jax.tree.map(jnp.asarray, variables)
            )
            rec["orbax_cached"] = True
        rec["status"] = "ok"
        progress(f"{family}: ok ({rec['converted_scalars']} scalars)")
    return report


def _expr_converter(convert_mod, sd: dict, variant: str) -> dict:
    return convert_mod.convert_expr_model(
        sd, variant=variant, num_layers=_expr_layers(sd)
    )


def run_calibration(weights_dir: str, calib_videos: list[str], progress=print,
                    base_cfg=None, wav2vec2_config=None) -> dict:
    """int8 recalibration on representative clips: record activation scales
    for the detector, the emotion CNN (via real detected crops), and the
    audio model (via the clips' wav sidecars), and PERSIST them as
    ``<weights_dir>/jax/<family>_act_scales`` sidecars — every later
    serving run with this weights_dir adopts them at build time
    (pipeline/builder.py), closing the round-2 product-path gap (scales
    otherwise come from noise + the first served batch only)."""
    import dataclasses

    import cv2

    from avcer_tpu.core import checkpoint
    from avcer_tpu.core.config import PipelineConfig
    from avcer_tpu.ops.image import clamp_boxes_valid
    from avcer_tpu.pipeline import audio_stage as audio_mod
    from avcer_tpu.pipeline import media
    from avcer_tpu.pipeline.builder import build_pipeline

    cfg = base_cfg if base_cfg is not None else PipelineConfig()
    cfg = dataclasses.replace(
        cfg,
        weights_dir=weights_dir,
        detector=dataclasses.replace(cfg.detector, quant="int8"),
        visual=dataclasses.replace(cfg.visual, quant="int8"),
        audio=dataclasses.replace(cfg.audio, quant="int8"),
    )
    pipe = build_pipeline(cfg, wav2vec2_config=wav2vec2_config)
    n_frames = n_crops = n_windows = 0
    for path in calib_videos:
        # frames are prepared per clip: calib videos may differ in resolution
        cap = cv2.VideoCapture(path)
        every = max(1, int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) // 16)
        frames, i = [], 0
        while len(frames) < 32:
            ok, frame = cap.read()
            if not ok:
                break
            if i % every == 0:
                frames.append(frame)
            i += 1
        cap.release()
        if frames:
            batch = np.stack(frames)
            prepped, _ = pipe.detect.prepare_batch(batch)
            pipe.detect.calibrate(prepped)
            n_frames += len(frames)
            # emotion-CNN scales come from the crops the detector actually
            # produces (top-scoring kept box per frame, serving crop rule)
            packed, dscale, _dev = pipe.detect.dispatch(batch)
            det = pipe.detect.unpack(np.asarray(packed, np.float32), dscale)
            crops = []
            for fi, frame in enumerate(frames):
                scores = np.where(det.keep[fi], det.scores[fi], -np.inf)
                if not np.isfinite(scores).any():
                    continue
                b, valid = clamp_boxes_valid(
                    det.boxes[fi][int(np.argmax(scores))][None],
                    frame.shape[1], frame.shape[0],
                )
                if not valid[0]:
                    continue
                x1, y1, x2, y2 = b[0]
                crops.append(media.resize_nearest_np(
                    frame[y1:y2, x1:x2], (224, 224)))
            if crops:
                pipe.visual.calibrate(np.stack(crops))
                n_crops += len(crops)
        try:
            wav = media.extract_audio(path)
        except Exception:
            wav = None
        if wav is not None and np.size(wav):
            windows = audio_mod.make_windows(
                np.asarray(wav, np.float32).reshape(-1), cfg.audio, fps=25.0
            ).batch
            pipe.audio.calibrate(windows[:16])
            n_windows += min(len(windows), 16)

    if n_frames == 0 and n_windows == 0:
        return {"status": "no frames decoded"}
    persisted = []
    det_family = checkpoint.detector_family(cfg.detector.backbone)
    for stage_vars, fam in (
        (pipe.detect.variables, det_family),
        (pipe.visual.static_variables, "emotion_resnet50"),
        (pipe.audio.variables,
         "expr_model_8cl" if cfg.audio.num_classes == 8 else "expr_model_7cl"),
    ):
        scales = stage_vars.get("act_scales")
        if scales is not None:
            checkpoint.save_act_scales(weights_dir, fam, scales)
            persisted.append(fam)
    progress(
        f"calibrated act_scales on {n_frames} frames / {n_crops} crops / "
        f"{n_windows} audio windows; persisted sidecars: {persisted}"
    )
    return {
        "status": "ok", "frames": n_frames, "crops": n_crops,
        "audio_windows": n_windows, "persisted": persisted,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="validate a checkpoint release")
    p.add_argument("--weights_dir", required=True)
    p.add_argument(
        "--reference_src", default=None,
        help="path to the reference repo's src/ for activation parity "
             "against the original torch classes (auto-probes "
             "/root/reference/src)",
    )
    p.add_argument("--families", nargs="*", default=None)
    p.add_argument("--no_cache", action="store_true")
    p.add_argument("--calib_video", nargs="*", default=None)
    p.add_argument("--golden", action="store_true",
                   help="run the full pipeline on a synthetic clip with the "
                        "converted weights and assert the artifact set")
    a = p.parse_args(argv)
    from avcer_tpu.core.tpuenv import enable_compile_cache

    enable_compile_cache()  # persistent XLA cache (AVCER_COMPILE_CACHE=0 disables)

    ref = a.reference_src
    if ref is None and os.path.isdir("/root/reference/src"):
        ref = "/root/reference/src"
    report = verify_weights_dir(
        a.weights_dir, reference_src=ref, families=a.families,
        cache=not a.no_cache,
    )
    if a.calib_video:
        report["calibration"] = run_calibration(a.weights_dir, a.calib_video)
    if a.golden:
        report["golden"] = _golden_e2e(a.weights_dir)
    print(json.dumps(report))
    bad = [
        k for k, v in report.items()
        if isinstance(v, dict) and str(v.get("status", "")).startswith("FAIL")
    ]
    return 1 if bad else 0


def _golden_e2e(weights_dir: str) -> dict:
    import dataclasses
    import tempfile

    from avcer_tpu.core.config import PipelineConfig
    from avcer_tpu.pipeline.builder import build_pipeline

    from bench import make_clip  # synthetic clip fixture at the repo root

    with tempfile.TemporaryDirectory() as td:
        video = os.path.join(td, "golden.avi")
        make_clip(video, os.path.join(td, "golden.wav"), seconds=2)
        cfg = dataclasses.replace(PipelineConfig(), weights_dir=weights_dir)
        pipe = build_pipeline(cfg)
        clip = pipe.run(video)
        out = os.path.join(td, "out")
        pipe.save_outputs(clip, out)
        artifacts = sorted(os.listdir(out))
        finite = bool(
            np.isfinite(clip.stat_probs).all()
            and np.isfinite(clip.audio_window_logits).all()
        )
        return {"status": "ok" if finite else "FAIL (non-finite outputs)",
                "artifacts": artifacts}


if __name__ == "__main__":
    raise SystemExit(main())
