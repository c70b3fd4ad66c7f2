"""Full-pipeline differential: run the reference's ACTUAL run_inference
(/root/reference/src/run.py:192-308) on a synthetic clip with injected
random weights, then run the avcer_tpu pipeline with the SAME weights and
diff every artifact (VERDICT round-1, Missing #1b).

What is real reference code here: run.run_inference, VideoPredictor.process,
RetinaFacePredictor.__call__ (+ PriorBox/decode/py_cpu_nms), SimpleFaceTracker,
preprocess_video_and_predict's per-frame loop, EmotionRecognition's window
loop, get_c_expr_db_pred fusion + txt writer. What is harness shim:

- torchvision / torchaudio stubs (not installed; see reference_loader)
- device "cuda:0" -> "cpu" (the reference hard-codes CUDA)
- HF hub calls replaced by locally built equivalents: the audeering feature
  extractor is a stock Wav2Vec2FeatureExtractor; ExprModelV3.from_pretrained
  builds the same class from a local config — its weights are immediately
  overwritten by the injected epoch_63.pth on both sides anyway
- crop jpgs written with PNG content (cv2.imread sniffs content, not
  extension): removes JPEG codec noise from the comparison; the codec is not
  part of the semantics under test
- detector threshold lowered (random weights produce no 0.8+ scores): the
  SAME calibrated threshold is used by both sides

Everything else — frame alignment, window mapping, rounding, tracker ids,
forward-fill/zeros semantics, label-order reorder, fusion weighting,
compound rules, txt format — is compared reference-vs-rebuild.
"""

from __future__ import annotations

import os
import sys
import wave
from copy import deepcopy
from types import SimpleNamespace

import numpy as np
import pandas as pd
import pytest
import torch

import reference_loader
from test_model_parity import randomize_state

torch.manual_seed(0)

W, H, FPS, FRAMES = 256, 192, 25, 40  # 1.6 s clip, dims % 32 == 0 (no pad)
SR = 16000


def _write_clip(path: str, rng: np.random.Generator) -> None:
    import cv2

    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), FPS, (W, H))
    assert vw.isOpened()
    base = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
    for i in range(FRAMES):
        frame = base.copy()
        x0 = (i * 5) % (W - 64)
        y0 = (i * 3) % (H - 64)
        frame[y0 : y0 + 64, x0 : x0 + 64] = rng.integers(
            0, 255, size=(64, 64, 3), dtype=np.uint8
        )
        vw.write(frame)
    vw.release()


def _write_wav_int16(path: str, ints: np.ndarray) -> None:
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(ints.astype("<i2").tobytes())


class _Cv2PngShim:
    """cv2 facade whose imwrite stores PNG content under the given name."""

    def __init__(self, real):
        self._real = real

    def __getattr__(self, name):
        return getattr(self._real, name)

    def imwrite(self, path, img):
        ok, buf = self._real.imencode(".png", img)
        assert ok
        with open(path, "wb") as f:
            f.write(buf.tobytes())
        return True


@pytest.mark.slow
def test_full_pipeline_differential(tmp_path, monkeypatch):
    import cv2

    rng = np.random.default_rng(7)
    reference_loader.install_torchvision_stub()
    reference_loader.install_torchaudio_stub()
    reference_loader.add_reference_paths()
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", ["run.py"])

    # ---- fixture clip + audio ------------------------------------------
    video = str(tmp_path / "clip.avi")
    _write_clip(video, rng)
    ints = rng.integers(-18000, 18000, FRAMES * SR // FPS, dtype=np.int64)
    _write_wav_int16(str(tmp_path / "clip.wav"), ints)
    wav_float = (ints / 32768.0).astype(np.float32)

    # ---- injected weights (saved where the reference hard-codes) -------
    os.makedirs("src/weights", exist_ok=True)
    ref_video_mod, _ = reference_loader.load_reference_architectures()
    static_t = ref_video_mod.ResNet50(7, channels=3)
    randomize_state(static_t)
    torch.save(static_t.state_dict(), "src/weights/FER_static_ResNet50_AffectNet.pt")
    lstm_t = ref_video_mod.LSTMPyTorch()
    randomize_state(lstm_t, scale=0.3)
    torch.save(lstm_t.state_dict(), "src/weights/FER_dinamic_LSTM_Aff-Wild2.pt")

    import torch_twins as twins

    hf_cfg = twins.make_hf_wav2vec2(num_layers=4).config
    ref_audio_mod = reference_loader.load_reference_audio_models(8)
    audio_t = ref_audio_mod.ExprModelV3(hf_cfg)
    randomize_state(audio_t, scale=0.05)
    audio_dir = os.path.join("src\\weights", "FLW-ExprModelV3-2024.03.02-11.42.11")
    os.makedirs(audio_dir, exist_ok=True)
    torch.save({"model_state_dict": audio_t.state_dict()},
               os.path.join(audio_dir, "epoch_63.pth"))

    ref_rf, ref_cfg = reference_loader.load_reference_retinaface()
    detector_t = ref_rf.RetinaFace(cfg=ref_cfg.cfg_re50, phase="test")
    randomize_state(detector_t, scale=0.05)
    # Small random weights leave the class logits bias-dominated and nearly
    # input-independent (deep random nets contract), so anchor scores form a
    # dense continuum with no threshold that is safely away from every
    # detection — any global cut flips borderline detections under the
    # ~1e-5 torch-vs-XLA fp32 conv drift. Amplify the ClassHead weights and
    # bias the background logit so scores spread, then calibrate the
    # threshold between the global rank-1 and rank-2 score clusters
    # (measured gap ~5e-4): exactly one well-separated detection per frame.
    with torch.no_grad():
        g2 = torch.Generator().manual_seed(11)
        for k, v in detector_t.state_dict().items():
            if "ClassHead" in k and k.endswith("weight"):
                v.copy_(torch.randn(v.shape, generator=g2) * 3.0)
            elif "ClassHead" in k and k.endswith("bias"):
                b = torch.zeros(v.shape)
                b[0::2] = 2.0  # background logit boost
                v.copy_(b)
    torch.save(detector_t.state_dict(), str(tmp_path / "retinaface.pth"))

    # ---- import the real pipeline modules ------------------------------
    import run as ref_run
    import get_prob_audio_8_cl as ref_audio_infer
    import data.get_face_images as ref_gfi
    from ibug.face_detection.retina_face.retina_face_predictor import (
        RetinaFacePredictor,
    )
    from data.face_detection.ibug.face_detection.utils import SimpleFaceTracker

    # HF hub -> local equivalents
    from transformers import Wav2Vec2FeatureExtractor

    monkeypatch.setattr(
        ref_audio_infer, "AutoFeatureExtractor",
        SimpleNamespace(from_pretrained=lambda name: Wav2Vec2FeatureExtractor()),
    )
    monkeypatch.setattr(
        ref_audio_infer.ExprModelV3, "from_pretrained",
        classmethod(lambda cls, name: cls(hf_cfg)),
    )

    # cuda:0 -> cpu for the audio stage
    orig_paap = ref_run.preprocess_audio_and_predict

    def paap_cpu(**kw):
        kw["device"] = "cpu"
        return orig_paap(**kw)

    monkeypatch.setattr(ref_run, "preprocess_audio_and_predict", paap_cpu)

    # calibrated detector threshold: random weights never reach 0.8; pick a
    # value that keeps a couple of detections per frame on both sides
    model_ns = SimpleNamespace(
        weights=str(tmp_path / "retinaface.pth"),
        config=SimpleNamespace(**deepcopy(ref_cfg.cfg_re50)),
    )
    calib = RetinaFacePredictor(threshold=0.0, device="cpu", model=model_ns)
    cap = cv2.VideoCapture(video)
    top1s, top2s = [], []
    while True:
        ok, fr = cap.read()
        if not ok:
            break
        s = np.sort(calib(fr, rgb=False)[:, 4])[::-1]
        top1s.append(s[0])
        top2s.append(s[1])
    cap.release()
    gap = float(min(top1s) - max(top2s))
    assert gap > 1e-4, f"rank1/rank2 clusters overlap (gap {gap}); reseed"
    threshold = float((min(top1s) + max(top2s)) / 2)

    ref_vp_cls = ref_gfi.VideoPredictor

    def make_vp():
        vp = ref_vp_cls.__new__(ref_vp_cls)
        vp.video_stream = None
        vp.device = "cpu"
        vp.count_frame = None
        vp.model = RetinaFacePredictor(
            threshold=threshold, device="cpu", model=model_ns
        )
        vp.face_tracker = SimpleFaceTracker(iou_threshold=0.4, minimum_face_size=0.0)
        return vp

    monkeypatch.setattr(ref_run, "VideoPredictor", make_vp)
    monkeypatch.setattr(ref_gfi, "cv2", _Cv2PngShim(cv2))

    # ---- run the REAL reference end-to-end -----------------------------
    from avcer_tpu.core import registry

    w1 = [list(map(float, row)) for row in np.asarray(registry.AV_WEIGHTS_8CL)]
    save_ref = str(tmp_path / "ref_out")
    ref_run.run_inference(
        path_video=video,
        path_save_results=save_ref,
        flag_save_prob=True,
        weights_prob_model=w1,
        weights_model=[1, 1, 1],
        ce_weights_type=False,
        ce_mask=True,
        flag_save_plot_pred=False,
    )

    ref_static = pd.read_csv(os.path.join(save_ref, "static__clip.csv"))
    ref_dynamic = pd.read_csv(os.path.join(save_ref, "dynamic__clip.csv"))
    ref_audio = pd.read_csv(
        os.path.join(save_ref, "FLW-ExprModelV3-2024.03.02-11.42.11", "clip.csv")
    )
    ref_txt = open(
        "src/pred_results/DF_C_EXPR_DB/C_EXPR_DB_av_False_True_clip.txt"
    ).read()

    # ---- run avcer_tpu with the same weights ----------------------------
    from avcer_tpu.core import convert
    from avcer_tpu.core.config import (
        AudioConfig, DetectorConfig, FusionConfig, PipelineConfig, VisualConfig,
    )
    from avcer_tpu.models.wav2vec2 import Wav2Vec2Config
    from avcer_tpu.pipeline.runner import Pipeline

    cfg = PipelineConfig(
        detector=DetectorConfig(
            long_side=0, threshold=threshold, dtype="float32",
            transfer_format="bgr", batch_size=8,
        ),
        visual=VisualConfig(dtype="float32", batch_size=16),
        audio=AudioConfig(num_classes=8, head="v3", dtype="float32", batch_size=4),
        fusion=FusionConfig(
            use_published_weights=True, ce_weights_type=False, ce_mask=True
        ),
        save_probs=True,
        save_plot=False,
    )
    pipe = Pipeline(
        cfg,
        convert.convert_retinaface(detector_t.state_dict()),
        convert.convert_emotion_resnet50(static_t.state_dict()),
        convert.convert_temporal_lstm(lstm_t.state_dict()),
        convert.convert_expr_model(audio_t.state_dict(), variant="v3", num_layers=4),
        Wav2Vec2Config(num_layers=4),
    )
    save_our = str(tmp_path / "our_out")
    clip = pipe.run(video, save_our, wav=wav_float)

    # ---- diff: per-stage probabilities ----------------------------------
    emo_v = list(registry.VIDEO_EMOTIONS)
    assert len(ref_static) == clip.total_frames == FRAMES
    np.testing.assert_allclose(
        clip.stat_probs, ref_static[emo_v].values, atol=2e-3,
        err_msg="static per-frame probs diverge from the reference loop",
    )
    np.testing.assert_allclose(
        clip.dyn_logits, ref_dynamic[emo_v].values, atol=2e-3,
        err_msg="dynamic per-frame logits diverge from the reference loop",
    )

    emo_a = list(registry.AUDIO_EMOTIONS_8)
    our_audio = pd.read_csv(os.path.join(save_our, "audio__clip.csv"))
    assert list(our_audio["frames"]) == list(ref_audio["frames"]), (
        "audio window->frame replication mapping differs"
    )
    np.testing.assert_allclose(
        our_audio[emo_a].values, ref_audio[emo_a].values, atol=2e-3,
    )

    # ---- diff: compound txt (byte format + labels) ----------------------
    our_txt = open(
        os.path.join(save_our, "DF_C_EXPR_DB", "C_EXPR_DB_av_False_True_clip.txt")
    ).read()
    ref_lines = ref_txt.strip().split("\n")
    our_lines = our_txt.strip().split("\n")
    assert our_lines[0] == ref_lines[0]  # header byte-equal
    assert len(our_lines) == len(ref_lines)
    ref_rows = [ln.rsplit(",", 1) for ln in ref_lines[1:]]
    our_rows = [ln.rsplit(",", 1) for ln in our_lines[1:]]
    assert [r[0] for r in our_rows] == [r[0] for r in ref_rows]  # image_location
    labels_ref = np.array([int(r[1]) for r in ref_rows])
    labels_our = np.array([int(r[1]) for r in our_rows])
    agree = (labels_ref == labels_our).mean()
    assert agree == 1.0, f"compound AV labels agree only {agree:.3f}"

    # ---- diff: face-crop dump structure (frames covered, tracklet dirs) -
    ref_crop_root = os.path.join(save_ref, "clip")
    assert os.path.isdir(ref_crop_root)
    # our pipeline dumps crops through the host path; check it against the
    # reference's directory layout
    cfg2 = PipelineConfig(
        detector=cfg.detector, visual=cfg.visual, audio=cfg.audio,
        fusion=cfg.fusion, save_probs=False, save_plot=False,
        save_face_crops=True,
    )
    pipe2 = Pipeline(
        cfg2,
        convert.convert_retinaface(detector_t.state_dict()),
        convert.convert_emotion_resnet50(static_t.state_dict()),
        convert.convert_temporal_lstm(lstm_t.state_dict()),
        convert.convert_expr_model(audio_t.state_dict(), variant="v3", num_layers=4),
        Wav2Vec2Config(num_layers=4),
    )
    save_our2 = str(tmp_path / "our_out_crops")
    clip2 = pipe2.run(video, save_our2, wav=wav_float)
    for tid_dir in sorted(os.listdir(ref_crop_root)):
        ref_files = sorted(os.listdir(os.path.join(ref_crop_root, tid_dir)))
        our_files = sorted(
            os.listdir(os.path.join(save_our2, "clip", tid_dir))
        )
        assert our_files == ref_files, f"crop dump differs for tracklet {tid_dir}"

    # host-crop path and device-crop path agree with each other too
    np.testing.assert_allclose(clip2.stat_probs, clip.stat_probs, atol=1e-4)
    np.testing.assert_allclose(clip2.dyn_logits, clip.dyn_logits, atol=1e-4)
