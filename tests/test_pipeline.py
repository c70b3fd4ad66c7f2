"""Pipeline-level tests: temporal plan parity vs a direct simulation of the
reference loop, tracker behavior, audio alignment, and an end-to-end smoke
run on a synthetic clip with tiny random-weight models."""

import os

import numpy as np
import pytest

from avcer_tpu.fusion.compound import align_audio_to_frames
from avcer_tpu.pipeline.tracker import IoUTracker
from avcer_tpu.pipeline.visual import build_temporal_plan


# ---------------------------------------------------------------------------
# Temporal plan parity (spec: get_prob_video.py:91-180 state machine)
# ---------------------------------------------------------------------------


def reference_loop(present, step, feats, dyn_fn, stat_fn):
    """Direct simulation of the reference's per-frame loop semantics."""
    last_output = None
    lstm_features = []
    probs_static, probs_dynamic = [], []
    zeros = np.zeros(7)
    for t in range(len(present)):
        if present[t]:
            output_s = stat_fn(t)
            if t % step == 0:
                f = feats[t]
                if len(lstm_features) == 0:
                    lstm_features = [f] * 10
                else:
                    lstm_features = lstm_features[1:] + [f]
                output_d = dyn_fn(np.stack(lstm_features))
                last_output = output_d
            else:
                output_d = last_output if last_output is not None else zeros
            probs_static.append(output_s)
            probs_dynamic.append(output_d)
        else:
            lstm_features = []
            if last_output is not None:
                probs_static.append(probs_static[-1])
                probs_dynamic.append(probs_dynamic[-1])
            else:
                probs_static.append(zeros)
                probs_dynamic.append(zeros)
    return np.stack(probs_static), np.stack(probs_dynamic)


@pytest.mark.parametrize("step", [1, 2, 5])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_temporal_plan_matches_reference_loop(step, seed):
    rng = np.random.default_rng(seed)
    t_total = 60
    present = rng.random(t_total) > 0.3
    feats = rng.normal(size=(t_total, 7))  # 7-d stand-in features
    stat_vals = rng.normal(size=(t_total, 7))

    def dyn_fn(window):  # deterministic linear "LSTM"
        return window.mean(axis=0) * np.arange(1, 8)

    want_stat, want_dyn = reference_loop(
        present, step, feats, dyn_fn, lambda t: stat_vals[t]
    )

    plan = build_temporal_plan(present, step)
    pres_idx = np.nonzero(present)[0]
    stat_p = stat_vals[pres_idx]  # [P, 7] per present frame
    feats_p = feats[pres_idx]
    # batched dynamic: windows over step-frame features
    if plan.step_frames.size:
        step_feats = feats_p[plan.step_frames]
        windows = step_feats[plan.window_idx]
        dyn_s = np.stack([dyn_fn(w) for w in windows])
    else:
        dyn_s = np.zeros((0, 7))

    got_stat = np.zeros((t_total, 7))
    got_dyn = np.zeros((t_total, 7))
    m = plan.stat_src >= 0
    got_stat[m] = stat_p[plan.stat_src[m]]
    md = plan.dyn_src >= 0
    if dyn_s.size:
        got_dyn[md] = dyn_s[plan.dyn_src[md]]

    np.testing.assert_allclose(got_stat, want_stat, atol=1e-12)
    np.testing.assert_allclose(got_dyn, want_dyn, atol=1e-12)


def test_temporal_plan_all_missing():
    plan = build_temporal_plan(np.zeros(10, bool), 2)
    assert plan.step_frames.size == 0
    assert (plan.stat_src == -1).all() and (plan.dyn_src == -1).all()


# ---------------------------------------------------------------------------
# Tracker (spec: simple_face_tracker.py)
# ---------------------------------------------------------------------------


def test_tracker_id_assignment_and_reset():
    tr = IoUTracker(iou_threshold=0.4)
    a = np.array([[0, 0, 10, 10, 0.9]])
    b = np.array([[100, 100, 120, 120, 0.9]])
    ids = tr(np.concatenate([a, b]))
    assert ids == [1, 2]
    # same boxes slightly moved keep ids
    ids = tr(np.array([[1, 1, 11, 11, 0.9], [101, 99, 121, 119, 0.9]]))
    assert ids == [1, 2]
    # empty frame clears tracklets; new faces get new ids
    assert tr(np.empty((0, 5))) == []
    ids = tr(a)
    assert ids == [3]
    tr.reset()
    assert tr(a) == [1]


def test_tracker_non_overlapping_gets_new_id():
    tr = IoUTracker(iou_threshold=0.4)
    assert tr(np.array([[0, 0, 10, 10, 0.9]])) == [1]
    # far-away box: old tracklet expires, new id
    assert tr(np.array([[50, 50, 60, 60, 0.9]])) == [2]


def _fast_small_face_track(step: float):
    """A 25 px box translating `step` px per observation — at step 14 the
    inter-observation IoU is ~0.27, under the 0.4 match threshold (the
    detect-stride-2 failure measured on the drift-study clips)."""
    return [np.array([[100 + step * i, 50, 125 + step * i, 80, 0.9]])
            for i in range(8)]


def test_tracker_gap_mode_keeps_identity_across_stride_gaps():
    # reference behavior (gap 1): the chain fragments — every observation
    # becomes a new tracklet (immediate expiry, simple_face_tracker.py:74-75)
    tr1 = IoUTracker(iou_threshold=0.4, gap_frames=1)
    ids1 = [tr1(b)[0] for b in _fast_small_face_track(14.0)]
    assert ids1 == list(range(1, 9))
    # gap mode (detect stride 2): bootstrap threshold admits the first
    # gap-sized motion, velocity extrapolation carries the rest -> one id
    tr2 = IoUTracker(iou_threshold=0.4, gap_frames=2)
    ids2 = [tr2(b)[0] for b in _fast_small_face_track(14.0)]
    assert ids2 == [1] * 8


def test_tracker_gap_mode_survives_deceleration_and_stop():
    """A velocity-established tracklet whose face stops must keep its id:
    the extrapolated box overshoots (IoU 0.28 < 0.4 for the 25 px box
    moving 14 px/observation), but the raw last box matches trivially —
    gap mode takes the better of the two."""
    tr = IoUTracker(iou_threshold=0.4, gap_frames=2)
    moving = _fast_small_face_track(14.0)[:3]
    ids = [tr(b)[0] for b in moving]
    assert ids == [1, 1, 1]  # velocity established
    stopped = moving[-1]
    for _ in range(4):  # the face stops dead
        assert tr(stopped)[0] == 1
    # and resumes motion (velocity re-zeroed by the stop, bootstrap-like
    # raw-box relaxation carries the first gap again)
    resumed = stopped + np.array([[14.0, 0, 14.0, 0, 0]])
    assert tr(resumed)[0] == 1


def test_tracker_gap_one_is_reference_exact():
    """gap_frames=1 must be byte-identical to the default tracker on a
    jittery multi-face sequence (the stride-1 parity contract)."""
    rng = np.random.default_rng(7)
    seqs = []
    base = np.array([[10, 10, 60, 70], [200, 40, 280, 130], [90, 150, 130, 200]],
                    float)
    for _ in range(30):
        base = base + rng.normal(0, 4, size=base.shape)
        drop = rng.random(3) < 0.2
        frame = np.concatenate([base[~drop], np.full((int(drop.sum()), 4), -1)])
        frame = frame[frame[:, 0] >= 0]
        seqs.append(np.concatenate([frame, np.full((len(frame), 1), 0.9)], axis=1))
    ta, tb = IoUTracker(iou_threshold=0.4), IoUTracker(iou_threshold=0.4,
                                                       gap_frames=1)
    for s in seqs:
        assert ta(s) == tb(s)


# ---------------------------------------------------------------------------
# Audio -> frame alignment (spec: run.py:90-103)
# ---------------------------------------------------------------------------


def test_align_audio_groupby_mean_and_tail_fill(rng):
    wl = rng.normal(size=(3, 8)).astype(np.float32)
    frame_ids = np.array([0, 1, 2, 1, 2, 3, 2, 3, 4])
    wor = np.array([0, 0, 0, 1, 1, 1, 2, 2, 2])
    out = align_audio_to_frames(wl, frame_ids, wor, num_frames=8)
    assert out.shape == (8, 8)
    np.testing.assert_allclose(out[0], wl[0], rtol=1e-6)
    np.testing.assert_allclose(out[1], (wl[0] + wl[1]) / 2, rtol=1e-6)
    np.testing.assert_allclose(out[2], (wl[0] + wl[1] + wl[2]) / 3, rtol=1e-6)
    np.testing.assert_allclose(out[4], wl[2], rtol=1e-6)
    # frames 5..7 beyond coverage -> forward-filled with frame 4's row
    for f in (5, 6, 7):
        np.testing.assert_allclose(out[f], out[4], rtol=1e-6)
    # ids beyond num_frames are dropped
    out2 = align_audio_to_frames(wl, frame_ids, wor, num_frames=3)
    assert out2.shape == (3, 8)


# ---------------------------------------------------------------------------
# End-to-end smoke: synthetic clip, tiny random models, stubbed detector
# ---------------------------------------------------------------------------


class StubDetect:
    """Deterministic detector: one centered face box on every frame.
    Implements the stage interface the runner drives (dispatch/unpack)."""

    def __init__(self, h, w):
        self.h, self.w = h, w

    def dispatch(self, frames):
        import jax.numpy as jnp

        b, k = frames.shape[0], 8
        packed = np.zeros((b, k, 16), np.float32)
        packed[:, 0, 0:4] = [self.w * 0.25, self.h * 0.25,
                             self.w * 0.75, self.h * 0.75]
        packed[:, 0, 4] = 0.95
        packed[:, 0, 5] = 1.0
        return packed, 1.0, jnp.asarray(frames)

    def unpack(self, packed_np, scale):
        from avcer_tpu.pipeline.detect import DetectStage

        return DetectStage.unpack(packed_np, scale)


def test_serving_profile_presets():
    """--serving_profile maps to the measured configs (BENCH_NOTES round-4)
    and explicit flags still override the preset."""
    from avcer_tpu.core.config import pipeline_config_from_args

    cfg, *_ = pipeline_config_from_args(["--serving_profile", "parity"])
    assert (cfg.detector.backbone, cfg.detector.quant) == ("resnet50", "none")
    cfg, *_ = pipeline_config_from_args(["--serving_profile", "balanced"])
    assert (cfg.detector.backbone, cfg.detector.quant) == ("resnet50", "none")
    assert cfg.detector.long_side == 448 and cfg.detector.stride == 1
    assert cfg.audio.quant == "none" and not cfg.audio.shared_extractor
    cfg, *_ = pipeline_config_from_args(["--serving_profile", "int8"])
    assert cfg.detector.quant == cfg.visual.quant == cfg.audio.quant == "int8"
    assert cfg.detector.long_side == 640 and cfg.detector.stride == 1
    # round-4: every quantized preset serves the shared-extractor audio
    # path (measured-zero drift, PARITY.md); --exact_audio opts out
    assert cfg.audio.shared_extractor
    cfg, *_ = pipeline_config_from_args(
        ["--serving_profile", "int8", "--exact_audio"])
    assert not cfg.audio.shared_extractor
    cfg, *_ = pipeline_config_from_args(["--serving_profile", "int8_s2"])
    assert cfg.detector.quant == cfg.visual.quant == cfg.audio.quant == "int8"
    assert (cfg.detector.backbone, cfg.detector.long_side) == ("resnet50", 640)
    assert cfg.detector.stride == 2 and cfg.audio.shared_extractor
    cfg, *_ = pipeline_config_from_args(["--serving_profile", "int8_448"])
    assert cfg.detector.quant == cfg.visual.quant == cfg.audio.quant == "int8"
    assert (cfg.detector.backbone, cfg.detector.long_side) == ("resnet50", 448)
    assert cfg.detector.stride == 1 and cfg.audio.shared_extractor
    cfg, *_ = pipeline_config_from_args(["--serving_profile", "int8_448_s2"])
    assert cfg.detector.quant == "int8"
    assert (cfg.detector.backbone, cfg.detector.long_side) == ("resnet50", 448)
    assert cfg.detector.stride == 2 and cfg.audio.shared_extractor
    cfg, *_ = pipeline_config_from_args(["--serving_profile", "fast"])
    assert cfg.detector.backbone == "mobilenet0.25"
    assert cfg.detector.long_side == 640
    cfg, *_ = pipeline_config_from_args(["--serving_profile", "turbo"])
    assert (cfg.detector.long_side, cfg.detector.stride) == (448, 2)
    assert cfg.audio.shared_extractor
    cfg, *_ = pipeline_config_from_args(
        ["--serving_profile", "turbo", "--long_side", "512",
         "--detect_stride", "4"]
    )
    assert (cfg.detector.long_side, cfg.detector.stride) == (512, 4)
    # an EXPLICIT flag equal to the non-turbo default still overrides
    cfg, *_ = pipeline_config_from_args(
        ["--serving_profile", "turbo", "--long_side", "640",
         "--detect_stride", "1"]
    )
    assert (cfg.detector.long_side, cfg.detector.stride) == (640, 1)
    assert cfg.visual.cnn_stride == 1  # turbo keeps the per-frame CNN
    # max = turbo + static CNN at the dynamic step cadence
    cfg, *_ = pipeline_config_from_args(["--serving_profile", "max"])
    assert cfg.detector.backbone == "mobilenet0.25"
    assert (cfg.detector.long_side, cfg.detector.stride) == (448, 2)
    assert cfg.detector.quant == cfg.visual.quant == cfg.audio.quant == "int8"
    assert cfg.audio.shared_extractor and cfg.detector.batch_size == 128
    assert cfg.visual.cnn_stride == 0  # 0 = resolve to dynamic_step(fps)
    cfg, *_ = pipeline_config_from_args(
        ["--serving_profile", "max", "--cnn_stride", "3"])
    assert cfg.visual.cnn_stride == 3  # explicit flag overrides the preset
    with pytest.raises(ValueError):  # negative stride fails at config time
        pipeline_config_from_args(["--cnn_stride", "-5"])


@pytest.mark.slow
@pytest.mark.parametrize(
    "path_mode", ["device", "host", "device_heatmaps", "device_int8"]
)
def test_end_to_end_synthetic_clip(tmp_path, rng, path_mode):
    import cv2

    from avcer_tpu.core.config import (AudioConfig, DetectorConfig,
                                       PipelineConfig, VisualConfig)
    from avcer_tpu.models.wav2vec2 import Wav2Vec2Config
    from avcer_tpu.pipeline import media
    from avcer_tpu.pipeline.builder import build_pipeline

    h = w = 96
    n_frames, fps = 30, 25
    video_path = str(tmp_path / "clip.avi")
    vw = cv2.VideoWriter(video_path, cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h))
    assert vw.isOpened()
    for i in range(n_frames):
        frame = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        vw.write(frame)
    vw.release()
    # sidecar wav (1.5 s, shorter than the 1.2 s video? -> 1.5s covers it)
    wav = (rng.normal(size=int(1.5 * 16000)) * 0.1).astype(np.float32)
    media.write_wav(str(tmp_path / "clip.wav"), wav, 16000)

    q = "int8" if path_mode == "device_int8" else "none"
    cfg = PipelineConfig(
        detector=DetectorConfig(batch_size=8, long_side=64, quant=q),
        visual=VisualConfig(batch_size=16, quant=q),
        audio=AudioConfig(batch_size=4, quant=q),
        weights_dir=str(tmp_path / "nonexistent_weights"),
        save_plot=False,
        save_face_crops=(path_mode == "host"),
        heatmaps="static" if path_mode in ("host", "device_heatmaps") else "",
    )
    tiny_w2v2 = Wav2Vec2Config(
        hidden_size=64, num_layers=2, num_heads=4, intermediate_size=128,
        conv_dim=(16,) * 7,
    )
    pipe = build_pipeline(cfg, wav2vec2_config=tiny_w2v2)
    pipe.detect = StubDetect(h, w)

    clip = pipe.run(video_path, str(tmp_path / "out"))
    assert clip.total_frames == n_frames
    assert clip.stat_probs.shape == (n_frames, 7)
    assert clip.dyn_logits.shape == (n_frames, 7)
    # every frame has a face -> static rows are probability rows
    np.testing.assert_allclose(clip.stat_probs.sum(1), 1.0, atol=1e-4)
    assert clip.compound is not None
    assert clip.compound.av.shape == (n_frames,)
    assert set(np.unique(clip.compound.av)) <= set(range(7))
    for f in ("static__clip.csv", "dynamic__clip.csv", "audio__clip.csv"):
        assert os.path.exists(tmp_path / "out" / f)
    assert os.path.exists(
        tmp_path / "out" / "DF_C_EXPR_DB" / "C_EXPR_DB_av_False_True_clip.txt"
    )
    if path_mode == "host":
        # crop dump parity: <save>/<video>/<tid-1:02d>/<frame:06d>.jpg
        crop_dir = tmp_path / "out" / "clip" / "00"
        assert crop_dir.is_dir() and len(list(crop_dir.glob("*.jpg"))) == n_frames
    if path_mode in ("host", "device_heatmaps"):
        # heatmaps no longer force the host-crop path: the device path
        # fetches just the step-frame crops (runner.detect_track_device
        # crop_step) and writes the same overlay files
        hm_dir = tmp_path / "out" / "clip" / "heatmaps_static"
        hm_files = sorted(p.name for p in hm_dir.glob("*.jpg"))
        assert hm_dir.is_dir() and len(hm_files) > 0
        # step cadence: frame numbers divisible by the dynamic step
        from avcer_tpu.core.registry import dynamic_step

        step = dynamic_step(fps)
        assert all(int(f.split(".")[0]) % step == 0 for f in hm_files)


@pytest.mark.slow
@pytest.mark.parametrize("quant", ["none", "int8"])
def test_cnn_stride_end_to_end_equivalence(tmp_path, rng, quant):
    """Full tiny pipeline, parity vs cnn_stride serving on the SAME clip:
    the dynamic stream is bit-exact (step-frame features computed exactly),
    static rows at computed frames are bit-exact, and skipped frames hold
    the previous computed row. The int8 arm pins the calibration contract:
    act_scales refine on the SAME leading crops in both paths
    (VisualStage.ensure_calibrated_from_frames), so quantized dynamic
    streams agree bitwise too."""
    import dataclasses

    import cv2

    from avcer_tpu.core.config import (AudioConfig, DetectorConfig,
                                       PipelineConfig, VisualConfig)
    from avcer_tpu.models.wav2vec2 import Wav2Vec2Config
    from avcer_tpu.pipeline import media
    from avcer_tpu.pipeline.builder import build_pipeline
    from avcer_tpu.pipeline.visual import cnn_compute_sel

    h = w = 96
    n_frames, fps = 30, 25
    video_path = str(tmp_path / "clip.avi")
    vw = cv2.VideoWriter(video_path, cv2.VideoWriter_fourcc(*"MJPG"), fps,
                         (w, h))
    assert vw.isOpened()
    for i in range(n_frames):
        vw.write(rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8))
    vw.release()
    wav = (rng.normal(size=int(1.5 * 16000)) * 0.1).astype(np.float32)
    media.write_wav(str(tmp_path / "clip.wav"), wav, 16000)

    cfg = PipelineConfig(
        detector=DetectorConfig(batch_size=8, long_side=64),
        visual=VisualConfig(batch_size=16, quant=quant),
        audio=AudioConfig(batch_size=4),
        weights_dir=str(tmp_path / "nonexistent_weights"),
        save_plot=False,
        save_probs=False,
    )
    tiny_w2v2 = Wav2Vec2Config(
        hidden_size=64, num_layers=2, num_heads=4, intermediate_size=128,
        conv_dim=(16,) * 7,
    )
    pipe = build_pipeline(cfg, wav2vec2_config=tiny_w2v2)
    pipe.detect = StubDetect(h, w)
    base = pipe.run(video_path, "")

    cfg_cs = dataclasses.replace(
        cfg, visual=dataclasses.replace(cfg.visual, cnn_stride=0)
    )
    pipe_cs = build_pipeline(cfg_cs, wav2vec2_config=tiny_w2v2)
    pipe_cs.detect = StubDetect(h, w)
    pipe_cs.visual.static_variables = pipe.visual.static_variables
    pipe_cs.visual.lstm_variables = pipe.visual.lstm_variables
    got = pipe_cs.run(video_path, "")

    from avcer_tpu.core.registry import dynamic_step

    step = dynamic_step(fps)
    np.testing.assert_array_equal(got.dyn_logits, base.dyn_logits)
    sel, _ = cnn_compute_sel(np.arange(n_frames), step, step)
    np.testing.assert_array_equal(
        got.stat_probs[sel], base.stat_probs[sel]
    )
    held = np.flatnonzero(sel)[np.cumsum(sel) - 1]
    np.testing.assert_array_equal(got.stat_probs, base.stat_probs[held])


@pytest.mark.slow
def test_detect_stage_wire_formats(rng):
    """Real DetectStage end-to-end at tiny size: bgr vs i420 wire formats
    agree (within chroma-subsample tolerance) and shapes are fixed."""
    import dataclasses

    import jax.numpy as jnp

    from avcer_tpu.core.checkpoint import init_variables
    from avcer_tpu.core.config import DetectorConfig
    from avcer_tpu.models.retinaface import RetinaFace
    from avcer_tpu.pipeline.detect import DetectStage

    model = RetinaFace(backbone="resnet50", dtype=jnp.float32)
    variables = init_variables(model, (jnp.zeros((1, 64, 64, 3), jnp.float32),))
    frames = rng.integers(0, 255, (2, 100, 130, 3), dtype=np.uint8)
    cfg = DetectorConfig(long_side=64, batch_size=2, transfer_format="i420")
    stage = DetectStage(cfg, variables, dtype=jnp.float32)
    det_i420 = stage(frames)
    assert det_i420.boxes.shape == (2, 64, 4)
    assert det_i420.scores.shape == (2, 64)

    cfg_bgr = dataclasses.replace(cfg, transfer_format="bgr")
    stage_bgr = DetectStage(cfg_bgr, variables, dtype=jnp.float32)
    det_bgr = stage_bgr(frames)
    # Random weights amplify the chroma-subsample perturbation, so numeric
    # agreement is not meaningful here (the I420 codec itself is verified
    # against cv2 in test_ops_image). Both paths must produce valid
    # fixed-shape outputs on odd letterbox dims, scores sorted descending,
    # boxes in native pixel coordinates.
    for det in (det_i420, det_bgr):
        assert det.boxes.shape == (2, 64, 4) and det.scores.shape == (2, 64)
        assert (np.diff(det.scores, axis=1) <= 1e-6).all()
        assert np.isfinite(det.boxes).all()


@pytest.mark.slow
def test_sharded_inference_stages(rng):
    """Data-parallel inference over the virtual 8-device CPU mesh: the
    detect stage shards the frame batch on 'data'; results must equal the
    unsharded run."""
    import jax
    import jax.numpy as jnp

    from avcer_tpu.core.checkpoint import init_variables
    from avcer_tpu.core.config import DetectorConfig
    from avcer_tpu.models.retinaface import RetinaFace
    from avcer_tpu.parallel import mesh as mesh_lib
    from avcer_tpu.pipeline.detect import DetectStage

    assert jax.device_count() == 8
    mesh = mesh_lib.make_mesh(data=8, model=1)
    model = RetinaFace(backbone="resnet50", dtype=jnp.float32)
    variables = init_variables(model, (jnp.zeros((1, 64, 64, 3), jnp.float32),))
    frames = rng.integers(0, 255, (8, 100, 130, 3), dtype=np.uint8)
    cfg = DetectorConfig(long_side=64, batch_size=8, transfer_format="bgr")
    sharded = DetectStage(cfg, variables, dtype=jnp.float32, mesh=mesh)
    plain = DetectStage(cfg, variables, dtype=jnp.float32)
    det_s = sharded(frames)
    det_p = plain(frames)
    np.testing.assert_allclose(det_s.scores, det_p.scores, atol=1e-4)
    np.testing.assert_allclose(det_s.boxes, det_p.boxes, atol=5e-2)


# ---------------------------------------------------------------------------
# detect_stride: detection every Nth frame + interpolated target boxes
# ---------------------------------------------------------------------------


class StridedStubDetect:
    """Stride-aware detector stub: emits one tracked box whose x-position
    moves linearly with the global frame index (frame id is encoded in the
    pixel values so the stub can recover it)."""

    def __init__(self, stride: int):
        self.stride = stride

    def dispatch(self, frames):
        import jax.numpy as jnp

        det_frames = frames[:: self.stride]
        ids = det_frames[:, 0, 0, 0].astype(np.float32)  # global frame index
        b = det_frames.shape[0]
        packed = np.zeros((b, 4, 16), np.float32)
        packed[:, 0, 0] = 10 + ids
        packed[:, 0, 1] = 20
        packed[:, 0, 2] = 50 + ids
        packed[:, 0, 3] = 60
        packed[:, 0, 4] = 0.95
        packed[:, 0, 5] = 1.0
        return packed, 1.0, jnp.asarray(frames)

    def unpack(self, packed_np, scale):
        from avcer_tpu.pipeline.detect import DetectStage

        return DetectStage.unpack(packed_np, scale)


@pytest.mark.parametrize("stride", [1, 4])
def test_detect_stride_box_interpolation(tmp_path, rng, stride, monkeypatch):
    """Frames between detections get linearly interpolated boxes; stride=1
    reduces to the per-frame reference behavior (every box exact)."""
    import dataclasses

    from avcer_tpu.core.config import DetectorConfig, PipelineConfig
    from avcer_tpu.pipeline import media
    from avcer_tpu.pipeline.runner import Pipeline

    n_frames, h, w = 20, 96, 128

    class FakeReader:
        class meta:
            width, height, fps, total_frames = w, h, 25, n_frames
            path = "fake.avi"

        def batches(self, batch_size):
            for s in range(0, n_frames, batch_size):
                n = min(batch_size, n_frames - s)
                frames = np.zeros((batch_size, h, w, 3), np.uint8)
                for j in range(batch_size):
                    frames[j, :, :, :] = min(s + min(j, n - 1), 255)
                yield frames, n

    cfg = PipelineConfig(
        detector=DetectorConfig(batch_size=8, stride=stride, long_side=0)
    )
    pipe = Pipeline.__new__(Pipeline)  # stages injected manually
    pipe.cfg = cfg
    pipe.detect = StridedStubDetect(stride)
    recorded = {}

    class FakeVisual:
        def run_static_from_frames(self, frames_dev, idx, boxes):
            recorded.setdefault("idx", []).append(np.array(idx))
            recorded.setdefault("boxes", []).append(np.array(boxes))
            p = len(idx)
            return np.zeros((p, 7), np.float32), np.zeros((p, 512), np.float32)

    pipe.visual = FakeVisual()
    present, stat, feats, _, face_boxes = Pipeline.detect_track_device(
        pipe, FakeReader()
    )

    assert present.all() and len(present) == n_frames
    assert face_boxes.shape == (n_frames, 4) and (face_boxes >= 0).all()
    idx = np.concatenate(recorded["idx"])
    boxes = np.concatenate(recorded["boxes"])
    np.testing.assert_array_equal(idx, np.arange(n_frames))
    last_det = (n_frames - 1) // stride * stride
    for i in range(n_frames):
        # linear motion -> interpolation reproduces the exact per-frame box;
        # past the final detection the box is held
        expect_x1 = 10 + (i if i <= last_det else last_det)
        assert boxes[i, 0] == expect_x1, (i, boxes[i], expect_x1)
        assert boxes[i, 1] == 20 and boxes[i, 3] == 60

def test_cnn_stride_sel_and_fill(rng):
    """cnn_compute_sel selects greedily in FRAME-ID space (the <=
    cnn_stride-1-frame staleness bound must hold even with sparse
    presence) plus every step frame; chunking with the prev_gid carry
    equals the single-shot selection; subset_forward_fill holds the last
    computed row, including across chunk boundaries via the carry."""
    from avcer_tpu.pipeline.visual import cnn_compute_sel, subset_forward_fill

    # present frames at irregular global ids (detection gaps)
    gids = np.array([0, 1, 2, 5, 6, 9, 10, 11, 14, 15, 20, 22, 25, 27, 31])
    step, cs = 5, 4
    sel, last = cnn_compute_sel(gids, step, cs)
    # independent greedy reference
    expect = np.zeros(gids.size, bool)
    prev = None
    for i, g in enumerate(gids):
        if prev is None or g - prev >= cs or g % step == 0:
            expect[i] = True
            prev = g
    np.testing.assert_array_equal(sel, expect)
    assert sel[0] and last == int(gids[np.flatnonzero(sel)[-1]])
    # the staleness bound in frame-id space: no present frame is ever
    # served a row computed >= cs frames earlier
    comp = np.where(sel, gids, -10**9)
    held_gid = np.maximum.accumulate(comp)
    assert int(np.max(gids - held_gid)) < cs

    # chunked selection with the prev_gid carry == single-shot
    s1, l1 = cnn_compute_sel(gids[:7], step, cs)
    s2, _ = cnn_compute_sel(gids[7:], step, cs, l1)
    np.testing.assert_array_equal(np.concatenate([s1, s2]), sel)

    # sparse presence: face on every 3rd frame, cs=5 -> the position-
    # stride rule would compute every 15 frames; greedy keeps the bound
    sparse = np.arange(0, 60, 3)
    ss, _ = cnn_compute_sel(sparse, 5, 5)
    comp = np.where(ss, sparse, -10**9)
    assert int(np.max(sparse - np.maximum.accumulate(comp))) < 5

    rows = rng.normal(size=(int(sel.sum()), 3)).astype(np.float32)
    filled, carry = subset_forward_fill(sel, rows, None)
    # forward-fill reference
    ref = np.empty((gids.size, 3), np.float32)
    j = -1
    for i in range(gids.size):
        if sel[i]:
            j += 1
        ref[i] = rows[j]
    np.testing.assert_array_equal(filled, ref)
    np.testing.assert_array_equal(carry, ref[-1])

    # chunked fill with carry == single-shot fill
    split = 7
    f1, c1 = subset_forward_fill(sel[:split], rows[: int(sel[:split].sum())], None)
    f2, c2 = subset_forward_fill(sel[split:], rows[int(sel[:split].sum()):], c1)
    np.testing.assert_array_equal(np.concatenate([f1, f2]), ref)
    np.testing.assert_array_equal(c2, ref[-1])

    # a chunk with NO computed rows holds the carry throughout
    f3, c3 = subset_forward_fill(
        np.zeros(4, bool), np.zeros((0, 3), np.float32), carry
    )
    np.testing.assert_array_equal(f3, np.tile(carry[None], (4, 1)))
    np.testing.assert_array_equal(c3, carry)

    # leading unselected rows without a carry fail loudly, not as a
    # downstream TypeError
    with pytest.raises(ValueError):
        subset_forward_fill(
            np.array([False, True]), np.zeros((1, 3), np.float32), None
        )


def test_cnn_stride_device_path(tmp_path, rng):
    """detect_track_device under cnn_stride: the CNN sees ONLY the selected
    frames (stride positions + step frames), and the returned stat/feats
    are the forward-filled expansion — step-frame rows exact, so the
    dynamic-model inputs are unchanged."""
    from avcer_tpu.core.config import (DetectorConfig, PipelineConfig,
                                       VisualConfig)
    from avcer_tpu.pipeline.runner import Pipeline
    from avcer_tpu.pipeline.visual import cnn_compute_sel

    n_frames, h, w = 20, 96, 128
    step, cs = 5, 3

    class FakeReader:
        class meta:
            width, height, fps, total_frames = w, h, 25, n_frames
            path = "fake.avi"

        def batches(self, batch_size):
            for s in range(0, n_frames, batch_size):
                n = min(batch_size, n_frames - s)
                frames = np.zeros((batch_size, h, w, 3), np.uint8)
                for j in range(batch_size):
                    frames[j, :, :, :] = min(s + min(j, n - 1), 255)
                yield frames, n

    cfg = PipelineConfig(
        detector=DetectorConfig(batch_size=8, long_side=0),
        visual=VisualConfig(cnn_stride=cs),
    )
    pipe = Pipeline.__new__(Pipeline)
    pipe.cfg = cfg
    pipe.detect = StridedStubDetect(1)
    recorded = {}

    class FakeVisual:
        def run_static_from_frames(self, frames_dev, idx, boxes):
            recorded.setdefault("idx", []).append(np.array(idx))
            p = len(idx)
            # encode the frame id into the rows so the fill is checkable
            stat = np.tile(np.array(idx, np.float32)[:, None], (1, 7))
            feats = np.tile(np.array(idx, np.float32)[:, None], (1, 512))
            return stat, feats

    pipe.visual = FakeVisual()
    present, stat, feats, _, _ = Pipeline.detect_track_device(
        pipe, FakeReader(), cnn_step=step
    )

    assert present.all()
    computed = np.concatenate(recorded["idx"])
    sel, _ = cnn_compute_sel(np.arange(n_frames), step, cs)
    np.testing.assert_array_equal(computed, np.flatnonzero(sel))
    # forward-fill: each row holds the last computed frame id
    held = np.flatnonzero(sel)[np.cumsum(sel) - 1]
    np.testing.assert_array_equal(stat[:, 0], held.astype(np.float32))
    np.testing.assert_array_equal(feats[:, 0], held.astype(np.float32))
    # every step frame is computed exactly (dynamic stream unchanged)
    assert sel[::step].all()
    # staleness bound: no frame served a row >= cs frame-ids old
    ids = np.arange(n_frames)
    assert int(np.max(ids - held)) < cs


def test_calibrate_batch_sizes(tmp_path, rng):
    """One-shot calibration measures candidate batch sizes, applies the
    optimum to the live pipeline, and round-trips through its cache."""
    from avcer_tpu.core.config import (AudioConfig, DetectorConfig,
                                       PipelineConfig, VisualConfig)
    from avcer_tpu.models.wav2vec2 import Wav2Vec2Config
    from avcer_tpu.pipeline.builder import build_pipeline
    from avcer_tpu.pipeline.calibrate import calibrate

    cfg = PipelineConfig(
        detector=DetectorConfig(batch_size=8, long_side=64),
        visual=VisualConfig(batch_size=16),
        audio=AudioConfig(batch_size=4),
        weights_dir=str(tmp_path / "nonexistent_weights"),
    )
    tiny_w2v2 = Wav2Vec2Config(
        hidden_size=64, num_layers=2, num_heads=4, intermediate_size=128,
        conv_dim=(16,) * 7,
    )
    pipe = build_pipeline(cfg, wav2vec2_config=tiny_w2v2)
    cache = str(tmp_path / "calib.json")
    rec = calibrate(pipe, cache_path=cache, cnn_batches=(4, 8), audio_batches=(2, 4))
    assert rec["visual_batch"] in (4, 8)
    assert rec["audio_batch"] in (2, 4)
    assert pipe.visual.batch_size == rec["visual_batch"]
    assert pipe.audio.cfg.batch_size == rec["audio_batch"]
    assert os.path.exists(cache)
    # second pipeline: served from cache (no new measurements), same applied values
    pipe2 = build_pipeline(cfg, wav2vec2_config=tiny_w2v2)
    rec2 = calibrate(pipe2, cache_path=cache, cnn_batches=(999,), audio_batches=(999,))
    assert rec2 == rec
    assert pipe2.visual.batch_size == rec["visual_batch"]


def test_calibration_record_validation():
    """Corrupt/hand-edited cache entries are rejected (re-measure path);
    well-formed measured records are adopted (advisor r2 cache-poisoning
    finding)."""
    from avcer_tpu.pipeline.calibrate import valid_record

    good = {
        "visual_batch": 8,
        "audio_batch": 4,
        "cnn_ms_per_frame": {"4": 1.0, "8": 0.7},
        "audio_ms_per_window": {"2": 3.0, "4": 2.5},
    }
    assert valid_record(good)
    assert not valid_record(None)
    assert not valid_record("256")
    assert not valid_record({})
    assert not valid_record({**good, "visual_batch": "8"})       # str, not int
    assert not valid_record({**good, "visual_batch": -8})
    assert not valid_record({**good, "audio_batch": 16})         # unmeasured
    assert not valid_record({k: v for k, v in good.items()
                             if k != "cnn_ms_per_frame"})
