"""Device-side audio windowing must match the host windowing + forward path
for every padding mode (spec: data/utils.py:63-89 + get_prob_audio_8_cl.py:78-90)."""

import numpy as np
import pytest
import jax.numpy as jnp

from avcer_tpu.core.checkpoint import init_variables
from avcer_tpu.core.config import AudioConfig
from avcer_tpu.models.wav2vec2 import Wav2Vec2Config
from avcer_tpu.pipeline.audio_stage import AudioStage, make_windows

TINY = Wav2Vec2Config(
    hidden_size=64, num_layers=1, num_heads=4, intermediate_size=128,
    conv_dim=(16,) * 7,
)


@pytest.fixture(scope="module")
def stage():
    cfg = AudioConfig(num_classes=8, head="v3", batch_size=4,
                      window_sec=4.0, step_sec=0.5)
    from avcer_tpu.models.audio_heads import ExprModel

    model = ExprModel(variant="v3", num_classes=8, wav2vec2_config=TINY,
                      dtype=jnp.float32)
    variables = init_variables(model, (jnp.zeros((1, 64000), jnp.float32),))
    st = AudioStage(variables, cfg, TINY, dtype=jnp.float32)
    return st


@pytest.mark.parametrize("padding", ["mean", "constant", "repeat"])
def test_device_window_extraction_matches_host(stage, padding, rng):
    """The contract is the extracted+padded window content — logits are NOT
    compared because an untrained wav2vec2 is numerically chaotic (its
    LayerNorm chain amplifies 1e-10 input deltas to O(0.1) logits over the
    constant padded regions)."""
    import dataclasses
    import jax

    stage.cfg = dataclasses.replace(stage.cfg, padding=padding)
    wav = (rng.normal(size=int(2.3 * 16000)) * 0.1).astype(np.float32)
    host_windows = make_windows(wav, stage.cfg, fps=25.0)
    starts = np.asarray([s for s, _ in host_windows.spans], np.int32)
    wav_dev = jnp.asarray(np.pad(wav, (0, 64001)))
    got = np.asarray(
        jax.jit(stage._extract_impl, static_argnames=("padding",))(
            wav_dev, jnp.asarray(len(wav), jnp.int32), jnp.asarray(starts),
            padding=padding,
        )
    )
    np.testing.assert_allclose(got, host_windows.batch, atol=1e-6)


@pytest.mark.parametrize("quant", ["none", "int8"])
def test_shared_extractor_stream_slices_match_window_features(stage, rng, quant):
    """Core identity behind AudioConfig.shared_extractor: the VALID-padded
    conv stack is shift-invariant, so stream features at frame
    start//prod(stride) + j equal window-local frame j EXACTLY when the
    same normalization is applied (the serving mode's only approximation is
    normalizing once per wav instead of per window). The identity must also
    hold for the int8 extractor with STATIC calibrated scales (quantization
    is elementwise with the same per-layer scale in both paths) — the turbo
    preset ships that combination."""
    import dataclasses

    from avcer_tpu.models.audio_heads import ExprModel

    wav = (rng.normal(size=int(6.5 * 16000)) * 0.1).astype(np.float32)
    xn = (wav - wav.mean()) / np.sqrt(wav.var() + 1e-7)
    window = 64000
    if quant == "int8":
        model = ExprModel(
            variant="v3", num_classes=8,
            wav2vec2_config=dataclasses.replace(TINY, quant=True),
            dtype=jnp.float32,
        )
        variables = stage.variables
        # calibrated static scales ON THIS SIGNAL: without them the dynamic
        # per-tensor scale would differ between the stream and each window
        _, upd = model.apply(
            variables, jnp.asarray(xn[:window][None]),
            mutable=["act_scales"],
        )
        variables = {**variables, "act_scales": upd["act_scales"]}
    else:
        model, variables = stage.model, stage.variables
    stream = np.asarray(
        model.apply(
            variables, jnp.asarray(xn[None]), w2v_mode="features_only"
        )[0]
    )
    stride_total = int(np.prod(TINY.conv_stride))
    fpw = TINY.num_output_frames(window)
    for s in (0, 8000, 24000, 40000):  # multiples of stride_total
        per_window = np.asarray(
            model.apply(
                variables, jnp.asarray(xn[s : s + window][None]),
                w2v_mode="features_only",
            )[0]
        )
        assert per_window.shape[0] == fpw
        np.testing.assert_allclose(
            stream[s // stride_total : s // stride_total + fpw],
            per_window, atol=1e-4, rtol=1e-4,
        )


@pytest.mark.parametrize("quant", ["none", "int8"])
def test_shared_extractor_run_from_wav(stage, rng, quant):
    """The shared-extractor serving path (exact and int8 — the turbo preset
    combines both) produces finite, deterministic, correctly-shaped logits
    with the exact path's window metadata."""
    import dataclasses

    wav = (rng.normal(size=int(2.3 * 16000)) * 0.1).astype(np.float32)
    shared = AudioStage(
        stage.variables,
        dataclasses.replace(stage.cfg, shared_extractor=True, quant=quant),
        TINY, dtype=jnp.float32,
    )
    got, meta = shared.run_from_wav(wav, fps=25.0)
    host_windows = make_windows(wav, stage.cfg, fps=25.0)
    assert got.shape == (len(host_windows.spans), 8)
    assert np.isfinite(got).all()
    got2, _ = shared.run_from_wav(wav, fps=25.0)
    np.testing.assert_array_equal(got, got2)
    np.testing.assert_array_equal(meta.frame_ids, host_windows.frame_ids)


@pytest.mark.slow
def test_run_from_wav_end_to_end(stage, rng):
    """Shapes/metadata of the device path; logits must be finite and
    deterministic across calls."""
    wav = (rng.normal(size=int(2.3 * 16000)) * 0.1).astype(np.float32)
    host_windows = make_windows(wav, stage.cfg, fps=25.0)
    got, meta = stage.run_from_wav(wav, fps=25.0)
    assert got.shape == (len(host_windows.spans), 8)
    assert np.isfinite(got).all()
    got2, _ = stage.run_from_wav(wav, fps=25.0)
    np.testing.assert_array_equal(got, got2)
    np.testing.assert_array_equal(meta.frame_ids, host_windows.frame_ids)
    np.testing.assert_array_equal(meta.window_of_row, host_windows.window_of_row)
