"""PyTorch checkpoint -> Flax variables converters.

The reference distributes five checkpoint families (none vendored in-repo;
they come from Google Drive / HF hub — /root/reference/README.md:15):

1. ``FER_static_ResNet50_AffectNet.pt``   (get_prob_video.py:22-25)
2. ``FER_dinamic_LSTM_Aff-Wild2.pt``      (get_prob_video.py:51-54)
3. ``epoch_NN.pth`` ExprModel heads, stored as
   ``{"model_state_dict": ...}``         (get_prob_audio_8_cl.py:58-66)
   over HF wav2vec2 weights              (audio_8_cl.py:18-22)
4. ``Resnet50_Final.pth`` RetinaFace     (retina_face_predictor.py:27-36)
5. legacy Keras ``.h5`` (EMO-AffectNet)  — covered by (1): the .pt files are
   the ported versions the pipeline actually loads.

Each converter maps a torch ``state_dict`` (tensor or numpy values) to the
Flax variable tree of the corresponding ``avcer_tpu.models`` module, with
layout transposes (OIHW->HWIO etc.) and weight-norm fusion. Every converted
family has an activation-parity test against a torch twin with random
weights (tests/test_model_parity.py), which is exactly the guarantee needed
to load the published checkpoints.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Mapping

import numpy as np

Array = np.ndarray
StateDict = Mapping[str, Any]


def _np(t: Any) -> Array:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def conv2d_kernel(w: Any) -> Array:
    """torch OIHW -> flax HWIO."""
    return _np(w).transpose(2, 3, 1, 0)


def conv1d_kernel(w: Any) -> Array:
    """torch OIL -> flax LIO."""
    return _np(w).transpose(2, 1, 0)


def dense_kernel(w: Any) -> Array:
    """torch (out, in) -> flax (in, out)."""
    return _np(w).T


def _dense(sd: StateDict, prefix: str, bias: bool = True) -> dict[str, Array]:
    out = {"kernel": dense_kernel(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _ln(sd: StateDict, prefix: str) -> dict[str, Array]:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _bn(sd: StateDict, prefix: str) -> tuple[dict[str, Array], dict[str, Array]]:
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def _conv2d(sd: StateDict, prefix: str, bias: bool = False) -> dict[str, Array]:
    out = {"kernel": conv2d_kernel(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _conv1d(sd: StateDict, prefix: str, bias: bool = True) -> dict[str, Array]:
    out = {"kernel": conv1d_kernel(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


class _Tree:
    """Tiny helper building nested params/batch_stats dicts with path keys."""

    def __init__(self) -> None:
        self.params: dict[str, Any] = {}
        self.stats: dict[str, Any] = {}

    @staticmethod
    def _set(root: dict, path: str, value: Any) -> None:
        parts = path.split("/")
        for p in parts[:-1]:
            root = root.setdefault(p, {})
        root[parts[-1]] = value

    def p(self, path: str, value: Any) -> None:
        self._set(self.params, path, value)

    def bn(self, path: str, sd: StateDict, prefix: str) -> None:
        params, stats = _bn(sd, prefix)
        self._set(self.params, path, params)
        self._set(self.stats, path, stats)

    def variables(self) -> dict[str, Any]:
        out: dict[str, Any] = {"params": self.params}
        if self.stats:
            out["batch_stats"] = self.stats
        return out


# ---------------------------------------------------------------------------
# 1. Emotion ResNet50 (architectures/video.py ResNet50)
# ---------------------------------------------------------------------------


def convert_emotion_resnet50(sd: StateDict) -> dict[str, Any]:
    t = _Tree()
    t.p("conv_stem", _conv2d(sd, "conv_layer_s2_same"))
    t.bn("batch_norm1", sd, "batch_norm1")
    for li, blocks in enumerate((3, 4, 6, 3)):
        for bi in range(blocks):
            tp = f"layer{li + 1}.{bi}"
            fp = f"layer{li + 1}_{bi}"
            for ci in (1, 2, 3):
                t.p(f"{fp}/conv{ci}", _conv2d(sd, f"{tp}.conv{ci}"))
                t.bn(f"{fp}/batch_norm{ci}", sd, f"{tp}.batch_norm{ci}")
            if f"{tp}.i_downsample.0.weight" in sd:
                t.p(f"{fp}/downsample_conv", _conv2d(sd, f"{tp}.i_downsample.0"))
                t.bn(f"{fp}/downsample_bn", sd, f"{tp}.i_downsample.1")
    t.p("fc1", _dense(sd, "fc1"))
    t.p("fc2", _dense(sd, "fc2"))
    return t.variables()


# ---------------------------------------------------------------------------
# 2. Temporal LSTM (architectures/video.py LSTMPyTorch)
# ---------------------------------------------------------------------------


def convert_temporal_lstm(sd: StateDict) -> dict[str, Any]:
    t = _Tree()
    for name in ("lstm1", "lstm2"):
        t.p(f"{name}/cell/ih", {
            "kernel": dense_kernel(sd[f"{name}.weight_ih_l0"]),
            "bias": _np(sd[f"{name}.bias_ih_l0"]),
        })
        t.p(f"{name}/cell/hh", {
            "kernel": dense_kernel(sd[f"{name}.weight_hh_l0"]),
            "bias": _np(sd[f"{name}.bias_hh_l0"]),
        })
    t.p("fc", _dense(sd, "fc"))
    return t.variables()


# ---------------------------------------------------------------------------
# 3. Audio ExprModel (wav2vec2 + head)
# ---------------------------------------------------------------------------


def _fused_pos_conv_weight(sd: StateDict, prefix: str) -> Array:
    """Fuse torch weight-norm (g * v / ||v||, norm over dims (0,1)) into a
    plain conv weight; handles both parametrization naming schemes."""
    new = f"{prefix}.conv.parametrizations.weight"
    old = f"{prefix}.conv"
    if f"{new}.original0" in sd:
        g = _np(sd[f"{new}.original0"])
        v = _np(sd[f"{new}.original1"])
    elif f"{old}.weight_g" in sd:
        g = _np(sd[f"{old}.weight_g"])
        v = _np(sd[f"{old}.weight_v"])
    else:  # already fused
        return _np(sd[f"{old}.weight"])
    norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=(0, 1), keepdims=True))
    return (g * v / norm).astype(v.dtype)


def convert_wav2vec2(sd: StateDict, prefix: str = "wav2vec2.", num_layers: int = 12) -> _Tree:
    t = _Tree()
    fe = f"{prefix}feature_extractor.conv_layers"
    i = 0
    while f"{fe}.{i}.conv.weight" in sd:
        t.p(f"feature_extractor/conv_layers_{i}_conv", _conv1d(sd, f"{fe}.{i}.conv"))
        t.p(
            f"feature_extractor/conv_layers_{i}_layer_norm",
            _ln(sd, f"{fe}.{i}.layer_norm"),
        )
        i += 1
    fp = f"{prefix}feature_projection"
    t.p("feature_projection/layer_norm", _ln(sd, f"{fp}.layer_norm"))
    t.p("feature_projection/projection", _dense(sd, f"{fp}.projection"))

    pc = f"{prefix}encoder.pos_conv_embed"
    w = _fused_pos_conv_weight(sd, pc)  # (out, in/groups, k)
    t.p("pos_conv_embed/conv", {
        "kernel": w.transpose(2, 1, 0),
        "bias": _np(sd[f"{pc}.conv.bias"]),
    })
    for li in range(num_layers):
        lp = f"{prefix}encoder.layers.{li}"
        fl = f"layers_{li}"
        t.p(f"{fl}/layer_norm", _ln(sd, f"{lp}.layer_norm"))
        for proj in ("q", "k", "v", "out"):
            t.p(f"{fl}/attention_{proj}_proj", _dense(sd, f"{lp}.attention.{proj}_proj"))
        t.p(f"{fl}/final_layer_norm", _ln(sd, f"{lp}.final_layer_norm"))
        t.p(f"{fl}/intermediate_dense", _dense(sd, f"{lp}.feed_forward.intermediate_dense"))
        t.p(f"{fl}/output_dense", _dense(sd, f"{lp}.feed_forward.output_dense"))
    t.p("layer_norm", _ln(sd, f"{prefix}encoder.layer_norm"))
    return t


def _convert_transformer_layer(t: _Tree, sd: StateDict, tp: str, fp: str) -> None:
    pre = f"{tp}." if tp else ""
    for w in ("query_w", "keys_w", "values_w", "ff_layer_after_concat"):
        t.p(f"{fp}/self_attention/{w}", _dense(sd, f"{pre}self_attention.{w}", bias=False))
    t.p(f"{fp}/add_norm_after_attention/layer_norm",
        _ln(sd, f"{pre}add_norm_after_attention.layer_norm"))
    t.p(f"{fp}/add_norm_after_ff/layer_norm",
        _ln(sd, f"{pre}add_norm_after_ff.layer_norm"))
    t.p(f"{fp}/feed_forward/layer_1", _dense(sd, f"{pre}feed_forward.layer_1"))
    t.p(f"{fp}/feed_forward/layer_2", _dense(sd, f"{pre}feed_forward.layer_2"))


def convert_expr_model(sd: StateDict, variant: str = "v3", num_layers: int = 12) -> dict[str, Any]:
    """ExprModelV1/V2/V3 checkpoint (incl. nested wav2vec2) -> Flax variables.

    Accepts the raw ``model_state_dict`` payload the reference saves
    (net_trainer.py:273-287, loaded at get_prob_audio_8_cl.py:58-66).
    """
    sd = {k: v for k, v in sd.items() if not k.endswith("num_batches_tracked")}
    t = convert_wav2vec2(sd, "wav2vec2.", num_layers)
    # re-root wav2vec2 under its module name
    t.params = {"wav2vec2": t.params}
    t.stats = {"wav2vec2": t.stats} if t.stats else {}

    if variant == "v1":
        for layer in (0, 1):
            t.p(f"gru/cell_{layer}/ih", {
                "kernel": dense_kernel(sd[f"gru.weight_ih_l{layer}"]),
                "bias": _np(sd[f"gru.bias_ih_l{layer}"]),
            })
            t.p(f"gru/cell_{layer}/hh", {
                "kernel": dense_kernel(sd[f"gru.weight_hh_l{layer}"]),
                "bias": _np(sd[f"gru.bias_hh_l{layer}"]),
            })
    else:
        _convert_transformer_layer(t, sd, "tl1", "tl1")
        _convert_transformer_layer(t, sd, "tl2", "tl2")

    # time_downsample: Sequential indices 0 conv, 1 bn, 4 conv, 5 bn
    t.p("time_downsample/conv1", _conv1d(sd, "time_downsample.0"))
    t.bn("time_downsample/bn1", sd, "time_downsample.1")
    t.p("time_downsample/conv2", _conv1d(sd, "time_downsample.4"))
    t.bn("time_downsample/bn2", sd, "time_downsample.5")
    t.p("feature_downsample", _dense(sd, "feature_downsample"))
    return t.variables()


# ---------------------------------------------------------------------------
# 4. RetinaFace
# ---------------------------------------------------------------------------


def _convert_convbn(t: _Tree, sd: StateDict, tp: str, fp: str) -> None:
    """torch Sequential(conv, bn[, act]) -> ConvBN module."""
    t.p(f"{fp}/conv", _conv2d(sd, f"{tp}.0"))
    t.bn(f"{fp}/bn", sd, f"{tp}.1")


def _convert_tv_resnet(t: _Tree, sd: StateDict, prefix: str = "body.") -> None:
    t.p("body/conv1", _conv2d(sd, f"{prefix}conv1"))
    t.bn("body/bn1", sd, f"{prefix}bn1")
    for li, blocks in enumerate((3, 4, 6, 3)):
        for bi in range(blocks):
            tp = f"{prefix}layer{li + 1}.{bi}"
            fp = f"body/layer{li + 1}_{bi}"
            for ci in (1, 2, 3):
                t.p(f"{fp}/conv{ci}", _conv2d(sd, f"{tp}.conv{ci}"))
                t.bn(f"{fp}/bn{ci}", sd, f"{tp}.bn{ci}")
            if f"{tp}.downsample.0.weight" in sd:
                t.p(f"{fp}/downsample_conv", _conv2d(sd, f"{tp}.downsample.0"))
                t.bn(f"{fp}/downsample_bn", sd, f"{tp}.downsample.1")


def _convert_mobilenet(t: _Tree, sd: StateDict, prefix: str = "body.") -> None:
    _convert_convbn(t, sd, f"{prefix}stage1.0", "body/stage1_0")
    idx = {"stage1": 6, "stage2": 6, "stage3": 2}
    for stage, n in idx.items():
        for i in range(n):
            if stage == "stage1" and i == 0:
                continue
            tp = f"{prefix}{stage}.{i}"
            fp = f"body/{stage}_{i if stage != 'stage1' else i}"
            # conv_dw = Sequential(dw conv, bn, act, pw conv, bn, act)
            t.p(f"{fp}/dw/conv", _conv2d(sd, f"{tp}.0"))
            t.bn(f"{fp}/dw/bn", sd, f"{tp}.1")
            t.p(f"{fp}/pw/conv", _conv2d(sd, f"{tp}.3"))
            t.bn(f"{fp}/pw/bn", sd, f"{tp}.4")


def convert_retinaface(sd: StateDict, backbone: str = "resnet50") -> dict[str, Any]:
    """RetinaFace ``Resnet50_Final.pth``-style state dict -> Flax variables.

    Handles the reference's ``module.``-prefix stripping
    (retina_face_predictor.py:28-34).
    """
    sd = {
        re.sub(r"^module\.", "", k): v
        for k, v in sd.items()
        if not k.endswith("num_batches_tracked")
    }
    t = _Tree()
    if backbone == "resnet50":
        _convert_tv_resnet(t, sd)
    else:
        _convert_mobilenet(t, sd)
    for out in (1, 2, 3):
        _convert_convbn(t, sd, f"fpn.output{out}", f"fpn/output{out}")
    for m in (1, 2):
        _convert_convbn(t, sd, f"fpn.merge{m}", f"fpn/merge{m}")
    for s in (1, 2, 3):
        for conv in ("conv3X3", "conv5X5_1", "conv5X5_2", "conv7X7_2", "conv7x7_3"):
            _convert_convbn(t, sd, f"ssh{s}.{conv}", f"ssh{s}/{conv}")
    for i in range(3):
        t.p(f"ClassHead_{i}", _conv2d(sd, f"ClassHead.{i}.conv1x1", bias=True))
        t.p(f"BboxHead_{i}", _conv2d(sd, f"BboxHead.{i}.conv1x1", bias=True))
        t.p(f"LandmarkHead_{i}", _conv2d(sd, f"LandmarkHead.{i}.conv1x1", bias=True))
    return t.variables()


# ---------------------------------------------------------------------------
# 5. S3FD
# ---------------------------------------------------------------------------


def convert_s3fd(sd: StateDict) -> dict[str, Any]:
    """S3FD ``s3fd_weights.pth`` -> Flax variables (names per s3fd_net.py)."""
    sd = {re.sub(r"^module\.", "", k): v for k, v in sd.items()}
    t = _Tree()
    vgg_conv_idx = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28, 30, 32)
    # torch ModuleList indices of convs: 0,2,5,7,10,12,14,17,19,21,24,26,28,30,32
    # our names reuse the torch index except fc6/fc7 (30->31 naming quirk
    # avoided: we named them vgg_31/vgg_33 after the reference's relu slots)
    name_map = {30: "vgg_31", 32: "vgg_33"}
    for i in vgg_conv_idx:
        if f"vgg.{i}.weight" not in sd:
            continue
        t.p(name_map.get(i, f"vgg_{i}"), _conv2d(sd, f"vgg.{i}", bias=True))
    for norm in ("L2Norm3_3", "L2Norm4_3", "L2Norm5_3"):
        t.p(norm, {"weight": _np(sd[f"{norm}.weight"])})
    for i in range(4):
        t.p(f"extras_{i}", _conv2d(sd, f"extras.{i}", bias=True))
    for i in range(6):
        t.p(f"loc_{i}", _conv2d(sd, f"loc.{i}", bias=True))
        t.p(f"conf_{i}", _conv2d(sd, f"conf.{i}", bias=True))
    return t.variables()


# ---------------------------------------------------------------------------
# Checkpoint IO helpers
# ---------------------------------------------------------------------------


def load_torch_state_dict(path: str) -> dict[str, Array]:
    """Load a torch checkpoint file into numpy arrays; unwraps the
    ``{"model_state_dict": ...}`` training wrapper (net_trainer.py:273-287)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: _np(v) for k, v in obj.items() if hasattr(v, "detach") or isinstance(v, np.ndarray)}


CONVERTERS: dict[str, Callable[..., dict[str, Any]]] = {
    "emotion_resnet50": convert_emotion_resnet50,
    "temporal_lstm": convert_temporal_lstm,
    "expr_model": convert_expr_model,
    "retinaface": convert_retinaface,
    "s3fd": convert_s3fd,
}
