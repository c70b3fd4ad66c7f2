"""Import the REAL reference modules from /root/reference/src for
differential parity testing (VERDICT.md round-1, Missing #1).

The reference depends on torchvision only for ``models.resnet50`` and
``models._utils.IntermediateLayerGetter`` (retina_face.py:4-5); torchvision
is not installed in this image, so this module installs a minimal stub into
``sys.modules`` BEFORE the reference package is imported. The stub's
resnet50 replicates torchvision's module naming/order exactly (that naming
is the converter contract for Resnet50_Final.pth); IntermediateLayerGetter
replicates torchvision's children-filtering semantics.

Everything else (FPN/SSH/heads, MobileNetV1, the emotion CNN/LSTM, the audio
ExprModels, the fusion/CLI scripts) imports and runs as-is on torch-cpu.
"""

from __future__ import annotations

import importlib.machinery
import sys
import types
from collections import OrderedDict


def _module(name: str) -> types.ModuleType:
    """Stub module with a valid __spec__ (transformers probes availability
    via importlib.util.find_spec, which rejects spec-less sys.modules
    entries)."""
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod

import torch
import torch.nn as nn

REF_SRC = "/root/reference/src"
REF_FACEDET = "/root/reference/src/data/face_detection"


class _TorchvisionResNet50(nn.Module):
    """torchvision.models.resnet50() lookalike: exact child naming/order and
    v1.5 bottleneck structure (stride on 3x3 conv, downsample Sequential)."""

    def __init__(self):
        super().__init__()
        import torch_twins as twins

        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        in_ch = 64
        for li, (blocks, planes) in enumerate(zip((3, 4, 6, 3), (64, 128, 256, 512))):
            stride = 1 if li == 0 else 2
            layer = []
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                ds = bi == 0 and (s != 1 or in_ch != planes * 4)
                layer.append(twins.TVStyleBottleneck(in_ch, planes, s, ds))
                in_ch = planes * 4
            setattr(self, f"layer{li + 1}", nn.Sequential(*layer))
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(2048, 1000)

    def forward(self, x):  # pragma: no cover - IntermediateLayerGetter bypasses
        h = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for li in range(4):
            h = getattr(self, f"layer{li + 1}")(h)
        return self.fc(torch.flatten(self.avgpool(h), 1))


class _IntermediateLayerGetter(nn.ModuleDict):
    """torchvision.models._utils.IntermediateLayerGetter semantics: keep
    children in order up to the last requested layer; forward returns an
    OrderedDict keyed by the return_layers values."""

    def __init__(self, model: nn.Module, return_layers: dict):
        orig = {str(k): str(v) for k, v in return_layers.items()}
        remaining = dict(orig)
        layers = OrderedDict()
        for name, module in model.named_children():
            layers[name] = module
            if name in remaining:
                del remaining[name]
            if not remaining:
                break
        super().__init__(layers)
        self.return_layers = orig

    def forward(self, x):
        out = OrderedDict()
        for name, module in self.items():
            x = module(x)
            if name in self.return_layers:
                out[self.return_layers[name]] = x
        return out


class _Compose:
    def __init__(self, fns):
        self.fns = fns

    def __call__(self, x):
        for f in self.fns:
            x = f(x)
        return x


class _PILToTensor:
    """torchvision.transforms.PILToTensor: PIL -> uint8 CHW tensor, no scaling."""

    def __call__(self, img):
        import numpy as np

        return torch.from_numpy(np.array(img)).permute(2, 0, 1)


def install_torchvision_stub() -> None:
    if "torchvision" in sys.modules:
        return
    tv = _module("torchvision")
    models = _module("torchvision.models")
    utils = _module("torchvision.models._utils")
    transforms = _module("torchvision.transforms")
    models.resnet50 = lambda *a, **k: _TorchvisionResNet50()
    utils.IntermediateLayerGetter = _IntermediateLayerGetter
    models._utils = utils
    transforms.Compose = _Compose
    transforms.PILToTensor = _PILToTensor
    tv.models = models
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models._utils"] = utils
    sys.modules["torchvision.transforms"] = transforms


def install_torchaudio_stub() -> None:
    """torchaudio is not installed; the reference only needs ``load`` and
    ``transforms.Resample`` (data/utils.py:42-60). ``load`` reads 16-bit PCM
    via the same reader avcer_tpu uses (int16/32768 scaling = torchaudio's);
    Resample is only constructed when sample rates differ, which the
    differential harness avoids by pre-writing the wav at the target rate."""
    if "torchaudio" in sys.modules:
        return
    ta = _module("torchaudio")
    transforms = _module("torchaudio.transforms")

    def load(path):
        from avcer_tpu.pipeline.media import read_wav

        wav, sr = read_wav(path)  # already [channels, samples]
        return torch.from_numpy(wav), sr

    class Resample:
        def __init__(self, orig_freq, new_freq):
            if orig_freq != new_freq:
                raise NotImplementedError(
                    "torchaudio stub: write the wav at the target rate"
                )

        def __call__(self, wav):
            return wav

    ta.load = load
    transforms.Resample = Resample
    ta.transforms = transforms
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.transforms"] = transforms


def add_reference_paths() -> None:
    for p in (REF_SRC, REF_FACEDET):
        if p not in sys.path:
            sys.path.insert(0, p)


def load_reference_retinaface():
    """Real retina_face module (network + config) with the torchvision stub."""
    install_torchvision_stub()
    add_reference_paths()
    from ibug.face_detection.retina_face import config as ref_config
    from ibug.face_detection.retina_face import retina_face as ref_rf

    return ref_rf, ref_config


def load_reference_architectures():
    """Real src/architectures modules (video + audio + attention)."""
    add_reference_paths()
    import architectures.attention_layers as ref_attn
    import architectures.video as ref_video

    return ref_video, ref_attn


def load_reference_audio_models(num_classes: int = 8):
    add_reference_paths()
    if num_classes == 8:
        import architectures.audio_8_cl as mod
    else:
        import architectures.audio_7_cl as mod
    return mod
