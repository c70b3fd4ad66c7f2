"""Torch fixture models for converter/parity tests.

These are *test fixtures*, not product code: minimal torch modules whose
``state_dict`` key names and forward math match the reference checkpoints'
(so the avcer_tpu converters can be validated with random weights, which is
exactly the contract needed to load the published checkpoints). Written
independently from the reference source; semantics cited per class.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# Emotion ResNet50 twin (spec: architectures/video.py:7-166)
# ---------------------------------------------------------------------------


def _bn2d(ch: int) -> nn.BatchNorm2d:
    return nn.BatchNorm2d(ch, eps=0.001, momentum=0.99)


class TwinBottleneck(nn.Module):
    def __init__(self, in_ch: int, planes: int, stride: int = 1, downsample: bool = False):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, planes, 1, stride=stride, bias=False)
        self.batch_norm1 = _bn2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding="same", bias=False)
        self.batch_norm2 = _bn2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.batch_norm3 = _bn2d(planes * 4)
        self.i_downsample = (
            nn.Sequential(
                nn.Conv2d(in_ch, planes * 4, 1, stride=stride, bias=False),
                _bn2d(planes * 4),
            )
            if downsample
            else None
        )

    def forward(self, x):
        idn = x if self.i_downsample is None else self.i_downsample(x)
        h = F.relu(self.batch_norm1(self.conv1(x)))
        h = F.relu(self.batch_norm2(self.conv2(h)))
        h = self.batch_norm3(self.conv3(h))
        return F.relu(h + idn)


class TwinEmotionResNet50(nn.Module):
    """Stem uses TF-'same' asymmetric padding (video.py:63-90), valid maxpool."""

    def __init__(self, num_classes: int = 7):
        super().__init__()
        self.conv_layer_s2_same = nn.Conv2d(3, 64, 7, stride=2, bias=False)
        self.batch_norm1 = _bn2d(64)
        in_ch = 64
        for li, (blocks, planes) in enumerate(zip((3, 4, 6, 3), (64, 128, 256, 512))):
            stride = 1 if li == 0 else 2
            layer = []
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                ds = bi == 0 and (s != 1 or in_ch != planes * 4)
                layer.append(TwinBottleneck(in_ch, planes, s, ds))
                in_ch = planes * 4
            setattr(self, f"layer{li + 1}", nn.Sequential(*layer))
        self.fc1 = nn.Linear(2048, 512)
        self.fc2 = nn.Linear(512, num_classes)

    @staticmethod
    def _same_pad(i: int, k: int, s: int) -> tuple[int, int]:
        total = max((math.ceil(i / s) - 1) * s + k - i, 0)
        return total // 2, total - total // 2

    def forward(self, x):
        ph = self._same_pad(x.shape[-2], 7, 2)
        pw = self._same_pad(x.shape[-1], 7, 2)
        x = F.pad(x, [pw[0], pw[1], ph[0], ph[1]])
        x = F.relu(self.batch_norm1(self.conv_layer_s2_same(x)))
        x = F.max_pool2d(x, 3, stride=2)
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
        x = x.mean(dim=(2, 3))
        feat = self.fc1(x)
        return self.fc2(F.relu(feat)), F.relu(feat)


class TwinTemporalLSTM(nn.Module):
    """Spec: video.py:169-185."""

    def __init__(self, num_classes: int = 7):
        super().__init__()
        self.lstm1 = nn.LSTM(512, 512, batch_first=True)
        self.lstm2 = nn.LSTM(512, 256, batch_first=True)
        self.fc = nn.Linear(256, num_classes)

    def forward(self, x):
        x, _ = self.lstm1(x)
        x, _ = self.lstm2(x)
        return self.fc(x[:, -1, :])


# ---------------------------------------------------------------------------
# Custom transformer layer twin (spec: attention_layers.py)
# ---------------------------------------------------------------------------


class TwinTransformerLayer(nn.Module):
    def __init__(self, input_dim: int, num_heads: int, max_len: int = 5000):
        super().__init__()
        d = input_dim

        class _MHA(nn.Module):
            def __init__(self):
                super().__init__()
                self.query_w = nn.Linear(d, d, bias=False)
                self.keys_w = nn.Linear(d, d, bias=False)
                self.values_w = nn.Linear(d, d, bias=False)
                self.ff_layer_after_concat = nn.Linear(d, d, bias=False)

            def forward(self, q, k, v):
                b, t, _ = q.shape
                hd = d // num_heads

                def split(x):
                    return x.view(b, t, num_heads, hd).transpose(1, 2)

                q, k, v = split(self.query_w(q)), split(self.keys_w(k)), split(self.values_w(v))
                a = torch.softmax(q @ k.transpose(-2, -1) / math.sqrt(hd), dim=-1)
                out = (a @ v).transpose(1, 2).reshape(b, t, d)
                return self.ff_layer_after_concat(out)

        class _AddNorm(nn.Module):
            def __init__(self):
                super().__init__()
                self.layer_norm = nn.LayerNorm(d)

            def forward(self, x, residual):
                return self.layer_norm(x + residual)

        class _FF(nn.Module):
            def __init__(self):
                super().__init__()
                self.layer_1 = nn.Linear(d, d)
                self.layer_2 = nn.Linear(d, d)

            def forward(self, x):
                return self.layer_2(F.relu(self.layer_1(x)))

        self.self_attention = _MHA()
        self.add_norm_after_attention = _AddNorm()
        self.add_norm_after_ff = _AddNorm()
        self.feed_forward = _FF()
        pos = torch.arange(max_len).unsqueeze(1)
        div = torch.exp(torch.arange(0, d, 2) * (-math.log(10000.0) / d))
        pe = torch.zeros(max_len, d)
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        self.register_buffer("pe", pe, persistent=False)

    def forward(self, x):
        x = x + self.pe[: x.size(1)]
        h = self.add_norm_after_attention(self.self_attention(x, x, x), x)
        return self.add_norm_after_ff(self.feed_forward(h), h)


# ---------------------------------------------------------------------------
# Audio head twin (spec: audio_8_cl.py ExprModelV1/V2/V3)
# ---------------------------------------------------------------------------


def make_hf_wav2vec2(num_layers: int = 2, hidden: int = 1024):
    """HF torch Wav2Vec2Model with the robust-family architecture, random
    weights, optionally shrunk for test speed."""
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    cfg = Wav2Vec2Config(
        hidden_size=hidden,
        num_hidden_layers=num_layers,
        num_attention_heads=16,
        intermediate_size=4 * hidden,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
        conv_bias=True,
        hidden_act="gelu",
        apply_spec_augment=False,
        layerdrop=0.0,
    )
    return Wav2Vec2Model(cfg)


class TwinExprModel(nn.Module):
    def __init__(self, variant: str = "v3", num_classes: int = 8, num_layers: int = 2):
        super().__init__()
        self.variant = variant
        self.wav2vec2 = make_hf_wav2vec2(num_layers)
        f = 1024 if variant != "v1" else 256
        if variant == "v1":
            self.gru = nn.GRU(1024, 256, num_layers=2, batch_first=True)
        else:
            self.tl1 = TwinTransformerLayer(1024, 32)
            self.tl2 = TwinTransformerLayer(1024, 16)
        self.time_downsample = nn.Sequential(
            nn.Conv1d(f, f, 5, stride=3, dilation=2),
            nn.BatchNorm1d(f),
            nn.MaxPool1d(5),
            nn.ReLU(),
            nn.Conv1d(f, f, 3),
            nn.BatchNorm1d(f),
            nn.AdaptiveAvgPool1d(1),
            nn.ReLU(),
        )
        self.feature_downsample = nn.Linear(f, num_classes)

    def forward(self, x):
        h = self.wav2vec2(x)[0]
        if self.variant == "v1":
            h, _ = self.gru(h)
        else:
            h = self.tl1(h)
            h = self.tl2(h)
        h = self.time_downsample(h.permute(0, 2, 1))
        return self.feature_downsample(h.squeeze(-1))


# ---------------------------------------------------------------------------
# RetinaFace twin (spec: retina_face.py + retina_face_net.py)
# ---------------------------------------------------------------------------


def _cbn(inp, oup, k=3, s=1, leaky=0.0, relu=True):
    mods = [
        nn.Conv2d(inp, oup, k, s, (k - 1) // 2, bias=False),
        nn.BatchNorm2d(oup),
    ]
    if relu:
        mods.append(nn.LeakyReLU(negative_slope=leaky, inplace=True))
    return nn.Sequential(*mods)


class TwinSSH(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        leaky = 0.1 if out_ch <= 64 else 0.0
        self.conv3X3 = _cbn(in_ch, out_ch // 2, relu=False)
        self.conv5X5_1 = _cbn(in_ch, out_ch // 4, leaky=leaky)
        self.conv5X5_2 = _cbn(out_ch // 4, out_ch // 4, relu=False)
        self.conv7X7_2 = _cbn(out_ch // 4, out_ch // 4, leaky=leaky)
        self.conv7x7_3 = _cbn(out_ch // 4, out_ch // 4, relu=False)

    def forward(self, x):
        c5_1 = self.conv5X5_1(x)
        return F.relu(
            torch.cat(
                [self.conv3X3(x), self.conv5X5_2(c5_1), self.conv7x7_3(self.conv7X7_2(c5_1))],
                dim=1,
            )
        )


class TwinFPN(nn.Module):
    def __init__(self, in_list, out_ch):
        super().__init__()
        leaky = 0.1 if out_ch <= 64 else 0.0
        self.output1 = _cbn(in_list[0], out_ch, k=1, leaky=leaky)
        self.output2 = _cbn(in_list[1], out_ch, k=1, leaky=leaky)
        self.output3 = _cbn(in_list[2], out_ch, k=1, leaky=leaky)
        self.merge1 = _cbn(out_ch, out_ch, leaky=leaky)
        self.merge2 = _cbn(out_ch, out_ch, leaky=leaky)

    def forward(self, feats):
        o1, o2, o3 = self.output1(feats[0]), self.output2(feats[1]), self.output3(feats[2])
        o2 = self.merge2(o2 + F.interpolate(o3, size=o2.shape[2:], mode="nearest"))
        o1 = self.merge1(o1 + F.interpolate(o2, size=o1.shape[2:], mode="nearest"))
        return [o1, o2, o3]


class TVStyleBottleneck(nn.Module):
    """torchvision ResNet v1.5 bottleneck: stride on the 3x3 conv, BN eps 1e-5,
    state_dict names conv1/bn1/conv2/bn2/conv3/bn3/downsample.{0,1}."""

    def __init__(self, in_ch, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = (
            nn.Sequential(
                nn.Conv2d(in_ch, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
            if downsample
            else None
        )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return F.relu(h + idn)


class TVStyleResNet50Body(nn.Module):
    """torchvision-resnet50-compatible backbone emitting layer2/3/4 features
    with torchvision state_dict names (what Resnet50_Final.pth contains)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        in_ch = 64
        for li, (blocks, planes) in enumerate(zip((3, 4, 6, 3), (64, 128, 256, 512))):
            stride = 1 if li == 0 else 2
            layer = []
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                ds = bi == 0 and (s != 1 or in_ch != planes * 4)
                layer.append(TVStyleBottleneck(in_ch, planes, s, ds))
                in_ch = planes * 4
            setattr(self, f"layer{li + 1}", nn.Sequential(*layer))

    def forward(self, x):
        h = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        h = self.layer1(h)
        c2 = self.layer2(h)
        c3 = self.layer3(c2)
        c4 = self.layer4(c3)
        return {"1": c2, "2": c3, "3": c4}


class TwinRetinaFace(nn.Module):
    def __init__(self):
        super().__init__()
        self.body = TVStyleResNet50Body()
        self.fpn = TwinFPN([512, 1024, 2048], 256)
        self.ssh1 = TwinSSH(256, 256)
        self.ssh2 = TwinSSH(256, 256)
        self.ssh3 = TwinSSH(256, 256)

        def head(width):
            return nn.ModuleList(
                [_Head(256, 2, width) for _ in range(3)]
            )

        class _Head(nn.Module):
            def __init__(self, in_ch, anchors, width):
                super().__init__()
                self.w = width
                self.conv1x1 = nn.Conv2d(in_ch, anchors * width, 1)

            def forward(self, x):
                out = self.conv1x1(x).permute(0, 2, 3, 1).contiguous()
                return out.view(out.shape[0], -1, self.w)

        self.ClassHead = head(2)
        self.BboxHead = head(4)
        self.LandmarkHead = head(10)

    def forward(self, x):
        feats = list(self.body(x).values())
        fpn = self.fpn(feats)
        features = [self.ssh1(fpn[0]), self.ssh2(fpn[1]), self.ssh3(fpn[2])]
        loc = torch.cat([self.BboxHead[i](f) for i, f in enumerate(features)], dim=1)
        conf = torch.cat([self.ClassHead[i](f) for i, f in enumerate(features)], dim=1)
        landms = torch.cat([self.LandmarkHead[i](f) for i, f in enumerate(features)], dim=1)
        return loc, torch.softmax(conf, dim=-1), landms
