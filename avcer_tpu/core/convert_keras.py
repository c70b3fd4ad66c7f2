"""Keras .h5 -> Flax converters for the legacy EMO-AffectNet visual models.

Capability parity with /root/reference/src/video/functions/get_models.py:
``load_weights_EE`` (keras_vggface ResNet50 + Dense512 'features' + Dense7,
:16-37) and ``load_weights_LSTM`` (Masking -> LSTM(512) -> LSTM(256) ->
Dense(7) softmax, :40-59). The production pipeline loads the already-ported
torch ``.pt`` files (convert.py); these converters ingest the original Keras
weight files directly.

Keras save_weights h5 layout: one group per layer, attr ``weight_names``
listing datasets like ``lstm_1/lstm_cell/kernel:0``. Keras LSTM kernels are
[in, 4*hidden] with gate order (i, f, c, o) and a single bias — identical
gate order to torch/(ours); the hh bias is zero.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _layer_weights(h5file, layer_name: str) -> list[np.ndarray]:
    import h5py  # noqa: F401

    g = h5file[layer_name] if layer_name in h5file else h5file
    names = [n.decode() if isinstance(n, bytes) else n
             for n in g.attrs.get("weight_names", [])]
    return [np.asarray(g[n]) for n in names]


def _find_lstm_layers(h5file) -> list[str]:
    names = [n.decode() if isinstance(n, bytes) else n
             for n in h5file.attrs.get("layer_names", [])]
    return [n for n in names if "lstm" in n.lower()]


def convert_keras_lstm(path: str) -> dict[str, Any]:
    """Keras LSTM .h5 (save_weights format) -> TemporalLSTM variables."""
    import h5py

    out_params: dict[str, Any] = {}
    with h5py.File(path, "r") as f:
        lstm_layers = _find_lstm_layers(f)
        dense_layers = [
            n.decode() if isinstance(n, bytes) else n
            for n in f.attrs.get("layer_names", [])
            if "dense" in (n.decode() if isinstance(n, bytes) else n).lower()
        ]
        for i, lname in enumerate(lstm_layers[:2]):
            kernel, recurrent, bias = _layer_weights(f, lname)[:3]
            out_params[f"lstm{i + 1}"] = {
                "cell": {
                    "ih": {"kernel": kernel.astype(np.float32),
                           "bias": bias.astype(np.float32)},
                    "hh": {"kernel": recurrent.astype(np.float32),
                           "bias": np.zeros(bias.shape, np.float32)},
                }
            }
        if dense_layers:
            dk, db = _layer_weights(f, dense_layers[-1])[:2]
            out_params["fc"] = {"kernel": dk.astype(np.float32),
                                "bias": db.astype(np.float32)}
    return {"params": out_params}


def convert_keras_backbone(path: str) -> dict[str, Any]:
    """Best-effort keras_vggface ResNet50 (+ feature head) -> EmotionResNet50
    variables. Maps by structural order: keras_vggface layer naming
    (conv1/7x7_s2, conv{s}_{b}_1x1_reduce/3x3/1x1_increase + _proj) onto our
    conv_stem / layer{s-1}_{b-1} blocks. Requires the original
    ``EmoAffectNet`` weight file; validated opportunistically (the production
    path uses the ported torch checkpoints instead)."""
    import h5py

    def conv_entry(w, b=None):
        e = {"kernel": np.asarray(w, np.float32)}
        if b is not None:
            e["bias"] = np.asarray(b, np.float32)
        return e

    def bn_entry(weights):
        gamma, beta, mean, var = (np.asarray(x, np.float32) for x in weights[:4])
        return {"scale": gamma, "bias": beta}, {"mean": mean, "var": var}

    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    with h5py.File(path, "r") as f:
        layer_names = [n.decode() if isinstance(n, bytes) else n
                       for n in f.attrs.get("layer_names", [])]

        def w(name):
            return _layer_weights(f, name)

        if "conv1/7x7_s2" in layer_names:
            params["conv_stem"] = conv_entry(*w("conv1/7x7_s2"))
            p, s = bn_entry(w("conv1/7x7_s2/bn"))
            params["batch_norm1"], stats["batch_norm1"] = p, s
            blocks = (3, 4, 6, 3)
            for stage, nblocks in enumerate(blocks, start=2):
                for b in range(1, nblocks + 1):
                    fp = f"layer{stage - 1}_{b - 1}"
                    params[fp] = {}
                    stats[fp] = {}
                    mapping = [
                        (f"conv{stage}_{b}_1x1_reduce", "conv1", "batch_norm1"),
                        (f"conv{stage}_{b}_3x3", "conv2", "batch_norm2"),
                        (f"conv{stage}_{b}_1x1_increase", "conv3", "batch_norm3"),
                    ]
                    for kname, cname, bnname in mapping:
                        params[fp][cname] = conv_entry(*w(kname))
                        p, s = bn_entry(w(f"{kname}/bn"))
                        params[fp][bnname], stats[fp][bnname] = p, s
                    proj = f"conv{stage}_{b}_1x1_proj"
                    if proj in layer_names:
                        params[fp]["downsample_conv"] = conv_entry(*w(proj))
                        p, s = bn_entry(w(f"{proj}/bn"))
                        params[fp]["downsample_bn"], stats[fp]["downsample_bn"] = p, s
        # feature head (get_models.py:16-28: Dense 512 'features' + Dense 7)
        for lname, target in (("features", "fc1"), ("dense", "fc2")):
            cand = [n for n in layer_names if n == lname or n.startswith(lname)]
            if cand:
                dk, db = w(cand[0])[:2]
                params[target] = {"kernel": np.asarray(dk, np.float32),
                                  "bias": np.asarray(db, np.float32)}
    return {"params": params, "batch_stats": stats}
