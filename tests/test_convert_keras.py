"""Keras .h5 converter test: build a save_weights-format h5 from torch LSTM
weights (keras layout: kernel=[in,4H] i,f,c,o; recurrent=[H,4H]; single
bias) and check activation parity with the torch model."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

import torch_twins as twins
from avcer_tpu.core.convert_keras import convert_keras_lstm
from avcer_tpu.models.temporal_lstm import TemporalLSTM


def write_keras_lstm_h5(path, tw):
    import h5py

    with h5py.File(path, "w") as f:
        layer_names = []
        for i, lname in enumerate(["lstm", "lstm_1"]):
            src = getattr(tw, f"lstm{i + 1}")
            kernel = src.weight_ih_l0.detach().numpy().T  # [in, 4H]
            recurrent = src.weight_hh_l0.detach().numpy().T  # [H, 4H]
            bias = (src.bias_ih_l0 + src.bias_hh_l0).detach().numpy()
            g = f.create_group(lname)
            names = [
                f"{lname}/lstm_cell/kernel:0",
                f"{lname}/lstm_cell/recurrent_kernel:0",
                f"{lname}/lstm_cell/bias:0",
            ]
            g.attrs["weight_names"] = [n.encode() for n in names]
            g.create_dataset(names[0], data=kernel)
            g.create_dataset(names[1], data=recurrent)
            g.create_dataset(names[2], data=bias)
            layer_names.append(lname.encode())
        g = f.create_group("dense")
        names = ["dense/kernel:0", "dense/bias:0"]
        g.attrs["weight_names"] = [n.encode() for n in names]
        g.create_dataset(names[0], data=tw.fc.weight.detach().numpy().T)
        g.create_dataset(names[1], data=tw.fc.bias.detach().numpy())
        layer_names.append(b"dense")
        f.attrs["layer_names"] = layer_names


def test_keras_lstm_converter_parity(tmp_path, rng):
    torch.manual_seed(1)
    tw = twins.TwinTemporalLSTM(7).eval()
    path = str(tmp_path / "lstm.h5")
    write_keras_lstm_h5(path, tw)
    variables = convert_keras_lstm(path)
    x = rng.normal(size=(2, 10, 512)).astype(np.float32)
    with torch.no_grad():
        want = tw(torch.from_numpy(x)).numpy()
    got = jax.jit(TemporalLSTM(7, dtype=jnp.float32).apply)(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-3)
