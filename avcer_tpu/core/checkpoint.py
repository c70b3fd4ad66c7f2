"""Checkpoint IO: converted-weight cache (orbax) + torch ingestion + init.

Weight resolution order for each model family:

1. an orbax cache directory ``<weights_dir>/jax/<family>`` (fast reload)
2. the reference torch checkpoint file, converted on the fly
   (file names per /root/reference: get_prob_video.py:22,51,
   get_prob_audio_8_cl.py:58-66 + 154-158, retina_face_predictor.py:44-46)
3. deterministic random initialization (PRNG seed 0) with a loud warning —
   keeps the pipeline runnable for throughput work without the external
   Google-Drive weights the reference also does not vendor.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from avcer_tpu.core import convert

log = logging.getLogger("avcer_tpu")

TORCH_FILES = {
    "emotion_resnet50": "FER_static_ResNet50_AffectNet.pt",
    "temporal_lstm": "FER_dinamic_LSTM_Aff-Wild2.pt",
    "retinaface": "Resnet50_Final.pth",
    # the reference's mobilenet predictor loads a different checkpoint file
    # (retina_face_predictor.py:49) — the family must be backbone-qualified
    # or an r50 cache would satisfy a mobilenet pipeline
    "retinaface_mnet025": "mobilenet0.25_Final.pth",
    # audio: directory per experiment, epoch file inside
    "expr_model_8cl": os.path.join("FLW-ExprModelV3-2024.03.02-11.42.11", "epoch_63.pth"),
    "expr_model_7cl": os.path.join("7cl-FLW-ExprModelV2-2024.03.04-11.52.11", "epoch_51.pth"),
}


def _orbax_dir(weights_dir: str, family: str) -> str:
    return os.path.abspath(os.path.join(weights_dir, "jax", family))


def save_converted(weights_dir: str, family: str, variables: dict[str, Any]) -> None:
    import orbax.checkpoint as ocp

    path = _orbax_dir(weights_dir, family)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, variables, force=True)
    ckptr.wait_until_finished()


def load_converted(weights_dir: str, family: str) -> Optional[dict[str, Any]]:
    import orbax.checkpoint as ocp

    path = _orbax_dir(weights_dir, family)
    if not os.path.isdir(path):
        return None
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path)


def detector_family(backbone: str) -> str:
    """Cache/torch family for a detector backbone ("retinaface" keeps the
    historical r50 cache path)."""
    return "retinaface" if backbone == "resnet50" else "retinaface_mnet025"


def save_act_scales(weights_dir: str, family: str, scales: dict[str, Any]) -> None:
    """Persist calibrated int8 activation scales as a sidecar of the
    converted-weight cache (``<weights_dir>/jax/<family>_act_scales``) so a
    representative-corpus calibration (cli/convert_verify --calib_video)
    survives into every later serving run."""
    save_converted(weights_dir, family + "_act_scales",
                   jax.tree.map(np.asarray, scales))


def load_act_scales(weights_dir: str, family: str) -> Optional[dict[str, Any]]:
    try:
        return load_converted(weights_dir, family + "_act_scales")
    except Exception:  # corrupt sidecar -> fall back to seeded scales
        return None


def init_variables(module, example_inputs: tuple, seed: int = 0) -> dict[str, Any]:
    """Deterministic random init (fallback when no checkpoint is present).

    Runs on the host CPU backend: compiling the four model-init programs on
    the accelerator costs minutes of pointless XLA work per process (and on
    a relay-attached TPU it is also the flakiest part of startup); the
    weights transfer to the accelerator on first use like converted
    checkpoints do."""
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = module.init(jax.random.PRNGKey(seed), *example_inputs)
    return jax.tree.map(np.asarray, variables)


def resolve(
    weights_dir: str,
    family: str,
    converter: Callable[..., dict[str, Any]],
    module,
    example_inputs: tuple,
    torch_file: Optional[str] = None,
    cache: bool = True,
    **converter_kw: Any,
) -> dict[str, Any]:
    cached = None
    try:
        cached = load_converted(weights_dir, family)
    except Exception:  # orbax cache corrupt/incompatible -> reconvert
        cached = None
    if cached is not None:
        return cached

    torch_path = os.path.join(weights_dir, torch_file or TORCH_FILES.get(family, ""))
    if torch_file is not None or family in TORCH_FILES:
        if os.path.exists(torch_path):
            sd = convert.load_torch_state_dict(torch_path)
            variables = converter(sd, **converter_kw)
            variables = jax.tree.map(jnp.asarray, variables)
            if cache:
                save_converted(weights_dir, family, variables)
            return variables

    log.warning(
        "no checkpoint for %s under %s — using random initialization "
        "(outputs will not match the published model)", family, weights_dir
    )
    return init_variables(module, example_inputs)


def tree_size_bytes(variables: dict[str, Any]) -> int:
    leaves = jax.tree.leaves(variables)
    return sum(np.prod(x.shape) * x.dtype.itemsize for x in leaves if hasattr(x, "shape"))
