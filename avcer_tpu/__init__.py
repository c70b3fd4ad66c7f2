"""avcer_tpu — TPU-native audio-visual compound expression recognition framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of ElenaRyumina/AVCER
(CVPRW 2024, zero-shot compound expression recognition via emotion probability
fusion). The reference is a serial, disk-coupled, per-frame PyTorch pipeline;
this framework inverts that design for TPU:

- host decodes video/audio into fixed-shape batched tensors,
- each model stage (RetinaFace detect, static emotion CNN, dynamic temporal
  model, audio wav2vec2 encoder + emotion head) is a single jitted bf16
  program over a frame/window batch axis,
- NMS and probability fusion are vectorized fixed-shape ops (Pallas/XLA),
- multi-chip scaling shards the batch axis over a `jax.sharding.Mesh`.

Reference behavior contracts are cited per-module as `/root/reference/<path>:<line>`.
"""

__version__ = "0.1.0"

from avcer_tpu.core import config as config  # noqa: F401
from avcer_tpu.core import registry as registry  # noqa: F401
