"""Round-5d: shared-extractor audio timing on the real chip.

Times run_from_wav wall (dispatch-to-fetch) for a 10 s clip in the three
audio serving configs: exact bf16, int8, int8+shared-extractor.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import jax
import jax.numpy as jnp

T0 = time.time()
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "exp_r5d_results.jsonl")


def emit(rec: dict) -> None:
    rec["t_min"] = round((time.time() - T0) / 60, 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main() -> None:
    from avcer_tpu.core.config import AudioConfig
    from avcer_tpu.models.audio_heads import ExprModel
    from avcer_tpu.models.wav2vec2 import Wav2Vec2Config
    from avcer_tpu.pipeline.audio_stage import AudioStage

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    emit({"name": "start", "backend": jax.default_backend()})

    variables = ExprModel(
        variant="v3", num_classes=8, wav2vec2_config=Wav2Vec2Config(),
        dtype=jnp.bfloat16,
    ).init(key, jnp.zeros((1, 4000), jnp.float32))

    wav = rng.normal(size=160_000).astype(np.float32)  # 10 s -> 21 windows

    for name, quant, shared in (
        ("exact", "none", False),
        ("int8", "int8", False),
        ("int8_shared", "int8", True),
    ):
        try:
            stage = AudioStage(
                variables,
                AudioConfig(quant=quant, shared_extractor=shared),
                dtype=jnp.bfloat16,
            )
            out, _ = stage.run_from_wav(wav, fps=25.0)  # compile warm
            n_win = out.shape[0]
            reps = 10
            t0 = time.perf_counter()
            for _ in range(reps):
                out, _ = stage.run_from_wav(wav, fps=25.0)
            sec = (time.perf_counter() - t0) / reps
            emit({"name": f"audio_clip10s_{name}",
                  "ms_per_window": round(sec / n_win * 1e3, 4),
                  "clip_ms": round(sec * 1e3, 2), "n_windows": n_win})
        except Exception as e:  # noqa: BLE001
            emit({"name": f"audio_{name}", "error": repr(e)[:300]})

    emit({"name": "done"})


if __name__ == "__main__":
    main()
