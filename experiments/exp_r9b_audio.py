"""Round-9b: audio serving rows, slope method (fresh process).

exp_r9's in-loop audio rows died in the relay's remote compiler (broken
pipe on the fori_loop-wrapped 12-layer wav2vec2 graph — the same graph
killed the r6b session; it has never compiled through this relay). The
raw window program is >5 ms/dispatch, squarely where the fetch-barrier
slope method is valid (BENCH_NOTES round-4), so these rows use slope:

  - audio full from-wav, bf16 and int8 (16 windows/dispatch);
  - shared-extractor turbo decomposition: conv features once per 60 s
    clip (slope) + per-window head at 64 windows/dispatch (slope);
  - final composite ladder merging the exp_r9 detect/CNN rows.

Results append to experiments/exp_r9_results.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

T0 = time.time()
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "exp_r9_results.jsonl")


def emit(rec: dict) -> None:
    rec["t_min"] = round((time.time() - T0) / 60, 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def slope(call, n1: int, n2: int) -> float:
    jax.block_until_ready(call())
    t0 = time.perf_counter()
    out = None
    for _ in range(n1):
        out = call()
    jax.block_until_ready(out)
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n2):
        out = call()
    jax.block_until_ready(out)
    tb = time.perf_counter() - t0
    return (tb - ta) / (n2 - n1)


def main() -> None:
    from avcer_tpu.core.checkpoint import init_variables
    from avcer_tpu.core.config import AudioConfig
    from avcer_tpu.models.audio_heads import ExprModel
    from avcer_tpu.models.wav2vec2 import Wav2Vec2Config
    from avcer_tpu.pipeline.audio_stage import AudioStage

    rng = np.random.default_rng(0)
    emit({"name": "start_r9b", "backend": jax.default_backend()})

    av = init_variables(
        ExprModel(variant="v3", num_classes=8,
                  wav2vec2_config=Wav2Vec2Config(), dtype=jnp.bfloat16),
        (jnp.zeros((1, 64000), jnp.float32),))
    wav = jnp.asarray(rng.standard_normal(200_001), jnp.float32)
    wl = jnp.asarray(136_000, jnp.int32)
    starts = jnp.asarray(np.arange(16, dtype=np.int32) * 8000)
    ms: dict[str, float] = {}

    for quant in ("none", "int8"):
        try:
            stage = AudioStage(
                av, AudioConfig(num_classes=8, head="v3", quant=quant,
                                batch_size=16),
                Wav2Vec2Config(), dtype=jnp.bfloat16)
            sec = slope(
                lambda s=stage: s._jit_forward_from_wav(
                    s.variables, wav, wl, starts, padding="mean"),
                4, 20)
            ms[f"audio_{quant}"] = sec / 16 * 1e3
            emit({"name": f"serve_audio_{quant}", "windows": 16,
                  "method": "slope",
                  "ms_per_window": round(ms[f"audio_{quant}"], 4)})
        except Exception as e:  # noqa: BLE001
            emit({"name": f"serve_audio_{quant}", "error": repr(e)[:300]})

    try:
        aq = AudioStage(av, AudioConfig(num_classes=8, head="v3",
                                        quant="int8", shared_extractor=True,
                                        batch_size=16),
                        Wav2Vec2Config(), dtype=jnp.bfloat16)
        wav60 = jnp.asarray(
            rng.standard_normal(960_000 + 64_001).astype(np.float32))
        wl60 = jnp.asarray(960_000, jnp.int32)
        n_win60 = (960_000 - 64_000) // 8_000 + 1
        sec_shared = slope(
            lambda: aq._jit_shared_features(aq.variables, wav60, wl60), 3, 12)
        feats60 = aq._jit_shared_features(aq.variables, wav60, wl60)
        jax.block_until_ready(feats60)
        starts_h = jnp.asarray(np.arange(64, dtype=np.int32) * 8000)
        sec_head = slope(
            lambda: aq._jit_from_features(aq.variables, feats60, starts_h),
            4, 20)
        ms["audio_turbo"] = (sec_shared / n_win60 + sec_head / 64) * 1e3
        emit({"name": "serve_audio_turbo", "method": "slope",
              "shared_ms_per_window": round(sec_shared / n_win60 * 1e3, 4),
              "head_ms_per_window": round(sec_head / 64 * 1e3, 4),
              "ms_per_window": round(ms["audio_turbo"], 4)})
    except Exception as e:  # noqa: BLE001
        emit({"name": "serve_audio_turbo", "error": repr(e)[:300]})

    # merge with the r9 detect/CNN rows and emit the final measured ladder
    for line in open(OUT):
        r = json.loads(line)
        n = r.get("name", "")
        if n.startswith("serve_") and "ms_per_frame" in r:
            ms[n[len("serve_"):]] = r["ms_per_frame"]
    fps = 25.0

    def vss(det, stride=1, cnn="cnn_none", audio="audio_none"):
        if det not in ms or cnn not in ms or audio not in ms:
            return None
        per_sec = ((ms[det] / stride + ms[cnn]) / 1e3 * fps
                   + ms[audio] / 1e3 * 2)
        return round(1.0 / per_sec, 1)

    aud8 = "audio_turbo" if "audio_turbo" in ms else "audio_int8"
    ladder = {
        "parity_r50_640": vss("r50_640_bf16"),
        "balanced_r50_448": vss("r50_448_bf16"),
        "int8_r50_640": vss("r50_640_int8", 1, "cnn_int8", aud8),
        "int8_r50_640_s2": vss("r50_640_int8", 2, "cnn_int8", aud8),
        "int8_r50_448": vss("r50_448_int8", 1, "cnn_int8", aud8),
        "int8_r50_448_s2": vss("r50_448_int8", 2, "cnn_int8", aud8),
        "fast_mnet_640_int8": vss("mnet_640_int8", 1, "cnn_int8", aud8),
        "turbo_mnet_448_int8_s2": vss("mnet_448_int8", 2, "cnn_int8",
                                      "audio_turbo"),
        "turbo_b64_mnet_448_int8_s2": vss("mnet_448_int8_b64", 2,
                                          "cnn_int8", "audio_turbo"),
    }
    emit({"name": "ladder_r9", "video_sec_per_sec": ladder,
          "rows_ms": {k: round(v, 4) for k, v in ms.items()}})
    emit({"name": "done_r9b"})


if __name__ == "__main__":
    main()
