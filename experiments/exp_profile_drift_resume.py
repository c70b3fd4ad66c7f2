"""Resume exp_profile_drift.py from its .partial checkpoint.

The main per-profile loop (56 min on this 1-core host) completed and wrote
profile_drift.json.partial; the process died during the shared-extractor
study. This script rebuilds only the audio fixtures (deterministic: same
seeds), runs the remaining shared-extractor isolated study, recomputes the
summary from the partial per-clip records, and writes the final
profile_drift.json in the exact format exp_profile_drift.py would have.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import jax

jax.config.update("jax_platforms", "cpu")
os.environ["AVCER_INT8_CPU_F32_ACCUM"] = "1"

import exp_profile_drift as base  # noqa: E402

T0 = time.time()


def main() -> None:
    with open(base.OUT + ".partial") as f:
        partial = json.load(f)
    results = partial["per_clip"]
    profiles = list(results.keys())
    assert profiles[0] == "parity" and len(profiles) == 6, profiles
    assert all(len(v) == base.N_CLIPS for v in results.values()), {
        k: len(v) for k, v in results.items()}

    base.log("rebuilding audio twin weights (deterministic seeds)...")
    _, _, expr_v = base.twin_weights()
    wavs = [base.write_clip(os.path.join("/tmp", f"drift_clip{i}.avi"),
                            seed=10 + i) for i in range(base.N_CLIPS)]

    base.log("shared-extractor isolated study...")
    shared = base.shared_extractor_study(expr_v, wavs)

    summary = {}
    for p in profiles[1:]:
        recs = results[p]
        summary[p] = base.summarize(recs)

    out = {
        "config": {
            "clips": base.N_CLIPS, "frames": base.N_FRAMES, "fps": base.FPS,
            "resolution": [base.W, base.H], "w2v2_layers": base.W2V2_LAYERS,
            "weights": "trained synthetic detectors (mnet+r50); "
                       "randomized-BN twins for CNN/LSTM/audio "
                       "(published checkpoints unavailable in image)",
        },
        "per_clip": results,
        "summary": summary,
        "shared_extractor_fp32": shared,
        "minutes": round(partial["minutes"] + (time.time() - T0) / 60, 1),
    }
    with open(base.OUT, "w") as f:
        json.dump(out, f, indent=1)
    base.log("summary:")
    print(json.dumps({"summary": summary, "shared_extractor_fp32": shared},
                     indent=1))


if __name__ == "__main__":
    main()
