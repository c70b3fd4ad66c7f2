"""Detector training: anchor matching, box encoding, multibox loss.

Behavior contract — the train-time half of the reference's box codec,
/root/reference/src/data/face_detection/ibug/face_detection/retina_face/
box_utils.py:96-207 (``match``/``encode``/``encode_landm``): per-anchor
ground-truth assignment by jaccard overlap with the "force best prior per
gt" rule and the 0.2 hard-gt filter, then variance-scaled center/log-size
encoding. The reference vendors these functions but ships no training
script; this module makes the detector trainable in-framework (and powers
the synthetic bucket-vs-native detection-quality study, SURVEY.md §7 hard
part #3 / experiments/exp_bucket_quality.py).

Matching runs on host (numpy, per image — data prep); the loss is a jitted
SSD multibox loss (smooth-L1 on positives + cross-entropy with 7:1
hard-negative mining, the standard RetinaFace recipe).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

VARIANCES = (0.1, 0.2)


def _point_form(priors_cc: np.ndarray) -> np.ndarray:
    """center-size -> xyxy (box_utils.py:5-26)."""
    return np.concatenate(
        [priors_cc[:, :2] - priors_cc[:, 2:] / 2,
         priors_cc[:, :2] + priors_cc[:, 2:] / 2], axis=1
    )


def _jaccard_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """IoU [N, M] in xyxy normalized coords (box_utils.py:29-72, no +1)."""
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]))[:, None]
    area_b = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))[None, :]
    return inter / np.maximum(area_a + area_b - inter, 1e-12)


def encode_boxes_np(
    matched_xyxy: np.ndarray, priors_cc: np.ndarray,
    variances: tuple[float, float] = VARIANCES,
) -> np.ndarray:
    """encode (box_utils.py:156-178): gt xyxy vs prior center-size ->
    variance-scaled (dcx, dcy, log w, log h) regression targets."""
    g_cxcy = (matched_xyxy[:, :2] + matched_xyxy[:, 2:]) / 2 - priors_cc[:, :2]
    g_cxcy /= variances[0] * priors_cc[:, 2:]
    g_wh = (matched_xyxy[:, 2:] - matched_xyxy[:, :2]) / priors_cc[:, 2:]
    g_wh = np.log(np.maximum(g_wh, 1e-12)) / variances[1]
    return np.concatenate([g_cxcy, g_wh], axis=1).astype(np.float32)


def match_anchors(
    truths_xyxy: np.ndarray,  # [num_obj, 4] normalized xyxy
    priors_cc: np.ndarray,  # [A, 4] center-size (ops.boxes.prior_boxes output)
    threshold: float = 0.35,
    variances: tuple[float, float] = VARIANCES,
) -> tuple[np.ndarray, np.ndarray]:
    """match (box_utils.py:96-154) without the landmark stream:

    returns (loc_t [A, 4] float32, conf_t [A] int32; 1 = face, 0 = bg).
    Rules replicated: best-prior-per-gt forced to overlap 2 (after dropping
    gts whose best prior overlaps < 0.2), best-gt-per-anchor assignment with
    the force loop, background below ``threshold``.
    """
    a = priors_cc.shape[0]
    if truths_xyxy.shape[0] == 0:
        return np.zeros((a, 4), np.float32), np.zeros(a, np.int32)
    overlaps = _jaccard_np(truths_xyxy, _point_form(priors_cc))  # [N, A]
    best_prior_overlap = overlaps.max(1)
    best_prior_idx = overlaps.argmax(1)
    valid_gt = best_prior_overlap >= 0.2
    if not valid_gt.any():
        return np.zeros((a, 4), np.float32), np.zeros(a, np.int32)
    best_truth_overlap = overlaps.max(0)
    best_truth_idx = overlaps.argmax(0)
    best_truth_overlap[best_prior_idx[valid_gt]] = 2.0
    for j in range(len(best_prior_idx)):  # ensure every gt keeps its best prior
        best_truth_idx[best_prior_idx[j]] = j
    matches = truths_xyxy[best_truth_idx]
    conf = np.ones(a, np.int32)
    conf[best_truth_overlap < threshold] = 0
    loc_t = encode_boxes_np(matches, priors_cc, variances)
    return loc_t, conf


# ---------------------------------------------------------------------------
# Synthetic-face harness (bucket-vs-native quality study)
# ---------------------------------------------------------------------------


def render_face_scene(
    rng: np.random.Generator,
    hw: tuple[int, int],
    face_sizes: list[int],
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic synthetic scene: textured background + schematic
    'faces' (skin ellipse, two dark eyes, dark mouth) at the given pixel
    sizes. Returns (image [H, W, 3] uint8 BGR, boxes [N, 4] xyxy pixels).
    Used to train a small detector and measure how the letterbox bucket
    changes its keep-set vs native resolution (the architecture-level drift:
    faces scaled below the stride-8 anchor band stop matching)."""
    import cv2

    h, w = hw
    img = rng.integers(60, 120, (h // 8, w // 8, 3), np.uint8)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
    boxes = []
    for s in face_sizes:
        fw, fh = s, int(s * 1.25)
        x = int(rng.integers(4, max(5, w - fw - 4)))
        y = int(rng.integers(4, max(5, h - fh - 4)))
        cx, cy = x + fw // 2, y + fh // 2
        cv2.ellipse(img, (cx, cy), (fw // 2, fh // 2), 0, 0, 360,
                    (150, 170, 215), -1)
        er = max(1, s // 10)
        cv2.circle(img, (cx - fw // 4, cy - fh // 6), er, (25, 25, 25), -1)
        cv2.circle(img, (cx + fw // 4, cy - fh // 6), er, (25, 25, 25), -1)
        cv2.ellipse(img, (cx, cy + fh // 4), (max(1, fw // 5), max(1, fh // 12)),
                    0, 0, 360, (30, 30, 60), -1)
        boxes.append([x, y, x + fw, y + fh])
    return img, np.asarray(boxes, np.float32).reshape(-1, 4)


def train_synthetic_detector(
    steps: int = 300,
    image_size: int = 256,
    batch: int = 4,
    seed: int = 0,
    lr: float = 1e-3,
    backbone: str = "mobilenet0.25",
    face_size_range: tuple[int, int] = (16, 128),
):
    """Train a small RetinaFace on rendered faces (CPU-feasible). Returns
    (variables, losses). BN runs on its (random) running stats — the conv
    weights adapt; this detector only needs to work, not win benchmarks."""
    import optax

    from avcer_tpu.models.retinaface import RetinaFace
    from avcer_tpu.ops import boxes as box_ops
    from avcer_tpu.ops.image import retinaface_normalize

    rng = np.random.default_rng(seed)
    model = RetinaFace(backbone=backbone, dtype=jnp.float32, raw_conf=True)
    variables = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, image_size, image_size, 3))
    )
    priors = box_ops.prior_boxes((image_size, image_size))
    tx = optax.adam(lr)
    opt_state = tx.init(variables)

    @jax.jit
    def step_fn(variables, opt_state, images, loc_t, conf_t):
        def loss_fn(v):
            loc, conf, _ = model.apply(v, retinaface_normalize(images))
            return multibox_loss(loc, conf, loc_t, conf_t)

        loss, grads = jax.value_and_grad(loss_fn)(variables)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(variables, updates), opt_state, loss

    losses = []
    for _ in range(steps):
        images = np.zeros((batch, image_size, image_size, 3), np.float32)
        loc_ts, conf_ts = [], []
        for b in range(batch):
            sizes = [
                int(rng.integers(*face_size_range))
                for _ in range(int(rng.integers(1, 4)))
            ]
            img, bx = render_face_scene(rng, (image_size, image_size), sizes)
            images[b] = img
            scale = np.array(
                [image_size, image_size, image_size, image_size], np.float32
            )
            loc_t, conf_t = match_anchors(bx / scale, priors)
            loc_ts.append(loc_t)
            conf_ts.append(conf_t)
        variables, opt_state, loss = step_fn(
            variables, opt_state, jnp.asarray(images),
            jnp.asarray(np.stack(loc_ts)), jnp.asarray(np.stack(conf_ts)),
        )
        losses.append(float(loss))
    return variables, losses


def evaluate_bucket_recall(
    variables,
    scene_hw: tuple[int, int],
    buckets: list[int],
    size_bins: list[int],
    n_scenes: int = 8,
    seed: int = 100,
    threshold: float = 0.5,
    backbone: str = "mobilenet0.25",
    quant: str = "none",
) -> dict:
    """Per-face-size recall and localization IoU of the detection stage at
    native resolution (bucket 0) vs letterbox buckets — the SURVEY §7 hard
    part #3 measurement. Returns {bucket: {size: {recall, mean_iou}}}."""
    from avcer_tpu.core.config import DetectorConfig
    from avcer_tpu.pipeline.detect import DetectStage

    results: dict = {}
    for bucket in buckets:
        cfg = DetectorConfig(
            backbone=backbone, long_side=bucket, threshold=threshold,
            dtype="float32", transfer_format="bgr", batch_size=1, quant=quant,
        )
        stage = DetectStage(cfg, variables, dtype=jnp.float32)
        if quant != "none":
            # calibrate activation scales on a representative rendered scene
            # (the production flow: DetectStage.calibrate on real frames)
            img0, _ = render_face_scene(
                np.random.default_rng(seed + 7), scene_hw, list(size_bins)
            )
            stage.calibrate(img0[None])
        hits = {s: [] for s in size_bins}
        ious = {s: [] for s in size_bins}
        rng = np.random.default_rng(seed)
        for _ in range(n_scenes):
            sizes = list(size_bins)
            img, gt = render_face_scene(rng, scene_hw, sizes)
            det = stage(img[None])
            kept = det.boxes[0][det.keep[0]]
            for s, g in zip(sizes, gt):
                if kept.shape[0] == 0:
                    hits[s].append(0.0)
                    continue
                iou = _jaccard_np(g[None], kept).max()
                hits[s].append(float(iou > 0.5))
                if iou > 0.5:
                    ious[s].append(float(iou))
        results[bucket] = {
            s: {
                "recall": float(np.mean(hits[s])),
                "mean_iou": float(np.mean(ious[s])) if ious[s] else 0.0,
            }
            for s in size_bins
        }
    return results


@jax.jit
def multibox_loss(
    loc_pred: jax.Array,  # [B, A, 4]
    conf_logits: jax.Array,  # [B, A, 2] raw logits (phase='train' output)
    loc_t: jax.Array,  # [B, A, 4]
    conf_t: jax.Array,  # [B, A] int32
) -> jax.Array:
    """SSD multibox loss: smooth-L1 over positive anchors + softmax CE with
    hard-negative mining at 7 negatives per positive (the published
    RetinaFace training recipe for the vendored model)."""
    pos = conf_t > 0  # [B, A]
    num_pos = jnp.maximum(pos.sum(), 1)

    diff = loc_pred - loc_t
    l1 = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff * diff, jnp.abs(diff) - 0.5)
    loss_loc = jnp.sum(l1.sum(-1) * pos) / num_pos

    logp = jax.nn.log_softmax(conf_logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, conf_t[..., None].astype(jnp.int32), -1)[..., 0]
    # hard negative mining: rank background anchors by loss, keep 7x positives
    neg_ce = jnp.where(pos, -jnp.inf, ce)
    rank = jnp.argsort(jnp.argsort(-neg_ce, axis=1), axis=1)  # 0 = hardest
    num_neg = jnp.clip(7 * pos.sum(1, keepdims=True), 1, pos.shape[1] - 1)
    neg = (rank < num_neg) & ~pos
    loss_conf = jnp.sum(ce * (pos | neg)) / num_pos
    return loss_loc + loss_conf
