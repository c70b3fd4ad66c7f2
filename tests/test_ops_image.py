"""Image op parity: PIL NEAREST resize, crop+resize gather, normalizations."""

import numpy as np
import jax.numpy as jnp
from PIL import Image

from avcer_tpu.core import registry
from avcer_tpu.ops import image as img_ops


def pil_nearest(arr: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    return np.asarray(Image.fromarray(arr).resize(size, Image.Resampling.NEAREST))


def test_resize_nearest_matches_pil(rng):
    for h, w in [(37, 53), (224, 224), (300, 180), (17, 500)]:
        arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        want = pil_nearest(arr, (224, 224))
        got = np.asarray(img_ops.resize_nearest(jnp.asarray(arr), (224, 224)))
        np.testing.assert_array_equal(got, want)


def test_crop_and_resize_matches_pil_crop_then_resize(rng):
    """Boxes chosen so no (i+0.5)*size/224 product lands exactly on an
    integer — there the op's exact-rational floor and PIL's float64 floor
    coincide (see crop_and_resize_nearest docstring for the edge case)."""
    h, w = 240, 320
    frames = rng.integers(0, 255, size=(4, h, w, 3), dtype=np.uint8)
    boxes = np.array(
        [[10, 20, 110, 140], [1, 3, 318, 238], [100, 50, 101, 51], [5, 7, 200, 239]],
        dtype=np.int32,
    )
    got = np.asarray(
        img_ops.crop_and_resize_nearest(jnp.asarray(frames), jnp.asarray(boxes), 224)
    )
    for i, (x1, y1, x2, y2) in enumerate(boxes):
        crop = frames[i, y1:y2, x1:x2]
        want = pil_nearest(crop, (224, 224))
        np.testing.assert_array_equal(got[i], want)


def test_crop_and_resize_exact_rational_boundaries(rng):
    """On exact rational boundaries (320->224 hits one every 7 columns) the
    op follows the exact rational floor."""
    frames = rng.integers(0, 255, size=(1, 240, 320, 3), dtype=np.uint8)
    boxes = np.array([[0, 0, 320, 240]], dtype=np.int32)
    got = np.asarray(
        img_ops.crop_and_resize_nearest(jnp.asarray(frames), jnp.asarray(boxes), 224)
    )[0]
    ri = ((2 * np.arange(224) + 1) * 240) // 448
    ci = ((2 * np.arange(224) + 1) * 320) // 448
    want = frames[0][ri[:, None], ci[None, :]]
    np.testing.assert_array_equal(got, want)


def test_clamp_boxes():
    b = np.array([[-5.2, -3.0, 700.9, 500.1]], dtype=np.float32)
    got = img_ops.clamp_boxes(b, width=640, height=480)
    np.testing.assert_array_equal(got, [[0, 0, 639, 479]])


def test_clamp_boxes_valid():
    """The consolidated crop-site rule (runner uses this at all three crop
    sites): truncating int cast + clamp + degenerate-box rejection
    (get_face_images.py:53-56)."""
    b = np.array(
        [
            [-5.2, -3.0, 700.9, 500.1],   # clamps to full frame -> valid
            [10.7, 20.9, 11.2, 30.0],     # x2 truncates to 11 > 10 -> valid
            [10.7, 20.0, 10.9, 30.0],     # x2 truncates to 10 == x1 -> invalid
            [650.0, 10.0, 700.0, 20.0],   # fully right of frame -> invalid
        ],
        dtype=np.float64,
    )
    got, valid = img_ops.clamp_boxes_valid(b, width=640, height=480)
    np.testing.assert_array_equal(got[0], [0, 0, 639, 479])
    np.testing.assert_array_equal(got[1], [10, 20, 11, 30])
    np.testing.assert_array_equal(valid, [True, True, False, False])
    # 1-D row convenience (scalar call sites pass det_row[None])
    got1, valid1 = img_ops.clamp_boxes_valid(b[2][None], 640, 480)
    assert not valid1[0]
    # empty input (frames with zero detections)
    got0, valid0 = img_ops.clamp_boxes_valid(np.zeros((0, 5)), 640, 480)
    assert got0.shape == (0, 4) and valid0.shape == (0,)


def test_vggface_normalize_matches_reference_math(rng):
    """Reference chain (data/utils.py:19-39): BGR crop -> RGB -> PIL resize ->
    tensor -> channel flip back to BGR -> subtract means. Our op: BGR resize
    -> subtract means. The two must agree exactly."""
    crop_bgr = rng.integers(0, 255, size=(64, 80, 3), dtype=np.uint8)
    rgb = crop_bgr[..., ::-1]
    resized_rgb = pil_nearest(rgb, (224, 224)).astype(np.float32)
    chw = resized_rgb.transpose(2, 0, 1)[::-1]  # flip channels -> BGR, CHW
    want = chw.copy()
    for c, m in enumerate(registry.VGGFACE2_BGR_MEAN):
        want[c] -= m

    resized_bgr = img_ops.resize_nearest(jnp.asarray(crop_bgr), (224, 224))
    got = np.asarray(img_ops.vggface_normalize(resized_bgr)).transpose(2, 0, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_letterbox_params():
    nh, nw, s = img_ops.letterbox_params(720, 1280, 640)
    assert (nh, nw) == (360, 640) and abs(s - 0.5) < 1e-9


def test_i420_wire_format_roundtrip(rng):
    """Host BGR->I420 (cv2) then device I420->BGR must match cv2's own
    YUV2BGR_I420 within rounding (+-1)."""
    import cv2

    from avcer_tpu.ops.image import bgr_batch_to_i420, i420_to_bgr_device

    frames = rng.integers(0, 255, size=(2, 48, 64, 3), dtype=np.uint8)
    wire = bgr_batch_to_i420(frames)
    assert wire.shape == (2, 72, 64)
    got = np.asarray(i420_to_bgr_device(jnp.asarray(wire), 48, 64))
    for i in range(2):
        want = cv2.cvtColor(wire[i], cv2.COLOR_YUV2BGR_I420)
        diff = np.abs(got[i].astype(int) - want.astype(int))
        assert diff.max() <= 1, diff.max()


def test_crop_onehot_matches_gather(rng):
    from avcer_tpu.ops.image import crop_and_resize_nearest, crop_and_resize_onehot

    frames = rng.integers(0, 255, size=(6, 60, 80, 3), dtype=np.uint8)
    idx = np.array([0, 3, 5, 1], np.int32)
    boxes = np.array(
        [[5, 5, 50, 40], [0, 0, 80, 60], [10, 20, 11, 21], [33, 7, 70, 59]],
        np.int32,
    )
    want = np.asarray(
        crop_and_resize_nearest(jnp.asarray(frames)[jnp.asarray(idx)],
                                jnp.asarray(boxes), 32)
    )
    got = np.asarray(
        crop_and_resize_onehot(jnp.asarray(frames), jnp.asarray(idx),
                               jnp.asarray(boxes), 32)
    )
    np.testing.assert_array_equal(got, want)
