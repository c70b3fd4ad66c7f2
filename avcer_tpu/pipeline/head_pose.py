"""Head pose estimation from the detector's 5 facial landmarks.

Capability parity with /root/reference/src/data/face_detection/ibug/
face_detection/utils/head_pose_estimator.py (EPnP on a 5-point mean shape
from ``bfm_lms.npy`` -> pitch/yaw/roll; :46-61). Unused by the AVCER main
path but exported by the face-detection package (__init__.py:1-5).

The reference's mean-shape file is an external asset (like the model
weights); pass its path via ``mean_shape_path``. Without it a generic
5-point 3D face template is used (eye centers, nose tip, mouth corners in
millimetres — standard anthropometric values, not the BFM file).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

#: generic 3D positions of (left eye, right eye, nose tip, left mouth,
#: right mouth) in a frontal face frame, millimetres
GENERIC_5PT_SHAPE = np.array(
    [
        [-32.0, 30.0, -25.0],
        [32.0, 30.0, -25.0],
        [0.0, 0.0, 0.0],
        [-24.0, -30.0, -22.0],
        [24.0, -30.0, -22.0],
    ],
    dtype=np.float64,
)


class HeadPoseEstimator:
    def __init__(self, mean_shape_path: Optional[str] = None):
        if mean_shape_path is not None:
            self.mean_shape = np.load(mean_shape_path).astype(np.float64)
        else:
            self.mean_shape = GENERIC_5PT_SHAPE

    def __call__(self, landmarks: np.ndarray, image_width: int, image_height: int):
        """landmarks: [5, 2] pixel coords (RetinaFace order: eyes, nose,
        mouth corners). Returns (pitch, yaw, roll) in degrees or None."""
        import cv2

        lms = np.asarray(landmarks, dtype=np.float64).reshape(-1, 2)
        if lms.shape[0] < 5:
            return None
        focal = image_width
        center = (image_width / 2.0, image_height / 2.0)
        cam = np.array(
            [[focal, 0, center[0]], [0, focal, center[1]], [0, 0, 1]], np.float64
        )
        ok, rvec, _ = cv2.solvePnP(
            self.mean_shape[:5], lms[:5], cam, np.zeros(5),
            flags=cv2.SOLVEPNP_EPNP,
        )
        if not ok:
            return None
        rot, _ = cv2.Rodrigues(rvec)
        # matrix -> euler (pitch around x, yaw around y, roll around z)
        sy = np.sqrt(rot[0, 0] ** 2 + rot[1, 0] ** 2)
        if sy > 1e-6:
            pitch = np.degrees(np.arctan2(rot[2, 1], rot[2, 2]))
            yaw = np.degrees(np.arctan2(-rot[2, 0], sy))
            roll = np.degrees(np.arctan2(rot[1, 0], rot[0, 0]))
        else:
            pitch = np.degrees(np.arctan2(-rot[1, 2], rot[1, 1]))
            yaw = np.degrees(np.arctan2(-rot[2, 0], sy))
            roll = 0.0
        return float(pitch), float(yaw), float(roll)
