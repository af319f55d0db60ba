"""BoT-SORT tracker: ByteTrack + camera-motion compensation (+ optional ReID
hook).

Reference: ultralytics/trackers/bot_sort.py + utils/gmc.py. The global
motion compensation estimates a per-frame affine with sparse optical flow
(cv2.goodFeaturesToTrack + calcOpticalFlowPyrLK) and warps predicted track
boxes before association; ReID embedding distance is an optional injectable
hook (the reference ships with it off by default).
"""

from __future__ import annotations

from typing import Optional

import cv2
import numpy as np

from quan_ultralytics_tpu.trackers.byte_tracker import BYTETracker
from quan_ultralytics_tpu.trackers.kalman import KalmanFilterXYWH


class GMC:
    """Sparse-flow global motion compensation (reference utils/gmc.py)."""

    def __init__(self, downscale: int = 2):
        self.downscale = max(1, downscale)
        self.prev_gray: Optional[np.ndarray] = None

    def apply(self, frame: np.ndarray) -> np.ndarray:
        gray = cv2.cvtColor(frame, cv2.COLOR_RGB2GRAY)
        if self.downscale > 1:
            gray = cv2.resize(gray, (gray.shape[1] // self.downscale, gray.shape[0] // self.downscale))
        H = np.eye(2, 3, dtype=np.float32)
        if self.prev_gray is not None:
            pts = cv2.goodFeaturesToTrack(self.prev_gray, maxCorners=200, qualityLevel=0.01,
                                          minDistance=8, blockSize=3)
            if pts is not None and len(pts) >= 6:
                nxt, status, _ = cv2.calcOpticalFlowPyrLK(self.prev_gray, gray, pts, None)
                good = status.reshape(-1).astype(bool)
                if good.sum() >= 6:
                    M, _ = cv2.estimateAffinePartial2D(pts[good], nxt[good], method=cv2.RANSAC)
                    if M is not None:
                        H = M.astype(np.float32)
                        H[:, 2] *= self.downscale
        self.prev_gray = gray
        return H


class BOTSORT(BYTETracker):
    def __init__(self, track_high_thresh=0.5, track_low_thresh=0.1,
                 new_track_thresh=0.6, match_thresh=0.8, track_buffer=30,
                 gmc: bool = True, reid_fn=None):
        super().__init__(track_high_thresh, track_low_thresh, new_track_thresh,
                         match_thresh, track_buffer)
        self.kf = KalmanFilterXYWH()  # BoT-SORT uses the xywh model
        self.fmt = "xywh"
        self.gmc = GMC() if gmc else None
        self.reid_fn = reid_fn  # optional: frame, boxes -> embeddings

    def _compensate(self, H: np.ndarray):
        """Warp predicted means by the estimated camera motion
        (reference bot_sort.py multi_gmc)."""
        R = H[:2, :2]
        t = H[:2, 2]
        for tr in self.tracked + self.lost:
            if tr.mean is not None:
                tr.mean[:2] = R @ tr.mean[:2] + t

    def update(self, xyxy: np.ndarray, scores: np.ndarray, cls: np.ndarray,
               frame: Optional[np.ndarray] = None) -> np.ndarray:
        if self.gmc is not None and frame is not None:
            self._compensate(self.gmc.apply(frame))
        return super().update(xyxy, scores, cls)
