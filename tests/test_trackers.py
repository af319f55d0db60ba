"""Tracker tests: identity persistence across frames with moving boxes."""

import numpy as np

from quan_ultralytics_tpu.trackers import BOTSORT, BYTETracker
from quan_ultralytics_tpu.trackers.byte_tracker import STrack, iou_distance


def _moving_sequence(n_frames=10):
    """Two objects moving right / down at constant velocity."""
    frames = []
    for t in range(n_frames):
        frames.append(np.array([
            [10 + 3 * t, 10, 40 + 3 * t, 40],
            [100, 50 + 2 * t, 140, 90 + 2 * t],
        ], np.float32))
    return frames


def test_bytetrack_identity_persistence():
    STrack._count = 0
    tracker = BYTETracker(track_high_thresh=0.5, new_track_thresh=0.5)
    ids_per_frame = []
    for boxes in _moving_sequence():
        out = tracker.update(boxes, np.array([0.9, 0.9]), np.array([0, 1]))
        ids_per_frame.append(set(out[:, 4].astype(int)) if len(out) else set())
    # after warmup both tracks output with stable ids
    assert len(ids_per_frame[-1]) == 2
    assert ids_per_frame[-1] == ids_per_frame[3], "track ids not stable"


def test_bytetrack_low_score_rescue():
    STrack._count = 0
    tracker = BYTETracker()
    boxes = np.array([[10, 10, 40, 40]], np.float32)
    for t in range(3):
        tracker.update(boxes + 2 * t, np.array([0.9]), np.array([0]))
    # drop score below high threshold: the track should be rescued (stage 2)
    out = tracker.update(boxes + 6, np.array([0.3]), np.array([0]))
    assert len(out) == 1


def test_bytetrack_lost_track_removed():
    STrack._count = 0
    tracker = BYTETracker(track_buffer=2)
    boxes = np.array([[10, 10, 40, 40]], np.float32)
    for t in range(3):
        tracker.update(boxes, np.array([0.9]), np.array([0]))
    for _ in range(5):  # object disappears
        out = tracker.update(np.zeros((0, 4), np.float32), np.zeros(0), np.zeros(0))
    assert len(out) == 0


def test_botsort_with_gmc():
    STrack._count = 0
    tracker = BOTSORT()
    rng = np.random.default_rng(0)
    frame = (rng.random((120, 160, 3)) * 255).astype(np.uint8)
    ids = []
    for t in range(6):
        boxes = np.array([[10 + 3 * t, 10, 40 + 3 * t, 40]], np.float32)
        out = tracker.update(boxes, np.array([0.9]), np.array([0]), frame=frame)
        if len(out):
            ids.append(int(out[0, 4]))
    assert len(set(ids)) == 1, ids


def test_iou_distance():
    a = np.array([[0, 0, 10, 10]], np.float32)
    assert iou_distance(a, a)[0, 0] < 1e-6
    b = np.array([[20, 20, 30, 30]], np.float32)
    assert iou_distance(a, b)[0, 0] == 1.0
