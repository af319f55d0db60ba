"""Predict-source loaders: images, directories/globs, video files, arrays.

Reference: ultralytics/data/loaders.py (LoadImagesAndVideos etc.). Streams /
screenshots are N/A in the zero-egress TPU environment; the video loader
covers `mode=track`.
"""

from __future__ import annotations

from pathlib import Path
from typing import Generator, Iterable, List, Union

import cv2
import numpy as np

IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp", ".tif", ".tiff"}
VID_EXTS = {".mp4", ".avi", ".mov", ".mkv", ".webm", ".m4v"}


def load_source(source: Union[str, Path, np.ndarray, Iterable]) -> Generator[np.ndarray, None, None]:
    """Yield RGB frames/images from any supported source."""
    if isinstance(source, np.ndarray):
        yield source
        return
    if isinstance(source, (list, tuple)):
        for s in source:
            yield from load_source(s)
        return
    p = Path(str(source))
    if p.is_dir():
        for f in sorted(p.iterdir()):
            if f.suffix.lower() in IMG_EXTS:
                yield from load_source(f)
        return
    if p.suffix.lower() in VID_EXTS:
        cap = cv2.VideoCapture(str(p))
        try:
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        finally:
            cap.release()
        return
    if p.suffix.lower() in IMG_EXTS or p.exists():
        im = cv2.imread(str(p))
        if im is None:
            raise FileNotFoundError(f"could not read {p}")
        yield cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
        return
    raise FileNotFoundError(f"unsupported source {source!r}")
