from quan_ultralytics_tpu.trackers.byte_tracker import BYTETracker
from quan_ultralytics_tpu.trackers.bot_sort import BOTSORT

__all__ = ["BYTETracker", "BOTSORT"]
