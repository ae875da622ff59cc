from .frame_metrics import FrameMetrics

__all__ = ["FrameMetrics"]
