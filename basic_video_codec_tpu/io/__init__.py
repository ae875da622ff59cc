from .fileio import FileIOHelper, write_mv_to_file, write_y_only_frame, parse_mv
from .yuv import read_y_frames, save_y_frames_to_file, iter_y_frames

__all__ = [
    "FileIOHelper",
    "write_mv_to_file",
    "write_y_only_frame",
    "parse_mv",
    "read_y_frames",
    "save_y_frames_to_file",
    "iter_y_frames",
]
