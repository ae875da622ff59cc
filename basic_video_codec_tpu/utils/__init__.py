from .logger import get_logger
from .frame_utils import (
    pad_frame,
    split_into_blocks,
    merge_blocks,
    frame_to_blocks,
    blocks_to_frame,
    mae,
    psnr,
    calculate_num_frames,
    pad_with_zeros,
    signed_to_unsigned,
    unsigned_to_signed,
    int_to_3_bytes,
    bytes_to_int_3,
)

__all__ = [
    "get_logger",
    "pad_frame",
    "split_into_blocks",
    "merge_blocks",
    "frame_to_blocks",
    "blocks_to_frame",
    "mae",
    "psnr",
    "calculate_num_frames",
    "pad_with_zeros",
    "signed_to_unsigned",
    "unsigned_to_signed",
    "int_to_3_bytes",
    "bytes_to_int_3",
]
