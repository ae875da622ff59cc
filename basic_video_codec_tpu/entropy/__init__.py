from .bits import BitWriter, BitReader
from .expgolomb import (
    exp_golomb_encode,
    exp_golomb_decode,
    exp_golomb_length,
    symbols_to_bits,
    symbols_bit_length,
    decode_symbols,
)
from .rle import rle_encode, rle_decode, rle_encode_blocks
from .zigzag import zigzag_indices, zigzag_order, inverse_zigzag_order

EOB_MARKER = 8190  # end-of-block sentinel (reference encoder/Frame.py:23)

__all__ = [
    "BitWriter",
    "BitReader",
    "exp_golomb_encode",
    "exp_golomb_decode",
    "exp_golomb_length",
    "symbols_to_bits",
    "symbols_bit_length",
    "decode_symbols",
    "rle_encode",
    "rle_decode",
    "rle_encode_blocks",
    "zigzag_indices",
    "zigzag_order",
    "inverse_zigzag_order",
    "EOB_MARKER",
]
