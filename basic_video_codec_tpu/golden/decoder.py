"""Golden decode driver (reference decoder.py:26-87 semantics).

Reads the framed bitstream, entropy-decodes prediction data and DCT
coefficients, reconstructs each frame (I: intra re-prediction from decoded
neighbours; P: motion compensation against the decoded reference deque), and
checks PSNR against the encoder's reconstructed plane file.
"""

from collections import deque
from contextlib import ExitStack

import numpy as np

from ..config import InputParameters
from ..io.fileio import FileIOHelper, write_y_only_frame
from ..utils.frame_utils import psnr
from ..utils.logger import get_logger
from . import frames as gf
from .interp import build_pre_interpolated_buffer

logger = get_logger()


def decode_video(params: InputParameters):
    ec = params.encoder_config
    file_io = FileIOHelper(params)
    from ..utils.frame_utils import padded_dims

    width, height = padded_dims(params.width, params.height, ec.block_size)
    frame_size = width * height

    refs = deque(maxlen=ec.nRefFrames)
    refs.append(np.full((height, width), 128, dtype=np.uint8))
    irefs = deque(maxlen=ec.nRefFrames)
    irefs.append(build_pre_interpolated_buffer(refs[0]))

    with ExitStack() as stack:
        recon_fh = stack.enter_context(open(file_io.get_mc_reconstructed_file_name(), "rb"))
        encoded_fh = stack.enter_context(open(file_io.get_encoded_file_name(), "rb"))
        decoded_fh = stack.enter_context(open(file_io.get_mc_decoded_file_name(), "wb"))

        frame_index = 0
        while True:
            frame_index += 1
            mode_byte = encoded_fh.read(1)
            if frame_index > params.frames_to_process or not mode_byte:
                break
            mode = int.from_bytes(mode_byte)

            if mode == gf.INTRA:
                frame = gf.GoldenFrame(gf.INTRA)
                refs.clear()
                irefs.clear()
            else:
                frame = gf.GoldenFrame(
                    gf.INTER, reference_frames=refs, interpolated_reference_frames=irefs
                )

            pred_len = int.from_bytes(encoded_fh.read(2))
            pred_data = encoded_fh.read(pred_len)
            if mode == gf.INTRA:
                gf.decode_iframe_prediction_data(frame, pred_data, params)
            else:
                gf.decode_pframe_prediction_data(frame, pred_data, params)

            dct_len = int.from_bytes(encoded_fh.read(3))
            gf.decode_dct_coffs(frame, encoded_fh.read(dct_len), params)

            if mode == gf.INTRA:
                decoded = gf.decode_iframe(frame, (height, width), ec)
            else:
                decoded = gf.decode_pframe(frame, (height, width), ec)

            reconstructed = np.frombuffer(recon_fh.read(frame_size), dtype=np.uint8).reshape(
                height, width
            )
            frame_psnr = psnr(decoded, reconstructed)
            logger.info(f"{frame_index:2}: psnr [{round(frame_psnr, 2):6.2f}]")

            write_y_only_frame(decoded_fh, decoded)
            refs.append(decoded)
            irefs.append(build_pre_interpolated_buffer(decoded))
    logger.info("End decoding")
