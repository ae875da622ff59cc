"""Artifact tree naming and text/binary frame writers.

Byte/path-compatible with the reference (file_io.py:6-74, motion_vector.py:1-11):
the output directory for a run is
``<seq>/<bs>_<sr>[.0]_<qp>_<IPeriod>_<nRef>_<RCflag>_<targetBR>/`` and contains
``mv.txt``, ``metrics.csv``, ``metrics.png``, ``residuals_w_mc.yuv``,
``residuals_wo_mc.yuv``, ``mc_quant_dct_coff.bin``, ``encoded.bin``,
``mc_reconstructed.yuv`` and ``mc_decoded.yuv``.
"""

import contextlib
import os

import numpy as np

from ..config import InputParameters


@contextlib.contextmanager
def overwrite_open(path: str, text: bool = False, newline=None):
    """``open(path, "w")`` semantics without truncate-at-open: an existing
    file is overwritten in place and truncated to the new length at exit.

    Truncating at open forces ext4 (data=ordered) to first write back any
    dirty pages the file still holds from a previous run — measured ~20 ms
    per 24 MB of unflushed artifact data, ~0.9 s of the artifact opens on a
    240-frame CIF encode into a just-written directory.  In-place
    overwrites carry no such ordering, and the exit-time ``truncate()`` is
    a metadata no-op whenever the new run writes at least as many bytes.
    On error the file is truncated at the failure point, so a crashed run
    leaves a plain prefix, not a prefix plus a stale tail."""
    mode = "r+" if text else "r+b"
    try:
        fh = open(path, mode, newline=newline) if text else open(path, mode)
    except FileNotFoundError:
        fh = (open(path, "w", newline=newline) if text
              else open(path, "wb"))
    try:
        yield fh
    except BaseException:
        # already raising: truncate best-effort at the failure point so a
        # crashed run leaves a plain prefix, but don't mask the original
        with contextlib.suppress(OSError, ValueError):
            fh.truncate()
        fh.close()
        raise
    else:
        try:
            fh.truncate()  # must succeed: a stale tail would corrupt artifacts
        finally:
            fh.close()


class FileIOHelper:
    """Derives every artifact path for a run (reference file_io.py:6-62)."""

    def __init__(self, params: InputParameters, create_dirs: bool = True):
        ec = params.encoder_config
        self.y_only_file = params.y_only_file
        self.block_size = ec.block_size
        self.search_range = ec.search_range
        self.qp = ec.quantization_factor
        self.nRefFrames = ec.nRefFrames
        self.I_Period = ec.I_Period
        self.RCflag = ec.RCflag
        self.targetBR = ec.targetBR
        self.frames_to_process = params.frames_to_process

        fme_id = ".0" if ec.fracMeEnabled else ""
        # 7-field config identity (reference file_io.py:20)
        self.file_identifier = (
            f"{self.block_size}_{self.search_range}{fme_id}_{self.qp}_"
            f"{self.I_Period}_{self.nRefFrames}_{self.RCflag}_{self.targetBR}"
        )
        self.file_prefix = os.path.splitext(self.y_only_file)[0]
        if create_dirs:
            os.makedirs(os.path.dirname(self.get_file_name(suffix="")), exist_ok=True)

    def get_file_name(self, suffix):
        return f"{self.file_prefix}/{self.file_identifier}/{suffix}"

    def get_file_name_wo_identifier(self, suffix):
        return f"{self.file_prefix}/{suffix}"

    def get_y_file_name(self):
        return f"{self.file_prefix}.y"

    def get_yuv_file_name(self):
        return f"{self.file_prefix}.yuv"

    def get_mv_file_name(self):
        return self.get_file_name("mv.txt")

    def get_metrics_csv_file_name(self):
        return self.get_file_name("metrics.csv")

    def get_metrics_png_file_name(self):
        return self.get_file_name("metrics.png")

    def get_residual_w_mc_file_name(self):
        return self.get_file_name("residuals_w_mc.yuv")

    def get_residual_wo_mc_file_name(self):
        return self.get_file_name("residuals_wo_mc.yuv")

    def get_quant_dct_coff_fh_file_name(self):
        return self.get_file_name("mc_quant_dct_coff.bin")

    def get_encoded_file_name(self):
        return self.get_file_name("encoded.bin")

    def get_mc_reconstructed_file_name(self):
        return self.get_file_name("mc_reconstructed.yuv")

    def get_mc_decoded_file_name(self):
        return self.get_file_name("mc_decoded.yuv")


def write_mv_to_file(file_handle, data: dict, new_line_per_block: bool = False):
    """MV text serialization ``x,y:mvx,mvy|`` per block (reference file_io.py:65-70).

    NOTE the reference iterates ``sorted(data.keys())`` on ``(x, y)`` tuples,
    i.e. sorted by *x first* — column-major-ish order — which we preserve.
    """
    newline = "\n" if new_line_per_block else ""
    for k in sorted(data.keys()):
        file_handle.write(f"{newline}{k[0]},{k[1]}:{data[k][0]},{data[k][1]}|")
    file_handle.write("\n")


def write_y_only_frame(file_handle, frame):
    """Raw plane dump (reference file_io.py:73-74).  C-contiguous planes
    write straight from the array's buffer — ``tobytes()`` would memcpy
    ~0.5 MB/frame across the encoder's five artifact files."""
    if isinstance(frame, np.ndarray) and frame.flags.c_contiguous:
        file_handle.write(frame.data)
    else:
        file_handle.write(frame.tobytes())


def parse_mv(line: str) -> dict:
    """Parse one mv.txt line back into ``{(x, y): [mvx, mvy]}``
    (reference motion_vector.py:1-11)."""
    mv_field = {}
    for entry in line.strip().split("|"):
        if not entry:
            continue
        coords, mv = entry.split(":")
        x, y = map(int, coords.split(","))
        mv_x, mv_y = map(int, mv.split(","))
        mv_field[(x, y)] = [mv_x, mv_y]
    return mv_field
