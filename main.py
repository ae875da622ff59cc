"""Default entry point (reference main.py:8-10 runs the assign3 deliverable).

Runs the rate-controlled deliverable configuration — CIF, block 16, fastME,
RCflag 3 @ 2.4 Mbps, 21 frames — generating a synthetic stand-in sequence if
``data/e3_CIF.y`` is absent (the reference's copy is an unhydrated LFS
pointer).  See ``python -m basic_video_codec_tpu --help`` for the full CLI.
"""

from basic_video_codec_tpu.experiments.data import ensure_sequence
from basic_video_codec_tpu.experiments.rc_study import deliverable


def main():
    path = ensure_sequence("data/e3_CIF.y", 352, 288, 21)
    deliverable(path)


if __name__ == "__main__":
    main()
