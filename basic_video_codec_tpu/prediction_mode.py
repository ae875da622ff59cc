"""Prediction-mode enum (reference encoder/PredictionMode.py:4-9).

The pipeline passes modes around as their integer values (they are also the
bitstream byte, reference encoder.py:105); this enum is the public-API name
for them.
"""

from enum import Enum


class PredictionMode(Enum):
    INTER_FRAME = 0  # P-frame
    INTRA_FRAME = 1  # I-frame

    def __str__(self):
        return self.name
