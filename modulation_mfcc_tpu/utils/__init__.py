"""Small shared utilities for the TPU-native modulation-MFCC framework."""
from modulation_mfcc_tpu.utils.helpers import (
    cdiv,
    next_pow2,
    pad_center,
    round_up_to_multiple,
)

__all__ = ["cdiv", "next_pow2", "pad_center", "round_up_to_multiple"]
