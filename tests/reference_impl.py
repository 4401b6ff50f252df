"""Compatibility shim: the float64 CPU oracle lives in the package now
(modulation_mfcc_tpu/oracle.py) so the CLI parity harness ships with it."""
from modulation_mfcc_tpu.oracle import (  # noqa: F401
    get_mfccs_change_np,
    mfcc_np,
    power_to_db_np,
    stft_power_np,
)
