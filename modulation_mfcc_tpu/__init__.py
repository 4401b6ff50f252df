"""modulation_mfcc_tpu — TPU-native acoustic feature-extraction framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``aaron-randreth/modulation-mfcc`` (see SURVEY.md): MFCC modulation cepstrum,
modulation spectra, F0, formants, amplitude envelopes, derivatives, peak
analysis, TextGrid/EMA I/O and CSV export — as a pure-functional, batched,
mesh-shardable library instead of a Qt desktop app.
"""
from modulation_mfcc_tpu.models.config import (
    AmplitudeConfig,
    EmaConfig,
    F0Config,
    FormantConfig,
    MfccConfig,
    PipelineConfig,
    config_from_reference_json,
    config_to_reference_json,
)
from modulation_mfcc_tpu.models.modulation import (
    extract_mfcc_change,
    mfcc_change,
    mfcc_trajectories,
    modulation_spectrum,
)

__version__ = "0.1.0"
