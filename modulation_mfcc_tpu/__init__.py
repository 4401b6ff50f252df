"""modulation_mfcc_tpu — TPU-native acoustic feature-extraction framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``aaron-randreth/modulation-mfcc`` (see SURVEY.md): MFCC modulation cepstrum,
modulation spectra, F0, formants, amplitude envelopes, derivatives, peak
analysis, TextGrid/EMA I/O and CSV export — as a pure-functional, batched,
mesh-shardable library instead of a Qt desktop app.
"""
import os as _os


def _setup_compilation_cache() -> None:
    """Persistent XLA compilation cache (opt out: MODMFCC_NO_CACHE=1).

    Remote TPU compilation of the longer pipelines runs minutes; caching
    makes every later session start warm. Respects an existing user setting.
    """
    if _os.environ.get("MODMFCC_NO_CACHE"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            cache = _os.path.join(
                _os.path.expanduser("~"), ".cache", "modmfcc_jax"
            )
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_setup_compilation_cache()

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

# BASELINE.json API names: extract_mfcc / extract_modulation
extract_modulation = extract_mfcc_change


def extract_mfcc(y, cfg: "MfccConfig" = None, **kw):
    """(times, mfcc [NF, n_mfcc]) — librosa-semantics MFCC matrix (jitted,
    bucket-padded so lengths within a bucket share one compile)."""
    from modulation_mfcc_tpu.models.modulation import extract_mfcc_matrix

    return extract_mfcc_matrix(y, cfg or MfccConfig(), **kw)

__version__ = "0.1.0"
