from fish_speech_tpu.models.dac.model import (
    dac_decode,
    dac_encode,
    dac_from_indices,
    init_dac,
)

__all__ = ["init_dac", "dac_encode", "dac_decode", "dac_from_indices"]
