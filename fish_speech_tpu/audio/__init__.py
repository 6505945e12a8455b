from fish_speech_tpu.audio.io import (
    load_audio,
    read_wav,
    resample,
    wav_chunk_header,
    write_wav,
)

__all__ = ["read_wav", "write_wav", "resample", "load_audio", "wav_chunk_header"]
