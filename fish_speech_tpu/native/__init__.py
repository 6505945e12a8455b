from fish_speech_tpu.native.loader import (
    fast_parse_available,
    fast_read_shard,
    load_library,
    materialize_sentence,
    parse_shard_flat,
)

__all__ = [
    "load_library",
    "fast_parse_available",
    "fast_read_shard",
    "parse_shard_flat",
    "materialize_sentence",
]
