from fish_speech_tpu.parallel.mesh import (
    batch_spec,
    dual_ar_param_specs,
    kv_cache_specs,
    make_mesh,
    shard_params,
)

__all__ = [
    "make_mesh",
    "dual_ar_param_specs",
    "kv_cache_specs",
    "batch_spec",
    "shard_params",
]
