from fish_speech_tpu.ops.norms import rms_norm
from fish_speech_tpu.ops.rope import apply_rope, precompute_rope
from fish_speech_tpu.ops.sampling import logits_to_probs, sample_from_probs

__all__ = [
    "rms_norm",
    "apply_rope",
    "precompute_rope",
    "logits_to_probs",
    "sample_from_probs",
]
