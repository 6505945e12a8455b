from fish_speech_tpu.engine.tts import InferenceResult, TTSInferenceEngine

__all__ = ["TTSInferenceEngine", "InferenceResult"]
