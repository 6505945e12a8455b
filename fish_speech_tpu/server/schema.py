"""API request/response schemas (pydantic).

Mirrors the reference contract (`fish_speech/utils/schema.py`) so clients of
the reference server work unchanged.
"""

from __future__ import annotations

import base64
from typing import Literal, Optional

from pydantic import BaseModel, Field, conint, model_validator
from typing_extensions import Annotated


class ServeReferenceAudio(BaseModel):
    audio: bytes
    text: str

    @model_validator(mode="before")
    def decode_audio(cls, values):
        audio = values.get("audio")
        if isinstance(audio, str) and len(audio) > 255:
            try:
                values["audio"] = base64.b64decode(audio)
            except Exception:
                pass
        return values

    def __repr__(self) -> str:
        return f"ServeReferenceAudio(text={self.text!r}, audio_size={len(self.audio)})"


class ServeTTSRequest(BaseModel):
    text: str
    chunk_length: Annotated[int, conint(ge=100, le=1000, strict=True)] = 200
    # reference schema is wav|pcm|mp3|opus (`schema.py:85`); flac is added
    # here because it has a native zero-dependency encoder (audio/transcode)
    # and the reference's own server already serves audio/flac content-type
    # (`api_utils.py:86`)
    format: Literal["wav", "pcm", "mp3", "opus", "flac"] = "wav"
    latency: Literal["normal", "balanced"] = "normal"
    references: list[ServeReferenceAudio] = []
    reference_id: Optional[str] = None
    seed: Optional[int] = None
    use_memory_cache: Literal["on", "off"] = "off"
    normalize: bool = True
    streaming: bool = False
    max_new_tokens: int = 1024
    top_p: Annotated[float, Field(ge=0.1, le=1.0)] = 0.8
    repetition_penalty: Annotated[float, Field(ge=0.9, le=2.0)] = 1.1
    temperature: Annotated[float, Field(ge=0.1, le=1.0)] = 0.8


class ServeVQGANEncodeRequest(BaseModel):
    audios: list[bytes]


class ServeVQGANEncodeResponse(BaseModel):
    tokens: list[list[list[int]]]


class ServeVQGANDecodeRequest(BaseModel):
    tokens: list[list[list[int]]]


class ServeVQGANDecodeResponse(BaseModel):
    audios: list[bytes]


class AddReferenceRequest(BaseModel):
    id: str = Field(..., min_length=1, max_length=255, pattern=r"^[a-zA-Z0-9\-_ ]+$")
    audio: bytes
    text: str = Field(..., min_length=1)

    @model_validator(mode="before")
    def decode_audio(cls, values):
        audio = values.get("audio")
        if isinstance(audio, str) and len(audio) > 255:
            try:
                values["audio"] = base64.b64decode(audio)
            except Exception:
                pass
        return values


class AddReferenceResponse(BaseModel):
    success: bool
    message: str
    reference_id: str


class ListReferencesResponse(BaseModel):
    success: bool
    reference_ids: list[str]
    message: str = "Success"


class DeleteReferenceResponse(BaseModel):
    success: bool
    message: str
    reference_id: str


class UpdateReferenceResponse(BaseModel):
    success: bool
    message: str
    old_reference_id: str
    new_reference_id: str
