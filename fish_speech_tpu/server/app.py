"""HTTP API server (aiohttp + msgpack).

Endpoint and wire-format parity with the reference server
(`tools/api_server.py`, `tools/server/views.py`):

  GET/POST /v1/health
  POST /v1/tts                  msgpack|json body -> WAV bytes, or
                                streaming WAV header + int16 PCM chunks
  POST /v1/vqgan/encode         {audios: [wav bytes]} -> {tokens}
  POST /v1/vqgan/decode         {tokens} -> {audios: [float16 pcm bytes]}
  POST /v1/references/add       multipart|msgpack|json
  GET  /v1/references/list
  DELETE /v1/references/delete
  POST /v1/references/update
  GET  /ui                      minimal built-in web UI

Bearer-token auth via --api-key. Generation runs in a worker thread (the
engine serializes device access); streaming chunks flow through an asyncio
queue.
"""

from __future__ import annotations

import asyncio
import io
import logging
from typing import Optional

import msgpack
import numpy as np
import pydantic
from aiohttp import web

from fish_speech_tpu.audio import transcode
from fish_speech_tpu.audio.io import write_wav
from fish_speech_tpu.engine.tts import TTSInferenceEngine, TTSRequest
from fish_speech_tpu.server.schema import (
    AddReferenceRequest,
    AddReferenceResponse,
    DeleteReferenceResponse,
    ListReferencesResponse,
    ServeReferenceAudio,
    ServeTTSRequest,
    ServeVQGANDecodeRequest,
    ServeVQGANEncodeRequest,
    UpdateReferenceResponse,
)

logger = logging.getLogger(__name__)

AMPLITUDE = 32768  # int16 full scale for streamed PCM chunks


def _msgpack_response(model, status: int = 200) -> web.Response:
    return web.Response(
        body=msgpack.packb(model.model_dump(), use_bin_type=True),
        status=status,
        content_type="application/msgpack",
    )


def _negotiated_response(request: web.Request, model, status: int = 200):
    accept = request.headers.get("Accept", "")
    if "application/json" in accept:
        return web.json_response(_jsonable(model.model_dump()), status=status)
    return _msgpack_response(model, status)


def _jsonable(obj):
    if isinstance(obj, bytes):
        import base64

        return base64.b64encode(obj).decode()
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_jsonable(v) for v in obj]
    return obj


async def _parse_body(request: web.Request) -> dict:
    ctype = request.content_type
    if ctype == "application/msgpack":
        return msgpack.unpackb(await request.read(), raw=False)
    if ctype == "application/json":
        return await request.json()
    if ctype == "multipart/form-data":
        data = {}
        async for part in await request.multipart():
            if part.name is None:
                continue
            if part.filename:
                data[part.name] = await part.read(decode=False)
            else:
                data[part.name] = (await part.read(decode=False)).decode()
        return data
    raise web.HTTPUnsupportedMediaType(
        headers={"Accept": "application/msgpack, application/json, multipart/form-data"}
    )


@web.middleware
async def error_middleware(request, handler):
    try:
        return await handler(request)
    except web.HTTPException:
        raise
    except (pydantic.ValidationError, ValueError) as e:
        # malformed request body/fields are client errors (the reference's
        # FastAPI layer returns 422 for these; we use 400 consistently)
        return web.json_response({"error": str(e)}, status=400)
    except Exception as e:
        logger.exception("Unhandled error in %s", request.path)
        return web.json_response({"error": str(e)}, status=500)


def make_auth_middleware(api_key: Optional[str]):
    @web.middleware
    async def auth_middleware(request, handler):
        if api_key and request.path.startswith("/v1/"):
            auth = request.headers.get("Authorization", "")
            if auth != f"Bearer {api_key}":
                return web.json_response({"error": "Unauthorized"}, status=401)
        return await handler(request)

    return auth_middleware


_UI_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>fish-speech-tpu</title>
<style>
body{font-family:system-ui;max-width:760px;margin:2rem auto;padding:0 1rem;background:#111;color:#eee}
textarea,input,select{width:100%;background:#1d1d1f;color:#eee;border:1px solid #444;border-radius:6px;padding:8px;margin:4px 0;box-sizing:border-box}
button{background:#4a7dff;color:#fff;border:0;border-radius:6px;padding:10px 18px;cursor:pointer;margin-top:8px}
button.sec{background:#333}
label{font-size:.85rem;color:#aaa}.row{display:flex;gap:8px}.row>div{flex:1}
details{margin:8px 0;border:1px solid #333;border-radius:6px;padding:8px}
summary{cursor:pointer;color:#aaa}
#refs{font-size:.85rem;color:#8f8}
</style></head><body>
<h2>fish-speech-tpu</h2>
<label>[[Text]] (use &lt;|speaker:N|&gt; tags for multi-speaker)</label>
<textarea id="text" rows="4">Hello! This is a test of the TPU-native fish-speech rebuild.</textarea>
<div class="row">
<div><label>[[Temperature]]</label><input id="temperature" type="number" value="0.8" step="0.1" min="0.1" max="1.0"></div>
<div><label>[[Top-P]]</label><input id="top_p" type="number" value="0.8" step="0.1" min="0.1" max="1.0"></div>
<div><label>[[Repetition Penalty]]</label><input id="repetition_penalty" type="number" value="1.1" step="0.1" min="0.9" max="2.0"></div>
<div><label>[[Max new tokens]]</label><input id="max_new_tokens" type="number" value="512"></div>
</div>
<div class="row">
<div><label>[[Chunk length (bytes)]]</label><input id="chunk_length" type="number" value="200" min="100" max="1000"></div>
<div><label>[[Seed]]</label><input id="seed" type="number" placeholder=""></div>
<div><label>[[Reference ID]]</label><input id="reference_id" placeholder="(optional)"></div>
<div><label>[[Streaming]]</label><select id="streaming"><option value="false">off</option><option value="true">on</option></select></div>
</div>
<details><summary>[[Reference Audio]] (voice cloning)</summary>
<label>[[Audio file]]</label><input id="ref_audio" type="file" accept=".wav,.flac">
<label>[[Reference Text]]</label><input id="ref_text" placeholder="what the reference says">
<div class="row">
<div><label>Save as ID</label><input id="ref_save_id" placeholder="my-voice"></div>
<div style="align-self:end"><button class="sec" onclick="saveRef()">Save reference</button></div>
<div style="align-self:end"><button class="sec" onclick="listRefs()">List</button></div>
</div>
<p id="refs"></p>
</details>
<button onclick="go()">[[Synthesize]]</button>
<p id="status"></p><audio id="player" controls style="width:100%"></audio>
<script>
function b64(buf){let s='';new Uint8Array(buf).forEach(b=>s+=String.fromCharCode(b));return btoa(s)}
async function refPayload(){
  const f=document.getElementById('ref_audio').files[0];
  if(!f) return [];
  return [{audio:b64(await f.arrayBuffer()),text:document.getElementById('ref_text').value||''}];
}
async function saveRef(){
  const f=document.getElementById('ref_audio').files[0];
  const id=document.getElementById('ref_save_id').value;
  const s=document.getElementById('refs');
  if(!f||!id){s.textContent='need a file and an ID';return}
  const r=await fetch('/v1/references/add',{method:'POST',headers:{'Content-Type':'application/json','Accept':'application/json'},
    body:JSON.stringify({id:id,audio:b64(await f.arrayBuffer()),text:document.getElementById('ref_text').value||''})});
  s.textContent=(await r.json()).message;
}
async function listRefs(){
  const r=await fetch('/v1/references/list',{headers:{'Accept':'application/json'}});
  const j=await r.json();
  document.getElementById('refs').textContent='References: '+(j.reference_ids.join(', ')||'(none)');
}
async function go(){
  const s=document.getElementById('status'); s.textContent='Generating…';
  const seedRaw=document.getElementById('seed').value;
  const body={text:document.getElementById('text').value,
    temperature:parseFloat(document.getElementById('temperature').value),
    top_p:parseFloat(document.getElementById('top_p').value),
    repetition_penalty:parseFloat(document.getElementById('repetition_penalty').value),
    max_new_tokens:parseInt(document.getElementById('max_new_tokens').value),
    chunk_length:parseInt(document.getElementById('chunk_length').value),
    seed:seedRaw?parseInt(seedRaw):null,
    reference_id:document.getElementById('reference_id').value||null,
    references:await refPayload(),
    format:'wav',streaming:document.getElementById('streaming').value==='true'};
  const t0=performance.now();
  const r=await fetch('/v1/tts',{method:'POST',headers:{'Content-Type':'application/json'},body:JSON.stringify(body)});
  if(!r.ok){s.textContent='Error: '+await r.text();return}
  const blob=await r.blob();
  document.getElementById('player').src=URL.createObjectURL(blob);
  s.textContent='Done in '+((performance.now()-t0)/1000).toFixed(1)+'s.';
}
</script></body></html>"""


def _render_ui_html() -> str:
    """Substitute the [[...]] label tokens through the i18n table (reference
    localizes its Gradio UI the same way, `tools/webui/__init__.py:22-153`)."""
    from fish_speech_tpu.i18n import i18n

    # literal keys so `python -m fish_speech_tpu.i18n.scan` finds them
    labels = {
        "Text": i18n("Text"),
        "Temperature": i18n("Temperature"),
        "Top-P": i18n("Top-P"),
        "Repetition Penalty": i18n("Repetition Penalty"),
        "Max new tokens": i18n("Max new tokens"),
        "Chunk length (bytes)": i18n("Chunk length (bytes)"),
        "Seed": i18n("Seed"),
        "Reference ID": i18n("Reference ID"),
        "Streaming": i18n("Streaming"),
        "Reference Audio": i18n("Reference Audio"),
        "Audio file": i18n("Audio file"),
        "Reference Text": i18n("Reference Text"),
        "Synthesize": i18n("Synthesize"),
    }
    html = _UI_HTML
    for key, val in labels.items():
        html = html.replace(f"[[{key}]]", val)
    return html


def create_app(engine: TTSInferenceEngine, api_key: Optional[str] = None,
               max_text_length: int = 0) -> web.Application:
    app = web.Application(
        middlewares=[make_auth_middleware(api_key), error_middleware],
        client_max_size=256 * 1024 * 1024,
    )
    app["engine"] = engine
    app["max_text_length"] = max_text_length

    async def health(request):
        return web.json_response({"status": "ok"})

    async def ui(request):
        return web.Response(text=_render_ui_html(), content_type="text/html")

    async def tts(request):
        data = await _parse_body(request)
        req_model = ServeTTSRequest(**data)
        if max_text_length > 0 and len(req_model.text) > max_text_length:
            return web.json_response(
                {"error": f"Text is too long, max length is {max_text_length}"},
                status=400,
            )
        if req_model.streaming and req_model.format != "wav":
            return web.json_response(
                {"error": "Streaming only supports WAV format"}, status=400
            )
        if req_model.format not in ("wav", "pcm") and (
            req_model.format not in transcode.available_formats()
        ):
            return web.json_response(
                {
                    "error": (
                        f"Format {req_model.format!r} has no encoder backend; "
                        f"available: {transcode.available_formats()}"
                    )
                },
                status=400,
            )

        ereq = TTSRequest(
            text=req_model.text,
            chunk_length=req_model.chunk_length,
            format=req_model.format,
            references=[
                ServeReferenceAudio(audio=r.audio, text=r.text)
                if not isinstance(r, ServeReferenceAudio)
                else r
                for r in req_model.references
            ],
            reference_id=req_model.reference_id,
            seed=req_model.seed,
            use_memory_cache=req_model.use_memory_cache,
            normalize=req_model.normalize,
            streaming=req_model.streaming,
            max_new_tokens=req_model.max_new_tokens,
            top_p=req_model.top_p,
            repetition_penalty=req_model.repetition_penalty,
            temperature=req_model.temperature,
        )

        loop = asyncio.get_running_loop()
        queue: asyncio.Queue = asyncio.Queue()

        def worker():
            try:
                for result in engine.inference(ereq):
                    loop.call_soon_threadsafe(queue.put_nowait, result)
            finally:
                loop.call_soon_threadsafe(queue.put_nowait, None)

        fut = loop.run_in_executor(None, worker)

        if ereq.streaming:
            response = web.StreamResponse(
                headers={
                    "Content-Type": "audio/wav",
                    "Content-Disposition": "attachment; filename=audio.wav",
                }
            )
            await response.prepare(request)
            while True:
                result = await queue.get()
                if result is None:
                    break
                if result.code == "header":
                    await response.write(result.audio[1].tobytes())
                elif result.code == "segment":
                    pcm = (result.audio[1] * AMPLITUDE).astype(np.int16)
                    await response.write(pcm.tobytes())
                elif result.code == "error":
                    logger.error("stream error: %s", result.error)
                    break
            await fut
            await response.write_eof()
            return response

        final = None
        error = None
        while True:
            result = await queue.get()
            if result is None:
                break
            if result.code == "final":
                final = result
            elif result.code == "error":
                error = result
        await fut
        if final is None:
            msg = str(error.error) if error else "No audio generated"
            return web.json_response({"error": msg}, status=500)

        sr, audio = final.audio
        if ereq.format == "pcm":
            body = (np.clip(audio, -1, 1) * AMPLITUDE).astype(np.int16).tobytes()
            ctype = "audio/pcm"
        elif ereq.format == "wav":
            buf = io.BytesIO()
            _write_wav_buffer(buf, audio, sr)
            body = buf.getvalue()
            ctype = "audio/wav"
        else:
            try:
                body = transcode.encode_audio(audio, sr, ereq.format)
            except transcode.TranscodeUnavailable as e:
                return web.json_response({"error": str(e)}, status=400)
            ctype = {
                "flac": "audio/flac", "mp3": "audio/mpeg", "opus": "audio/opus"
            }[ereq.format]
        return web.Response(
            body=body,
            content_type=ctype,
            headers={
                "Content-Disposition": f"attachment; filename=audio.{ereq.format}"
            },
        )

    async def vqgan_encode(request):
        data = await _parse_body(request)
        req_model = ServeVQGANEncodeRequest(**data)
        loop = asyncio.get_running_loop()
        tokens = await loop.run_in_executor(
            None,
            lambda: [engine.encode_reference(a).tolist() for a in req_model.audios],
        )
        from fish_speech_tpu.server.schema import ServeVQGANEncodeResponse

        return _msgpack_response(ServeVQGANEncodeResponse(tokens=tokens))

    async def vqgan_decode(request):
        data = await _parse_body(request)
        req_model = ServeVQGANDecodeRequest(**data)
        loop = asyncio.get_running_loop()

        def run():
            out = []
            for tok in req_model.tokens:
                audio = engine.decode_vq_tokens(np.asarray(tok, dtype=np.int32))
                out.append(audio.astype(np.float16).tobytes())
            return out

        audios = await loop.run_in_executor(None, run)
        from fish_speech_tpu.server.schema import ServeVQGANDecodeResponse

        return _msgpack_response(ServeVQGANDecodeResponse(audios=audios))

    async def references_add(request):
        data = await _parse_body(request)
        try:
            req_model = AddReferenceRequest(**data)
            engine.references.add_reference(
                req_model.id, req_model.audio, req_model.text
            )
            resp = AddReferenceResponse(
                success=True,
                message=f"Reference voice '{req_model.id}' added successfully",
                reference_id=req_model.id,
            )
            return _negotiated_response(request, resp)
        except FileExistsError:
            resp = AddReferenceResponse(
                success=False,
                message=f"Reference ID '{data.get('id')}' already exists",
                reference_id=str(data.get("id")),
            )
            return _negotiated_response(request, resp, status=409)
        except (ValueError, KeyError) as e:
            resp = AddReferenceResponse(
                success=False, message=str(e), reference_id=str(data.get("id"))
            )
            return _negotiated_response(request, resp, status=400)

    async def references_list(request):
        ids = engine.references.list_references()
        return _negotiated_response(
            request, ListReferencesResponse(success=True, reference_ids=ids)
        )

    async def references_delete(request):
        data = await _parse_body(request)
        ref_id = str(data.get("id", ""))
        try:
            engine.references.delete_reference(ref_id)
            resp = DeleteReferenceResponse(
                success=True,
                message=f"Reference voice '{ref_id}' deleted successfully",
                reference_id=ref_id,
            )
            return _negotiated_response(request, resp)
        except FileNotFoundError:
            resp = DeleteReferenceResponse(
                success=False,
                message=f"Reference ID '{ref_id}' not found",
                reference_id=ref_id,
            )
            return _negotiated_response(request, resp, status=404)

    async def references_update(request):
        data = await _parse_body(request)
        old_id = str(data.get("old_id", data.get("id", "")))
        new_id = str(data.get("new_id", old_id))
        try:
            engine.references.update_reference(
                old_id, new_id, data.get("audio"), data.get("text")
            )
            resp = UpdateReferenceResponse(
                success=True,
                message="Reference updated",
                old_reference_id=old_id,
                new_reference_id=new_id,
            )
            return _negotiated_response(request, resp)
        except FileNotFoundError:
            resp = UpdateReferenceResponse(
                success=False,
                message=f"Reference ID '{old_id}' not found",
                old_reference_id=old_id,
                new_reference_id=new_id,
            )
            return _negotiated_response(request, resp, status=404)

    app.router.add_get("/v1/health", health)
    app.router.add_post("/v1/health", health)
    app.router.add_get("/ui", ui)
    app.router.add_post("/v1/tts", tts)
    app.router.add_post("/v1/vqgan/encode", vqgan_encode)
    app.router.add_post("/v1/vqgan/decode", vqgan_decode)
    app.router.add_post("/v1/references/add", references_add)
    app.router.add_get("/v1/references/list", references_list)
    app.router.add_delete("/v1/references/delete", references_delete)
    app.router.add_post("/v1/references/update", references_update)
    return app


def _write_wav_buffer(buf, audio: np.ndarray, sr: int):
    import wave

    pcm = (np.clip(audio, -1.0, 1.0) * 32767.0).astype("<i2")
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())
