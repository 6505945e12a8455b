"""CLI tool smoke tests (tiny models, CliRunner)."""

import numpy as np
import pytest
from click.testing import CliRunner

from fish_speech_tpu.audio.io import write_wav
from fish_speech_tpu.config import dac_tiny


@pytest.fixture()
def audio_tree(tmp_path):
    """A little speaker-folder tree with wavs + .lab transcripts."""
    cfg = dac_tiny()
    rng = np.random.default_rng(0)
    for spk in ("alice", "bob"):
        d = tmp_path / spk
        d.mkdir()
        for i in range(2):
            wav = rng.normal(size=cfg.frame_length * 2).astype(np.float32) * 0.1
            write_wav(d / f"{i}.wav", wav, cfg.sample_rate)
            (d / f"{i}.lab").write_text(f"{spk} sentence {i}")
    return tmp_path


def test_codec_cli_roundtrip(tmp_path):
    """The codec round-trip CLI (`tools/codec.py`, reference
    `fish_speech/models/dac/inference.py`): audio -> .npy codes ->
    reconstructed wav, through a saved native codec checkpoint."""
    import jax
    import jax.numpy as jnp

    from fish_speech_tpu.audio.io import read_wav
    from fish_speech_tpu.models.dac.model import init_dac
    from fish_speech_tpu.tools.codec import main
    from fish_speech_tpu.utils.checkpoint import save_dac

    cfg = dac_tiny()
    params = init_dac(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ckpt = tmp_path / "codec_ckpt"
    save_dac(ckpt, params, cfg)

    wav_in = tmp_path / "in.wav"
    rng = np.random.default_rng(3)
    write_wav(wav_in, rng.normal(size=cfg.frame_length * 3).astype(np.float32) * 0.1,
              cfg.sample_rate)

    runner = CliRunner()
    codes_out = tmp_path / "codes.npy"
    r = runner.invoke(main, ["-i", str(wav_in), "-o", str(codes_out),
                             "--checkpoint-path", str(ckpt), "--cpu"],
                      catch_exceptions=False)
    assert r.exit_code == 0
    codes = np.load(codes_out)
    assert codes.shape == (cfg.rvq.total_codebooks, 3)

    wav_out = tmp_path / "recon.wav"
    r = runner.invoke(main, ["-i", str(codes_out), "-o", str(wav_out),
                             "--checkpoint-path", str(ckpt), "--cpu"],
                      catch_exceptions=False)
    assert r.exit_code == 0
    audio, sr = read_wav(wav_out)  # (channels, T)
    assert sr == cfg.sample_rate
    assert audio.shape == (1, 3 * cfg.frame_length)


def test_extract_vq_and_build_dataset(audio_tree):
    from fish_speech_tpu.tools.build_dataset import main as build_main
    from fish_speech_tpu.tools.extract_vq import main as extract_main

    runner = CliRunner()
    r = runner.invoke(
        extract_main,
        [str(audio_tree), "--tiny", "--batch-size", "2", "--max-seconds", "1"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0
    npys = list(audio_tree.rglob("*.npy"))
    assert len(npys) == 4
    codes = np.load(npys[0])
    assert codes.shape[0] == dac_tiny().rvq.total_codebooks

    out = audio_tree / "protos"
    r = runner.invoke(
        build_main,
        ["--input", str(audio_tree), "--output", str(out)],
        catch_exceptions=False,
    )
    assert r.exit_code == 0
    shards = list(out.glob("*.protos"))
    assert shards

    # the shards feed the dataset
    from fish_speech_tpu.data.stream import read_pb_stream

    groups = []
    for s in shards:
        with open(s, "rb") as f:
            groups.extend(read_pb_stream(f))
    assert {g.name for g in groups} == {"alice", "bob"}
    assert all(len(g.sentences) == 2 for g in groups)


def test_create_train_split(audio_tree):
    from fish_speech_tpu.tools.create_train_split import main

    runner = CliRunner()
    r = runner.invoke(
        main, [str(audio_tree), "--val-count", "1", "--filter-transcribed"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0
    train = (audio_tree / "vq_train_filelist.txt").read_text().splitlines()
    val = (audio_tree / "vq_val_filelist.txt").read_text().splitlines()
    assert len(val) == 1 and len(train) == 3


def test_tts_cli_tiny(tmp_path):
    from fish_speech_tpu.tools.tts import main

    runner = CliRunner()
    out = tmp_path / "out.wav"
    r = runner.invoke(
        main,
        ["--tiny", "--cpu", "--text", "hi", "--max-new-tokens", "6",
         "--output", str(out), "--output-dir", str(tmp_path)],
        catch_exceptions=False,
    )
    assert r.exit_code == 0
    assert out.exists()
    assert (tmp_path / "codes_0.npy").exists()
    codes = np.load(tmp_path / "codes_0.npy")
    assert codes.shape[0] == dac_tiny().rvq.total_codebooks


def test_quantize_cli(tmp_path, tokenizer):
    import jax
    import jax.numpy as jnp

    from fish_speech_tpu.config import dual_ar_tiny
    from fish_speech_tpu.models.dual_ar import init_dual_ar
    from fish_speech_tpu.tools.quantize import main
    from fish_speech_tpu.utils.checkpoint import load_dual_ar, save_dual_ar

    cfg = dual_ar_tiny(semantic_begin_id=300, semantic_end_id=331, im_end_id=3)
    params = init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    src = tmp_path / "ckpt"
    save_dual_ar(src, params, cfg, tokenizer)

    runner = CliRunner()
    r = runner.invoke(main, ["--checkpoint-path", str(src)],
                      catch_exceptions=False)
    assert r.exit_code == 0
    qdir = tmp_path / "ckpt-int8"
    qparams, qcfg = load_dual_ar(qdir, dtype=None)
    assert qcfg == cfg
    assert qparams["layers"]["wqkv"]["q"].dtype == jnp.int8


def test_quantize_cli_int4(tmp_path, tokenizer):
    """--mode int4 writes a packed groupwise checkpoint (reference CLI
    parity, `tools/llama/quantize.py:242-420`); the loaded tree is
    IDENTICAL to runtime quantization and feeds `ops.quant.mm` directly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fish_speech_tpu.config import dual_ar_tiny
    from fish_speech_tpu.models.dual_ar import init_dual_ar
    from fish_speech_tpu.ops.quant import mm, quantize_dual_ar
    from fish_speech_tpu.tools.quantize import main
    from fish_speech_tpu.utils.checkpoint import load_dual_ar, save_dual_ar

    cfg = dual_ar_tiny(semantic_begin_id=300, semantic_end_id=331, im_end_id=3)
    params = init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    src = tmp_path / "ckpt"
    save_dual_ar(src, params, cfg, tokenizer)

    runner = CliRunner()
    r = runner.invoke(
        main,
        ["--checkpoint-path", str(src), "--mode", "int4", "--group-size", "32"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0
    qparams, qcfg = load_dual_ar(tmp_path / "ckpt-int4", dtype=None)
    assert qcfg == cfg
    assert qparams["layers"]["wqkv"]["p"].dtype == jnp.uint8
    assert "gs" in qparams["layers"]["wqkv"]
    # heads stay int8 in int4 mode (quality-sensitive, small traffic share)
    assert qparams["fast"]["output"]["q"].dtype == jnp.int8

    # loaded PTQ tree == runtime quantization, leaf for leaf
    want = quantize_dual_ar(params, mode="int4", group_size=32)
    flat_w = jax.tree_util.tree_leaves_with_path(want)
    flat_g = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(qparams)
    }
    assert len(flat_w) == len(flat_g)
    for k, v in flat_w:
        np.testing.assert_array_equal(
            np.asarray(flat_g[jax.tree_util.keystr(k)]), np.asarray(v)
        )

    # and the packed weight drives the runtime matmul
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, cfg.dim)), jnp.bfloat16
    )
    y = mm(x, {k: v[0] for k, v in qparams["layers"]["wqkv"].items()})
    yw = mm(x, {k: v[0] for k, v in want["layers"]["wqkv"].items()})
    np.testing.assert_array_equal(np.asarray(y), np.asarray(yw))


def test_eval_in_context_cli(tmp_path, tokenizer):
    """`tools/eval_in_context.py` (reference `tools/llama/eval_in_context.py`):
    teacher-forced per-frame semantic-loss curves across checkpoints, from
    (reference codes + target codes) through the chat framing."""
    import json

    import jax
    import jax.numpy as jnp

    from fish_speech_tpu.config import dual_ar_tiny
    from fish_speech_tpu.models.dual_ar import init_dual_ar
    from fish_speech_tpu.tools.eval_in_context import main
    from fish_speech_tpu.utils.checkpoint import save_dual_ar

    cfg = dual_ar_tiny(semantic_begin_id=300, semantic_end_id=331, im_end_id=3)
    params = init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ckpt = tmp_path / "ckpt"
    save_dual_ar(ckpt, params, cfg, tokenizer)

    rng = np.random.default_rng(7)
    n_sem = cfg.semantic_end_id - cfg.semantic_begin_id + 1
    ref = rng.integers(0, n_sem, size=(cfg.num_codebooks, 6)).astype(np.int32)
    tgt = rng.integers(0, n_sem, size=(cfg.num_codebooks, 5)).astype(np.int32)
    np.save(tmp_path / "ref.npy", ref)
    np.save(tmp_path / "tgt.npy", tgt)

    out = tmp_path / "loss.json"
    runner = CliRunner()
    r = runner.invoke(
        main,
        ["--checkpoint-path", str(ckpt),
         "--reference-codes", str(tmp_path / "ref.npy"),
         "--reference-text", "reference speech",
         "--target-codes", str(tmp_path / "tgt.npy"),
         "--target-text", "target speech",
         "--output", str(out)],
        catch_exceptions=False,
    )
    assert r.exit_code == 0
    results = json.loads(out.read_text())
    (entry,) = results.values()
    assert len(entry["per_frame"]) == tgt.shape[1]
    assert np.isfinite(entry["mean_loss"]) and entry["mean_loss"] > 0
    assert np.allclose(entry["mean_loss"], np.mean(entry["per_frame"]))


def test_eval_quality_harness(tmp_path, monkeypatch):
    """`tools/eval_quality.py` (the gate for the opt-in serving flags; the
    reference publishes the numbers in README.md:92-101 but ships no eval
    code): manifest -> engine synthesis -> mock-ASR WER + spectral-proxy
    SIM -> reference-format table, with a kv-int8 A/B in one invocation."""
    import json

    from fish_speech_tpu.config import dac_tiny
    from fish_speech_tpu.tools.eval_quality import main

    cfg = dac_tiny()
    rng = np.random.default_rng(0)
    ref_wav = tmp_path / "speaker.wav"
    write_wav(ref_wav, rng.normal(size=cfg.frame_length * 4).astype(np.float32) * 0.1,
              cfg.sample_rate)

    manifest = tmp_path / "manifest.jsonl"
    items = [
        {"id": "en_1", "text": "hello there", "lang": "en"},
        {"id": "zh_1", "text": "one two three", "lang": "zh",
         "ref_audio": str(ref_wav), "ref_text": "ref"},
    ]
    manifest.write_text("\n".join(json.dumps(i) for i in items))

    out = tmp_path / "eval_out"
    runner = CliRunner()
    r = runner.invoke(
        main,
        ["--manifest", str(manifest), "--out-dir", str(out), "--tiny",
         "--cpu", "--asr", "mock", "--sim", "spectral", "--ab", "kv-int8",
         "--max-new-tokens", "8"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    report = json.loads((out / "report.json").read_text())
    base = report["configs"]["baseline"]["aggregates"]
    # mock ASR echoes targets -> WER exactly 0 for both langs
    assert base["wer_en"] == 0.0 and base["wer_zh"] == 0.0
    assert -1.0 <= base["sim_mean"] <= 1.0
    ab = report["configs"]["kv-int8"]
    assert "delta_vs_baseline" in ab and "wer_en" in ab["delta_vs_baseline"]
    # timing keys are excluded from the A/B deltas (not quality numbers)
    assert "synthesis_wall_s" not in ab["delta_vs_baseline"]
    # every item synthesized under both configs
    assert len(ab["items"]) == 2
    # pooled synthesis (default --pool-size 8 -> BatcherSession): per-item
    # RTF/TTFA columns + manifest-level throughput aggregates (VERDICT r4
    # item 3 — the gate must run at serving speed, and report it)
    assert base["synthesis_wall_s"] > 0
    assert base["synthesis_x_realtime"] > 0
    for row in report["configs"]["baseline"]["items"]:
        assert row["ttfa_s"] > 0 and row["rtf"] > 0 and row["audio_s"] > 0
    assert (out / "report.md").read_text().startswith("| Benchmark |")
    assert "Seed-TTS Eval — WER (Chinese)" in (out / "report.md").read_text()


def test_eval_quality_error_rate_units():
    """WER is word-level for en, char-level for zh; normalization strips
    punctuation/case (Seed-TTS-eval conventions)."""
    from fish_speech_tpu.tools.eval_quality import error_rate

    assert error_rate("Hello, WORLD!", "hello world", "en") == 0.0
    assert error_rate("hello big world", "hello world", "en") == 0.5
    assert error_rate("abc", "abd", "zh") == pytest.approx(1 / 3)
    assert error_rate("", "hello world", "en") == 1.0


def test_eval_quality_corpus_level_wer():
    """Per-language WER aggregates at corpus level (total edits / total
    reference tokens), not the mean of per-utterance rates — a 1-edit
    2-word clip beside a clean 100-word clip is ~1% corpus WER, not 25%
    (review finding: short utterances must not dominate the flag gate)."""
    from fish_speech_tpu.tools.eval_quality import score

    class Item(dict):
        pass

    timing = {"seconds": 0.1, "ttfa_s": 0.05, "audio_s": 0.5, "rtf": 0.2}
    results = [
        ({"id": "a", "lang": "en", "text": "hello world"},
         "a.wav", timing),
        ({"id": "b", "lang": "en", "text": " ".join(["word"] * 100)},
         "b.wav", timing),
    ]
    hyps = {"a.wav": "hello big world",  # 1 insertion vs 2 ref words
            "b.wav": " ".join(["word"] * 100)}
    rows, agg = score(results, lambda p, lang: hyps[p], None)
    assert rows[0]["wer"] == 0.5 and rows[1]["wer"] == 0.0
    assert agg["wer_en"] == pytest.approx(1 / 102, abs=1e-4)
