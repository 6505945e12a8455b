"""Bulk offline synthesis CLI (`tools/batch_tts.py`).

Runs the real entry point in-process with tiny random models over the
continuous batcher: outputs land per item, the manifest records status and
timing, per-item failures don't abort the job, and work-list validation
catches filename-hostile and duplicate ids before any model loads.
"""

import json
import wave

import pytest

pytestmark = pytest.mark.heavy  # loads models + jit-compiles

from fish_speech_tpu.tools.batch_tts import main, read_items


def test_batch_job_tsv_through_pool(tmp_path):
    work = tmp_path / "work.tsv"
    work.write_text(
        "# comment line\n"
        "first\tHello from item one.\n"
        "second\tA different sentence.\n"
        "third\tShort.\n",
        encoding="utf-8",
    )
    out = tmp_path / "out"
    rc = main([
        "--input", str(work), "--output-dir", str(out),
        "--tiny", "--cpu", "--pool-size", "2", "--max-new-tokens", "8",
        "--decode-chunk-size", "8",
    ])
    assert rc == 0
    rows = [json.loads(l) for l in
            (out / "manifest.jsonl").read_text().splitlines()]
    assert {r["id"] for r in rows} == {"first", "second", "third"}
    for r in rows:
        assert r["status"] == "ok" and r["seconds_of_audio"] > 0
        with wave.open(r["file"]) as f:
            assert f.getnframes() > 0


def test_batch_job_jsonl_failure_isolation(tmp_path):
    work = tmp_path / "work.jsonl"
    rows = [
        {"id": "ok-item", "text": "This one works.", "seed": 7},
        # unknown reference id -> this item fails, the job continues
        {"id": "bad-item", "text": "Doomed.", "reference_id": "no-such-ref"},
    ]
    work.write_text("\n".join(json.dumps(r) for r in rows), encoding="utf-8")
    out = tmp_path / "out"
    rc = main([
        "--input", str(work), "--output-dir", str(out),
        "--tiny", "--cpu", "--pool-size", "1", "--max-new-tokens", "8",
        "--decode-chunk-size", "8",
    ])
    assert rc == 1  # at least one failure
    manifest = {r["id"]: r for r in
                (json.loads(l) for l in
                 (out / "manifest.jsonl").read_text().splitlines())}
    assert manifest["ok-item"]["status"] == "ok"
    assert (out / "ok-item.wav").exists()
    assert manifest["bad-item"]["status"] == "error"
    assert not (out / "bad-item.wav").exists()


def test_read_items_validation(tmp_path):
    bad_id = tmp_path / "bad.tsv"
    bad_id.write_text("../escape\ttext\n", encoding="utf-8")
    with pytest.raises(ValueError, match="filename"):
        read_items(bad_id)

    dupes = tmp_path / "dupes.tsv"
    dupes.write_text("a\tone\na\ttwo\n", encoding="utf-8")
    with pytest.raises(ValueError, match="duplicate"):
        read_items(dupes)

    no_tab = tmp_path / "notab.tsv"
    no_tab.write_text("just text\n", encoding="utf-8")
    with pytest.raises(ValueError, match="TAB"):
        read_items(no_tab)

    missing = tmp_path / "missing.jsonl"
    missing.write_text('{"id": "x"}\n', encoding="utf-8")
    with pytest.raises(ValueError, match="text"):
        read_items(missing)
