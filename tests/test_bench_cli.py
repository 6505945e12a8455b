"""bench.py CLI contract: default resolution and the re-exec retry ladder's
env overrides (a hard device OOM poisons the in-process client, so each
ladder step re-execs a fresh process and passes its shrunken config through
BENCH_FORCE_* — measured necessity: a 48x2k OOM dragged the old in-process
ladder down through 6/3/1/tiny, all spuriously RESOURCE_EXHAUSTED)."""

import importlib.util
import pathlib
import sys


def _load_bench():
    path = pathlib.Path(__file__).resolve().parent.parent / "bench.py"
    spec = importlib.util.spec_from_file_location("bench_module", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_parse_defaults_and_overrides(monkeypatch):
    bench = _load_bench()

    monkeypatch.setattr(sys, "argv", ["bench.py"])
    args = bench._parse()
    assert args.batch == 32  # round-4 serving default
    assert args.chunk == 128
    assert args.kv_int8 is True

    monkeypatch.setattr(sys, "argv", ["bench.py", "--burst"])
    args = bench._parse()
    assert args.batch == 16  # burst keeps the 2x-oversubscription pool

    monkeypatch.setattr(sys, "argv", ["bench.py", "--kv-bf16", "--batch", "8"])
    args = bench._parse()
    assert args.kv_int8 is False and args.batch == 8

    # ladder re-exec overrides win over argv
    monkeypatch.setattr(sys, "argv", ["bench.py", "--batch", "48"])
    monkeypatch.setenv("BENCH_FORCE_BATCH", "24")
    monkeypatch.setenv("BENCH_FORCE_SMALL", "1")
    args = bench._parse()
    assert args.batch == 24 and args.small is True
