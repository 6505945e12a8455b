"""Native C++ shard parser vs the protobuf-python path."""

import time

import numpy as np
import pytest

from fish_speech_tpu.data.stream import read_pb_stream
from fish_speech_tpu.native import fast_parse_available, fast_read_shard

from tests.test_data import NUM_CODEBOOKS, make_proto_file

pytestmark = pytest.mark.skipif(
    not fast_parse_available(), reason="g++/native lib unavailable"
)


def test_native_matches_protobuf(tmp_path):
    p = make_proto_file(tmp_path / "d.protos", n_groups=3, n_sentences=4)
    with open(p, "rb") as f:
        want = list(read_pb_stream(f))
    got = fast_read_shard(p)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert len(g["sentences"]) == len(w.sentences)
        for gs, ws in zip(g["sentences"], w.sentences):
            assert gs["text"] == ws.texts[0]
            sem = np.asarray(
                [list(r.values) for r in ws.semantics], dtype=np.int32
            )
            np.testing.assert_array_equal(gs["semantics"], sem)


def test_native_unicode_text(tmp_path):
    from fish_speech_tpu.data.protos import Semantics, Sentence, TextData
    from fish_speech_tpu.data.stream import write_pb_stream

    p = tmp_path / "u.protos"
    with open(p, "wb") as f:
        write_pb_stream(
            f,
            TextData(
                source="s", name="n",
                sentences=[
                    Sentence(
                        texts=["你好 wörld"],
                        semantics=[Semantics(values=[1, 2, 3])],
                    )
                ],
            ),
        )
    got = fast_read_shard(p)
    assert got[0]["sentences"][0]["text"] == "你好 wörld"
    np.testing.assert_array_equal(
        got[0]["sentences"][0]["semantics"], [[1, 2, 3]]
    )


def test_native_truncated_stream_rejected(tmp_path):
    p = make_proto_file(tmp_path / "d.protos", n_groups=1)
    data = p.read_bytes()
    bad = tmp_path / "bad.protos"
    bad.write_bytes(data[:-3])
    with pytest.raises(ValueError):
        fast_read_shard(bad)


def test_native_speedup(tmp_path):
    """The point of the native parser: meaningfully faster PARSING than
    protobuf-python (the dataset materializes only sampled sentences)."""
    from fish_speech_tpu.native import parse_shard_flat

    rng = np.random.default_rng(0)
    p = make_proto_file(tmp_path / "big.protos", n_groups=20, n_sentences=50,
                        rng=rng)

    t0 = time.perf_counter()
    for _ in range(3):
        with open(p, "rb") as f:
            py_records = [
                [
                    [list(r.values) for r in s.semantics]
                    for s in td.sentences
                ]
                for td in read_pb_stream(f)
            ]
    t_py = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(3):
        data, flat = parse_shard_flat(p)
    t_native = time.perf_counter() - t0

    assert flat["n_records"] == len(py_records)
    assert t_native < t_py, (t_native, t_py)


def test_native_malicious_varint_length_rejected(tmp_path):
    """A corrupt length varint near 2^64 must raise (wire error), not pass
    the bounds check via signed overflow or loop forever in the loader's
    grow-and-retry path."""
    import struct

    # record body: field 4 (Sentence), wire 2, length = 2^63 (10-byte varint)
    huge = b"\x22" + b"\xff\xff\xff\xff\xff\xff\xff\xff\x7f"
    rec = huge + b"\x00" * 16
    p = tmp_path / "evil.protos"
    p.write_bytes(struct.pack("<I", len(rec)) + rec)
    with pytest.raises(ValueError):
        fast_read_shard(p)


def test_native_corrupt_semantics_row_rejected(tmp_path):
    """A Semantics row whose packed length overflows must be a wire error
    (raise), NOT a capacity signal (-3) that doubles buffers forever."""
    import struct

    # Sentence { Semantics-row field 3 wire 2 } whose inner packed field 1
    # declares a huge length.
    inner = b"\x0a" + b"\xff\xff\xff\xff\xff\xff\xff\xff\x7f"  # field1 len 2^63
    sem_row = b"\x1a" + bytes([len(inner)]) + inner  # field 3, wire 2
    sentence = b"\x22" + bytes([len(sem_row)]) + sem_row  # field 4, wire 2
    p = tmp_path / "evil2.protos"
    p.write_bytes(struct.pack("<I", len(sentence)) + sentence)
    with pytest.raises(ValueError):
        fast_read_shard(p)


def test_native_capacity_growth_still_works(tmp_path):
    """Legit oversized rows still succeed through the grow-and-retry path."""
    from fish_speech_tpu.data.protos import Semantics, Sentence, TextData
    from fish_speech_tpu.data.stream import write_pb_stream

    p = tmp_path / "big_row.protos"
    big = list(range(200_000))  # larger than the loader's initial value cap
    with open(p, "wb") as f:
        write_pb_stream(
            f,
            TextData(
                source="s", name="n",
                sentences=[Sentence(texts=["t"],
                                    semantics=[Semantics(values=big)])],
            ),
        )
    got = fast_read_shard(p)
    np.testing.assert_array_equal(got[0]["sentences"][0]["semantics"][0], big)


def test_native_fuzz_mutations_never_crash(tmp_path):
    """Seeded fuzz sweep: random byte flips, truncations, insertions, and
    slice duplications over a valid shard must either parse or raise a
    clean Python error — never crash the process, hang, or hand back
    malformed arrays (the parser fronts untrusted dataset files)."""
    base = make_proto_file(tmp_path / "d.protos", n_groups=3, n_sentences=4)
    data = base.read_bytes()
    rng = np.random.default_rng(0)
    parsed = errors = 0
    for trial in range(200):
        buf = bytearray(data)
        kind = ("flip", "trunc", "insert", "dup")[trial % 4]
        if kind == "flip":
            for _ in range(int(rng.integers(1, 8))):
                i = int(rng.integers(0, len(buf)))
                buf[i] ^= int(rng.integers(1, 256))
        elif kind == "trunc":
            buf = buf[: int(rng.integers(0, len(buf)))]
        elif kind == "insert":
            i = int(rng.integers(0, len(buf)))
            buf[i:i] = bytes(
                rng.integers(0, 256, size=int(rng.integers(1, 16)),
                             dtype=np.uint8)
            )
        else:
            i, j = sorted(rng.integers(0, len(buf), size=2).tolist())
            buf[j:j] = buf[i:j]
        f = tmp_path / "fuzz.protos"
        f.write_bytes(bytes(buf))
        try:
            for g in fast_read_shard(f):
                for s in g["sentences"]:
                    assert s["semantics"].ndim == 2
                    assert s["semantics"].dtype == np.int32
            parsed += 1
        except Exception:
            errors += 1
    assert parsed + errors == 200
