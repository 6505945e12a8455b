import io

import numpy as np
import pytest

from fish_speech_tpu.data.clean import clean_text
from fish_speech_tpu.data.dataset import (
    CODEBOOK_PAD_TOKEN_ID,
    IGNORE_INDEX,
    DataLoader,
    InterleaveDataset,
    SemanticIterableDataset,
    TextDataCollator,
)
from fish_speech_tpu.data.protos import Semantics, Sentence, TextData
from fish_speech_tpu.data.stream import (
    pack_pb_stream,
    read_pb_stream,
    split_pb_stream,
    write_pb_stream,
)

NUM_CODEBOOKS = 4


def make_proto_file(path, n_groups=2, n_sentences=5, rng=None):
    rng = rng or np.random.default_rng(0)
    with open(path, "wb") as f:
        for g in range(n_groups):
            sentences = []
            for s in range(n_sentences):
                t = int(rng.integers(3, 8))
                sems = [
                    Semantics(values=rng.integers(0, 32, size=t).tolist())
                    for _ in range(NUM_CODEBOOKS)
                ]
                sentences.append(
                    Sentence(texts=[f"sentence {g}-{s}"], semantics=sems)
                )
            write_pb_stream(
                f, TextData(source="test", name=f"spk{g}", sentences=sentences)
            )
    return path


def test_pb_stream_roundtrip(tmp_path):
    p = make_proto_file(tmp_path / "data.protos")
    with open(p, "rb") as f:
        groups = list(read_pb_stream(f))
    assert len(groups) == 2
    assert groups[0].name == "spk0"
    assert len(groups[0].sentences) == 5
    assert len(groups[0].sentences[0].semantics) == NUM_CODEBOOKS

    # split preserves raw records
    with open(p, "rb") as f:
        raw = list(split_pb_stream(f))
    assert len(raw) == 2
    assert raw[0] == pack_pb_stream(groups[0])


def test_reference_wire_compat(tmp_path):
    """Our records must parse with a plain proto3 decode of the reference
    schema (field numbers 1,2,4 / 1,3 / 1)."""
    p = make_proto_file(tmp_path / "data.protos", n_groups=1, n_sentences=1)
    data = open(p, "rb").read()
    size = int.from_bytes(data[:4], "little")
    assert size == len(data) - 4


def test_dataset_pack_shapes(tmp_path, tokenizer):
    p = make_proto_file(tmp_path / "d.protos")
    ds = SemanticIterableDataset(
        [str(p)], tokenizer, max_length=512, num_codebooks=NUM_CODEBOOKS
    )
    sample = next(iter(ds))
    tokens, labels = sample["tokens"], sample["labels"]
    assert tokens.shape[0] == NUM_CODEBOOKS + 1
    assert tokens.shape == labels.shape
    # codebook rows at non-VQ positions are pad
    semantic_rows = tokens[1:]
    assert (semantic_rows >= 0).all()
    # last label row entry is codebook pad (per packed sentence)
    assert (labels[1:, -1] == CODEBOOK_PAD_TOKEN_ID).all()
    # text-row labels use ignore index outside loss spans
    assert (labels[0] == IGNORE_INDEX).any()


def test_dataset_sharding(tmp_path, tokenizer):
    p = make_proto_file(tmp_path / "d.protos", n_groups=4)
    ds0 = SemanticIterableDataset(
        [str(p)], tokenizer, num_codebooks=NUM_CODEBOOKS, shard_id=0, num_shards=2
    )
    ds1 = SemanticIterableDataset(
        [str(p)], tokenizer, num_codebooks=NUM_CODEBOOKS, shard_id=1, num_shards=2
    )
    next(iter(ds0)), next(iter(ds1))  # both shards produce data
    assert ds0.groups is not None and ds1.groups is not None


def test_collator_padding(tmp_path, tokenizer):
    p = make_proto_file(tmp_path / "d.protos")
    ds = SemanticIterableDataset(
        [str(p)], tokenizer, max_length=256, num_codebooks=NUM_CODEBOOKS
    )
    collate = TextDataCollator(tokenizer, max_length=256)
    it = iter(ds)
    batch = collate([next(it), next(it)])
    assert batch["inputs"].shape == (2, NUM_CODEBOOKS + 1, 256)
    assert batch["labels"].shape == (2, NUM_CODEBOOKS + 1, 256)
    assert batch["pad_mask"].shape == (2, 256)
    # padded positions: labels ignored, codebook rows pad
    for b in range(2):
        pm = batch["pad_mask"][b]
        if pm.any():
            assert (batch["labels"][b][:, pm] == IGNORE_INDEX).all()
            assert (batch["inputs"][b][1:, pm] == CODEBOOK_PAD_TOKEN_ID).all()


def test_dataloader_batches(tmp_path, tokenizer):
    p = make_proto_file(tmp_path / "d.protos")
    ds = SemanticIterableDataset(
        [str(p)], tokenizer, max_length=128, num_codebooks=NUM_CODEBOOKS
    )
    loader = DataLoader(ds, 2, TextDataCollator(tokenizer, 128))
    it = iter(loader)
    b1 = next(it)
    b2 = next(it)
    assert b1["inputs"].shape[0] == 2
    assert not np.array_equal(b1["inputs"], b2["inputs"])


def test_interleave(tmp_path, tokenizer):
    p = make_proto_file(tmp_path / "d.protos")
    ds = SemanticIterableDataset(
        [str(p)], tokenizer, num_codebooks=NUM_CODEBOOKS
    )
    mix = InterleaveDataset([ds, ds], [0.5, 0.5])
    assert next(iter(mix)) is not None


def test_clean_text():
    assert clean_text(" hello ") == "hello"
    assert clean_text("a‘b’c") == "a'b'c"
    assert clean_text("x,,,,y") == "x,y"
    # strip happens before emoji removal (reference order), so the space stays
    assert clean_text("hi 😀😀") == "hi "


def test_dataset_native_matches_protobuf_path(tmp_path, tokenizer):
    """Same seed -> identical samples whether shards are parsed natively or
    via protobuf-python."""
    from fish_speech_tpu.native import fast_parse_available

    if not fast_parse_available():
        import pytest

        pytest.skip("native parser unavailable")
    p = make_proto_file(tmp_path / "d.protos")
    a = SemanticIterableDataset(
        [str(p)], tokenizer, max_length=256, num_codebooks=NUM_CODEBOOKS,
        use_native_parser=True, seed=7,
    )
    b = SemanticIterableDataset(
        [str(p)], tokenizer, max_length=256, num_codebooks=NUM_CODEBOOKS,
        use_native_parser=False, seed=7,
    )
    ia, ib = iter(a), iter(b)
    for _ in range(3):
        sa, sb = next(ia), next(ib)
        np.testing.assert_array_equal(sa["tokens"], sb["tokens"])
        np.testing.assert_array_equal(sa["labels"], sb["labels"])


def test_dataloader_producer_exits_when_consumer_abandons():
    """Breaking out of a DataLoader iterator mid-epoch must terminate the
    producer thread: a blocking queue.put with the prefetch queue full
    used to wedge it forever (leaking the thread + prefetched batches;
    regression from a round-3 full-suite crash dump)."""
    import threading
    import time

    from fish_speech_tpu.data.dataset import DataLoader

    class Infinite:
        def __iter__(self):
            i = 0
            while True:
                yield i
                i += 1

    loader = DataLoader(Infinite(), 4, collate_fn=list, prefetch=2)
    it = iter(loader)
    next(it)  # producer now races ahead and blocks on the full queue
    it.close()  # abandon: generator finally sets stop

    deadline = time.monotonic() + 5.0
    while time.monotonic() < deadline:
        alive = [t for t in threading.enumerate()
                 if t.name == "dataloader-producer" and t.is_alive()]
        if not alive:
            break
        time.sleep(0.05)
    assert not alive, "producer thread leaked after consumer abandoned"


def test_dataloader_producer_crash_surfaces_in_consumer():
    """A producer-thread exception (corrupt sample / collate bug) must
    re-raise in the consumer's loop — a crashed daemon thread that never
    delivers the sentinel would strand the trainer on queue.get() forever."""
    import pytest as _pytest

    from fish_speech_tpu.data.dataset import DataLoader

    class Corrupt:
        def __iter__(self):
            yield 1
            yield 2
            raise ValueError("corrupt sample")

    loader = DataLoader(Corrupt(), 2, collate_fn=list, prefetch=2)
    with _pytest.raises(ValueError, match="corrupt sample"):
        for _ in loader:
            pass
