"""The full-framework correctness proof: build a dataset, train a tiny model
on it until it memorizes, then GENERATE through the inference stack and
check the model reproduces the memorized codes.

This exercises every layer end to end: proto shards -> native/protobuf
parse -> packing -> collator -> train step -> sampling-constrained
generation with KV cache -> code extraction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import SamplingConfig, dual_ar_tiny
from fish_speech_tpu.data.dataset import (
    DataLoader,
    SemanticIterableDataset,
    TextDataCollator,
)
from fish_speech_tpu.data.protos import Semantics, Sentence, TextData
from fish_speech_tpu.data.stream import write_pb_stream
from fish_speech_tpu.generate import GenerationSession, generate_long
from fish_speech_tpu.models import dual_ar
from fish_speech_tpu.train.step import make_optimizer, make_train_step

NUM_CODEBOOKS = 3
TARGET_TEXT = "say the magic phrase"


@pytest.mark.slow
def test_overfit_then_generate(tokenizer, tmp_path):
    rng = np.random.default_rng(0)
    # one fixed sentence with fixed codes, repeated
    target_codes = rng.integers(1, 30, size=(NUM_CODEBOOKS, 12)).astype(np.int32)
    with open(tmp_path / "d.protos", "wb") as f:
        write_pb_stream(
            f,
            TextData(
                source="s", name="spk",
                sentences=[
                    Sentence(
                        texts=[TARGET_TEXT],
                        semantics=[
                            Semantics(values=row.tolist()) for row in target_codes
                        ],
                    )
                ],
            ),
        )

    cfg = dual_ar_tiny(
        vocab_size=tokenizer.vocab_size,
        semantic_begin_id=tokenizer.semantic_begin_id,
        semantic_end_id=tokenizer.semantic_end_id,
        im_end_id=tokenizer.im_end_id,
        num_codebooks=NUM_CODEBOOKS,
        codebook_size=32,
        max_seq_len=128,
        n_layer=2,
        dim=128,
        intermediate_size=256,
        n_head=4,
        n_local_heads=2,
        head_dim=32,
    )
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)

    ds = SemanticIterableDataset(
        [str(tmp_path / "d.protos")], tokenizer, max_length=128,
        num_codebooks=NUM_CODEBOOKS,
    )
    loader = DataLoader(ds, 2, TextDataCollator(tokenizer, 128))

    opt = make_optimizer(lr=3e-3, params=params, weight_decay=0.0)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(cfg, opt))

    it = iter(loader)
    loss = None
    for i in range(150):
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        params, opt_state, metrics = step(params, opt_state, batch)
        loss = float(metrics["loss"])
        if loss < 0.05:
            break
    assert loss is not None and loss < 0.5, f"failed to memorize: loss={loss}"

    # Generate with the trained model through the REAL inference path, using
    # the training prompt format ("Speak out the provided text." template).
    session = GenerationSession(
        params, cfg, SamplingConfig(), dtype=jnp.float32, decode_chunk_size=8
    )
    from fish_speech_tpu.sequence import ContentSequence, TextPart

    seq = ContentSequence()
    seq.append(TextPart(text="Speak out the provided text."))
    seq.append(TextPart(text=f"<|speaker:user|> {TARGET_TEXT}"), add_end=True)
    seq.append(TextPart(text="<|speaker:assistant|> <|voice|>"))
    prompt, _, _ = seq.encode_for_inference(tokenizer, NUM_CODEBOOKS)

    out = session.generate(
        prompt, jax.random.PRNGKey(0), max_new_tokens=20,
        temperature=0.01, top_p=1.0, top_k=1,  # greedy
    )
    gen = out[1:]  # codebook rows
    if int(out[0, -1]) == cfg.im_end_id:
        gen = gen[:, :-1]

    n = min(gen.shape[1], target_codes.shape[1])
    assert n >= 6, f"generated too few frames: {gen.shape}"
    match = (gen[:, :n] == target_codes[:, :n]).mean()
    assert match > 0.9, (
        f"memorized codes not reproduced (match={match:.2f})\n"
        f"gen={gen[:, :n]}\nwant={target_codes[:, :n]}"
    )
