import numpy as np

from fish_speech_tpu.sequence import (
    IGNORE_INDEX,
    ContentSequence,
    Conversation,
    Message,
    TextPart,
    VQPart,
    restore_ndarray,
)
from fish_speech_tpu.tokenizer import IM_END_TOKEN, IM_START_TOKEN


def make_codes(num_codebooks, t, rng=None, hi=32):
    rng = rng or np.random.default_rng(0)
    return rng.integers(0, hi, size=(num_codebooks, t)).astype(np.int32)


def test_text_only_encode(tokenizer):
    seq = ContentSequence(parts=[TextPart(text="abc", cal_loss=True)])
    enc = seq.encode(tokenizer, add_shift=False)
    assert enc.tokens.tolist() == tokenizer.encode("abc")
    assert (enc.labels == enc.tokens).all()
    assert not enc.vq_mask_tokens.any()


def test_no_loss_labels_are_ignore(tokenizer):
    seq = ContentSequence(parts=[TextPart(text="abc", cal_loss=False)])
    enc = seq.encode(tokenizer, add_shift=False)
    assert (enc.labels == IGNORE_INDEX).all()


def test_modality_token_prepended(tokenizer):
    seq = ContentSequence(parts=[TextPart(text="x")], modality="voice")
    enc = seq.encode(tokenizer, add_shift=False)
    assert enc.tokens[0] == tokenizer.get_token_id("<|voice|>")


def test_vq_part_arithmetic_mapping(tokenizer):
    codes = make_codes(10, 7)
    seq = ContentSequence(parts=[VQPart(codes=codes)])
    enc = seq.encode(tokenizer, add_shift=False)
    np.testing.assert_array_equal(
        enc.tokens, codes[0] + tokenizer.semantic_begin_id
    )
    assert enc.vq_mask_tokens.all()
    assert len(enc.vq_parts) == 1


def test_shift_semantics(tokenizer):
    seq = ContentSequence(parts=[TextPart(text="abcd", cal_loss=True)])
    enc_ns = seq.encode(tokenizer, add_shift=False)
    enc = seq.encode(tokenizer, add_shift=True)
    np.testing.assert_array_equal(enc.tokens, enc_ns.tokens[:-1])
    np.testing.assert_array_equal(enc.labels, enc_ns.labels[1:])


def test_encode_for_inference_matrix(tokenizer):
    nc = 10
    codes = make_codes(nc, 5)
    seq = ContentSequence(
        parts=[TextPart(text="hi "), VQPart(codes=codes), TextPart(text=" end")]
    )
    values, audio_masks, audio_parts = seq.encode_for_inference(
        tokenizer, num_codebooks=nc
    )
    assert values.shape[0] == nc + 1
    t_pre = len(tokenizer.encode("hi "))
    # row 0 at VQ positions: mapped semantic ids
    np.testing.assert_array_equal(
        values[0, t_pre : t_pre + 5], codes[0] + tokenizer.semantic_begin_id
    )
    # rows 1..N at VQ positions: raw codes
    np.testing.assert_array_equal(values[1:, t_pre : t_pre + 5], codes)
    # rows 1..N elsewhere: zero
    assert (values[1:, :t_pre] == 0).all()
    assert audio_masks is None and audio_parts is None


def test_text_only_inference_matrix_returns_none_aux(tokenizer):
    seq = ContentSequence(parts=[TextPart(text="just text")])
    values, am, ap = seq.encode_for_inference(tokenizer, num_codebooks=4)
    assert values.shape[0] == 5
    assert am is None and ap is None


def test_conversation_framing(tokenizer):
    conv = Conversation(
        [
            Message(role="system", parts=[TextPart(text="sys")]),
            Message(role="user", parts=[TextPart(text="hi")]),
            Message(
                role="assistant", parts=[], modality="voice", add_im_end=False
            ),
        ]
    )
    enc = conv.encode(tokenizer, add_shift=False)
    ids = enc.tokens.tolist()
    im_start = tokenizer.get_token_id(IM_START_TOKEN)
    im_end = tokenizer.get_token_id(IM_END_TOKEN)
    assert ids.count(im_start) == 3
    assert ids.count(im_end) == 2
    # final message opens the assistant voice turn and leaves it unclosed
    voice = tokenizer.get_token_id("<|voice|>")
    assert ids[-1] == voice


def test_conversation_loss_inheritance(tokenizer):
    conv = Conversation(
        [
            Message(role="user", parts=[TextPart(text="q")], cal_loss=False),
            Message(role="assistant", parts=[TextPart(text="a")], cal_loss=True),
        ]
    )
    enc = conv.encode(tokenizer, add_shift=False)
    # the assistant's content and its im_end carry loss; user's do not
    has_loss = enc.labels != IGNORE_INDEX
    assert has_loss.any()
    n_user = len(tokenizer.encode(f"{IM_START_TOKEN}user\nq{IM_END_TOKEN}\n"))
    assert not has_loss[:n_user].any()


def test_restore_ndarray_msgpack_form():
    arr = np.arange(12, dtype=np.int32).reshape(3, 4)
    packed = {"__ndarray__": True, "data": arr.tobytes(), "dtype": "int32", "shape": (3, 4)}
    out = restore_ndarray(packed)
    np.testing.assert_array_equal(out, arr)


def test_visualize_runs(tokenizer):
    codes = make_codes(4, 3)
    seq = ContentSequence(parts=[TextPart(text="v", cal_loss=True), VQPart(codes=codes)])
    s = seq.visualize(tokenizer, merge_semantic_tokens=True)
    assert "[<|semantic|>x3]" in s
