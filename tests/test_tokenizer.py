import numpy as np

from fish_speech_tpu.tokenizer import (
    IM_END_TOKEN,
    IM_START_TOKEN,
    NUM_SEMANTIC_TOKENS,
    SEMANTIC_TOKEN_TEMPLATE,
    build_test_tokenizer,
)


def test_semantic_range_contiguous(tokenizer):
    assert tokenizer.semantic_end_id - tokenizer.semantic_begin_id + 1 == (
        NUM_SEMANTIC_TOKENS
    )
    # arithmetic mapping must hold for every code
    for code in [0, 1, 17, 4095]:
        tid = tokenizer.get_token_id(SEMANTIC_TOKEN_TEMPLATE.format(i=code))
        assert tid == tokenizer.semantic_begin_id + code


def test_encode_roundtrip_plain_text(tokenizer):
    text = "hello world"
    ids = tokenizer.encode(text)
    assert len(ids) == len(text.encode("utf-8"))
    assert tokenizer.decode(ids) == text


def test_special_tokens_parsed_inline(tokenizer):
    text = f"{IM_START_TOKEN}user\nhello{IM_END_TOKEN}"
    ids = tokenizer.encode(text)
    assert tokenizer.get_token_id(IM_START_TOKEN) in ids
    assert tokenizer.get_token_id(IM_END_TOKEN) in ids
    # special tokens are single ids, not split into bytes
    assert ids[0] == tokenizer.get_token_id(IM_START_TOKEN)
    assert ids[-1] == tokenizer.get_token_id(IM_END_TOKEN)


def test_semantic_tokens_parsed_inline(tokenizer):
    text = "<|semantic:5|><|semantic:6|>"
    ids = tokenizer.encode(text)
    assert ids == [tokenizer.semantic_begin_id + 5, tokenizer.semantic_begin_id + 6]


def test_unicode_text(tokenizer):
    text = "你好世界 héllo"
    ids = tokenizer.encode(text)
    assert tokenizer.decode(ids) == text


def test_save_load_roundtrip(tokenizer, tmp_path):
    from fish_speech_tpu.tokenizer import FishTokenizer

    tokenizer.save_pretrained(tmp_path)
    reloaded = FishTokenizer.from_pretrained(str(tmp_path))
    assert reloaded.semantic_begin_id == tokenizer.semantic_begin_id
    assert reloaded.semantic_end_id == tokenizer.semantic_end_id
    text = "roundtrip <|semantic:9|> test"
    assert reloaded.encode(text) == tokenizer.encode(text)
