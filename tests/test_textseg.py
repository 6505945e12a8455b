"""Incremental text segmentation (`utils/textseg.split_ready`)."""

from fish_speech_tpu.utils.textseg import split_ready


def test_no_terminator_keeps_buffering():
    ready, rest = split_ready("hello wor")
    assert ready == "" and rest == "hello wor"


def test_cuts_at_last_terminator():
    ready, rest = split_ready("One. Two! Thr")
    assert ready == "One. Two!" and rest == "Thr"


def test_force_flushes_everything():
    ready, rest = split_ready("no punctuation here", force=True)
    assert ready == "no punctuation here" and rest == ""


def test_byte_budget_forces_flush():
    text = "あ" * 40  # 120 UTF-8 bytes, zero terminators
    ready, rest = split_ready(text, max_buffer=100)
    assert ready == text and rest == ""
    ready, rest = split_ready(text, max_buffer=200)
    assert ready == "" and rest == text


def test_cjk_and_arabic_terminators():
    ready, rest = split_ready("你好。接下来")
    assert ready == "你好。" and rest == "接下来"
    ready, rest = split_ready("كيف حالك؟ بعد")
    assert ready == "كيف حالك؟" and rest == "بعد"


def test_empty_and_whitespace():
    assert split_ready("") == ("", "")
    assert split_ready("  ", force=True) == ("", "")
