"""Tokenization tests mirroring /root/reference/src/alignment/tokenization.rs:118-226."""

from wav2vec2_tpu.align.tokenization import (
    build_token_sequence_case_aware,
    rebuild_words_from_chars,
)

BLANK_ID = 0
WORD_SEP_ID = 99

VOCAB_LOWER = {"a": 1, "b": 2, "c": 3}
VOCAB_UPPER = {"A": 1, "B": 2, "C": 3}
VOCAB_MIXED = {"a": 1, "B": 2, "c": 3}


def test_empty_transcript_produces_single_blank():
    seq = build_token_sequence_case_aware("", VOCAB_LOWER, BLANK_ID, WORD_SEP_ID)
    assert seq.tokens == [BLANK_ID]
    assert seq.chars == [None]
    assert seq.normalized_words == []


def test_single_word_lowercase_vocab():
    seq = build_token_sequence_case_aware("AB", VOCAB_LOWER, BLANK_ID, WORD_SEP_ID)
    assert seq.normalized_words == ["ab"]
    # pattern: blank, a, blank, b, blank
    assert seq.tokens == [BLANK_ID, 1, BLANK_ID, 2, BLANK_ID]
    assert seq.chars == [None, "a", None, "b", None]


def test_uppercase_only_vocab_uppercases_transcript():
    seq = build_token_sequence_case_aware("a b", VOCAB_UPPER, BLANK_ID, WORD_SEP_ID)
    assert seq.normalized_words == ["A", "B"]
    assert WORD_SEP_ID in seq.tokens


def test_lowercase_only_vocab_lowercases_transcript():
    seq = build_token_sequence_case_aware("A B", VOCAB_LOWER, BLANK_ID, WORD_SEP_ID)
    assert seq.normalized_words == ["a", "b"]


def test_mixed_vocab_lowercases_transcript():
    # vocab has 'a','B','c' → transcript lowered to "a b c"; 'b' unknown → word skipped
    seq = build_token_sequence_case_aware("A B c", VOCAB_MIXED, BLANK_ID, WORD_SEP_ID)
    assert seq.normalized_words == ["a", "c"]


def test_multiple_words_have_sep_and_blanks():
    seq = build_token_sequence_case_aware("a b c", VOCAB_LOWER, BLANK_ID, WORD_SEP_ID)
    assert seq.normalized_words == ["a", "b", "c"]
    assert seq.tokens.count(WORD_SEP_ID) == 2
    # full expected layout: blank a blank | blank b blank | blank c blank
    assert seq.tokens == [0, 1, 0, 99, 0, 2, 0, 99, 0, 3, 0]


def test_unknown_chars_skipped():
    seq = build_token_sequence_case_aware("aXb", VOCAB_LOWER, BLANK_ID, WORD_SEP_ID)
    assert seq.normalized_words == ["ab"]


def test_fully_unknown_word_skipped_no_dangling_separator():
    seq = build_token_sequence_case_aware("a xyz9 b", VOCAB_LOWER, BLANK_ID, WORD_SEP_ID)
    assert seq.normalized_words == ["a", "b"]
    assert seq.tokens.count(WORD_SEP_ID) == 1


def test_normalized_words_match_chars_contract():
    seq = build_token_sequence_case_aware("a b c", VOCAB_LOWER, BLANK_ID, WORD_SEP_ID)
    assert seq.normalized_words == rebuild_words_from_chars(seq.chars)
