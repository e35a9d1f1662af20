"""Tokenizer behavior parity (ref: tasks/R2R-judy/src/utils/misc.py:94-218)."""
import numpy as np

from curriculum_learning_for_vln_tpu.utils.tokenizer import (
    BASE_VOCAB, BOS_IDX, EOS_IDX, PAD_IDX, UNK_IDX,
    Tokenizer, build_vocab, read_vocab, split_sentence, write_vocab,
)


def test_split_sentence():
    assert split_sentence("Walk down one flight of stairs.") == [
        "walk", "down", "one", "flight", "of", "stairs", ".",
    ]
    # punctuation-only runs explode char-by-char, except runs of '.'
    assert split_sentence("stop!? now..") == ["stop", "!", "?", "now", ".."]
    assert split_sentence("  turn,  right ") == ["turn", ",", "right"]


def test_encode_pads_and_truncates():
    vocab = BASE_VOCAB + ["walk", "left", "right", "stop"]
    tok = Tokenizer(vocab, encoding_length=8)

    ids, length = tok.encode_sentence("walk left stop")
    assert length == 5  # BOS + 3 + EOS
    assert ids.tolist() == [BOS_IDX, 4, 5, 7, EOS_IDX, PAD_IDX, PAD_IDX, PAD_IDX]

    # truncation: cut to max_length, last token forced to EOS
    ids, length = tok.encode_sentence("walk walk walk walk walk walk walk walk walk")
    assert length == 8
    assert ids[-1] == EOS_IDX
    assert ids[0] == BOS_IDX
    assert len(ids) == 8

    # unknown words hit UNK
    ids, _ = tok.encode_sentence("walk sideways")
    assert ids[2] == UNK_IDX


def test_decode_and_shrink():
    vocab = BASE_VOCAB + ["walk", "left"]
    tok = Tokenizer(vocab, encoding_length=8)
    ids, length = tok.encode_sentence("walk left")
    assert tok.decode_sentence(ids) == "<BOS> walk left <EOS>"
    assert tok.shrink(list(ids)) == [4, 5]
    assert tok.shrink([]) == []
    # no EOS -> empty
    assert tok.shrink([BOS_IDX, 4, 5]) == []


def test_build_vocab_min_count():
    data = [
        {"instructions": ["walk walk walk", "walk left"]},
        {"instructions": ["left right"]},
    ]
    vocab = build_vocab(data, min_count=2)
    assert vocab[:4] == BASE_VOCAB
    assert "walk" in vocab and "left" in vocab and "right" not in vocab


def test_vocab_roundtrip(tmp_path):
    path = str(tmp_path / "vocab.txt")
    vocab = BASE_VOCAB + ["alpha", "beta"]
    write_vocab(vocab, path)
    assert read_vocab(path) == vocab
