"""Integrity of the shipped R2R/CLR2R assets against reference-pinned facts
(SURVEY §6: splits, counts, vocab)."""
import os

import numpy as np
import pytest

from curriculum_learning_for_vln_tpu.data.datasets import (CLR2R_ROUNDS, clr2r_split_name,
                                                           expand_r2r_items, load_datasets)
from curriculum_learning_for_vln_tpu.utils.tokenizer import (BASE_VOCAB, Tokenizer,
                                                             build_vocab, read_vocab)

ASSETS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets")


def test_r2r_split_sizes():
    # (ref: SURVEY §6 — train 4675, val_seen 340, val_unseen 783, test 1391)
    assert len(load_datasets(["train"], "R2R", ASSETS)) == 4675
    assert len(load_datasets(["val_seen"], "R2R", ASSETS)) == 340
    assert len(load_datasets(["val_unseen"], "R2R", ASSETS)) == 783
    assert len(load_datasets(["test"], "R2R", ASSETS)) == 1391


def test_clr2r_rounds_partition_train():
    # rounds 1-5 = 345/471/1632/1530/697, a partition of R2R train
    sizes = []
    all_ids = []
    clr_dir = os.path.join(ASSETS, "CLR2Rv3")
    for k in range(1, CLR2R_ROUNDS + 1):
        items = load_datasets([clr2r_split_name(k)], "CLR2R", clr_dir)
        sizes.append(len(items))
        all_ids += [it["path_id"] for it in items]
    assert sizes == [345, 471, 1632, 1530, 697]
    train_ids = {it["path_id"] for it in load_datasets(["train"], "R2R", ASSETS)}
    assert len(all_ids) == len(set(all_ids)) == len(train_ids)
    assert set(all_ids) == train_ids


def test_shipped_vocab_matches_build_rule():
    """train_vocab.txt == base vocab + min-count-5 words of the train split
    (ref: misc.py:191-204; bootstrap main.py:25-27)."""
    vocab = read_vocab(os.path.join(ASSETS, "train_vocab.txt"))
    assert vocab[:4] == BASE_VOCAB
    assert len(vocab) == 992
    rebuilt = build_vocab(load_datasets(["train"], "R2R", ASSETS), min_count=5)
    assert rebuilt == vocab


def test_real_instruction_expansion_and_encoding():
    tok = Tokenizer(read_vocab(os.path.join(ASSETS, "train_vocab.txt")), encoding_length=80)
    items = load_datasets(["val_seen"], "R2R", ASSETS)
    expanded = expand_r2r_items(items, tok)
    # one val_seen path carries 4 instructions; Evaluation's instr_id set
    # only covers _0.._2 so the extra one is ignored at scoring time
    assert len(expanded) == 340 * 3 + 1
    enc = expanded[0]["instr_encoding"]
    assert enc.shape == (80,)
    assert 3 <= expanded[0]["instr_length"] <= 80
    # instr ids follow "<path_id>_<j>"
    ids = {e["instr_id"] for e in expanded}
    for it in items[:5]:
        for j in range(3):
            assert f"{it['path_id']}_{j}" in ids
