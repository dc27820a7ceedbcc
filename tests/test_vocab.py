"""Vocab semantics vs reference (vocab.py:6-119)."""

import pytest

from ccnerx_ray.state.vocab import Vocab


def test_word_defaults_and_order():
    v = Vocab.from_list(["apple", "pear", "apple"], is_word=True, unk_num=3)
    # <pad>, <unk>, <unk>1..3 first (vocab.py:26-30); then first-come order
    assert v.id2token(0) == "<pad>"
    assert v.id2token(1) == "<unk>"
    assert v.id2token(2) == "<unk>1"
    assert v.token2id("apple") == 5
    assert v.token2id("pear") == 6
    assert len(v) == 7  # dedup on insert


def test_unk_length_fallback():
    v = Vocab.from_list(["abc"], is_word=True, unk_num=4)
    # unknown 2-char word → <unk>2 (vocab.py:96-99)
    assert v.id2token(v.token2id("zz")) == "<unk>2"
    # unknown word longer than unk_num buckets → <unk> (vocab.py:100-101)
    assert v.id2token(v.token2id("zzzzzzzz")) == "<unk>"


def test_tag_vocab_raises_on_unknown():
    v = Vocab.from_list(["O", "B-X"], is_word=False)
    assert v.token2id("B-X") == 1
    with pytest.raises(KeyError):
        v.token2id("B-Y")


def test_list_recursion():
    v = Vocab.from_list(["O", "B-X", "E-X"])
    assert v.token2id(["O", "E-X"]) == [0, 2]
    assert v.id2token([0, 2]) == ["O", "E-X"]


def test_max_scan_cap():
    v = Vocab.from_list(["a", "b", "c"], max_scan_num=2)
    assert "c" not in v and "b" in v
