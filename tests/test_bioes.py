"""BIOES codec vs reference semantics (label.py:11-55; trainer.py:211-214)."""

from ccnerx_ray.functions.bioes import get_entities, get_labels, normalize_tags


def spans(labels, text):
    return [(s, e, lab, list(w)) for s, e, lab, w in get_entities(labels, text)]


def test_simple_entity():
    labs = ["O", "B-FUNC", "E-FUNC", "O"]
    text = ["x", "foo", "bar", "y"]
    assert spans(labs, text) == [(1, 3, "FUNC", ["foo", "bar"])]


def test_single_token_entity():
    assert spans(["S-LIB"], ["numpy"]) == [(0, 1, "LIB", ["numpy"])]


def test_entity_at_start_and_end():
    labs = ["B-A", "E-A", "O", "B-B", "E-B"]
    text = ["a", "b", "c", "d", "e"]
    got = spans(labs, text)
    assert got == [(0, 2, "A", ["a", "b"]), (3, 5, "B", ["d", "e"])]


def test_adjacent_entities():
    labs = ["B-A", "E-A", "B-B", "E-B"]
    got = spans(labs, ["1", "2", "3", "4"])
    assert got == [(0, 2, "A", ["1", "2"]), (2, 4, "B", ["3", "4"])]


def test_broken_middle_start_tolerated():
    # I- without B- opens an entity (label.py:28-32)
    labs = ["I-X", "E-X", "O"]
    assert spans(labs, ["a", "b", "c"]) == [(0, 2, "X", ["a", "b"])]


def test_empty():
    assert spans([], []) == []


def test_inputs_not_mutated():
    labs = ["S-A"]
    text = ["t"]
    get_entities(labs, text)
    assert labs == ["S-A"] and text == ["t"]


def test_get_labels():
    assert get_labels("X", 1) == ["S-X"]
    assert get_labels("X", 2) == ["B-X", "E-X"]
    assert get_labels("X", 4) == ["B-X", "I-X", "I-X", "E-X"]
    assert get_labels("X", 2, has_end=False) == ["B-X", "I-X"]
    assert get_labels("X", 1, has_single=False) == ["B-X"]


def test_normalize_m_to_i():
    assert normalize_tags(["B-X", "M-X", "E-X"]) == ["B-X", "I-X", "E-X"]


def test_roundtrip():
    labs = get_labels("FUNC", 3)
    assert spans(labs, ["a", "b", "c"]) == [(0, 3, "FUNC", ["a", "b", "c"])]
