"""Distributed BPE tokenizer training (ops/bpe.py): hand-worked merges,
driver↔distributed path parity, encode roundtrip, independent-reference
parity on the generated fixture corpus."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ccnerx_ray.corpus import expected_bpe_merges
from ccnerx_ray.ops.bpe import apply_bpe, train_bpe, word_frequencies


def _corpus(texts):
    return ray.data.from_arrow(pa.table({"text": texts}))


def _rows(ds):
    import ray
    return [r for b in ds.to_arrow_refs() for r in ray.get(b).to_pylist()]


def test_word_frequencies(ray_session):
    wf = sorted((r["word"], r["cnt"])
                for r in _rows(word_frequencies(_corpus(
                    ["ab ab cd", "  ab\n cd ", ""]))))
    assert wf == [("ab", 3), ("cd", 2)]


def test_train_bpe_hand_worked(ray_session):
    # "low lower" × weights from repetition: classic BPE toy
    got = train_bpe(_corpus(["low low low", "lower lower"]),
                    num_merges=3).to_pylist()
    # counts: (l,o)=5 (w,</w>)=3 (o,w)=5 ... round 0: (l,o) vs (o,w) both 5
    # → lexicographic tie-break picks ('l','o'); round 1: ('lo','w') 5;
    # round 2: ('low','</w>') 3
    assert [(r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
            for r in got] == [
        (0, "l", "o", 5), (1, "lo", "w", 5), (2, "low", "</w>", 3)]


def test_train_bpe_stops_below_two(ray_session):
    # every word unique, all pair counts 1 → zero merges
    got = train_bpe(_corpus(["ab cd ef"]), num_merges=5)
    assert got.num_rows == 0


def test_driver_distributed_parity(ray_session):
    texts = ["the cat sat on the mat", "the cat ate the rat",
             "a rat sat", "mat rat cat " * 4]
    a = train_bpe(_corpus(texts), num_merges=12,
                  max_driver_words=2_000_000).to_pylist()
    b = train_bpe(_corpus(texts), num_merges=12,
                  max_driver_words=0).to_pylist()
    assert a == b and len(a) > 4


def test_apply_bpe_roundtrip(ray_session):
    corpus = _corpus(["low low low lower lowest"])
    merges = train_bpe(corpus, num_merges=3)
    out = _rows(apply_bpe(corpus, merges))
    toks = out[0]["bpe_tokens"]
    # every learned merge is applied greedily; detokenizing restores text
    text = "".join(toks).replace("</w>", " ").strip()
    assert text == "low low low lower lowest"
    assert "low</w>" in toks            # rank-2 merge applied
    assert out[0]["text"] == "low low low lower lowest"


def test_reference_parity(ray_session):
    from ccnerx_ray.corpus import generate_corpus
    t = generate_corpus(240, seed=42)
    ds = ray.data.from_arrow([t.slice(i * 30, 30) for i in range(8)])
    got = train_bpe(ds, text_col="content", num_merges=25).to_pylist()
    want = expected_bpe_merges(240, seed=42, num_merges=25).to_pylist()
    assert got == want and len(got) == 25


def test_bpe_vocab_hand_worked(ray_session):
    from ccnerx_ray.ops.bpe import bpe_vocab
    got = bpe_vocab(_corpus(["low low low", "lower lower"]),
                    num_merges=3).to_pylist()
    assert [(r["token_id"], r["token"], r["kind"]) for r in got] == [
        (0, "e", "base"), (1, "l", "base"), (2, "o", "base"),
        (3, "r", "base"), (4, "w", "base"), (5, "</w>", "base"),
        (6, "lo", "merged"), (7, "low", "merged"),
        (8, "low</w>", "merged")]


def test_bpe_vocab_reference_parity(ray_session):
    from ccnerx_ray.corpus import expected_bpe_vocab, generate_corpus
    from ccnerx_ray.ops.bpe import bpe_vocab
    t = generate_corpus(240, seed=42)
    ds = ray.data.from_arrow([t.slice(i * 30, 30) for i in range(8)])
    got = bpe_vocab(ds, text_col="content", num_merges=25).to_pylist()
    want = expected_bpe_vocab(240, seed=42, num_merges=25).to_pylist()
    assert got == want


def test_driver_distributed_parity_hostile_symbols(ray_session):
    # words containing control characters (incl. \x1f) — pair identity
    # must stay exact with no joined-key ambiguity
    texts = ["a\x1fb a\x1fb a\x1fb", "ab ab a\x1f a\x1f \x1fb \x1fb"]
    a = train_bpe(_corpus(texts), num_merges=6,
                  max_driver_words=2_000_000).to_pylist()
    b = train_bpe(_corpus(texts), num_merges=6,
                  max_driver_words=0).to_pylist()
    assert a == b and len(a) > 2
