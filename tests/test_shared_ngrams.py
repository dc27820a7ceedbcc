"""shared_ngram_stats (ops/dedup.py): hand-worked counts, short-doc
sentinel, and partitioning invariance."""

import pyarrow as pa
import ray.data

from ccnerx_ray.ops.dedup import shared_ngram_stats


def _run(rows, n, parallelism=1):
    t = pa.table({"doc_id": [r[0] for r in rows],
                  "text": [r[1] for r in rows]})
    if parallelism > 1:
        per = (t.num_rows + parallelism - 1) // parallelism
        ds = ray.data.from_arrow(
            [t.slice(i * per, per) for i in range(parallelism)])
    else:
        ds = ray.data.from_arrow(t)
    out = shared_ngram_stats(ds, n=n)
    rows_out = [r for b in ray.get(out.to_arrow_refs())
                for r in b.to_pylist()]
    return sorted(rows_out, key=lambda r: r["doc_id"])


def test_hand_worked_trigrams():
    # doc 1: grams {a b c, b c d}; doc 2: grams {a b c, b c x};
    # doc 3: {z z z} (repeated within doc only — NOT shared);
    # doc 4 shorter than n → sentinel zero row
    out = _run([(1, "a b c d"), (2, "a b c x"), (3, "z z z z z"),
                (4, "a b")], n=3)
    assert out == [
        {"doc_id": 1, "n_grams": 2, "n_shared": 1},
        {"doc_id": 2, "n_grams": 2, "n_shared": 1},
        {"doc_id": 3, "n_grams": 1, "n_shared": 0},
        {"doc_id": 4, "n_grams": 0, "n_shared": 0},
    ]


def test_within_doc_repeat_not_shared():
    # the SAME gram twice in one doc is one distinct gram, zero shared
    out = _run([(1, "p q r s p q r")], n=3)
    # grams: pqr, qrs, rsp, spq, pqr(dup) → 4 distinct, none shared
    assert out == [{"doc_id": 1, "n_grams": 4, "n_shared": 0}]


def test_partitioning_invariance():
    rows = [(i, " ".join(["w%d" % ((i * 7 + j) % 11) for j in range(20)]))
            for i in range(40)]
    assert _run(rows, n=3, parallelism=1) == _run(rows, n=3, parallelism=7)
