"""Entity-level evaluation metrics (G6/G7): the reference's conformance
oracle semantics, distributed.

Semantics replicated from ``CC/trainer.py:211-246``:
* ``M-`` → ``I-`` normalization before comparison (trainer.py:211-214);
* entity-level exact-span matching (seqeval convention): an entity counts
  as correct iff (start, end, label) all match;
* token accuracy over non-pad positions.

Composition FIXES the reference's bias: the reference averages per-batch
F1 over batches (trainer.py:222-246 running mean), which is not the
corpus-level metric; here per-block partial counts (tp / n_pred / n_gold /
correct_tokens / n_tokens) are summed globally and P/R/F1 are computed once
from the totals — the exact global metric at any scale.
"""

from __future__ import annotations

import pyarrow as pa

from ccnerx_ray.functions.bioes import get_entities, normalize_tags

COUNT_SCHEMA = pa.schema([
    ("tp", pa.int64()), ("n_pred", pa.int64()), ("n_gold", pa.int64()),
    ("correct_tokens", pa.int64()), ("n_tokens", pa.int64()),
])


def _spans(tags: list[str]) -> set[tuple[int, int, str]]:
    toks = [""] * len(tags)
    return {(s, e, lab) for s, e, lab, _ in get_entities(normalize_tags(tags), toks)}


def partial_counts(batch: pa.Table, pred_col: str = "pred",
                   gold_col: str = "label") -> pa.Table:
    """Per-block combiner: one partial-count row per batch."""
    preds = batch.column(pred_col).to_pylist()
    golds = batch.column(gold_col).to_pylist()
    tp = n_pred = n_gold = correct = total = 0
    for p, g in zip(preds, golds):
        p = normalize_tags(p)
        g = normalize_tags(g)
        sp, sg = _spans(p), _spans(g)
        tp += len(sp & sg)
        n_pred += len(sp)
        n_gold += len(sg)
        correct += sum(1 for a, b in zip(p, g) if a == b)
        total += len(g)
    return pa.Table.from_pydict(
        {"tp": [tp], "n_pred": [n_pred], "n_gold": [n_gold],
         "correct_tokens": [correct], "n_tokens": [total]},
        schema=COUNT_SCHEMA)


def finalize(tp: int, n_pred: int, n_gold: int,
             correct_tokens: int, n_tokens: int) -> dict:
    p = tp / n_pred if n_pred else 0.0
    r = tp / n_gold if n_gold else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    acc = correct_tokens / n_tokens if n_tokens else 0.0
    return {"precision": p, "recall": r, "f1": f1, "accuracy": acc,
            "tp": tp, "n_pred": n_pred, "n_gold": n_gold}


def seqeval_metrics(ds, pred_col: str = "pred", gold_col: str = "label") -> dict:
    """Distributed entity-level P/R/F1/accuracy: per-block partials →
    global Sum aggregate → exact corpus-level metrics."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        lambda b: partial_counts(b, pred_col, gold_col),
        batch_format="pyarrow")
    totals = partials.aggregate(
        Sum("tp"), Sum("n_pred"), Sum("n_gold"),
        Sum("correct_tokens"), Sum("n_tokens"))
    return finalize(totals["sum(tp)"], totals["sum(n_pred)"],
                    totals["sum(n_gold)"], totals["sum(correct_tokens)"],
                    totals["sum(n_tokens)"])


def classification_report(ds, pred_col: str = "pred",
                          gold_col: str = "label") -> dict[str, dict]:
    """Per-label P/R/F1 (``classification_report`` analogue,
    trainer.py:243-246) — partial per-label counts, global sum."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def per_label(batch: pa.Table) -> pa.Table:
        counts: dict[str, list[int]] = {}
        for p, g in zip(batch.column(pred_col).to_pylist(),
                        batch.column(gold_col).to_pylist()):
            sp, sg = _spans(normalize_tags(p)), _spans(normalize_tags(g))
            for (_, _, lab) in sp:
                counts.setdefault(lab, [0, 0, 0])[1] += 1
            for span in sg:
                counts.setdefault(span[2], [0, 0, 0])[2] += 1
            for span in sp & sg:
                counts.setdefault(span[2], [0, 0, 0])[0] += 1
        return pa.table({
            "lab": pa.array(list(counts), pa.string()),
            "tp": pa.array([v[0] for v in counts.values()], pa.int64()),
            "n_pred": pa.array([v[1] for v in counts.values()], pa.int64()),
            "n_gold": pa.array([v[2] for v in counts.values()], pa.int64()),
        })

    agg = (ds.map_batches(per_label, batch_format="pyarrow")
             .groupby("lab").aggregate(Sum("tp"), Sum("n_pred"), Sum("n_gold")))
    out: dict[str, dict] = {}
    for row in agg.take_all():
        d = finalize(row["sum(tp)"], row["sum(n_pred)"], row["sum(n_gold)"], 0, 0)
        d.pop("accuracy")
        out[row["lab"]] = d
    return out
