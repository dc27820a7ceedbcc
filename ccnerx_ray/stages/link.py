"""Entity-link scoring: nested mention rows × broadcast catalog → linked rows.

The reference's linking resources are dict lookups — word→tag-sequence
(``vocab_tag.py:24-37``, J2) and external-entity labels
(``ftloader_v1.py:317-341``, J3) — plus a similarity-ranked candidate
top-k (``label_counter.py:56-68``, T2). The catalog is always ≪ corpus, so
this is a broadcast join realized as per-batch dict lookups inside
``map_batches`` (never a shuffle; SURVEY.md §2.5). At a catalog scale where
broadcast no longer fits, swap this stage for a hash-partitioned join on
``norm_key`` — the mention side is already keyed.

Scoring (deterministic):
* exact surface match in catalog  → link_score 1.0, labels ← catalog labels;
* normalized-key match            → link_score 0.9, labels ← catalog labels;
* otherwise NIL                   → link_score 0.0, label ← tagger label.

MULTI-LABEL semantics (reference ``ftloader_v1.py:317-341`` /
``mlabel_le_loader.py:199-215``): a surface may carry up to
``max_label_num`` candidate labels. Candidates are kept sorted
(lexicographic — deterministic), the primary ``linked_label`` is the
first candidate, and the full candidate set is surfaced as the
pipe-joined ``cand_labels`` string plus ``n_cands`` (a string rather
than ``list<string>`` keeps the column oracle-hashable).
"""

from __future__ import annotations

import pyarrow as pa

from ccnerx_ray.functions.tokenize import normalize_surface


class LinkScorer:
    """Actor-pool callable; catalog dicts built once per actor. Operates on
    the nested segment-mention rows (list columns) from MentionTagger."""

    def __init__(self, catalog_pairs: list[tuple[tuple[str, ...], str]] | None = None,
                 catalog_ref=None, max_label_num: int = 3):
        if catalog_ref is not None:
            import ray
            catalog_pairs = ray.get(catalog_ref)
        pairs = [(tuple(s), l) for s, l in (catalog_pairs or [])]
        self.max_label_num = max_label_num
        by_surface: dict[str, list[str]] = {}
        by_norm: dict[str, list[str]] = {}
        for surf, lab in sorted(pairs):
            by_surface.setdefault(" ".join(surf), []).append(lab)
            by_norm.setdefault(normalize_surface(surf), []).append(lab)
        self.by_surface = {s: sorted(set(ls)) for s, ls in by_surface.items()}
        self.by_norm = {k: sorted(set(ls)) for k, ls in by_norm.items()}

    def link_one(self, surface: str, norm_key: str,
                 label: str) -> tuple[float, list[str], bool]:
        """→ (score, candidate labels ≤ max_label_num, in_catalog)."""
        cands = self.by_surface.get(surface)
        if cands is not None:
            return 1.0, cands[:self.max_label_num], True
        cands = self.by_norm.get(norm_key)
        if cands is not None:
            return 0.9, cands[:self.max_label_num], True
        return 0.0, [label], False

    def __call__(self, batch: pa.Table) -> pa.Table:
        surfaces = batch.column("surfaces").to_pylist()
        norm_keys = batch.column("norm_keys").to_pylist()
        labels = batch.column("labels").to_pylist()
        scores, linked, in_cat, cands, ncands = [], [], [], [], []
        for ss, nks, labs in zip(surfaces, norm_keys, labels):
            row = [self.link_one(s, nk, lab) for s, nk, lab in zip(ss, nks, labs)]
            scores.append([r[0] for r in row])
            linked.append([r[1][0] for r in row])
            in_cat.append([r[2] for r in row])
            cands.append(["|".join(r[1]) for r in row])
            ncands.append([len(r[1]) for r in row])
        return (batch
                .append_column("link_scores", pa.array(scores, pa.list_(pa.float64())))
                .append_column("linked_labels", pa.array(linked, pa.list_(pa.string())))
                .append_column("in_catalog", pa.array(in_cat, pa.list_(pa.bool_())))
                .append_column("cand_labels", pa.array(cands, pa.list_(pa.string())))
                .append_column("n_cands", pa.array(ncands, pa.list_(pa.int32()))))
