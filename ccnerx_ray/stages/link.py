"""Entity-link scoring: mention rows × entity catalog → linked rows.

The reference's linking resources are dict lookups — word→tag-sequence
(``vocab_tag.py:24-37``, J2) and external-entity labels
(``ftloader_v1.py:317-341``, J3) — plus a similarity-ranked candidate
top-k (``label_counter.py:56-68``, T2). Two realizations of the SAME
scoring contract (parity test-enforced):

* :class:`LinkScorer` — catalog ≪ corpus (the reference's regime): a
  broadcast join realized as per-batch dict lookups inside
  ``map_batches`` (never a shuffle; SURVEY.md §2.5).
* :func:`link_exploded_mentions` — the at-scale path (VERDICT r4 #1): a
  real KG links against a catalog of 10⁸–10⁹ surfaces that won't
  ``ray.put``. The catalog stays a DATASET; candidate labels are
  aggregated distributed (one coarse groupby per key kind), and mentions
  hash-partition join against the lookup tables via
  ``ops.join.adaptive_join`` (which still takes the shuffle-free
  broadcast fast path whenever the aggregated lookup provably fits).
  Note the TAGGER's lexicon is a separate, bounded artifact (the
  reference caps it at ``max_scan_num`` = 1.5M words, ``le_loader.py:25``)
  — only the LINK catalog needs fact-scale treatment.

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


# --------------------------------------------------------------------------
# Distributed catalog linking (VERDICT r4 #1): the catalog as a Dataset
# --------------------------------------------------------------------------

def catalog_dataset(catalog_pairs, parallelism: int = 4):
    """Small-side helper (tests / parity): catalog pairs → a Dataset of
    ``(surface, norm_key, label)`` rows — the shape a production catalog
    parquet carries. A real deployment reads this with
    ``read_parquet(..., columns=["surface", "norm_key", "label"])``."""
    import ray.data

    from ccnerx_ray.functions.tokenize import normalize_surface as norm

    rows = [{"surface": " ".join(s), "norm_key": norm(tuple(s)),
             "label": lab} for s, lab in catalog_pairs]
    return ray.data.from_items(rows, override_num_blocks=parallelism)


def catalog_candidates(catalog_ds, key_col: str, out_col: str,
                       max_label_num: int = 3, num_buckets: int = 256):
    """Distributed candidate-label aggregation: ``(key, label)`` rows →
    one row per key with ``out_col`` = the sorted distinct labels,
    truncated to ``max_label_num``, pipe-joined — EXACTLY the
    :class:`LinkScorer` candidate contract, computed as a coarse groupby
    (both sides stay distributed; per-key label sets are tiny, so the
    aggregated table is ~one row per catalog key)."""
    from ccnerx_ray.functions.grouping import coarse_grouped

    def local(g):
        g = (g[[key_col, "label"]].drop_duplicates()
             .sort_values([key_col, "label"], kind="mergesort"))
        g = g[g.groupby(key_col, sort=False).cumcount() < max_label_num]
        out = (g.groupby(key_col, sort=False)["label"]
                .agg("|".join).reset_index())
        out.columns = [key_col, out_col]
        return out

    return coarse_grouped(catalog_ds.select_columns([key_col, "label"]),
                          [key_col], local, num_buckets=num_buckets,
                          out_dtypes={key_col: "string", out_col: "string"})


def link_exploded_mentions(mentions, catalog_ds, *, max_label_num: int = 3,
                           broadcast_bytes: int | None = None,
                           catalog_bytes_hint: int | None = None,
                           probe_bytes_hint: int | None = None,
                           num_buckets: int = 256):
    """Hash-partitioned entity linking over a FLAT mention table (the
    ``explode_mentions`` shape, each row carrying ``surface`` /
    ``norm_key`` / ``label``) against a catalog *Dataset* of
    ``(surface, norm_key, label)`` rows.

    Scoring is the :class:`LinkScorer` contract verbatim — exact surface
    hit → 1.0, normalized-key hit → 0.9, else NIL 0.0 with the tagger
    label — realized as two LEFT OUTER lookup joins (surface pass, then
    norm-key pass) plus one vectorized finalize. Strategy per pass (the
    ``adaptive_join`` stats discipline):

    * the aggregated lookup is BROADCAST (``ray.put`` once, zero-copy
      per task, no shuffle) only when ``catalog_bytes_hint`` — normally
      the catalog parquet's metadata size, an upper bound since
      aggregation only shrinks — provably fits ``broadcast_bytes``,
      re-checked block-by-block while materializing;
    * otherwise (including ``catalog_bytes_hint=None``, the scale-safe
      default, and ``broadcast_bytes=0``, which the parity tests use to
      force it) a hash-partitioned co-group
      (``grouping.lookup_join_on``): both sides stay distributed and
      nothing lands on the driver.

    Appends ``linked_label, link_score, in_catalog, cand_labels,
    n_cands`` — bit-identical to the broadcast scorer on the same
    catalog (test-enforced)."""
    import pyarrow.compute as pc

    from ccnerx_ray.functions.grouping import lookup_join_on
    from ccnerx_ray.ops import join as joinmod
    from ccnerx_ray.state import metrics

    if broadcast_bytes is None:
        broadcast_bytes = joinmod.BROADCAST_BYTES_DEFAULT
    if probe_bytes_hint:
        # bytes-derived shuffle width (the repo-wide sizing rule): one
        # bucket per 64 MiB of probe, floored at the caller's bucket
        # count, capped so per-partition overhead cannot dominate
        num_buckets = int(min(max(probe_bytes_hint // (64 << 20),
                                  num_buckets), 4096))

    def one_pass(probe, key: str, out_col: str):
        lut = catalog_candidates(catalog_ds, key, out_col,
                                 max_label_num, num_buckets)
        tbl = None
        if (broadcast_bytes > 0 and catalog_bytes_hint is not None
                and catalog_bytes_hint <= broadcast_bytes):
            tbl = joinmod._materialize_build(lut, broadcast_bytes,
                                             catalog_bytes_hint)
        if tbl is None:
            metrics.incr(f"link_catalog_partitioned_{key}")
            return lookup_join_on(probe, key, lut, out_col,
                                  num_buckets=num_buckets)
        import ray
        ref = ray.put(tbl)

        def add(batch: pa.Table) -> pa.Table:
            import numpy as np
            b, _keys, idx = joinmod._prepared_build(ref, key)
            if idx is None:
                raise ValueError(
                    "catalog candidate table has duplicate keys")
            indexer = idx.get_indexer(batch.column(key).to_pandas())
            matched = indexer >= 0
            picked = b.column(out_col).take(
                pa.array(np.where(matched, indexer, 0), type=pa.int64(),
                         mask=~matched))
            return batch.append_column(out_col, picked)

        return probe.map_batches(add, batch_format="pyarrow")

    m = one_pass(mentions, "surface", "_s_cands")
    m = one_pass(m, "norm_key", "_nk_cands")

    def finalize(batch: pa.Table) -> pa.Table:
        s = batch.column("_s_cands")
        nk = batch.column("_nk_cands")
        s_hit = pc.is_valid(s)
        nk_hit = pc.is_valid(nk)
        score = pc.if_else(s_hit, 1.0, pc.if_else(nk_hit, 0.9, 0.0))
        cands = pc.coalesce(s, nk, batch.column("label"))
        # linked_label = first candidate = text before the first '|'
        first = pc.list_element(pc.split_pattern(cands, "|",
                                                 max_splits=1), 0)
        n_cands = pc.cast(
            pc.add(pc.count_substring(cands, "|"), 1), pa.int32())
        return (batch.drop_columns(["_s_cands", "_nk_cands"])
                .append_column("linked_label", first)
                .append_column("link_score", pc.cast(score, pa.float64()))
                .append_column("in_catalog", pc.or_(s_hit, nk_hit))
                .append_column("cand_labels", cands)
                .append_column("n_cands", n_cands))

    return m.map_batches(finalize, batch_format="pyarrow")
