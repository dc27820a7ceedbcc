"""Surface-form canonicalization: salted two-phase groupby clustering.

The reference groups entity surfaces by label / exact string key in-memory
(``label_collections.py:63-95``, ``label_counter.py:26-54`` — G4/G5). At
10^12-file scale a bare ``groupby(norm_key)`` is an all-to-all shuffle of
every mention row AND a skew bomb (a monorepo's dominant identifiers form
giant groups — SURVEY.md §7). This stage defuses both:

1. **combiner** (``map_batches``): partial count per
   ``(norm_key, label, surface)`` inside each batch — hot keys collapse to
   one row per batch before anything moves;
2. **salted partial reduce**: ``groupby([norm_key, salt])`` with
   ``salt = hash(surface) % S`` merges combiner rows without concentrating
   a hot key on one reducer;
3. **final reduce**: ``groupby(norm_key)`` over the (now tiny) partials
   picks the majority label and representative surface (ties broken
   lexicographically — deterministic).

Output: one row per canonical entity
``(entity_id, norm_key, label, repr_surface, n_mentions)``.

Two entry points:
* :func:`canonicalize` — over the flat mention table (G4 parity path);
* :func:`entities_from_triples` — over ``mentioned_in`` rows of the triple
  store, so the entity table is built WITHOUT a second pass over the corpus
  (the store is orders of magnitude smaller than the input).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ccnerx_ray.config import PipelineConfig
from ccnerx_ray.functions.hashing import entity_id, stable_hash64

ENTITY_SCHEMA = pa.schema([
    ("entity_id", pa.string()),
    ("norm_key", pa.string()),
    ("label", pa.string()),
    ("repr_surface", pa.string()),
    ("n_mentions", pa.int64()),
])


def make_combiner(key_col: str = "norm_key", label_col: str = "linked_label",
                  surface_col: str = "surface",
                  salt_buckets: int = PipelineConfig.canonical_salt_buckets):
    """Phase-1 combiner factory: within-batch partial counts (pre-shuffle)."""

    def combine(batch: pa.Table) -> pa.Table:
        df = pa.Table.from_arrays(
            [batch.column(key_col), batch.column(label_col), batch.column(surface_col)],
            names=["norm_key", "label", "surface"]).to_pandas()
        g = (df.groupby(["norm_key", "label", "surface"], sort=False)
               .size().reset_index(name="cnt"))
        g["salt"] = [stable_hash64(s) % salt_buckets for s in g["surface"]]
        return pa.Table.from_pandas(g, preserve_index=False)

    return combine


def _merge_partials(g: pd.DataFrame) -> pd.DataFrame:
    return (g.groupby(["norm_key", "label", "surface"], sort=False)["cnt"]
              .sum().reset_index())


def _finalize(g: pd.DataFrame) -> pd.DataFrame:
    nk = g["norm_key"].iloc[0]
    by_label = g.groupby("label")["cnt"].sum()
    # majority label; tie → lexicographically smallest (deterministic)
    best = by_label.max()
    label = sorted(by_label[by_label == best].index)[0]
    by_surface = g.groupby("surface")["cnt"].sum()
    best_s = by_surface.max()
    surface = sorted(by_surface[by_surface == best_s].index)[0]
    return pd.DataFrame({
        "entity_id": [entity_id(nk)],
        "norm_key": [nk],
        "label": [label],
        "repr_surface": [surface],
        "n_mentions": [int(g["cnt"].sum())],
    })


def canonicalize(mentions, salted: bool = True, label_col: str = "linked_label"):
    """flat mention Dataset → canonical entity Dataset."""
    partials = mentions.map_batches(make_combiner(label_col=label_col),
                                    batch_format="pyarrow")
    if salted:
        partials = partials.groupby(["norm_key", "salt"]).map_groups(
            _merge_partials, batch_format="pandas")
    return partials.groupby("norm_key").map_groups(_finalize, batch_format="pandas")


def entities_from_triples(triples, salted: bool = True):
    """Triple-store Dataset → canonical entity Dataset.

    Counts segment-level support (one ``mentioned_in`` row per distinct
    entity per segment), which is the store-native notion of ``n_mentions``.
    """
    ment = triples.map_batches(filter_mentioned_in, batch_format="pyarrow")
    return canonicalize(ment, salted=salted, label_col="label")


def filter_mentioned_in(batch: pa.Table) -> pa.Table:
    """Arrow-native predicate filter (used where expr-filter isn't enough)."""
    return batch.filter(pc.equal(batch.column("pred"), "mentioned_in"))
