"""Sampling / splitting operators (SURVEY.md §2.7 T3-T6).

The reference's sampling is driver-side ``random.sample`` with fixed seeds
(``expand_data.py:34-51``; ``Test.ipynb`` ``random.seed(2021)``); here each
maps to the native Dataset op with an explicit seed, so every run (and
every retry) draws the same rows.
"""

from __future__ import annotations


def sample_fraction(ds, rate: float, seed: int = 2021):
    """T3: seeded Bernoulli sample (``random.sample(n*rate)`` analogue)."""
    return ds.random_sample(rate, seed=seed)


def few_shot_sample(ds, k: int, seed: int = 2021):
    """T4: fixed-seed k-row sample (``random.seed(2021); random.sample``),
    realized as seeded shuffle + limit."""
    return ds.random_shuffle(seed=seed).limit(k)


def train_val_split(ds, val_fraction: float = 0.2, seed: int = 2021):
    """T5: seeded 0.8/0.2 split (``cn_data_manager.py:223-234``)."""
    return ds.train_test_split(test_size=val_fraction, seed=seed)


def shuffled(ds, seed: int = 2021):
    """T6: full seeded shuffle (only where semantics require it — inference
    pipelines never shuffle; SURVEY.md §2.7)."""
    return ds.random_shuffle(seed=seed)
