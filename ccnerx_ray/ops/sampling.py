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


def hash_split(ds, id_col: str = "doc_id", salt: str = "split",
               bounds_pm: tuple = (("train", 900), ("val", 950),
                                   ("test", 1000))):
    """Deterministic hash-bucket corpus split (train/val/test): each row
    lands in a per-mille bucket — the first 15 hex chars (60 bits) of
    ``sha256(f"{salt}:{id}")`` mod 1000 — and takes the first split
    whose upper bound exceeds its bucket. A PURE MAP: no shuffle, no
    state, assignment stable across runs, retries, partitionings and
    cluster sizes — which is what makes it the split primitive at
    100 TB (a seeded global shuffle would be an all-to-all; the
    reference's driver-side ``random.sample`` does not scale past one
    machine). Appends ``split`` and ``bucket_pm``. DuckDB mirror:
    ``('0x' || substr(sha256(salt || ':' || CAST(id AS VARCHAR)), 1,
    15))::UBIGINT % 1000`` — the same 60-bit prefix arithmetic the HLL
    oracle uses."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    names = np.array([n for n, _ in bounds_pm], dtype=object)
    highs = np.array([b for _, b in bounds_pm], dtype=np.int64)
    assert list(highs) == sorted(highs) and highs[-1] == 1000, \
        "bounds_pm must be ascending per-mille bounds ending at 1000"
    pre = f"{salt}:".encode("utf-8")

    def assign(batch: pa.Table) -> pa.Table:
        # sha256(f"{salt}:{id}")[:15 hex] == big-endian digest[:8] >> 4
        # (first 60 bits either way) — the bytes path skips hexdigest
        # construction and the str→int parse, and the bucket→split map is
        # one searchsorted + gather instead of a per-row generator
        # (ADVICE r4: the per-row interpreter cost, not sha256 itself,
        # dominated this pure-map stage). One C-speed hashlib call per
        # row remains — ids are unique per row, so no cache applies.
        ids = batch.column(id_col).to_pylist()
        pms = np.fromiter(
            ((int.from_bytes(
                hashlib.sha256(pre + str(i).encode("utf-8")).digest()[:8],
                "big") >> 4) % 1000 for i in ids),
            dtype=np.int64, count=len(ids))
        splits = names[np.searchsorted(highs, pms, side="right")]
        return (batch
                .append_column("split", pa.array(splits, pa.string()))
                .append_column("bucket_pm", pa.array(pms, pa.int64())))

    return ds.map_batches(assign, batch_format="pyarrow")


def stratified_sample(ds, key_col: str, id_col: str, n_per_key: int,
                      seed: int = 2021, num_buckets: int = 64):
    """Deterministic stratified sample: the ``n_per_key`` rows of each
    stratum with the smallest ``sha256(seed|key|id)`` hex prefix —
    reproducible across runs, retries and partitionings (never Python
    ``hash``), and reproducible by the DuckDB oracle
    (``substr(sha256(concat(...)), 1, 16)`` ordering). The pattern a
    training-data pipeline uses for class-balanced subsets."""
    import pandas as pd
    import pyarrow as pa

    from ccnerx_ray.functions.grouping import coarse_grouped
    from ccnerx_ray.functions.hashing import sha256_hex16

    def add_rank_key(batch: pa.Table) -> pa.Table:
        ks = batch.column(key_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        h = [sha256_hex16(f"{seed}|{k}|{i}")
             for k, i in zip(ks, ids)]
        return batch.append_column("_rk", pa.array(h, pa.string()))

    def local(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.sort_values(["_rk", id_col])
                .groupby(key_col, sort=False).head(n_per_key))
        return out.drop(columns=["_rk"])

    keyed = ds.map_batches(add_rank_key, batch_format="pyarrow")
    return coarse_grouped(keyed, [key_col], local, num_buckets=num_buckets)


def mixture_sample(ds, rates_pm: dict[str, int], domain_col: str = "lang",
                   id_col: str = "doc_id", salt: str = "mix",
                   default_pm: int = 0):
    """Deterministic DOMAIN-MIXTURE sampling: keep a row iff its per-mille
    hash bucket — the same 60-bit sha256 prefix arithmetic as
    :func:`hash_split` — is below its domain's target rate
    (``rates_pm[domain]``, per-mille; unknown domains fall back to
    ``default_pm``). This is how a training mix is rebalanced at corpus
    scale (down-sample the dominant web domain, keep all of the scarce
    ones): a PURE MAP + filter with no shuffle and no state, stable
    across runs, retries and partitionings, and composable with
    ``hash_split`` (different salts → independent buckets). Appends
    ``bucket_pm`` and ``rate_pm``. DuckDB mirror: ``('0x' ||
    substr(sha256(salt || ':' || id), 1, 15))::UBIGINT % 1000 <
    rate``."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    pre = f"{salt}:".encode("utf-8")
    domains = sorted(rates_pm)
    dom_arr = np.array(domains, dtype=object)
    rate_arr = np.array([rates_pm[d] for d in domains], dtype=np.int64)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        pms = np.fromiter(
            ((int.from_bytes(
                hashlib.sha256(pre + str(i).encode("utf-8")).digest()[:8],
                "big") >> 4) % 1000 for i in ids),
            dtype=np.int64, count=len(ids))
        doms = np.asarray(batch.column(domain_col).to_pylist(),
                          dtype=object)
        idx = np.searchsorted(dom_arr, doms)
        idx_c = np.clip(idx, 0, len(dom_arr) - 1)
        known = (idx < len(dom_arr)) & (dom_arr[idx_c] == doms) \
            if len(dom_arr) else np.zeros(len(doms), dtype=bool)
        rates = np.where(known, rate_arr[idx_c] if len(dom_arr) else 0,
                         default_pm)
        out = (batch
               .append_column("bucket_pm", pa.array(pms, pa.int64()))
               .append_column("rate_pm", pa.array(rates, pa.int64())))
        return out.filter(pa.array(pms < rates))

    return ds.map_batches(keep, batch_format="pyarrow")
