"""Domain-mixture sampling (ops/sampling.py:mixture_sample)."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data

from ccnerx_ray.ops.sampling import mixture_sample


def _pm(i, salt="mix"):
    d = hashlib.sha256(f"{salt}:{i}".encode()).digest()[:8]
    return (int.from_bytes(d, "big") >> 4) % 1000


def _rows(ds):
    import ray
    return [r for b in ds.to_arrow_refs() for r in ray.get(b).to_pylist()]


def test_mixture_exact_membership(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(400)),
        "lang": (["en", "de", "xx", "fr"] * 100)}))
    rates = {"en": 300, "de": 900, "fr": 1000}
    got = {r["doc_id"]: r for r in _rows(mixture_sample(ds, rates))}
    for i in range(400):
        lang = ["en", "de", "xx", "fr"][i % 4]
        expect = _pm(i) < rates.get(lang, 0)
        assert (i in got) == expect, (i, lang, _pm(i))
        if i in got:
            assert got[i]["bucket_pm"] == _pm(i)
            assert got[i]["rate_pm"] == rates[lang]
    # rate-1000 domain keeps everything; unknown domain drops everything
    assert sum(1 for r in got.values() if r["lang"] == "fr") == 100
    assert not any(r["lang"] == "xx" for r in got.values())


def test_mixture_partitioning_invariance(ray_session):
    t = pa.table({"doc_id": [f"d{i}" for i in range(300)],
                  "lang": ["en", "de", "fr"] * 100})
    rates = {"en": 500, "de": 250, "fr": 750}
    one = ray.data.from_arrow(t)
    many = ray.data.from_arrow([t.slice(i * 30, 30) for i in range(10)])
    a = sorted((r["doc_id"], r["bucket_pm"], r["rate_pm"])
               for r in _rows(mixture_sample(one, rates)))
    b = sorted((r["doc_id"], r["bucket_pm"], r["rate_pm"])
               for r in _rows(mixture_sample(many, rates)))
    assert a == b and len(a) > 100


def test_mixture_default_rate(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(200)), "lang": ["yy"] * 200}))
    kept = _rows(mixture_sample(ds, {"en": 500}, default_pm=1000))
    assert len(kept) == 200    # unknown domain kept via default_pm=1000
