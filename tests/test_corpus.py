"""Synthetic corpus generator: determinism, schema, skew, planted gold."""

from ccnerx_ray.corpus import CORPUS_SCHEMA, build_catalog, generate_corpus


def test_schema_matches_input_hint():
    t = generate_corpus(20, seed=42)
    assert t.schema.equals(CORPUS_SCHEMA)
    assert t.num_rows == 20


def test_deterministic():
    a = generate_corpus(30, seed=42)
    b = generate_corpus(30, seed=42)
    assert a.equals(b)
    c = generate_corpus(30, seed=43)
    assert not a.equals(c)


def test_prefix_stability():
    """Row i depends only on (seed, i) — subsets regenerate identically."""
    a = generate_corpus(10, seed=42)
    b = generate_corpus(40, seed=42)
    assert a.equals(b.slice(0, 10))


def test_monorepo_skew():
    t = generate_corpus(200, seed=42)
    repos = t.column("repo").to_pylist()
    frac = sum(r == "bigcorp/monorepo" for r in repos) / len(repos)
    assert 0.35 < frac < 0.65


def test_gold_mentions_in_content():
    t, gold = generate_corpus(10, seed=42, with_gold=True)
    contents = t.column("content").to_pylist()
    assert len(gold) > 0
    for row_idx, surface, label in gold[:50]:
        assert " ".join(surface) in contents[row_idx]


def test_catalog_deterministic():
    a = build_catalog(42)
    b = build_catalog(42)
    assert a.surface2label == b.surface2label
    assert len(a) >= 300
