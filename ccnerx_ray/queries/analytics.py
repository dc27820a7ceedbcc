"""Training-data analytics + KG flagship queries over the test tables.

SQL-expressible ops carry a DuckDB oracle with definitions matched token
for token (integer outputs where float hashing would be fragile); the
model-driven / sketch-driven ops (tagger KG, MinHash, SimHash, langid,
fingerprint, IVF) are rows-only checks — the driver records the weaker
check and the pytest suite covers their semantics against planted fixtures
and numpy oracles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ccnerx_ray.config import PipelineConfig
from ccnerx_ray.functions.hashing import sha256_hex
from ccnerx_ray.ops.dedup import (embedding_dup_pairs, exact_dedup_groups,
                                  minhash_dedup_pairs, simhash_pairs)
from ccnerx_ray.ops.similarity import ivf_knn, knn_bruteforce
from ccnerx_ray.ops.text import (add_fingerprint, add_langid,
                                 add_quality_score, add_token_stats)

_STOPS_SQL = "('the','a','of','and','to','in','is','for','on','with','that','it','as','at','by')"


def _docs(sf_dir: str, columns=None):
    import ray.data
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _emb(sf_dir: str):
    import ray.data
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


# ------------------------------------------------------------- token stats
def q_token_stats(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(add_token_stats, batch_format="pyarrow") \
             .select_columns(["doc_id", "n_tokens", "n_uniq_tokens"])


ORACLE_TOKEN_STATS = r"""
SELECT doc_id,
  CASE WHEN trim(text)='' THEN 0
       ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
  CASE WHEN trim(text)='' THEN 0
       ELSE len(list_distinct(string_split_regex(trim(text), '\s+'))) END AS n_uniq_tokens
FROM documents
"""


# ------------------------------------------------------------- quality
def q_quality(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(add_quality_score, batch_format="pyarrow") \
             .select_columns(["doc_id", "stopword_pm", "punct_pm", "quality"])


ORACLE_QUALITY = rf"""
WITH t AS (
  SELECT doc_id, text,
    CASE WHEN trim(text)='' THEN NULL
         ELSE string_split_regex(trim(text), '\s+') END AS toks
  FROM documents
), m AS (
  SELECT doc_id, text, toks,
    len(toks) AS n,
    len(list_filter(toks, w -> lower(w) IN {_STOPS_SQL})) AS stops,
    length(regexp_replace(text, '[\w\s]', '', 'g')) AS punct,
    1.0 * list_sum(list_transform(toks, w -> length(w))) / len(toks) AS mean_len
  FROM t
)
SELECT doc_id,
  CASE WHEN toks IS NULL THEN 0
       ELSE CAST(floor(1000.0 * stops / n) AS BIGINT) END AS stopword_pm,
  CASE WHEN toks IS NULL THEN 0
       ELSE CAST(floor(1000.0 * punct / greatest(1, length(text))) AS BIGINT) END AS punct_pm,
  CASE WHEN toks IS NULL THEN 0
       ELSE greatest(0, 100
            - CASE WHEN n < 5 THEN 40 ELSE 0 END
            - CASE WHEN mean_len < 2 OR mean_len > 12 THEN 20 ELSE 0 END
            - CASE WHEN floor(1000.0 * punct / greatest(1, length(text))) > 300 THEN 20 ELSE 0 END
            - CASE WHEN stops = 0 THEN 10 ELSE 0 END) END AS quality
FROM m
"""


# ------------------------------------------------------------- exact dedup
def q_exact_dedup(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text"])
    return exact_dedup_groups(ds).select_columns(["keep_id", "n_copies"])


ORACLE_EXACT_DEDUP = """
SELECT min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY text
"""


# ------------------------------------------------------------- knn
def _query_matrix(sf_dir: str, n: int = 4) -> tuple[np.ndarray, list[int]]:
    import duckdb
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        f"WHERE vec_id < {n} ORDER BY vec_id").fetchall()
    con.close()
    return np.stack([np.asarray(r[1], dtype=np.float64) for r in rows]), \
        [r[0] for r in rows]


def q_knn(sf_dir: str):
    Q, qids = _query_matrix(sf_dir)
    out = knn_bruteforce(_emb(sf_dir), Q, query_ids=qids, k=10)
    return out.select_columns(["query_id", "vec_id", "rank"])


ORACLE_KNN = """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 4)
SELECT qid AS query_id, vec_id, rank FROM (
  SELECT q.qid, e.vec_id,
         row_number() OVER (PARTITION BY q.qid
             ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC,
                      e.vec_id) AS rank
  FROM q CROSS JOIN embeddings e
) WHERE rank <= 10
"""


# ------------------------------------------------------------- embedding dup
def q_embedding_dedup(sf_dir: str):
    return embedding_dup_pairs(_emb(sf_dir), threshold=0.45)


ORACLE_EMBEDDING_DEDUP = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b
  ON a.vec_id < b.vec_id
 AND list_cosine_similarity(a.embedding, b.embedding) >= 0.45
"""


# ---------------------------------------------------- rows-only (no SQL)
def q_langid(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(add_langid, batch_format="pyarrow") \
             .select_columns(["doc_id", "pred_lang"])


def q_fingerprint(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(add_fingerprint, batch_format="pyarrow") \
             .select_columns(["doc_id", "fingerprint"])


def q_minhash_pairs(sf_dir: str):
    return minhash_dedup_pairs(_docs(sf_dir, ["doc_id", "text"]),
                               threshold=0.5)


def q_simhash_pairs(sf_dir: str):
    return simhash_pairs(_docs(sf_dir, ["doc_id", "text"]), max_hamming=6)


def q_ivf_knn(sf_dir: str):
    Q, qids = _query_matrix(sf_dir)
    out = ivf_knn(_emb(sf_dir), Q, query_ids=qids, k=10,
                  n_centroids=8, nprobe=4)
    return out.select_columns(["query_id", "vec_id", "rank"])


def q_media_features(sf_dir: str):
    """Multimodal plumbing over a deterministic synthetic media table
    (size scaled loosely by the sf dir name)."""
    import ray.data
    from ccnerx_ray.ops.multimodal import (extract_media_features,
                                           synthetic_media_table)
    n = 120 if sf_dir.rstrip("/").endswith("0.1") else 60
    ds = ray.data.from_arrow(synthetic_media_table(n))
    return extract_media_features(ds, dim=32, concurrency=2)


# ------------------------------------------------------------- KG flagship
# fixed domain catalog for the documents vocabulary (token tuples → label)
TESTDATA_CATALOG: list[tuple[tuple[str, ...], str]] = sorted({
    (("spark",), "LIB"),
    (("table",), "CLASS"), (("column",), "CLASS"), (("vector",), "CLASS"),
    (("stream",), "CLASS"), (("window",), "CLASS"), (("batch",), "CLASS"),
    (("filter",), "FUNC"), (("scan",), "FUNC"), (("sort",), "FUNC"),
    (("merge",), "FUNC"), (("agg",), "FUNC"), (("join",), "FUNC"),
    (("hash", "join"), "FUNC"), (("merge", "join"), "FUNC"),
    (("sort", "merge"), "FUNC"), (("hash", "agg"), "FUNC"),
    (("customer",), "CONST"), (("order",), "CONST"), (("query",), "CONST"),
})

def kg_cfg() -> PipelineConfig:
    """Tagger actor-pool sizing follows the session's CPU count (the pool
    is the hot stage; a fixed size would throttle scaling runs)."""
    import ray
    n = 8
    if ray.is_initialized():
        n = int(ray.cluster_resources().get("CPU", 8))
    return PipelineConfig(tagger_concurrency=max(2, n - 1),
                          output_partitions=8)


def docs_to_corpus(batch: pa.Table) -> pa.Table:
    """documents → graft corpus shape (repo, path, commit, lang, content);
    commit is derived from the content hash (deterministic)."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    srcs = batch.column("source").to_pylist()
    return pa.table({
        "repo": pa.array([f"corpus/{s}" for s in srcs], pa.string()),
        "path": pa.array([f"doc/{i}.txt" for i in ids], pa.string()),
        "commit": pa.array([sha256_hex(t or "")[:40] for t in texts],
                           pa.string()),
        "lang": pa.array(langs, pa.string()),
        "content": pa.array(texts, pa.string()),
    })


def corpus_from_documents(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text", "lang", "source"])
    return ds.map_batches(docs_to_corpus, batch_format="pyarrow")


def q_kg_triples(sf_dir: str):
    """Flagship KG pipeline over the documents-derived corpus."""
    from ccnerx_ray.pipelines.kg import triples_dataset
    corpus = corpus_from_documents(sf_dir)
    return triples_dataset(corpus, TESTDATA_CATALOG, kg_cfg())


def q_kg_mentions(sf_dir: str):
    from ccnerx_ray.pipelines.kg import mentions_dataset
    corpus = corpus_from_documents(sf_dir)
    return mentions_dataset(corpus, TESTDATA_CATALOG, kg_cfg())


def q_kg_entities(sf_dir: str):
    """Canonical entity table (salted two-phase groupby clustering)."""
    from ccnerx_ray.stages.canonical import canonicalize
    return canonicalize(q_kg_mentions(sf_dir))


def q_kg_label_dist(sf_dir: str):
    """G3: per-label mention counts."""
    from ray.data.aggregate import Count
    out = q_kg_mentions(sf_dir).groupby("linked_label").aggregate(Count())

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["label" if c == "linked_label" else
             ("n_mentions" if c == "count()" else c)
             for c in batch.column_names])

    return out.map_batches(rename, batch_format="pyarrow")


ANALYTICS_QUERIES = {
    "token_stats": q_token_stats,
    "quality": q_quality,
    "exact_dedup": q_exact_dedup,
    "knn": q_knn,
    "embedding_dedup": q_embedding_dedup,
    "langid": q_langid,
    "fingerprint": q_fingerprint,
    "minhash_pairs": q_minhash_pairs,
    "simhash_pairs": q_simhash_pairs,
    "ivf_knn": q_ivf_knn,
    "media_features": q_media_features,
    "kg_triples": q_kg_triples,
    "kg_mentions": q_kg_mentions,
    "kg_entities": q_kg_entities,
    "kg_label_dist": q_kg_label_dist,
}

ANALYTICS_ORACLE = {
    "token_stats": ORACLE_TOKEN_STATS,
    "quality": ORACLE_QUALITY,
    "exact_dedup": ORACLE_EXACT_DEDUP,
    "knn": ORACLE_KNN,
    "embedding_dedup": ORACLE_EMBEDDING_DEDUP,
    # everything else: rows-only (model/sketch semantics, no SQL oracle)
}


def q_kg_aliases(sf_dir: str):
    """Alias pairs over the canonical entity table (T2/A4 analogue)."""
    from ccnerx_ray.stages.canonical import alias_pairs
    return alias_pairs(q_kg_entities(sf_dir), threshold=0.3)


ANALYTICS_QUERIES["kg_aliases"] = q_kg_aliases


def q_minhash_dedup_keepers(sf_dir: str):
    """Full near-dup dedup pipeline: MinHash-LSH pairs → connected
    components → one keeper (min doc_id) per duplicate cluster."""
    from ccnerx_ray.ops.dedup import dup_components
    pairs = q_minhash_pairs(sf_dir)
    return dup_components(pairs)


ANALYTICS_QUERIES["minhash_dedup_keepers"] = q_minhash_dedup_keepers


def q_stratified_docs(sf_dir: str):
    """Deterministic per-language document sample (5 per lang)."""
    from ccnerx_ray.ops.sampling import stratified_sample
    ds = _docs(sf_dir, ["doc_id", "lang"])
    return stratified_sample(ds, "lang", "doc_id", n_per_key=5, seed=2021) \
        .select_columns(["lang", "doc_id"])


ANALYTICS_QUERIES["stratified_docs"] = q_stratified_docs
