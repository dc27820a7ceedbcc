"""Broadcastable per-actor state: trie, vocab, embeddings, entity catalog.

Everything here is built once (driver-side or in an actor's ``__init__``)
and is small relative to the corpus — it travels through ``ray.put`` /
actor construction, never through a shuffle.
"""

from ccnerx_ray.state.trie import Trie
from ccnerx_ray.state.vocab import Vocab
from ccnerx_ray.state.embedding import WordEmbedding
from ccnerx_ray.state.catalog import EntityCatalog

__all__ = ["Trie", "Vocab", "WordEmbedding", "EntityCatalog"]
