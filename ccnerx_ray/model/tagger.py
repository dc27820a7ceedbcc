"""Deterministic lexicon-fusion tagging model (numpy).

Plays the role of the reference's LEBert + BiLSTM + CRF inference stack:

* hash-seeded token embeddings stand in for BERT wordpiece embeddings
  (``CC/loaders/le_loader.py:156``, fallback style of ``embedding.py:67-69``
  made content-deterministic);
* **lexicon fusion**: trie-matched catalog words inject their BIOES label
  prior into the per-position emission scores — the same information flow
  as LEBert's word-attention adapter (``CC/LEBert.py:172-196``), reduced to
  an additive prior with strength ``lexicon_boost``;
* a seeded 2-layer MLP produces the base emission scores (the BiLSTM+fc
  analogue, ``CC/birnncrf.py:6-41`` / ``crf.py:44-45``);
* transitions are seeded and structured to the BIOES grammar, decode is the
  reference-exact viterbi (:mod:`ccnerx_ray.model.crf`).

All weights derive from ``PipelineConfig.model_seed`` alone, so every actor,
every retry and the single-process oracle produce identical tags for
identical token sequences regardless of batch composition (SURVEY.md §7 M3
"decode determinism across batch boundaries").
"""

from __future__ import annotations

import hashlib

import numpy as np

from ccnerx_ray.config import PipelineConfig, bioes_tag_list
from ccnerx_ray.model.crf import CRFParams, IMPOSSIBLE, viterbi_decode
from ccnerx_ray.state.catalog import EntityCatalog
from ccnerx_ray.state.trie import Trie


def _token_seed(token: str, salt: int) -> int:
    h = hashlib.blake2b(token.encode("utf-8"), digest_size=8,
                        key=salt.to_bytes(8, "little")).digest()
    return int.from_bytes(h, "little")


def save_checkpoint(path: str, cfg: PipelineConfig = PipelineConfig()) -> str:
    """Serialize the seeded model's weights to an ``.npz`` checkpoint —
    the stand-in for the reference's ``torch.save`` model artifact
    (``CC/trainer.py:366-380``). Loading it through
    ``MentionTagger(checkpoint_path=...)`` exercises the per-actor
    weight-loading path of ``predicter.py:52-83`` end to end. Write is
    atomic (tmp + rename) so concurrent actors never read a torn file."""
    import os
    import tempfile

    tags = bioes_tag_list(cfg.entity_labels)
    T = len(tags) + 2
    rng = np.random.default_rng(cfg.model_seed)
    D, H = cfg.embed_dim, cfg.hidden_dim
    payload = {
        "W1": rng.standard_normal((D, H)) / np.sqrt(D),
        "b1": rng.standard_normal(H) * 0.1,
        "W2": rng.standard_normal((H, T)) * 0.4 / np.sqrt(H),
        "b2": rng.standard_normal(T) * 0.1,
        "transitions": _structured_transitions(tags, cfg.model_seed + 1),
        "tags": np.array(tags),
        "o_bias": np.float64(3.0),
        "emb_salt": np.int64(cfg.model_seed + 2),
    }
    if cfg.backbone == "attn":
        # attention-backbone checkpoints are self-contained: all N layer
        # parameter sets plus the tag-space projection ride in the same
        # flat npz (keys attn_<layer>_<name>, Wp, bp)
        from ccnerx_ray.model.attention import SeededAttentionEncoder
        enc = SeededAttentionEncoder(D, cfg.attn_layers, cfg.attn_heads,
                                     cfg.model_seed)
        payload.update(enc.flat_weights())
        rng2 = np.random.default_rng(cfg.model_seed + 50)
        payload["Wp"] = rng2.standard_normal((D, T)) * 0.4 / np.sqrt(D)
        payload["bp"] = rng2.standard_normal(T) * 0.1
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                               suffix=".tmp.npz")  # .npz: savez keeps name
    os.close(fd)
    np.savez(tmp, **payload)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str) -> dict:
    """Read an ``.npz`` checkpoint into the ``weights=`` dict
    :class:`TaggerModel` / ``TorchTaggerModel`` accept."""
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def _structured_transitions(tags: list[str], seed: int) -> np.ndarray:
    """BIOES-grammar transition matrix in the reference layout
    ``transitions[to, from]`` (crf.py:31-34), with small (0.15σ) seeded noise on the
    allowed arcs — a deterministic stand-in for trained weights."""
    T = len(tags) + 2
    start_idx, stop_idx = T - 2, T - 1
    rng = np.random.default_rng(seed)
    trans = np.full((T, T), IMPOSSIBLE, dtype=np.float64)

    def allowed(frm: str, to: str) -> bool:
        fh = frm[0]
        th = to[0]
        if fh in ("O", "E", "S"):
            return th in ("O", "B", "S")
        # B-X / I-X may only continue to I-X / E-X of the SAME label
        if fh in ("B", "I"):
            return th in ("I", "E") and to[1:] == frm[1:]
        return False

    for i, frm in enumerate(tags):          # i = from
        for j, to in enumerate(tags):       # j = to
            if allowed(frm, to):
                trans[j, i] = 0.15 * rng.standard_normal()
    # START may open O/B/S; O/E/S may close to STOP
    for j, to in enumerate(tags):
        if to[0] in ("O", "B", "S"):
            trans[j, start_idx] = 0.15 * rng.standard_normal()
    for i, frm in enumerate(tags):
        if frm[0] in ("O", "E", "S"):
            trans[stop_idx, i] = 0.15 * rng.standard_normal()
    trans[start_idx, :] = IMPOSSIBLE   # crf.py:33
    trans[:, stop_idx] = IMPOSSIBLE    # crf.py:34
    return trans


class TaggerModel:
    """Deterministic tagger: tokens → BIOES tag strings. Weights come
    from the config seed, or — the production regime the reference's
    ``predicter.py:52-83`` embodies (load a trained ``.pth`` once per
    predictor) — from an on-disk checkpoint via ``weights=``
    (:func:`load_checkpoint`), loaded once per actor/worker process."""

    def __init__(self, catalog: EntityCatalog, cfg: PipelineConfig = PipelineConfig(),
                 extra_lexicon: list[tuple[str, ...]] | None = None,
                 weights: dict | None = None):
        self.cfg = cfg
        self.catalog = catalog
        self.tags = bioes_tag_list(cfg.entity_labels)
        self.tag2id = {t: i for i, t in enumerate(self.tags)}
        self.num_tags = len(self.tags)
        T = self.num_tags + 2

        words = list(catalog.words())
        if extra_lexicon:
            words.extend(extra_lexicon)
        # deterministic build order (vocab-id determinism, SURVEY.md §7)
        self.trie = Trie.from_words(sorted(set(words)), use_single=cfg.use_single,
                                    max_scan_num=cfg.max_scan_num)

        if weights is not None:
            saved_tags = [str(t) for t in weights["tags"]]
            if saved_tags != self.tags:
                raise ValueError(
                    "checkpoint tag vocabulary does not match the config's "
                    f"entity labels: {saved_tags[:4]}... vs {self.tags[:4]}...")
            self.W1 = np.asarray(weights["W1"], dtype=np.float64)
            self.b1 = np.asarray(weights["b1"], dtype=np.float64)
            self.W2 = np.asarray(weights["W2"], dtype=np.float64)
            self.b2 = np.asarray(weights["b2"], dtype=np.float64)
            self.o_bias = float(weights["o_bias"])
            self.crf = CRFParams(
                np.asarray(weights["transitions"], dtype=np.float64),
                T - 2, T - 1)
            self._emb_salt = int(weights["emb_salt"])
        else:
            rng = np.random.default_rng(cfg.model_seed)
            D, H = cfg.embed_dim, cfg.hidden_dim
            self.W1 = rng.standard_normal((D, H)) / np.sqrt(D)
            self.b1 = rng.standard_normal(H) * 0.1
            self.W2 = rng.standard_normal((H, T)) * 0.4 / np.sqrt(H)
            self.b2 = rng.standard_normal(T) * 0.1
            self.o_bias = 3.0  # favor O absent lexicon evidence
            self.crf = CRFParams(
                _structured_transitions(self.tags, cfg.model_seed + 1),
                T - 2, T - 1)
            self._emb_salt = cfg.model_seed + 2
        self._emb_cache: dict[str, np.ndarray] = {}
        # per-token BASE emission row cache (emission = f(token) + boosts;
        # the MLP runs once per distinct token, ever, per process)
        self._row_cache: dict[str, np.ndarray] = {}
        self.encoder = None
        if cfg.backbone == "attn":
            # multi-layer self-attention backbone (VERDICT r4 #2): the
            # structural twin of the reference's transformer stack
            # (CC/LEBert.py:141-171); hidden width = embed_dim so the
            # residual stream is well-defined, projection to tag space
            # via a dedicated seeded (Wp, bp)
            from ccnerx_ray.model.attention import (
                SeededAttentionEncoder, unflatten_layer_weights)
            lw = (unflatten_layer_weights(weights, cfg.attn_layers)
                  if weights is not None else None)
            self.encoder = SeededAttentionEncoder(
                cfg.embed_dim, cfg.attn_layers, cfg.attn_heads,
                cfg.model_seed, layer_weights=lw)
            if weights is not None and "Wp" in weights:
                self.Wp = np.asarray(weights["Wp"], dtype=np.float64)
                self.bp = np.asarray(weights["bp"], dtype=np.float64)
            else:
                rng2 = np.random.default_rng(cfg.model_seed + 50)
                self.Wp = (rng2.standard_normal((cfg.embed_dim, T))
                           * 0.4 / np.sqrt(cfg.embed_dim))
                self.bp = rng2.standard_normal(T) * 0.1
        elif cfg.backbone != "mlp":
            raise ValueError(f"unknown backbone {cfg.backbone!r}; "
                             "expected 'mlp' or 'attn'")
        self.fusion = None
        if cfg.fusion == "lebert":
            from ccnerx_ray.model.fusion import WordAttentionFusion
            # in attn mode the fusion adapter operates mid-stack on the
            # D-wide residual stream (LEBert injects between encoder
            # layers); in mlp mode it fuses the H-wide hidden state
            fdim = cfg.embed_dim if self.encoder is not None \
                else cfg.hidden_dim
            self.fusion = WordAttentionFusion(fdim, cfg.embed_dim,
                                              cfg.model_seed + 3)
            self._word_emb_cache: dict[tuple, np.ndarray] = {}
        elif cfg.fusion != "boost":
            raise ValueError(f"unknown fusion mode {cfg.fusion!r}")

    # --- embeddings -----------------------------------------------------
    def _embed(self, token: str) -> np.ndarray:
        vec = self._emb_cache.get(token)
        if vec is None:
            r = np.random.default_rng(_token_seed(token, self._emb_salt))
            vec = r.uniform(-1.0, 1.0, self.cfg.embed_dim)
            if len(self._emb_cache) < 500_000:
                self._emb_cache[token] = vec
        return vec

    def _word_embed(self, word: tuple) -> np.ndarray:
        """Matched-word embedding = mean of its token embeddings (the
        deterministic stand-in for LEBert's 200-d word2vec rows)."""
        vec = self._word_emb_cache.get(word)
        if vec is None:
            vec = np.mean([self._embed(t) for t in word], axis=0)
            if len(self._word_emb_cache) < 500_000:
                self._word_emb_cache[word] = vec
        return vec

    def _fused_emissions(self, tokens: list[str]) -> np.ndarray:
        """LEBert-mode unary scores: hidden states fused with the
        position's matched-word embeddings through word attention
        (``model/fusion.py``; LEBert.py:172-196 information flow), THEN
        projected to tag space; the additive lexicon boost still applies
        (seeded fusion weights carry no label signal)."""
        from ccnerx_ray.model.fusion import position_word_slots

        L = len(tokens)
        T = self.num_tags + 2
        X = np.stack([self._embed(t) for t in tokens])
        H = np.tanh(X @ self.W1 + self.b1)
        spans = list(self.trie.spans(tokens,
                                     max_words=self.cfg.max_word_num))
        slots = position_word_slots(spans, L, self.cfg.max_word_num)
        Wn = self.cfg.max_word_num
        Wm = np.zeros((L, Wn, self.cfg.embed_dim))
        mask = np.zeros((L, Wn))
        for k, words in enumerate(slots):
            for j, w in enumerate(words):
                Wm[k, j] = self._word_embed(w)
                mask[k, j] = 1.0
        e = self.fusion.fuse(H, Wm, mask) @ self.W2 + self.b2
        e[:, self.tag2id["O"]] += self.o_bias
        e[:, -2:] = IMPOSSIBLE
        boost = self.cfg.lexicon_boost
        for start, end, word in spans:
            lab = self.catalog.label(word)
            if lab is None:
                continue
            if end - start == 1:
                e[start, self.tag2id[f"S-{lab}"]] += boost
            else:
                e[start, self.tag2id[f"B-{lab}"]] += boost
                for k in range(start + 1, end - 1):
                    e[k, self.tag2id[f"I-{lab}"]] += boost
                e[end - 1, self.tag2id[f"E-{lab}"]] += boost
        return e

    def _apply_boost(self, e: np.ndarray, spans) -> None:
        """Additive lexicon label priors on candidate spans (in place)."""
        boost = self.cfg.lexicon_boost
        for start, end, word in spans:
            lab = self.catalog.label(word)
            if lab is None:
                continue
            if end - start == 1:
                e[start, self.tag2id[f"S-{lab}"]] += boost
            else:
                e[start, self.tag2id[f"B-{lab}"]] += boost
                for k in range(start + 1, end - 1):
                    e[k, self.tag2id[f"I-{lab}"]] += boost
                e[end - 1, self.tag2id[f"E-{lab}"]] += boost

    def _attn_emissions(self, tokens: list[str]) -> np.ndarray:
        """Attention-backbone unary scores: token embeddings + sinusoidal
        positions → N self-attention layers with the LEBert word-attention
        adapter injected after layer ``attn_fusion_layer`` (mid-stack —
        the CC/LEBert.py:141-196 information flow) → seeded projection to
        tag space; O bias, START/STOP mask and the additive lexicon boost
        apply exactly as in the other backbones (seeded weights carry no
        label signal of their own)."""
        from ccnerx_ray.model.attention import sinusoidal_positions

        L = len(tokens)
        X = (np.stack([self._embed(t) for t in tokens])
             + sinusoidal_positions(L, self.cfg.embed_dim))
        spans = list(self.trie.spans(tokens,
                                     max_words=self.cfg.max_word_num))
        hook = None
        if self.fusion is not None:
            from ccnerx_ray.model.fusion import position_word_slots
            slots = position_word_slots(spans, L, self.cfg.max_word_num)
            Wn = self.cfg.max_word_num
            Wm = np.zeros((L, Wn, self.cfg.embed_dim))
            mask = np.zeros((L, Wn))
            for k, words in enumerate(slots):
                for j, w in enumerate(words):
                    Wm[k, j] = self._word_embed(w)
                    mask[k, j] = 1.0

            def hook(H):
                return self.fusion.fuse(H, Wm, mask)

        H = self.encoder.forward(X, fusion_hook=hook,
                                 fusion_layer=self.cfg.attn_fusion_layer)
        e = H @ self.Wp + self.bp
        e[:, self.tag2id["O"]] += self.o_bias
        e[:, -2:] = IMPOSSIBLE
        self._apply_boost(e, spans)
        return e

    # --- emissions ------------------------------------------------------
    def emissions(self, tokens: list[str]) -> np.ndarray:
        """Per-position unary scores [L, num_tags+2] = backbone(embedding)
        + lexicon-fusion label priors + O bias; START/STOP columns
        impossible."""
        L = len(tokens)
        T = self.num_tags + 2
        if L == 0:
            return np.zeros((0, T))
        if self.encoder is not None:
            return self._attn_emissions(tokens)
        if self.fusion is not None:
            return self._fused_emissions(tokens)
        X = np.stack([self._embed(t) for t in tokens])
        e = np.tanh(X @ self.W1 + self.b1) @ self.W2 + self.b2
        e[:, self.tag2id["O"]] += self.o_bias
        e[:, -2:] = IMPOSSIBLE  # never emit START/STOP mid-sequence

        # lexicon fusion: candidate spans from the trie, labels from catalog
        boost = self.cfg.lexicon_boost
        for start, end, word in self.trie.spans(tokens, max_words=self.cfg.max_word_num):
            lab = self.catalog.label(word)
            if lab is None:
                continue
            n = end - start
            if n == 1:
                e[start, self.tag2id[f"S-{lab}"]] += boost
            else:
                e[start, self.tag2id[f"B-{lab}"]] += boost
                for k in range(start + 1, end - 1):
                    e[k, self.tag2id[f"I-{lab}"]] += boost
                e[end - 1, self.tag2id[f"E-{lab}"]] += boost
        return e

    def _base_rows(self, uniq_tokens: list[str]) -> np.ndarray:
        """[U, T] base emission rows (MLP + O bias + START/STOP mask),
        cache-assisted; new tokens run through ONE batched MLP. Row values
        are bit-identical to the per-segment path (row-wise matmul is
        row-independent)."""
        T = self.num_tags + 2
        out = np.empty((len(uniq_tokens), T), dtype=np.float64)
        missing: list[tuple[int, str]] = []
        for u, tok in enumerate(uniq_tokens):
            row = self._row_cache.get(tok)
            if row is None:
                missing.append((u, tok))
            else:
                out[u] = row
        if missing:
            X = np.stack([self._embed(t) for _, t in missing])
            E = np.tanh(X @ self.W1 + self.b1) @ self.W2 + self.b2
            E[:, self.tag2id["O"]] += self.o_bias
            E[:, -2:] = IMPOSSIBLE
            for k, (u, tok) in enumerate(missing):
                out[u] = E[k]
                if len(self._row_cache) < 500_000:
                    self._row_cache[tok] = E[k]
        return out

    # --- decode ---------------------------------------------------------
    def tag_segments(self, segments: list[list[str]]) -> list[list[str]]:
        """Tag a batch of token segments → BIOES tag strings per segment.

        Pads to the batch max length and decodes with masks, like the
        reference's batched predict (``predicter.py:130-171``); per-row
        output is independent of batch composition. Emission assembly is
        fully vectorized: one gather from the per-token row cache plus
        sparse lexicon-boost additions (scale note: the per-batch Python
        work is O(trie spans), not O(tokens))."""
        if not segments:
            return []
        B = len(segments)
        L = max((len(s) for s in segments), default=0)
        if L == 0:
            return [[] for _ in segments]
        T = self.num_tags + 2

        if self.fusion is not None or self.encoder is not None:
            # LEBert / attention mode: emissions are position-contextual,
            # so the per-token row cache does not apply
            efn = (self._attn_emissions if self.encoder is not None
                   else self._fused_emissions)
            feats = np.zeros((B, L, T))
            masks = np.zeros((B, L))
            for i, seg in enumerate(segments):
                if seg:
                    feats[i, :len(seg)] = efn(seg)
                    masks[i, :len(seg)] = 1.0
            paths = viterbi_decode(feats, masks, self.crf)
            return [[self.tags[t] for t in path] for path in paths]

        uniq: dict[str, int] = {}
        for seg in segments:
            for t in seg:
                if t not in uniq:
                    uniq[t] = len(uniq)
        base = self._base_rows(list(uniq))

        ids = np.zeros((B, L), dtype=np.int64)
        masks = np.zeros((B, L), dtype=np.float64)
        for i, seg in enumerate(segments):
            n = len(seg)
            if n:
                ids[i, :n] = [uniq[t] for t in seg]
                masks[i, :n] = 1.0
        feats = base[ids]                     # [B, L, T] (copy via gather)
        feats[masks == 0.0] = 0.0             # padded positions stay zero

        # lexicon fusion: sparse additive label priors per candidate span
        boost = self.cfg.lexicon_boost
        for i, seg in enumerate(segments):
            for start, end, word in self.trie.spans(seg, max_words=self.cfg.max_word_num):
                lab = self.catalog.label(word)
                if lab is None:
                    continue
                if end - start == 1:
                    feats[i, start, self.tag2id[f"S-{lab}"]] += boost
                else:
                    feats[i, start, self.tag2id[f"B-{lab}"]] += boost
                    for k in range(start + 1, end - 1):
                        feats[i, k, self.tag2id[f"I-{lab}"]] += boost
                    feats[i, end - 1, self.tag2id[f"E-{lab}"]] += boost

        paths = viterbi_decode(feats, masks, self.crf)
        return [[self.tags[t] for t in path] for path in paths]
