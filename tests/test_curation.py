"""Composite curation mask (ops/curation.py): bit assembly over the
component families, every bit fired, multi-bit docs, reason_counts."""

from __future__ import annotations

import pyarrow as pa

from ccnerx_ray.ops.curation import (BIT_BOILERPLATE, BIT_OFF_DISTRIBUTION,
                                     BIT_REPETITIVE, BIT_SHORT,
                                     curation_mask, reason_counts)

LONG = " ".join(f"w{i % 9}x w{(i * 7) % 11}y" for i in range(15))  # 30 toks


def _ds(rows):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string())}))


def _component_reference(rows):
    """Assemble the expected mask from the component operators' own
    driver outputs (each family is independently oracle/unit-verified;
    this pins the COMPOSITION: bit values, one row per doc, summing)."""
    from ccnerx_ray.ops.dedup import passage_dedup_stats
    from ccnerx_ray.ops.lm import score_documents, train_unigram
    from ccnerx_ray.functions.tokenize import ws_tokens

    ds = _ds(rows)
    pas = {r["doc_id"]: r for r in
           passage_dedup_stats(ds, window=4).take_all()}
    lm = {r["doc_id"]: r for r in
          score_documents(ds, train_unigram(ds)).take_all()}
    exp = {}
    for did, txt in rows:
        toks = ws_tokens(txt)
        bigs = list(zip(toks, toks[1:]))
        r = 0
        if len(toks) < 20:
            r |= BIT_SHORT
        if bigs and 1000 * (len(bigs) - len(set(bigs))) > 100 * len(bigs):
            r |= BIT_REPETITIVE
        p = pas[did]
        if p["n_passages"] > 0 and \
                1000 * p["n_dup_passages"] > 250 * p["n_passages"]:
            r |= BIT_BOILERPLATE
        if lm[did]["mean_surprisal_x100"] > 510:
            r |= BIT_OFF_DISTRIBUTION
        exp[did] = r
    return exp


def test_every_bit_fires_and_composes(ray_session):
    # corpus dominated by one common token so rare-token docs score high
    rows = [(i, "common " * 40) for i in range(8)]          # bulk: keep?
    rows += [(100, "tiny doc")]                             # SHORT
    rows += [(101, "rep " * 30)]                            # REPETITIVE (+…)
    rows += [(102, LONG), (103, LONG)]                      # 103: BOILER
    rows += [(104, " ".join(f"rare{i}" for i in range(25)))]  # OFF_DIST
    ds = _ds(rows)
    got = {r["doc_id"]: (r["reasons"], r["keep"])
           for r in curation_mask(ds).take_all()}
    exp = _component_reference(rows)
    assert {k: v[0] for k, v in got.items()} == exp
    assert all(v[1] == (1 if v[0] == 0 else 0) for v in got.values())
    fired = set()
    for r in exp.values():
        for bit in (BIT_SHORT, BIT_REPETITIVE, BIT_BOILERPLATE,
                    BIT_OFF_DISTRIBUTION):
            if r & bit:
                fired.add(bit)
    assert fired == {BIT_SHORT, BIT_REPETITIVE, BIT_BOILERPLATE,
                     BIT_OFF_DISTRIBUTION}, fired
    # at least one multi-bit doc (composition, not one-hot)
    assert any(bin(r).count("1") >= 2 for r in exp.values())
    # one row per input doc, always
    assert set(got) == {r[0] for r in rows}


def test_reason_counts(ray_session):
    rows = [(0, "tiny"), (1, LONG), (2, LONG)]
    mask = curation_mask(_ds(rows))
    c = reason_counts(mask)
    got = {r["doc_id"]: r["reasons"] for r in mask.take_all()}
    assert c["n_docs"] == 3
    assert c["n_kept"] == sum(1 for r in got.values() if r == 0)
    assert c["n_dropped"] == 3 - c["n_kept"]
    assert c["too_short"] == sum(1 for r in got.values() if r & BIT_SHORT)
    assert c["boilerplate_passages"] == \
        sum(1 for r in got.values() if r & BIT_BOILERPLATE)
