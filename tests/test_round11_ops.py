"""Invariant pins for the round-11 operators (the per-round convention:
each new op carries oracle parity in the slow tier AND at least one
structural invariant SQL equality cannot restate)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tf_datapipeline_spark.catalog import load_table


def _python_bpe(tok: str, rules: list[str]) -> list[str]:
    """Independent greedy BPE reference: apply char-pair rules in rank
    order, each merging left-to-right non-overlapping."""
    units = list(tok)
    for rule in rules:
        c1, c2 = rule[0], rule[1]
        out: list[str] = []
        for u in units:
            if out and out[-1] == c1 and u == c2:
                out[-1] = rule
            else:
                out.append(u)
        units = out
    return units


def test_bpe_encode_roundtrips_and_matches_reference(spark):
    """q5t: (1) char conservation on EVERY row (n_unit_chars equals
    n_token_chars — a merge that loses or duplicates characters cannot
    pass), (2) the per-doc BPE token counts equal an independent Python
    greedy-BPE reference whose detokenization provably round-trips,
    (3) compression never inflates: n_bpe_tokens <= n_token_chars and
    >= n_ws_tokens."""
    from tf_datapipeline_spark.operators.text import _BPE_K, q5t_bpe_encode

    rows = {r.doc_id: r for r in q5t_bpe_encode(spark, SF_SMOKE).collect()}
    assert rows
    for r in rows.values():
        assert r.n_unit_chars == r.n_token_chars, r
        assert r.n_ws_tokens <= r.n_bpe_tokens <= r.n_token_chars, r
        assert r.bpe_per_char == r.n_bpe_tokens / r.n_token_chars
        assert r.bpe_per_ws_token == r.n_bpe_tokens / r.n_ws_tokens

    # independent merge-table derivation + encode for a doc sample
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    pair_counts: dict[str, int] = {}
    all_toks: dict[int, list[str]] = {}
    for d in docs:
        toks = [t for t in re.split(r"\s+", d.text.strip()) if t]
        all_toks[d.doc_id] = toks
        for t in toks:
            for i in range(len(t) - 1):
                p = t[i : i + 2]
                pair_counts[p] = pair_counts.get(p, 0) + 1
    rules = [
        p
        for p, _ in sorted(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :_BPE_K
        ]
    ]
    for d in docs[:25]:
        toks = all_toks[d.doc_id]
        n_bpe = 0
        for t in toks:
            units = _python_bpe(t, rules)
            assert "".join(units) == t  # detokenize round-trip
            n_bpe += len(units)
        r = rows[d.doc_id]
        assert r.n_ws_tokens == len(toks)
        assert r.n_bpe_tokens == n_bpe, (d.doc_id, r.n_bpe_tokens, n_bpe)
