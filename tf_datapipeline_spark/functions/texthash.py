"""Cross-engine deterministic string hashing.

Dedup operators (MinHash, SimHash) need a string→uint32 hash that Spark
and the DuckDB oracle compute identically. Engine-native hashes
(xxhash64, duckdb hash()) differ, so we build one from primitives both
engines share bit-for-bit: md5 hex + instr-based hex-digit decoding.

    hash32(s) = int(md5(s)[:8], 16)

expressed as SUM over 8 hex digits of (instr('0123456789abcdef', digit)-1)
* 16^(8-i). The same SQL text parses in Spark SQL and DuckDB, so the Spark
side just wraps it in F.expr — one definition, two engines.

At 100 TB this is still executor-side, codegen-compatible scalar work (md5
+ fixed arithmetic), embarrassingly parallel; k MinHash permutations reuse
ONE md5 per shingle via (a_k * h + b_k) mod p universal hashing.
"""

from __future__ import annotations

# Mersenne prime 2^31 - 1: universal-hash modulus; (a*h+b) stays < 2^63.
MERSENNE = 2147483647

# Deterministic (a_k, b_k) pairs for the k MinHash permutations, from a
# fixed LCG (seed constants are arbitrary but frozen: the signature is
# part of the operator's contract).
def minhash_params(k: int, seed: int = 7) -> list[tuple[int, int]]:
    params = []
    state = seed
    for _ in range(k):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        a = state % (MERSENNE - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        b = state % MERSENNE
        params.append((a, b))
    return params


def sql_hash32(expr: str) -> str:
    """SQL (valid in BOTH Spark SQL and DuckDB) computing
    int(md5(expr)[:8], 16) as BIGINT."""
    return sql_hash32_from_md5(f"md5({expr})")


def sql_hash32_from_md5(md5_expr: str) -> str:
    """hash32 from an already-computed md5 hex column — use this when the
    md5 can be projected once in an inner SELECT (the digit extraction
    references the digest 8 times; inlining md5() would recompute it 8×
    unless the engine's CSE catches it)."""
    terms = []
    for i in range(1, 9):
        digit = f"substr({md5_expr}, {i}, 1)"
        val = f"CAST(instr('0123456789abcdef', {digit}) - 1 AS BIGINT)"
        terms.append(f"{val} * {16 ** (8 - i)}")
    return "(" + " + ".join(terms) + ")"


def sql_hash32_dialect(expr: str, dialect: str) -> str:
    """hash32 with the cheapest expression per engine. Spark has conv()
    (hex string -> bigint in one JVM intrinsic, ~8x fewer expression nodes
    than the digit decode); DuckDB lacks conv, so the oracle keeps the
    shared instr arithmetic. Equality of the two forms is asserted in
    tests (same md5 prefix, same integer)."""
    if dialect == "spark":
        return f"CAST(conv(substr(md5({expr}), 1, 8), 16, 10) AS BIGINT)"
    return sql_hash32(expr)


def sql_hash32_from_md5_dialect(md5_expr: str, dialect: str) -> str:
    """Like sql_hash32_dialect, over an already-projected md5 hex column."""
    if dialect == "spark":
        return f"CAST(conv(substr({md5_expr}, 1, 8), 16, 10) AS BIGINT)"
    return sql_hash32_from_md5(md5_expr)


def sql_hash60_from_md5_dialect(md5_expr: str, dialect: str) -> str:
    """60-bit integer from the first 15 hex digits of an already-projected
    md5 digest — the wide-keyspace variant for operators whose distinct-key
    universe can approach 2^32 at 100 TB, where a 32-bit space saturates
    (KMV bottom-k order statistics, corpus-wide gram join keys — r7
    advisor). 15 hex digits keep the value < 2^60, safely inside signed
    BIGINT arithmetic in both engines. Spark spells it conv(); DuckDB
    keeps the shared instr digit arithmetic (pass a PROJECTED md5 column:
    the decode references the digest 15 times)."""
    if dialect == "spark":
        return f"CAST(conv(substr({md5_expr}, 1, 15), 16, 10) AS BIGINT)"
    terms = []
    for i in range(15):
        digit = f"substr({md5_expr}, {1 + i}, 1)"
        val = f"CAST(instr('0123456789abcdef', {digit}) - 1 AS BIGINT)"
        terms.append(f"{val} * {16 ** (14 - i)}")
    return "(" + " + ".join(terms) + ")"


def sql_hash32_from_md5_at(md5_expr: str, start: int, dialect: str) -> str:
    """32-bit integer from an 8-hex-digit window of an md5 digest starting
    at 1-based offset `start` — lets one md5 computation yield several
    independent hash values (Bloom double-hashing uses windows 1 and 9).
    Spark spells it conv(); DuckDB keeps the instr digit arithmetic."""
    if dialect == "spark":
        return f"CAST(conv(substr({md5_expr}, {start}, 8), 16, 10) AS BIGINT)"
    terms = []
    for i in range(8):
        digit = f"substr({md5_expr}, {start + i}, 1)"
        val = f"CAST(instr('0123456789abcdef', {digit}) - 1 AS BIGINT)"
        terms.append(f"{val} * {16 ** (7 - i)}")
    return "(" + " + ".join(terms) + ")"


def sql_minhash_perm(h_expr: str, a: int, b: int) -> str:
    """One universal-hash permutation of a 32-bit hash value. The input is
    reduced mod the Mersenne prime first so a*h stays under 2^62 (Spark
    runs ANSI mode: BIGINT overflow is an error, not a wrap)."""
    return f"(({a} * ({h_expr} % {MERSENNE}) + {b}) % {MERSENNE})"
