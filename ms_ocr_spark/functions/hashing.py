"""Deterministic cross-engine hashing (Spark column expr + DuckDB SQL twin).

Spark's builtin hash/xxhash64 and DuckDB's hash() use different algorithms,
so every operator that must be oracle-checkable derives integers from md5
hex — identical in both engines:

    Spark : conv(substring(md5(s), 1, 15), 16, 10)  cast long
    DuckDB: CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)

15 hex digits < 2^60 always fits signed int64.  Used by minhash, simhash,
LSH hyperplanes and exact-dedup keys.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column | str, salt: str | None = None) -> Column:
    """60-bit non-negative int from md5(salt || ':' || col)."""
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(F.lit(f"{salt}:"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str, salt: str | None = None) -> str:
    """DuckDB twin of md5_long (expr is a SQL string expression)."""
    inner = f"concat('{salt}:', {expr})" if salt is not None else expr
    return f"CAST(concat('0x', substr(md5({inner}), 1, 15)) AS BIGINT)"


MERSENNE31 = (1 << 31) - 1


def perm_params(n: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the classic universal-hash minhash
    family h_s(x) = (a_s * x + b_s) mod (2^31 - 1)  (Broder '97).

    One md5 per shingle + n cheap integer permutations replaces n md5s per
    shingle (~16x less hashing CPU); a_s*x < 2^62 so the product is safe
    under ANSI overflow checking in both engines.  Derived from md5 so the
    Spark plan and the DuckDB oracle embed identical literals.
    """
    import hashlib

    out = []
    for s in range(n):
        a = int(hashlib.md5(f"perm:a:{s}".encode()).hexdigest()[:8], 16) % (MERSENNE31 - 1) + 1
        b = int(hashlib.md5(f"perm:b:{s}".encode()).hexdigest()[:8], 16) % MERSENNE31
        out.append((a, b))
    return out


def plane_weights(n_planes: int, dim: int, table: int = 0) -> list[list[float]]:
    """±1.0 random-hyperplane weights from md5 parity — computed once on
    the driver and embedded as literals in BOTH the Spark plan and the
    DuckDB oracle (so bucket assignment is engine-independent).

    `table` selects an independent hash table for OR-amplified multi-table
    LSH; table 0 keeps the original keys.
    """
    import hashlib

    out = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            key = f"plane:{p}:{d}" if table == 0 else f"plane:t{table}:{p}:{d}"
            h = int(hashlib.md5(key.encode()).hexdigest()[:2], 16)
            row.append(1.0 if h & 1 else -1.0)
        out.append(row)
    return out
