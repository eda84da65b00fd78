"""Portable 64-bit string hashing, identical across Spark SQL, DuckDB SQL
and Python.

The reference uses Knuth multiplicative hashing
(/root/reference/src/pthreads/afforest_simple.c:383) and modulo hashing
(/root/reference/src/mpi/cc_mpi.c:1092) for its hash sets; here hashing
carries more weight: url→vertex-id assignment, MinHash permutations, and
LSH banding must produce the *same* values in the engine (Spark) and the
correctness oracle (DuckDB) so the driver's value-hash compare is exact.

Construction: first 15 hex chars of md5 → non-negative int64 (60 bits).
md5 is available and bit-identical in Spark (`md5`), DuckDB (`md5`) and
Python (`hashlib.md5`); 15 hex chars keep the value < 2^60 so every
downstream modulus/linear-combination stays inside int64 without overflow
disagreement between engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, functions as F

# MinHash permutations h_i(x) = (a_i*x + b_i) mod P over a 31-bit prime
# field: operands stay < 2^31 so a*x+b < 2^63 — no int64 overflow in Spark
# or DuckDB (Python would be fine either way, but the SQL engines wrap).
MERSENNE_31 = (1 << 31) - 1


def portable_hash64_col(col: Column | str) -> Column:
    """Spark: md5-based 60-bit hash of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def portable_hash64_sql(expr: str) -> str:
    """DuckDB SQL fragment computing the identical hash of ``expr``."""
    return f"(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15))::BIGINT)"


def portable_hash64_py(s: str) -> int:
    """Python: identical hash, for per-row test oracles."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def minhash_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i(x) = (a*x + b) mod MERSENNE_31,
    with shingle value x itself reduced mod MERSENNE_31 first.

    Derived from the portable hash itself so Spark/DuckDB/Python agree on
    the permutation family without sharing state.
    """
    params = []
    for i in range(num_perm):
        a = portable_hash64_py(f"minhash-a-{seed}-{i}") % (MERSENNE_31 - 1) + 1
        b = portable_hash64_py(f"minhash-b-{seed}-{i}") % MERSENNE_31
        params.append((a, b))
    return params
