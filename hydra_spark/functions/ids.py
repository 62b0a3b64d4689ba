"""Correlation ids — Hydra's Base62 id builder as engine scalars.

Reference: common/src/main/scala/hydra/common/util/Base62.scala used by
core/src/main/scala/hydra/core/ingest/CorrelationIdBuilder.scala:7-13 —
a compact base-62 encoding of a numeric id attached to every request.

Two forms:
  * ``base62`` — exact Hydra alphabet semantics (0-9A-Za-z), pure
    Python; used driver-side for run/correlation ids (never in the
    per-row hot path).
  * ``correlation_id_col`` — JVM-side per-row variant via ``conv``
    (base-36: the largest radix Spark's and ANSI SQL's base-conversion
    functions share); stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

ALPHABET = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"


def base62(n: int) -> str:
    """Hydra Base62.encode semantics: non-negative int -> compact id."""
    if n < 0:
        raise ValueError("base62 requires a non-negative integer")
    if n == 0:
        return ALPHABET[0]
    out = []
    while n:
        n, r = divmod(n, 62)
        out.append(ALPHABET[r])
    return "".join(reversed(out))


def base62_decode(s: str) -> int:
    n = 0
    for ch in s:
        n = n * 62 + ALPHABET.index(ch)
    return n


def correlation_id_col(num_col: Column | str, prefix: str = "") -> Column:
    """Per-row compact id, JVM-side: conv(id, 10, 36)."""
    c = F.col(num_col) if isinstance(num_col, str) else num_col
    enc = F.conv(c.cast("string"), 10, 36)
    return F.concat(F.lit(prefix), enc) if prefix else enc
