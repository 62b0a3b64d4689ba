"""Deterministic, key-stable dataset splitting and sampling.

A training pipeline must assign every document to train/val/test (and
draw per-stratum samples) such that (a) the assignment is a PURE
FUNCTION of the record key — re-running the pipeline, adding data, or
changing cluster size never moves a record across splits (leakage), and
(b) no shuffle or state is involved. Spark's ``randomSplit``/``sampleBy``
are seed-random per-task and NOT key-stable; the standard fix (used by
every large-scale corpus pipeline) is hash-thresholding: md5(key) as a
uniform 128-bit draw compared against exact integer thresholds.

Spark shape: a single projection — the split column is
``md5(cast(key as string))`` compared against hex literals, entirely
whole-stage-codegen JVM expressions. The DuckDB oracle mirrors it
character-for-character (md5 hex is lowercase in both engines), so
membership itself is oracle-checked, not just the counts.

Thresholds are exact: weights are converted through ``Fraction`` and
scaled to 2^128, so engine and oracle share the identical literal and
no float rounding can disagree at a boundary hash.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, Window as W, functions as F


def hex_threshold(frac) -> str:
    """Exact 32-hex-char threshold: md5_hex < hex_threshold(f) holds for
    a fraction f of uniform hashes (md5 interpreted as a 128-bit int)."""
    fr = Fraction(str(frac))
    if not 0 <= fr <= 1:
        raise ValueError(f"fraction must be in [0, 1], got {frac}")
    if fr == 1:
        # 2^128 needs 33 hex chars, which would break the lexicographic
        # compare; "g" sorts after every lowercase hex string instead
        return "g"
    return format(int(fr * (1 << 128)), "032x")


def _key_hash(key_col: str, salt: str = ""):
    """Lowercase md5 hex of the record key (+optional salt, so distinct
    uses draw independent hashes from the same key). NULL keys hash via
    a fixed sentinel: md5(NULL) is NULL, which would make every split
    condition NULL and silently route all NULL-key rows to whichever
    branch happens to be last (dict-order dependent) — NULL keys must
    instead behave as ONE deterministic key (all land in the same split,
    survive frac-1 strata), keeping the assignment a pure function of
    the key."""
    key = F.coalesce(F.col(key_col).cast("string"), F.lit("\x00hydra-null-key\x00"))
    return F.md5(F.concat(key, F.lit(salt)).cast("binary"))


def hash_split(
    df: DataFrame,
    weights: dict[str, object],
    key_col: str,
    out_col: str = "split",
    salt: str = "",
) -> DataFrame:
    """Assign every row to a named split, key-stable and exact.

    ``weights`` maps split name -> fraction; fractions must sum to 1
    (checked exactly via Fraction). Assignment order follows dict order:
    cumulative thresholds t_1 < t_2 < ... ; row goes to the first split
    whose threshold exceeds its hash."""
    fracs = [(name, Fraction(str(w))) for name, w in weights.items()]
    if sum(f for _, f in fracs) != 1:
        raise ValueError(f"split weights must sum to exactly 1, got {weights}")
    h = _key_hash(key_col, salt)
    cum = Fraction(0)
    expr = None
    for name, f in fracs[:-1]:
        cum += f
        cond = h < F.lit(hex_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = fracs[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    fractions: dict[object, object],
    group_col: str,
    key_col: str,
    default: object = 0,
    salt: str = "",
) -> DataFrame:
    """Keep a key-stable deterministic sample per stratum: row survives
    iff md5(key||salt) < threshold(fractions[group]). The deterministic
    analog of ``sampleBy`` — same rows survive on every run, any
    partitioning, any cluster size. Groups absent from ``fractions``
    use ``default`` (0 = dropped)."""
    h = _key_hash(key_col, salt)
    expr = None
    for g, frac in fractions.items():
        cond = F.col(group_col).eqNullSafe(F.lit(g))
        thr = F.lit(hex_threshold(frac))
        expr = F.when(cond, h < thr) if expr is None else expr.when(cond, h < thr)
    fallback = (h < F.lit(hex_threshold(default))) if default else F.lit(False)
    expr = fallback if expr is None else expr.otherwise(fallback)
    return df.where(expr)


def balanced_sample(
    df: DataFrame,
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Balance strata to the smallest stratum's size, key-stable.

    The corpus-mixing step of a multi-source training pipeline at
    temperature alpha=0 (uniform mixing WITHOUT replacement): every
    stratum is downsampled to exactly n_min = min stratum count, so the
    mixed corpus weights all sources equally. Selection is by md5-hash
    RANK within the stratum — keep the n_min smallest hashes — which is
    (a) a pure function of the keys present (no seed, no partitioning
    dependence) and (b) consistent with the threshold samplers above:
    the kept set IS the prefix of the same uniform hash order that
    ``stratified_sample`` thresholds into.

    Shape: one metadata-scale counts aggregate (1-row min broadcast
    back) + one rank window per stratum. The per-stratum sort is the
    EXACT form; at 10^12 rows a dominant stratum serializes into one
    window task — the documented swap is threshold selection seeded by
    an approximate hash quantile at rank n_min (same exact->approx swap
    as order_value_deciles), identical output up to quantile error.
    Non-exported intermediate columns are underscore-prefixed and
    dropped.
    """
    h = _key_hash(key_col, salt)
    counts = df.groupBy(group_col).agg(F.count("*").alias("_c"))
    n_min = counts.agg(F.min("_c").alias("_n_min"))
    rk = F.row_number().over(
        # hash order; key tiebreak makes collisions (never observed,
        # but cheap) deterministic too
        W.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    )
    return (
        df.withColumn("_rk", rk)
        .crossJoin(F.broadcast(n_min))
        .where(F.col("_rk") <= F.col("_n_min"))
        .drop("_rk", "_n_min")
    )
