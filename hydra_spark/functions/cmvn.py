"""Corpus mean-variance normalization (CMVN) of feature vectors.

The classic speech-pipeline normalization applied to filterbank/MFCC
features before training: per feature band, subtract the corpus mean
and divide by the corpus standard deviation, grouped so that corpora
mixing sample rates normalize per rate (band center frequencies differ
across rates, so cross-rate pooling would be wrong).

Scale shape — the textbook two-pass global-statistics pattern:

  pass 1  ONE hash aggregate over (group, band) with map-side partials;
          the stats table is O(groups × bands) — metadata-scale at any
          corpus size.
  pass 2  broadcast the stats table back onto the (exploded) feature
          rows and normalize with JVM arithmetic — no second shuffle of
          the data, no Python in the hot path.

Population std (stddev_pop) so engine and SQL oracles agree exactly;
zero-variance bands normalize to 0.0 (a constant band carries no
information — emitting NULL/inf would poison downstream training).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cmvn_normalize(
    df: DataFrame,
    feat_col: str,
    id_col: str = "clip_id",
    group_cols: tuple[str, ...] = ("sr_hz",),
) -> DataFrame:
    """Long-form CMVN: explode ``feat_col`` (array<double>) to
    (id, *group, band, value), compute per-(group, band) mean/std in
    one aggregate, broadcast-join back, and return rows with the
    normalized value alongside the corpus stats that produced it."""
    bands = df.select(
        F.col(id_col), *group_cols, F.posexplode(feat_col).alias("band", "value")
    )
    keys = [*group_cols, "band"]
    stats = bands.groupBy(*keys).agg(
        F.avg("value").alias("band_mean"),
        F.stddev_pop("value").alias("band_std"),
    )
    norm = F.when(
        F.col("band_std") > 0,
        (F.col("value") - F.col("band_mean")) / F.col("band_std"),
    ).otherwise(F.lit(0.0))
    return bands.join(F.broadcast(stats), keys).select(
        id_col, *group_cols, "band", "value", norm.alias("norm_value")
    )
