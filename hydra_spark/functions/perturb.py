"""Speed perturbation — the standard 3-way ASR tempo augmentation.

Speed perturbation at factor f re-times the waveform: playback speed
scales by f, so duration (and sample count) scale by 1/f while the
sample-rate LABEL is preserved — pitch and tempo shift together
(Ko et al. 2015, "Audio augmentation for speech recognition"; Kaldi's
sox `speed`). sox implements it as a resample whose ratio is f instead
of src/dst, and so do we: the ragged-vectorized resample kernel
(functions/resample.py) is reused UNCHANGED by feeding it a virtual
source rate,

    resample ratio = sr_virtual / dst = round(f * K) / K

with K a fixed precision constant, exact in integers for the standard
factors (0.9 / 1.0 / 1.1). Consequences inherited for free:

  * n_samples_out = ceil(n_in * K / round(f*K)) — pure integer
    arithmetic over octet_length, so a DuckDB oracle verifies the
    accounting end-to-end (clips_speed_perturb row);
  * interpolation positions are j * f exactly — engine bytes equal the
    shared per-row oracle (audio.resample_clip under the same rate
    swap) byte-for-byte, asserted in tests/test_perturb.py;
  * decode+perturb+encode happens BEFORE any shuffle, output emitted in
    size-bounded Arrow slices, bad rows become error rows.

Output is pcm16 at the ORIGINAL labeled rate (the augmented clip drops
back into the corpus with its sr_hz intact, as the augmentation
contract requires).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hydra_spark.functions.resample import _MAX_SLICE, resample_clips

# virtual-rate precision: round(f*K)/K == f exactly for the standard
# 1-decimal factors, and K is large enough that any f given to 6 dp is
# represented exactly
PRECISION_K = 1_000_000


def virtual_sr(factor: float) -> int:
    """The integer virtual source rate the kernel sees for ``factor``."""
    return round(factor * PRECISION_K)


def speed_perturb(
    df: DataFrame, factor: float, max_slice_bytes: int = _MAX_SLICE
) -> DataFrame:
    """bytes+codec+sr_hz -> pcm16 bytes_out re-timed by ``factor``.

    Same output surface as resample_clips (n_samples_in /
    n_samples_out / bytes_out / resample_error) with the original
    sr_hz label restored — n_samples_out = ceil(n_in / factor) up to
    the exact integer form ceil(n_in * K / round(f*K)).
    """
    if not 0.5 <= factor <= 2.0:
        # outside sox's sane speed range; also guards factor <= 0,
        # which would alias to an error-free no-op below
        raise ValueError(f"factor must be in [0.5, 2.0], got {factor}")
    sv = virtual_sr(factor)
    tagged = df.withColumn("_sr_orig", F.col("sr_hz")).withColumn(
        # non-positive rates keep their value so the kernel's sr<=0
        # error classification still fires for them
        "sr_hz",
        F.when(F.col("sr_hz") > 0, F.lit(sv)).otherwise(F.col("sr_hz")),
    )
    out = resample_clips(tagged, dst_sr=PRECISION_K, max_slice_bytes=max_slice_bytes)
    return out.withColumn("sr_hz", F.col("_sr_orig")).drop("_sr_orig")
