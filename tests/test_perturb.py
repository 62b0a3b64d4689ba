"""Speed perturbation: byte parity of the virtual-rate reuse of the
resample kernel against the per-row shared-module oracle under the same
rate swap, plus label restoration and the 1/factor duration law."""

import math

import numpy as np
import pytest
from pyspark.sql import types as T

from hydra_spark import audio
from hydra_spark.functions.perturb import PRECISION_K, speed_perturb, virtual_sr

SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr_hz", T.IntegerType(), False),
        T.StructField("codec", T.StringType(), False),
    ]
)


def _mk_rows():
    rng = np.random.default_rng(11)
    rows, i = [], 0
    for codec in audio.SUPPORTED_CODECS:
        for sr in (8000, 44100):
            for dur_ms in (0, 1, 137, 800):
                n = sr * dur_ms // 1000
                x = (rng.random(n).astype(np.float64) * 2 - 1) * 0.9
                rows.append((f"c{i:04d}", bytearray(audio.encode(x, codec)), sr, codec))
                i += 1
    rows.append(("e-null", None, 16000, "pcm16"))
    rows.append(("e-sr", bytearray(b"\x01\x02"), 0, "pcm16"))
    return rows


@pytest.mark.parametrize("factor", [0.9, 1.0, 1.1])
def test_speed_perturb_parity(spark, factor):
    rows = _mk_rows()
    df = spark.createDataFrame(rows, schema=SCHEMA).repartition(4)
    got = {r["clip_id"]: r for r in speed_perturb(df, factor).collect()}
    assert len(got) == len(rows)
    sv = virtual_sr(factor)
    for cid, buf, sr, codec in rows:
        g = got[cid]
        assert g["sr_hz"] == sr  # original label restored, error rows too
        if cid.startswith("e-"):
            assert g["resample_error"] is not None and g["bytes_out"] is None
            continue
        assert g["resample_error"] is None
        # the oracle under the same virtual-rate swap
        expected = audio.resample_clip(bytes(buf), codec, sv, PRECISION_K)
        assert bytes(g["bytes_out"]) == expected, (cid, factor)
        # duration law: n_out == ceil(n_in / factor) in exact integers
        n_in = g["n_samples_in"]
        assert g["n_samples_out"] == -((-n_in * PRECISION_K) // sv)
        if factor == 1.0:
            assert g["n_samples_out"] == n_in


def test_speed_perturb_rejects_silly_factors(spark):
    df = spark.createDataFrame([], schema=SCHEMA)
    for bad in (0.0, -1.0, 0.49, 2.01):
        with pytest.raises(ValueError):
            speed_perturb(df, bad)


def test_speed_perturb_retimes_a_sine(spark):
    """A 440 Hz second at 0.9x must come back ~1.111 s long with the
    tone at ~396 Hz — pitch and tempo move together."""
    sr = 16000
    t = np.arange(sr) / sr
    x = 0.8 * np.sin(2 * math.pi * 440.0 * t)
    df = spark.createDataFrame(
        [("s", bytearray(audio.encode(x, "pcm16")), sr, "pcm16")], schema=SCHEMA
    )
    g = speed_perturb(df, 0.9).collect()[0]
    y = np.frombuffer(bytes(g["bytes_out"]), dtype="<i2").astype(np.float64) / 32767.0
    assert abs(len(y) - sr / 0.9) <= 1
    spec = np.abs(np.fft.rfft(y))
    peak_hz = np.argmax(spec) * sr / len(y)
    assert abs(peak_hz - 440.0 * 0.9) < 2.0
