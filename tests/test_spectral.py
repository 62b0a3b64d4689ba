"""Spectral stage: batched-2D-rfft engine path (functions/spectral.py)
vs the per-row shared definition (audio.spectral_features), including
short/empty/silent windows and error rows."""

import numpy as np
from pyspark.sql import types as T

from hydra_spark import audio
from hydra_spark.functions.spectral import spectral_clips

SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr_hz", T.IntegerType(), False),
        T.StructField("codec", T.StringType(), False),
    ]
)


def _mk_rows():
    rng = np.random.default_rng(5)
    rows, raw = [], {}
    i = 0
    for codec in audio.SUPPORTED_CODECS:
        for sr in (8000, 22050, 44100):
            # shorter than, equal to, and longer than the N_FFT window
            for n in (0, 3, 500, audio.N_FFT, 5000):
                x = ((rng.random(n) * 2 - 1) * 0.8).astype(np.float64)
                rows.append((f"c{i:04d}", bytearray(audio.encode(x, codec)), sr, codec))
                i += 1
    # pure tone: dominant bin must sit at the tone frequency
    sr = 16000
    t = np.arange(4 * audio.N_FFT) / sr
    tone = 0.7 * np.sin(2 * np.pi * 1000.0 * t)
    rows.append(("tone", bytearray(audio.encode(tone, "pcm16")), sr, "pcm16"))
    # all-silent window -> NULL features
    rows.append(("silent", bytearray(audio.encode(np.zeros(2000), "pcm16")), sr, "pcm16"))
    # error rows
    rows.append(("e-null", None, sr, "pcm16"))
    rows.append(("e-odd", bytearray(b"\x01\x02\x03"), sr, "pcm16"))
    rows.append(("e-codec", bytearray(b"\x01\x02"), sr, "opus"))
    return rows


def test_spectral_parity(spark):
    rows = _mk_rows()
    df = spark.createDataFrame(rows, schema=SCHEMA).repartition(4)
    got = {r["clip_id"]: r for r in spectral_clips(df).collect()}
    assert len(got) == len(rows)
    for cid, buf, sr, codec in rows:
        g = got[cid]
        if cid.startswith("e-"):
            assert g["decode_error"] is not None
            assert g["n_samples"] is None
            assert g["centroid_hz"] is None and g["dominant_hz"] is None
            continue
        assert g["decode_error"] is None
        x = audio.decode(bytes(buf), codec)
        cen, dom = audio.spectral_features(x, sr)
        if cen is None:
            assert g["centroid_hz"] is None and g["dominant_hz"] is None
        else:
            # same elementwise ops -> bit-identical (verified); pin tight
            assert abs(g["centroid_hz"] - cen) <= 1e-12 * max(1.0, abs(cen)), cid
            assert g["dominant_hz"] == dom, cid
        n_expect = len(buf) // 2 if codec == "pcm16" else len(buf)
        assert g["n_samples"] == n_expect


def test_spectral_tone_lands_on_bin():
    sr, f0 = 16000, 1000.0
    t = np.arange(4 * audio.N_FFT) / sr
    x = (0.7 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    cen, dom = audio.spectral_features(x, sr)
    bin_hz = sr / audio.N_FFT
    assert abs(dom - f0) <= bin_hz  # 1000 Hz isn't exactly on a bin
    assert abs(cen - f0) < 100.0  # leakage keeps the centroid near the tone
