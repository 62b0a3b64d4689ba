"""Mel filterbank stage: batched-2D-rfft + per-rate GEMM engine path
(functions/mel.py) vs the per-row shared definition (audio.mel_energies),
including short/empty/silent windows, error rows, and filterbank shape
invariants."""

import numpy as np
from pyspark.sql import types as T

from hydra_spark import audio
from hydra_spark.functions.mel import mel_clips

SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr_hz", T.IntegerType(), False),
        T.StructField("codec", T.StringType(), False),
    ]
)


def _mk_rows():
    rng = np.random.default_rng(7)
    rows = []
    i = 0
    for codec in audio.SUPPORTED_CODECS:
        for sr in (8000, 16000, 22050, 44100):
            # shorter than, equal to, and longer than the N_FFT window
            for n in (0, 3, 500, audio.N_FFT, 5000):
                x = ((rng.random(n) * 2 - 1) * 0.8).astype(np.float64)
                rows.append((f"c{i:04d}", bytearray(audio.encode(x, codec)), sr, codec))
                i += 1
    sr = 16000
    # pure 1 kHz tone: the band containing 1 kHz must carry the max energy
    t = np.arange(4 * audio.N_FFT) / sr
    tone = 0.7 * np.sin(2 * np.pi * 1000.0 * t)
    rows.append(("tone", bytearray(audio.encode(tone, "pcm16")), sr, "pcm16"))
    # all-silent window -> every band at the -120 dB floor
    rows.append(("silent", bytearray(audio.encode(np.zeros(2000), "pcm16")), sr, "pcm16"))
    # error rows
    rows.append(("e-null", None, sr, "pcm16"))
    rows.append(("e-odd", bytearray(b"\x01\x02\x03"), sr, "pcm16"))
    rows.append(("e-codec", bytearray(b"\x01\x02"), sr, "opus"))
    return rows


def test_filterbank_shape_and_coverage():
    for sr in (8000, 44100):
        fb = audio.mel_filterbank(sr)
        assert fb.shape == (audio.N_MELS, audio.N_FFT // 2 + 1)
        assert float(fb.min()) >= 0.0
        # adjacent triangles overlap: every interior bin is covered
        cov = fb.sum(axis=0)
        assert (cov[1:-1] > 0.0).all()
        # each band peaks at (or adjacent to) its own center
        centers = np.argmax(fb, axis=1)
        assert (np.diff(centers) > 0).all()


def test_mel_parity(spark):
    rows = _mk_rows()
    df = spark.createDataFrame(rows, schema=SCHEMA).repartition(4)
    got = {r["clip_id"]: r for r in mel_clips(df).collect()}
    assert len(got) == len(rows)
    for cid, buf, sr, codec in rows:
        g = got[cid]
        if cid.startswith("e-"):
            assert g["decode_error"] is not None
            assert g["n_samples"] is None and g["mel_db"] is None
            continue
        assert g["decode_error"] is None
        x = audio.decode(bytes(buf), codec)
        want = audio.mel_energies(x, sr)
        if want is None:
            assert g["mel_db"] is None
            continue
        assert len(g["mel_db"]) == audio.N_MELS
        np.testing.assert_allclose(
            np.asarray(g["mel_db"]), want, rtol=0, atol=1e-9,
            err_msg=f"{cid} ({codec}@{sr})",
        )
    # tone: max band is the one whose filter covers 1 kHz
    fb = audio.mel_filterbank(16000)
    bin_1k = int(round(1000.0 / (16000.0 / audio.N_FFT)))
    assert int(np.argmax(got["tone"]["mel_db"])) == int(np.argmax(fb[:, bin_1k]))
    # silent: every band at the floor
    np.testing.assert_allclose(
        np.asarray(got["silent"]["mel_db"]), -120.0, atol=1e-9
    )


def test_mel_nonpositive_sr(spark):
    x = np.sin(np.arange(800) / 10.0) * 0.5
    df = spark.createDataFrame(
        [("z", bytearray(audio.encode(x, "pcm16")), 0, "pcm16")], schema=SCHEMA
    )
    r = mel_clips(df).collect()[0]
    # undecided rate: not an error, but no filterbank -> NULL bands
    assert r["decode_error"] is None and r["mel_db"] is None
    assert r["n_samples"] == 800


def test_cmvn_normalize_stats_and_zero_variance(spark):
    """CMVN: normalized bands have mean 0 / pop-std 1 per group;
    a zero-variance band maps to 0.0, not NULL/inf; grouping keys
    keep groups independent."""
    import numpy as np

    from hydra_spark.functions.cmvn import cmvn_normalize

    rows = [
        # group 8000: band0 varies, band1 constant (zero variance)
        ("a", 8000, [1.0, 5.0]),
        ("b", 8000, [3.0, 5.0]),
        ("c", 8000, [8.0, 5.0]),
        # group 16000: different stats entirely
        ("d", 16000, [100.0, -2.0]),
        ("e", 16000, [104.0, 2.0]),
    ]
    df = spark.createDataFrame(rows, "clip_id string, sr_hz int, feats array<double>")
    out = cmvn_normalize(df, "feats").collect()
    got = {(r.clip_id, r.band): r.norm_value for r in out}

    v = np.array([1.0, 3.0, 8.0])
    exp = (v - v.mean()) / v.std()
    for cid, e in zip("abc", exp):
        assert abs(got[(cid, 0)] - e) < 1e-12
    assert got[("a", 1)] == got[("b", 1)] == got[("c", 1)] == 0.0
    assert abs(got[("d", 0)] + 1.0) < 1e-12 and abs(got[("e", 0)] - 1.0) < 1e-12
    for g, n_bands in ((8000, 2), (16000, 2)):
        for band in range(n_bands):
            vals = [r.norm_value for r in out if r.sr_hz == g and r.band == band]
            assert abs(sum(vals)) < 1e-9
