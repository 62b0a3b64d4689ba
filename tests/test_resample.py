"""Resample stage: byte-for-byte parity of the ragged-vectorized engine
path (functions/resample.py) against the per-row shared-module oracle
(audio.resample_clip), plus error-row semantics and sample accounting."""

import numpy as np
import pytest
from pyspark.sql import functions as F, types as T

from hydra_spark import audio
from hydra_spark.functions.resample import resample_clips

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
    # every codec x every (src, dst) direction: down, up, identity, and
    # the non-integer-ratio pairs (22050/44100 -> 16000)
    for codec in audio.SUPPORTED_CODECS:
        for sr in (8000, 16000, 22050, 44100):
            for dur_ms in (0, 1, 137, 800):
                n = sr * dur_ms // 1000
                x = (rng.random(n).astype(np.float64) * 2 - 1) * 0.9
                rows.append((f"c{i:04d}", bytearray(audio.encode(x, codec)), sr, codec))
                i += 1
    # error rows: null bytes, odd pcm16, unknown codec, bad sr
    rows.append(("e-null", None, 16000, "pcm16"))
    rows.append(("e-odd", bytearray(b"\x01\x02\x03"), 16000, "pcm16"))
    rows.append(("e-codec", bytearray(b"\x01\x02"), 16000, "mp3"))
    rows.append(("e-sr", bytearray(b"\x01\x02"), 0, "pcm16"))
    return rows


@pytest.mark.parametrize("dst_sr", [16000, 8000, 44100])
def test_resample_parity(spark, dst_sr):
    rows = _mk_rows()
    df = spark.createDataFrame(rows, schema=SCHEMA).repartition(4)
    got = {
        r["clip_id"]: r
        for r in resample_clips(df, dst_sr=dst_sr).collect()
    }
    assert len(got) == len(rows)
    for cid, buf, sr, codec in rows:
        g = got[cid]
        if cid.startswith("e-"):
            assert g["resample_error"] is not None
            assert g["n_samples_in"] is None and g["n_samples_out"] is None
            assert g["bytes_out"] is None
            continue
        assert g["resample_error"] is None
        expected = audio.resample_clip(bytes(buf), codec, sr, dst_sr)
        assert bytes(g["bytes_out"]) == expected, (cid, codec, sr, dst_sr)
        n_in = len(buf) // 2 if codec == "pcm16" else len(buf)
        assert g["n_samples_in"] == n_in
        assert g["n_samples_out"] == (n_in * dst_sr + sr - 1) // sr
        assert len(g["bytes_out"]) == 2 * g["n_samples_out"]


def test_resample_identity_within_quantizer_pcm16(spark):
    """sr == dst_sr on pcm16: interp positions land on integers, so the
    only error is the decode->re-encode quantizer (float32 /32767 then
    truncating *32767) — at most 1 LSB per sample, ~90 dB SNR."""
    rng = np.random.default_rng(11)
    x = (rng.random(4000).astype(np.float64) * 2 - 1) * 0.9
    buf = audio.encode(x, "pcm16")
    df = spark.createDataFrame([("a", bytearray(buf), 16000, "pcm16")], schema=SCHEMA)
    out = resample_clips(df, dst_sr=16000).collect()[0]
    got = np.frombuffer(bytes(out["bytes_out"]), dtype="<i2")
    ref = np.frombuffer(buf, dtype="<i2")
    assert len(got) == len(ref)
    assert int(np.abs(got.astype(np.int32) - ref.astype(np.int32)).max()) <= 1
    assert audio.snr_db(ref / 32767.0, got / 32767.0) >= 80.0


def test_resample_sliced_output_matches_single_slice(spark):
    """Output-bounded slicing (the int32-offset-overflow guard): forcing
    a tiny max_slice_bytes makes one input batch emit many RecordBatches;
    rows must be identical to the single-slice path, error rows included."""
    rows = _mk_rows()
    df = spark.createDataFrame(rows, schema=SCHEMA).coalesce(1)
    base = {r["clip_id"]: r for r in resample_clips(df, dst_sr=44100).collect()}
    sliced = {
        r["clip_id"]: r
        for r in resample_clips(df, dst_sr=44100, max_slice_bytes=4096).collect()
    }
    assert set(base) == set(sliced)
    for cid in base:
        b, s = base[cid], sliced[cid]
        assert b["resample_error"] == s["resample_error"], cid
        assert b["n_samples_out"] == s["n_samples_out"], cid
        assert (b["bytes_out"] is None) == (s["bytes_out"] is None), cid
        if b["bytes_out"] is not None:
            assert bytes(b["bytes_out"]) == bytes(s["bytes_out"]), cid


def test_mixed_null_and_unknown_codec_batch(spark):
    """A batch mixing codec=NULL with an unknown string codec must yield
    error rows, not a numpy sort TypeError that kills the task (shared
    _classify_errors contract — decode / resample / spectral)."""
    from hydra_spark.functions.decode import decode_features
    from hydra_spark.functions.spectral import spectral_clips

    schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), True),
            T.StructField("sr_hz", T.IntegerType(), True),
            T.StructField("codec", T.StringType(), True),
        ]
    )
    ok_buf = bytearray(audio.encode(np.zeros(16), "pcm16"))
    rows = [
        ("a", ok_buf, 16000, "pcm16"),
        ("b", bytearray(b"\x01\x02"), 16000, None),
        ("c", bytearray(b"\x01\x02"), 16000, "mp3"),
    ]
    df = spark.createDataFrame(rows, schema=schema).coalesce(1)
    for fn, err_col in (
        (lambda d: resample_clips(d), "resample_error"),
        (decode_features, "decode_error"),
        (spectral_clips, "decode_error"),
    ):
        got = {r["clip_id"]: r for r in fn(df).collect()}
        assert got["a"][err_col] is None
        assert "unsupported codec" in got["b"][err_col]
        assert "unsupported codec: mp3" in got["c"][err_col]


def test_resample_shared_oracle_properties():
    """The shared definition itself: duration preserved, clamped tail,
    linearity on a ramp (interior points exact)."""
    x = np.linspace(-0.5, 0.5, 441, dtype=np.float32)
    y = audio.resample_linear(x, 44100, 16000)
    assert len(y) == (441 * 16000 + 44099) // 44100
    # a downsampled linear ramp stays on the ramp
    pos = np.minimum(np.arange(len(y)) * (44100 / 16000), 440.0)
    np.testing.assert_allclose(y, -0.5 + pos / 440.0, atol=1e-6)
    assert len(audio.resample_linear(np.empty(0, np.float32), 8000, 16000)) == 0
