"""BS.1770 loudness: spec-table coefficient pin, FIR-vs-IIR parity,
reference sine level, gating behavior, and the Spark stage end-to-end
(functions/loudness.py) including error rows."""

import numpy as np
import pytest
from pyspark.sql import types as T

from hydra_spark import audio
from hydra_spark.functions.loudness import loudness_clips

SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr_hz", T.IntegerType(), False),
        T.StructField("codec", T.StringType(), False),
    ]
)


def test_k_weighting_matches_spec_table_at_48k():
    # ITU-R BS.1770-4, Table 1 & 2 filter coefficients at 48 kHz
    (b_s, a_s), (b_h, a_h) = audio._k_weighting_coeffs(48000)
    np.testing.assert_allclose(
        b_s, [1.53512485958697, -2.69169618940638, 1.19839281085285], atol=1e-10
    )
    np.testing.assert_allclose(
        a_s, [1.0, -1.69065929318241, 0.73248077421585], atol=1e-10
    )
    np.testing.assert_allclose(b_h, [1.0, -2.0, 1.0], atol=0)
    np.testing.assert_allclose(
        a_h, [1.0, -1.99004745483398, 0.99007225036621], atol=1e-10
    )


def test_fir_convolution_equals_direct_iir():
    """The engine's truncated-FIR FFT-convolution path must equal the
    true per-sample IIR cascade (truncation sits below float64 noise)."""
    rng = np.random.default_rng(11)
    for sr in (8000, 44100):
        x = (rng.random(int(0.7 * sr)) * 2 - 1).astype(np.float32)
        want = np.asarray(x, dtype=np.float64)
        for b, a in audio._k_weighting_coeffs(sr):
            want = audio.biquad_direct(b, a, want)
        got = audio.k_weight(x, sr)
        np.testing.assert_allclose(got, want, atol=1e-10)


def test_reference_sine_level():
    # canonical check: 0 dBFS 997 Hz sine reads -3.01 LKFS. The bilinear
    # redesign matches the spec filters exactly only at 48 kHz; at other
    # rates frequency warping shifts the shelf response a few hundredths
    # of a dB at 997 Hz, hence the looser non-48k tolerance.
    for sr, tol in ((16000, 0.05), (48000, 0.02)):
        t = np.arange(3 * sr) / sr
        x = np.sin(2 * np.pi * 997.0 * t).astype(np.float32)
        lufs, nb, ng = audio.lufs_integrated(x, sr)
        assert abs(lufs - (-3.01)) < tol
        assert nb == 1 + (3 * sr - int(0.4 * sr)) // int(0.1 * sr)
        assert ng == nb  # steady tone: nothing gated
    # -20 dB the same sine -> -23.01 LUFS (linearity)
    sr = 16000
    t = np.arange(3 * sr) / sr
    x = (0.1 * np.sin(2 * np.pi * 997.0 * t)).astype(np.float32)
    lufs, _, _ = audio.lufs_integrated(x, sr)
    assert abs(lufs - (-23.01)) < 0.05


def test_gating():
    sr = 16000
    t = np.arange(int(0.5 * sr)) / sr
    loud = np.sin(2 * np.pi * 500.0 * t) * 0.5
    # loud burst + long silence: the purely-silent blocks are gated out
    # (only burst blocks and the boundary-straddling partials remain —
    # the partials legitimately drag the level a little, per spec)
    x = np.concatenate([loud, np.zeros(4 * sr)]).astype(np.float32)
    lufs, nb, ng = audio.lufs_integrated(x, sr)
    ref, ref_nb, _ = audio.lufs_integrated(loud.astype(np.float32), sr)
    assert ng < nb
    assert ref - 3.0 < lufs <= ref + 1e-9
    # contrast with NO gating: averaging the silent blocks in would sit
    # far below the gated figure
    block, hop = int(0.4 * sr), int(0.1 * sr)
    y = audio.k_weight(x, sr)
    c = np.concatenate(([0.0], np.cumsum(y * y)))
    starts = np.arange(nb) * hop
    z = (c[starts + block] - c[starts]) / block
    ungated = -0.691 + 10 * np.log10(z.mean())
    assert lufs - ungated > 5.0
    # all-silent: every block below the absolute gate -> None
    lufs, nb, ng = audio.lufs_integrated(np.zeros(2 * sr, dtype=np.float32), sr)
    assert lufs is None and nb > 0 and ng == 0
    # shorter than one block -> None, zero blocks
    assert audio.lufs_integrated(np.zeros(100, dtype=np.float32), sr) == (None, 0, 0)


def test_loudness_stage(spark):
    rng = np.random.default_rng(13)
    rows, want = [], {}
    i = 0
    for codec in audio.SUPPORTED_CODECS:
        for sr in (8000, 44100):
            for dur_s in (0.2, 1.3):  # below and above one block
                x = ((rng.random(int(dur_s * sr)) * 2 - 1) * 0.6).astype(np.float64)
                cid = f"c{i:03d}"
                rows.append((cid, bytearray(audio.encode(x, codec)), sr, codec))
                want[cid] = audio.lufs_integrated(
                    audio.decode(bytes(rows[-1][1]), codec), sr
                )
                i += 1
    rows.append(("e-null", None, 16000, "pcm16"))
    rows.append(("e-sr", bytearray(b"\x00\x00"), 0, "pcm16"))
    # below the K-weighting floor: must be an ERROR row (the bilinear
    # shelf redesign is unstable once its corner exceeds Nyquist), not
    # a crash and not silent garbage
    rows.append(("e-lowsr", bytearray(b"\x00\x00" * 4000), 2000, "pcm16"))
    df = spark.createDataFrame(rows, schema=SCHEMA).repartition(3)
    got = {r["clip_id"]: r for r in loudness_clips(df).collect()}
    assert len(got) == len(rows)
    for cid, (l, nb, ng) in want.items():
        g = got[cid]
        assert g["decode_error"] is None
        assert (g["n_blocks"], g["n_gated"]) == (nb, ng)
        if l is None:
            assert g["lufs"] is None
        else:
            assert abs(g["lufs"] - l) < 1e-12  # shared kernel: bit-identical
    assert got["e-null"]["decode_error"] is not None
    assert got["e-sr"]["decode_error"] is not None
    assert got["e-sr"]["lufs"] is None and got["e-sr"]["n_blocks"] is None
    assert "K-weighting floor" in got["e-lowsr"]["decode_error"]
    assert got["e-lowsr"]["lufs"] is None
    # direct call below the floor raises (no NaN/garbage path)
    with pytest.raises(ValueError, match="K-weighting floor"):
        audio.lufs_integrated(np.zeros(10, dtype=np.float32), 5)
