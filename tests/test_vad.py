"""VAD stage: the vectorized reshape/axis-max kernel must match the
naive per-frame oracle (vad_clip) integer-exactly on every codec, with
hand-built speech/silence patterns pinning the segment-run logic."""

import numpy as np
import pytest
from pyspark.sql import types as T

from hydra_spark import audio
from hydra_spark.functions.vad import vad_clip, vad_clips

SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr_hz", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)

SR = 8000
FLEN = SR * 20 // 1000  # 160 samples / frame


def _pattern(frames):
    """Build PCM from a frame speech-mask: speech frames are a 0.5
    burst, silent frames are zeros."""
    parts = []
    for s in frames:
        parts.append(np.full(FLEN, 0.5 if s else 0.0, dtype=np.float64))
    return np.concatenate(parts) if parts else np.empty(0)


def test_vad_known_patterns(spark):
    cases = {
        # (mask, expected (n_frames, n_speech, n_segments, longest))
        "all-silent": ([0, 0, 0, 0], (4, 0, 0, 0)),
        "all-speech": ([1, 1, 1], (3, 3, 1, 3)),
        "two-runs": ([1, 0, 1, 1, 0, 1, 1, 1], (8, 6, 3, 3)),
        "edges": ([1, 0, 0, 1], (4, 2, 2, 1)),
    }
    rows = []
    for cid, (mask, _exp) in cases.items():
        x = _pattern(mask)
        # +30 samples of sub-frame speech tail: must be IGNORED
        x = np.concatenate([x, np.full(30, 0.5)])
        rows.append((cid, bytearray(audio.encode(x, "pcm16")), SR, "pcm16"))
    rows.append(("e-null", None, SR, "pcm16"))
    rows.append(("e-odd", bytearray(b"\x01\x02\x03"), SR, "pcm16"))
    rows.append(("e-sr", bytearray(b"\x01\x02"), 0, "pcm16"))
    df = spark.createDataFrame(rows, schema=SCHEMA).repartition(2)
    got = {r.clip_id: r for r in vad_clips(df, frame_ms=20).collect()}
    for cid, (_mask, exp) in cases.items():
        g = got[cid]
        assert g.vad_error is None
        assert (g.n_frames, g.n_speech_frames, g.n_segments, g.longest_run) == exp, cid
    for cid in ("e-null", "e-odd", "e-sr"):
        assert got[cid].vad_error is not None and got[cid].n_frames is None


@pytest.mark.parametrize("codec", sorted(audio.SUPPORTED_CODECS))
def test_vad_parity_vs_per_row_oracle(spark, codec):
    rng = np.random.default_rng(17)
    rows = []
    for i, n in enumerate((0, 100, 1600, 4321)):
        # sparse bursts over silence: exercises eps boundary at G.711
        # quantization levels too
        x = np.zeros(n)
        if n:
            hot = rng.choice(n, size=max(1, n // 50), replace=False)
            x[hot] = rng.random(len(hot)) * 2 - 1
        rows.append((f"{codec}{i}", bytearray(audio.encode(x, codec)), SR, codec))
    df = spark.createDataFrame(rows, schema=SCHEMA)
    got = {r.clip_id: r for r in vad_clips(df, frame_ms=20).collect()}
    for cid, buf, sr, c in rows:
        exp = vad_clip(bytes(buf), c, sr, 20)
        g = got[cid]
        assert (g.n_frames, g.n_speech_frames, g.n_segments, g.longest_run) == exp, cid
