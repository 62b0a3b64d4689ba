"""Time-mask stage: byte parity against a per-row Python oracle,
position determinism, salt redraw, zero-length no-op, error rows."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F, types as T

from hydra_spark import audio
from hydra_spark.functions.mask import _ZERO_BYTE, time_mask

SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr_hz", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)


def _mk_rows():
    rng = np.random.default_rng(3)
    rows = []
    i = 0
    for codec in audio.SUPPORTED_CODECS:
        for n in (0, 5, 9, 1000, 4801):  # incl. mask_len==0 cases (n<10)
            x = (rng.random(n) * 2 - 1) * 0.9
            rows.append((f"c{i:03d}", bytearray(audio.encode(x, codec)), 16000, codec))
            i += 1
    rows.append(("e-null", None, 16000, "pcm16"))
    rows.append(("e-odd", bytearray(b"\x01\x02\x03"), 16000, "pcm16"))
    rows.append(("e-codec", bytearray(b"\x01\x02"), 16000, "mp3"))
    return rows


def _oracle_pos(clip_id, salt, n, ml):
    h = hashlib.md5((clip_id + salt).encode()).hexdigest()
    folded = ord(h[0]) * 16777216 + ord(h[1]) * 65536 + ord(h[2]) * 256 + ord(h[3])
    span = n - ml + 1
    return folded % span if span > 0 else 0


def _oracle_mask(buf, codec, clip_id, salt, frac_num=1, frac_den=10):
    bps = 2 if codec == "pcm16" else 1
    n = len(buf) // bps
    ml = n * frac_num // frac_den
    ms = _oracle_pos(clip_id, salt, n, ml)
    out = bytearray(buf)
    out[ms * bps : (ms + ml) * bps] = bytes([_ZERO_BYTE[codec]]) * (ml * bps)
    return ms, ml, bytes(out)


def test_time_mask_parity(spark):
    rows = _mk_rows()
    df = spark.createDataFrame(rows, schema=SCHEMA).repartition(3)
    got = {r["clip_id"]: r for r in time_mask(df, "0.1", salt="s").collect()}
    assert len(got) == len(rows)
    for cid, buf, _, codec in rows:
        g = got[cid]
        if cid.startswith("e-"):
            assert g["mask_error"] is not None and g["bytes_masked"] is None
            continue
        ms, ml, expected = _oracle_mask(buf, codec, cid, "s")
        assert g["mask_error"] is None
        assert (g["mask_start"], g["mask_len"]) == (ms, ml), cid
        assert bytes(g["bytes_masked"]) == expected, (cid, codec)
        if ml == 0:  # short clip: pass-through, byte-identical
            assert bytes(g["bytes_masked"]) == bytes(buf)


def test_time_mask_salt_redraws_position(spark):
    rows = [r for r in _mk_rows() if not r[0].startswith("e-")]
    df = spark.createDataFrame(rows, schema=SCHEMA)
    a = {r["clip_id"]: r["mask_start"] for r in time_mask(df, "0.1", salt="a").collect()}
    b = {r["clip_id"]: r["mask_start"] for r in time_mask(df, "0.1", salt="b").collect()}
    moved = [c for c in a if a[c] != b[c]]
    assert moved  # different salt -> different epoch of mask positions
    # and each salt is itself deterministic across runs/partitionings
    a2 = {
        r["clip_id"]: r["mask_start"]
        for r in time_mask(df.repartition(7), "0.1", salt="a").collect()
    }
    assert a2 == a


def test_time_mask_validates_frac(spark):
    df = spark.createDataFrame([], schema=SCHEMA)
    with pytest.raises(ValueError):
        time_mask(df, mask_frac="1")
    with pytest.raises(ValueError):
        time_mask(df, mask_frac="-0.1")


def test_time_mask_silences_energy(spark):
    """Semantic check: the masked span decodes to (quantizer) silence —
    rms over the masked region is at/near the codec's zero level."""
    x = np.ones(4000) * 0.5
    buf = audio.encode(x, "pcm16")
    df = spark.createDataFrame([("a", bytearray(buf), 16000, "pcm16")], schema=SCHEMA)
    g = time_mask(df, "0.25", salt="z").collect()[0]
    pcm = np.frombuffer(bytes(g["bytes_masked"]), dtype="<i2")
    s, l = g["mask_start"], g["mask_len"]
    assert l == 1000 and np.all(pcm[s : s + l] == 0)
    assert np.all(pcm[: s] != 0) and np.all(pcm[s + l :] != 0)


def test_freq_mask_geometry_and_passthrough(spark):
    """freq_mask: exactly mask_bands consecutive entries floored at the
    deterministic per-clip position, every other entry bit-identical,
    and a salt change redraws positions without touching geometry."""
    from hydra_spark.functions.mask import freq_mask

    n_mels = 8
    rows = [(f"f{i:02d}", [float(-10 * b - i) for b in range(n_mels)]) for i in range(40)]
    schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType(), False),
            T.StructField("mel_db", T.ArrayType(T.DoubleType()), True),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    got = {
        r["clip_id"]: r
        for r in freq_mask(df, n_mels=n_mels, mask_bands=2, salt="v1").collect()
    }
    starts = set()
    for cid, orig in rows:
        r = got[cid]
        s = r["mask_band_start"]
        assert s == _oracle_pos(cid, "v1", n_mels, 2)
        starts.add(s)
        for b in range(n_mels):
            want = -120.0 if s <= b < s + 2 else orig[b]
            assert r["mel_db_masked"][b] == want, (cid, b)
    assert len(starts) > 1  # positions actually vary across clips

    redraw = {
        r["clip_id"]: r["mask_band_start"]
        for r in freq_mask(df, n_mels=n_mels, mask_bands=2, salt="v2").collect()
    }
    assert any(redraw[c] != got[c]["mask_band_start"] for c, _ in rows)

    with pytest.raises(ValueError):
        freq_mask(df, n_mels=n_mels, mask_bands=0)
    with pytest.raises(ValueError):
        freq_mask(df, n_mels=n_mels, mask_bands=9)


def test_freq_mask_n_mels_mismatch_fails_loudly(spark):
    """A caller-supplied n_mels that disagrees with the actual feature
    array length must raise at execution (silent mis-scoping of the
    mask is worse than a crash); NULL feature arrays pass through with
    a NULL mask position."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from hydra_spark.functions.mask import freq_mask

    schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType(), False),
            T.StructField("mel_db", T.ArrayType(T.DoubleType()), True),
        ]
    )
    bad = spark.createDataFrame(
        [("ok0", [0.0] * 8), ("short", [0.0] * 5)], schema
    )
    with pytest.raises(SparkRuntimeException, match="n_mels=8"):
        freq_mask(bad, n_mels=8, mask_bands=2).collect()

    with_null = spark.createDataFrame(
        [("ok0", [float(-b) for b in range(8)]), ("isnull", None)], schema
    )
    rows = {r["clip_id"]: r for r in freq_mask(with_null, n_mels=8, mask_bands=2).collect()}
    assert rows["isnull"]["mask_band_start"] is None
    assert rows["isnull"]["mel_db_masked"] is None
    assert rows["ok0"]["mask_band_start"] is not None
