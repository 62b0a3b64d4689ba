"""Tier 1: codec unit tests vs the numpy oracle (SURVEY.md §5)."""

import numpy as np
import pytest

from hydra_spark import audio


@pytest.mark.parametrize("codec", audio.SUPPORTED_CODECS)
@pytest.mark.parametrize("i", [0, 7, 39, 123])
def test_roundtrip_snr(codec, i):
    x = audio.waveform(i, 8000, 500)
    buf = audio.encode(x, codec)
    y = audio.decode(buf, codec)
    assert len(y) == len(x)
    snr = audio.snr_db(x, y)
    assert snr >= 30.0, f"{codec} SNR {snr:.1f} < 30 dB"


def test_pcm16_near_lossless():
    x = audio.waveform(3, 16000, 300)
    y = audio.decode(audio.encode(x, "pcm16"), "pcm16")
    assert audio.snr_db(x, y) > 80.0


def test_decode_errors():
    with pytest.raises(ValueError):
        audio.decode(b"\x00\x01\x02", "pcm16")  # odd length
    with pytest.raises(ValueError):
        audio.decode(b"\x00\x00", "opus")  # unsupported codec
    with pytest.raises(ValueError):
        audio.decode(None, "pcm16")


def test_companding_monotone():
    x = np.linspace(-1, 1, 101).astype(np.float32)
    for codec in ("ulaw", "alaw"):
        y = audio.decode(audio.encode(x, codec), codec)
        assert np.all(np.diff(y) >= -1e-6), f"{codec} not monotone"


def test_empty_buffer():
    assert len(audio.decode(b"", "pcm16")) == 0
    assert len(audio.decode(b"", "ulaw")) == 0
