"""FIXTURES.md §4 byte-for-byte normalization parity cases."""

import unicodedata

from hydra_spark import textnorm


CASES = [
    ("  hello world  ", "hello world"),
    ("a   b", "a b"),
    ("HeLLo", "hello"),
    ("cafe\u0301", "caf\u00e9"),  # NFD -> NFC
    ("a\r\n\tb", "a b"),
    ("", ""),
    (None, None),
    ("don't stop.", "don't stop."),
]


def test_normalize_cases():
    for raw, expected in CASES:
        got = textnorm.normalize(raw)
        assert got == expected, f"{raw!r} -> {got!r}, want {expected!r}"
        if got is not None:
            assert got == unicodedata.normalize("NFC", got)


def test_idempotent():
    for raw, _ in CASES:
        once = textnorm.normalize(raw)
        assert textnorm.normalize(once) == once
