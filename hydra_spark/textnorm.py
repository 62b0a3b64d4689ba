"""Shared transcript normalization — single code path for engine and oracle.

Byte-for-byte parity requirement (BASELINE.md "Transcript correctness"):
the engine's pandas UDF and the test oracle both call ``normalize``.

Rules (FIXTURES.md §4):
  - NFC unicode normalization
  - lowercase
  - collapse all whitespace runs (spaces, tabs, CR, LF) to one space
  - strip leading/trailing whitespace
  - empty string stays empty string (NOT null)
  - None stays None (tombstone — Hydra null payload = deletion marker,
    reference: core/src/main/scala/hydra/core/ingest/HydraRequest.scala:7)
  - punctuation kept verbatim
"""

from __future__ import annotations

import re
import unicodedata

_WS = re.compile(r"\s+")


def normalize(s: str | None) -> str | None:
    if s is None:
        return None
    s = unicodedata.normalize("NFC", s)
    s = s.lower()
    s = _WS.sub(" ", s).strip()
    return s


def normalize_series(series):
    """Vectorized-ish pandas helper used by the engine's pandas UDF."""
    return series.map(normalize, na_action="ignore")
