"""Unit-suffix parsing for sized specs and page sizes.

Reference semantics: utils/UnitConversions.java, used by sized-profile
expansion (layoutv2/DSSizedExpander.java:31-43) — ``10m`` = 10,000,000
records, ``4G`` bytes, etc. Driver-side pure Python (no Spark involvement).
"""

from __future__ import annotations

import re

_MULT = {
    "": 1,
    "k": 10**3,
    "m": 10**6,
    "g": 10**9,
    "t": 10**12,
    "ki": 2**10,
    "mi": 2**20,
    "gi": 2**30,
    "ti": 2**40,
}

_RX = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*([kKmMgGtT][iI]?|)[bB]?\s*$")


def parse_unit_count(text: str | int | float) -> int:
    """Parse '10m' -> 10_000_000, '4Gi' -> 4*2^30, plain ints pass through."""
    if isinstance(text, (int, float)):
        return int(text)
    m = _RX.match(str(text))
    if not m:
        raise ValueError(f"unparseable unit count: {text!r}")
    value, suffix = m.groups()
    return int(float(value) * _MULT[suffix.lower()])
