"""ULID handling (F11 in SURVEY §2.8; spec/metadata/Ulid.java:1-245,
mnode.md:110-112).

ULIDs are 16 bytes: 48-bit ms timestamp + 80-bit randomness, canonically
rendered as 26 chars of Crockford base32. The engine stores ULIDs as their
canonical strings (sortable lexicographically == chronologically); helpers
cover encode/decode driver-side and timestamp extraction as a Column for
distributed use.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ALPHABET = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
_DECODE = {c: i for i, c in enumerate(_ALPHABET)}
# also accept the commonly-confused letters per Crockford
for pairs in (("O", 0), ("I", 1), ("L", 1)):
    _DECODE[pairs[0]] = pairs[1]


def ulid_encode(data: bytes) -> str:
    """16 bytes -> 26-char Crockford base32 (matches Ulid.java rendering)."""
    if len(data) != 16:
        raise ValueError("ULID must be 16 bytes")
    n = int.from_bytes(data, "big")
    out = []
    for shift in range(125, -1, -5):
        out.append(_ALPHABET[(n >> shift) & 0x1F])
    return "".join(out)


def ulid_decode(text: str) -> bytes:
    """26-char canonical form -> 16 bytes; validates alphabet + overflow."""
    t = text.strip().upper()
    if len(t) != 26:
        raise ValueError("ULID must be 26 characters")
    n = 0
    for ch in t:
        if ch not in _DECODE:
            raise ValueError(f"invalid ULID character {ch!r}")
        n = (n << 5) | _DECODE[ch]
    if n >= 1 << 128:
        raise ValueError("ULID overflows 128 bits")
    return n.to_bytes(16, "big")


def ulid_timestamp_ms(data_or_text: bytes | str) -> int:
    """48-bit millisecond timestamp prefix."""
    raw = ulid_decode(data_or_text) if isinstance(data_or_text, str) else data_or_text
    return int.from_bytes(raw[:6], "big")


def ulid_timestamp_col(col: Column) -> Column:
    """Column version: canonical-ULID string -> TIMESTAMP. The 10-char time
    prefix decodes with a base32 polynomial — pure Catalyst (aggregate over a
    10-char split), no UDF.

    Crockford alias chars I/L/O translate to 1/1/0 (same as the driver-side
    ulid_decode); any OTHER character outside the alphabet yields NULL, not a
    silently-wrong timestamp (ADVICE r1 — the old coalesce mapped invalid
    chars to 0)."""
    prefix = F.translate(F.upper(F.substring(col, 1, 10)), "ILO", "110")
    chars = F.filter(F.split(prefix, ""), lambda c: c != "")
    idx = F.transform(
        chars,
        lambda c: F.nullif(F.instr(F.lit(_ALPHABET), c).cast("long") - 1, F.lit(-1)),
    )
    # NULL indices propagate through the polynomial -> NULL timestamp
    ms = F.aggregate(idx, F.lit(0).cast("long"), lambda acc, x: acc * 32 + x)
    return F.timestamp_millis(ms)
