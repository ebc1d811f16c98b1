"""Tag filtering (spec/tagging/TagFilter.java:93-247, TagFilterTest.java).

Filter specs select tagged items (catalog entries, datasets, profiles):

- ``name`` — the item must carry the tag name (value irrelevant, may be null)
- ``name:value`` / ``name=value`` — the value, compiled as an anchored Java
  regex ``^value$``, must match the item's tag value
- pairs separated by COMMAS only (``split("[,] *")`` in the reference —
  space-separated pairs are intentionally NOT split; TagFilterTest
  ``testMatchingDetails`` pins that a spec like ``a:'x' b c`` is ONE
  assignment with everything after the first ``:`` as the value)
- a surrounding ``'...'``/``"..."`` on the whole spec or on a value is
  stripped once; values are trimmed after unquoting
- ``any(...)`` / ``all(...)`` / ``none(...)`` wrap the spec to change the
  conjugation (default ``all``)
- a filter key ``names`` falls back to the singular ``name`` when the plural
  is absent from the item's tags (TagFilter.java:181-189)

Two surfaces:

- :class:`TagFilter` — driver-side, for catalog-sized lists, with the
  reference's per-item match log (the checkbox diagnostics).
- :func:`tag_filter_column` — the same semantics compiled to ONE boolean
  Spark Column over a ``map<string,string>`` column, for catalog-scale
  DataFrames; regexes evaluate JVM-side (Spark's rlike is Java regex, the
  same dialect the reference compiles).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

_CONJUGATE_RX = re.compile(r"^(?P<conjugate>\w+)\((?P<filter>.+)\)$", re.DOTALL | re.MULTILINE)
_CONJUGATES = ("any", "all", "none")


def _unquote(text: str) -> str:
    """Strip ONE level of surrounding single or double quotes
    (TagFilter.java:159-166: first char is the quote and the NEXT occurrence
    is the last char)."""
    for q in ("'", '"'):
        if text.startswith(q) and text.find(q, 1) == len(text) - 1:
            text = text[1:-1]
    return text


def parse_tag_filter(spec: str | None) -> tuple[str, dict[str, str | None]]:
    """(conjugate, ordered {key: value-or-None}) from a filter spec
    (TagFilter.java:136-157)."""
    filt: dict[str, str | None] = {}
    conjugate = "all"
    if spec:
        spec = _unquote(spec)
        m = _CONJUGATE_RX.match(spec)
        if m and m.group("conjugate").lower() in _CONJUGATES:
            conjugate = m.group("conjugate").lower()
            spec = m.group("filter")
        for assignment in re.split(r", *", spec):
            # split at the FIRST ':' or '=' (Java split("[:=]", 2))
            parts = re.split(r"[:=]", assignment, maxsplit=1)
            if len(parts) == 2:
                filt[parts[0]] = _unquote(parts[1]).strip()
            else:
                filt[parts[0]] = None
    return conjugate, filt


@dataclass
class TagMatchResult:
    element: object
    matched: bool
    log: list[str]

    def get_log(self) -> str:
        return "\n".join(self.log)


class TagFilter:
    """Driver-side tag filter with diagnostic logging (TagFilter.java:93+)."""

    def __init__(self, filter_spec: str | None = ""):
        self.conjugate, self.filter = parse_tag_filter(filter_spec)

    @property
    def map(self) -> dict[str, str | None]:
        return self.filter

    def matches(self, tags: dict[str, str | None]) -> TagMatchResult:
        log: list[str] = []
        total = 0
        for filterkey, filterval in self.filter.items():
            matched_key = True
            itemval = tags.get(filterkey)
            if itemval is None and filterkey not in tags and filterkey.endswith("s"):
                singular = filterkey[:-1]
                itemval = tags.get(singular)
                log.append(f"(☐, ) '{filterkey}' tags do not exist: try '{singular}'")
                filterkey = singular

            detail = (
                f"filter({filterkey}{':' + filterval if filterval is not None else ''}) "
                f"tag({filterkey if filterkey in tags else ''}"
                f"{':' + tags[filterkey] if tags.get(filterkey) is not None else ''})"
            )

            if filterval is None:
                if filterkey in tags:
                    log.append(f"(☑, ) {detail}: matched names")
                else:
                    log.append(f"(☐, ) {detail}: did not match)")
                    matched_key = False
            else:
                pattern = f"^{filterval}$"
                if itemval is None:
                    log.append(f"(☑,☐) {detail}: null tag value did not match '{pattern}'")
                    matched_key = False
                elif re.fullmatch(filterval, itemval) is not None:
                    log.append(f"(☑,☑) {detail}: matched pattern '{pattern}'")
                else:
                    log.append(f"(☑,☐) {detail}: did not match '{pattern}'")
                    matched_key = False
            total += 1 if matched_key else 0

        n = len(self.filter)
        matched = {"any": total > 0, "all": total == n, "none": total == 0}[self.conjugate]
        if not self.filter:
            log.append(f"(<☑>) {tags} : matched empty pattern")
        return TagMatchResult(tags, matched, log)

    def matches_tagged(self, tags: dict[str, str | None]) -> bool:
        return self.matches(tags).matched

    def filter_items(self, items: list, tags_of=lambda x: x.tags) -> list:
        return [x for x in items if self.matches(tags_of(x)).matched]

    def filter_log(self, items: list, tags_of=lambda x: x.tags) -> list[str]:
        return [self.matches(tags_of(x)).get_log() for x in items]


def tag_filter_column(filter_spec: str | None, tags_col: Column | str) -> Column:
    """The same match semantics as ONE boolean Column over a
    ``map<string,string>`` column — catalog-scale filtering without
    collecting entries to the driver.

    Per filter key: name-only ⇒ ``map_contains_key`` (after the plural
    fallback rewrite); name:value ⇒ the (fallback-resolved) value rlike
    ``^(?:value)$`` and not null. The conjugate folds the per-key booleans
    with or/and/nor. Everything stays in whole-stage codegen — no UDF.
    """
    tags = F.col(tags_col) if isinstance(tags_col, str) else tags_col
    conjugate, filt = parse_tag_filter(filter_spec)
    if not filt:
        return F.lit(True)

    def key_match(filterkey: str, filterval: str | None) -> Column:
        has_plural = F.map_contains_key(tags, F.lit(filterkey))
        if filterkey.endswith("s"):
            singular = filterkey[:-1]
            # plural fallback applies only when the plural key is absent
            resolved_val = F.when(has_plural, tags[filterkey]).otherwise(tags[singular])
            has_key = has_plural | F.map_contains_key(tags, F.lit(singular))
        else:
            resolved_val = tags[filterkey]
            has_key = has_plural
        if filterval is None:
            return has_key
        # Java Pattern.matches ≡ rlike with explicit anchors; non-capturing
        # group so alternation stays inside the anchors
        return resolved_val.rlike(f"^(?:{filterval})$")

    # null (missing key / null value in a comparison) means "did not match"
    cols = [F.coalesce(key_match(k, v), F.lit(False)) for k, v in filt.items()]
    if conjugate == "any":
        acc = cols[0]
        for c in cols[1:]:
            acc = acc | c
        return acc
    acc = cols[0] if conjugate == "all" else ~cols[0]
    for c in cols[1:]:
        acc = acc & (c if conjugate == "all" else ~c)
    return acc
