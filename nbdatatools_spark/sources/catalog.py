"""Catalog model: discovery of datasets with exact/glob/regex lookup
(S12 + §2 "Dataset discovery"; docs/specs/catalog.md:16-100,
downloader/Catalog.java:51-64,215-353).

A catalog is a JSON/YAML array of entries: name, url, attributes, profiles,
tags. Driver-side metadata (tiny); also exposable as a DataFrame for
catalog-scale queries.
"""

from __future__ import annotations

import fnmatch
import json
import os
import re
from dataclasses import dataclass, field

try:
    import yaml

    _HAVE_YAML = True
except ImportError:
    _HAVE_YAML = False


@dataclass
class CatalogEntry:
    name: str
    url: str = ""
    attributes: dict = field(default_factory=dict)
    profiles: dict = field(default_factory=dict)
    tags: dict = field(default_factory=dict)


class Catalog:
    def __init__(self, entries: list[CatalogEntry]):
        self.entries = entries

    # --- lookup (Catalog.java:215,333,342,353) ---------------------------
    def find_exact(self, name: str) -> CatalogEntry | None:
        return next((e for e in self.entries if e.name == name), None)

    def match_glob(self, pattern: str) -> list[CatalogEntry]:
        return [e for e in self.entries if fnmatch.fnmatchcase(e.name, pattern)]

    def match_regex(self, pattern: str) -> list[CatalogEntry]:
        rx = re.compile(pattern)
        return [e for e in self.entries if rx.fullmatch(e.name)]

    def match_tags(self, filter_spec: str) -> list[CatalogEntry]:
        """Tag-filter selection (spec/tagging/TagFilter.java:100-108):
        ``name``, ``name:regex``, comma-separated, any()/all()/none()."""
        from nbdatatools_spark.functions.tags import TagFilter

        return TagFilter(filter_spec).filter_items(self.entries)

    def match_one(self, spec: str) -> CatalogEntry:
        """Exact, then glob, then regex; must resolve to exactly one
        (Catalog.java:353 matchOne)."""
        e = self.find_exact(spec)
        if e:
            return e
        for matches in (self.match_glob(spec), self.match_regex(spec)):
            if len(matches) == 1:
                return matches[0]
            if len(matches) > 1:
                raise ValueError(
                    f"{spec!r} is ambiguous: {[m.name for m in matches]}"
                )
        raise KeyError(f"no catalog entry matches {spec!r}")

    # --- IO ---------------------------------------------------------------
    @classmethod
    def load(cls, path: str) -> "Catalog":
        with open(path) as f:
            text = f.read()
        if path.endswith((".yaml", ".yml")) and _HAVE_YAML:
            data = yaml.safe_load(text)
        else:
            data = json.loads(text)
        if isinstance(data, dict):
            data = data.get("datasets") or data.get("entries") or []
        entries = [
            CatalogEntry(
                name=d.get("name", ""),
                url=d.get("url", ""),
                attributes=d.get("attributes") or {},
                profiles=d.get("profiles") or {},
                tags=d.get("tags") or {},
            )
            for d in data
        ]
        return cls(entries)

    @classmethod
    def build(cls, roots: list[str]) -> "Catalog":
        """``catalog <roots>`` (README.md:81-83): walk dataset roots for
        dataset.yaml manifests and emit entries."""
        from nbdatatools_spark.sources.dataset import load_dataset

        entries = []
        for root in roots:
            for dirpath, _dirnames, filenames in os.walk(root):
                if "dataset.yaml" in filenames:
                    m = load_dataset(dirpath)
                    entries.append(
                        CatalogEntry(
                            name=m.name,
                            url=os.path.abspath(dirpath),
                            attributes=m.attributes,
                            profiles={p: {} for p in m.profiles},
                        )
                    )
        return cls(sorted(entries, key=lambda e: e.name))

    def save(self, path: str) -> None:
        data = [
            {
                "name": e.name,
                "url": e.url,
                "attributes": e.attributes,
                "profiles": e.profiles,
                "tags": e.tags,
            }
            for e in self.entries
        ]
        with open(path, "w") as f:
            if path.endswith((".yaml", ".yml")) and _HAVE_YAML:
                yaml.safe_dump(data, f)
            else:
                json.dump(data, f, indent=2)

    def to_df(self, spark):
        return spark.createDataFrame(
            [
                (e.name, e.url, {str(k): str(v) for k, v in e.attributes.items()},
                 json.dumps(e.profiles), {str(k): str(v) for k, v in e.tags.items()})
                for e in self.entries
            ],
            "name STRING, url STRING, attributes MAP<STRING,STRING>, profiles STRING, tags MAP<STRING,STRING>",
        )
