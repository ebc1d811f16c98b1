"""Layered catalog discovery — the reference's TestDataSources config chain
(discovery/TestDataSources.java:36-340, docs/specs/catalog.md:16-45).

Resolution layers, mirroring catalog.md §2:

1. ``catalogs.yaml`` / ``catalogs.json`` — a LIST of catalog locations
   (strings: URLs or paths). Found in a config dir (default
   ``~/.config/vectordata``, TestDataSources.java:67 DEFAULT_CONFIG_DIR) or
   passed directly; each listed location is resolved recursively.
2. ``catalog.json`` / ``catalog.yaml`` — a catalog DEFINITION (array of
   dataset entries; direct or layout-embedded per catalog.md §3.1).
3. ``dataset.yaml`` — a single dataset base path, wrapped as a one-entry
   catalog (Catalog.java:192 dataset.yaml tail handling).

``TestDataSources`` is immutable; every configure/add method returns a new
instance (the Java builder chain). Required locations raise on load failure;
optional locations are skipped silently (Catalog.java loadCatalogEntries
``required`` flag). http(s) locations are fetched with urllib — exercised
against the stdlib range-request fixture in tests/test_http_remote.py.
"""

from __future__ import annotations

import json
import os
import urllib.request
from dataclasses import dataclass, field

from nbdatatools_spark.sources.catalog import Catalog, CatalogEntry

DEFAULT_CONFIG_DIR = "~/.config/vectordata"

_CATALOG_LIST_NAMES = ("catalogs.yaml", "catalogs.json")
_CATALOG_DEF_NAMES = ("catalog.json", "catalog.yaml")


def _is_http(loc: str) -> bool:
    return loc.startswith("http://") or loc.startswith("https://")


def _expand(path: str) -> str:
    return os.path.expanduser(path)


def _read_text(loc: str) -> str:
    if _is_http(loc):
        req = urllib.request.Request(
            loc, headers={"Accept": "application/yaml, application/json"}
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.read().decode("utf-8")
    with open(loc) as f:
        return f.read()


def _parse_structured(text: str, name_hint: str):
    """YAML if available and the name suggests it, else JSON (the reference
    feeds both through one lenient parser, Catalog.java:SHARED.gson)."""
    if name_hint.endswith((".yaml", ".yml")):
        try:
            import yaml

            return yaml.safe_load(text)
        except ImportError:
            # minimal fallback: a flat "- item" list (the only shape
            # catalogs.yaml is allowed to have per catalog.md §2.1)
            return [
                line.strip()[2:].strip().strip("'\"")
                for line in text.splitlines()
                if line.strip().startswith("- ")
            ]
    return json.loads(text)


def _load_location_list(list_file: str) -> list[str]:
    """Parse a catalogs.yaml/catalogs.json: a list of location strings
    (TestDataSources.java:101-138 loadConfig). Relative entries resolve
    against the list file's directory (catalog.md §5 relative paths)."""
    data = _parse_structured(_read_text(list_file), list_file)
    if not isinstance(data, list) or not all(isinstance(x, str) for x in data):
        raise ValueError(f"{list_file} must be a list of strings")
    base = os.path.dirname(list_file)
    out = []
    for loc in data:
        loc = _expand(loc)
        if not _is_http(loc) and not os.path.isabs(loc):
            loc = os.path.join(base, loc)
        out.append(loc)
    return out


def _dir_name_of_path(url: str) -> str:
    """Dataset name = last directory component of the dataset path
    (Catalog.java dirNameOfPath: '<...>/testxvec/dataset.yaml' -> 'testxvec')."""
    parts = [p for p in url.replace("\\", "/").split("/") if p]
    if parts and parts[-1].lower() == "dataset.yaml":
        parts = parts[:-1]
    return parts[-1] if parts else url


def _entries_from_catalog_file(cat_file: str, base: str) -> list[CatalogEntry]:
    data = _parse_structured(_read_text(cat_file), cat_file)
    if isinstance(data, dict):
        data = data.get("datasets") or data.get("entries") or []
    entries = []
    for d in data:
        if "layout" in d:
            # layout-embedded entry (catalog.md §3.1.2): url resolves
            # relative to the catalog location; name = dir of path
            url = d.get("path", "")
            if not _is_http(url) and not os.path.isabs(url):
                url = (
                    base.rstrip("/") + "/" + url if _is_http(base)
                    else os.path.join(base, url)
                )
            layout = d.get("layout") or {}
            entries.append(
                CatalogEntry(
                    name=d.get("name") or _dir_name_of_path(url),
                    url=url,
                    attributes=layout.get("attributes") or {},
                    profiles=layout.get("profiles") or {},
                    tags=layout.get("tags") or {},
                )
            )
        else:
            url = d.get("url", "")
            if url and not _is_http(url) and not os.path.isabs(url):
                url = (
                    base.rstrip("/") + "/" + url if _is_http(base)
                    else os.path.join(base, url)
                )
            entries.append(
                CatalogEntry(
                    name=d.get("name", ""),
                    url=url,
                    attributes=d.get("attributes") or {},
                    profiles=d.get("profiles") or {},
                    tags=d.get("tags") or {},
                )
            )
    return entries


def _entries_from_dataset_dir(root: str) -> list[CatalogEntry]:
    from nbdatatools_spark.sources.dataset import load_dataset

    m = load_dataset(root)
    return [
        CatalogEntry(
            name=m.name or _dir_name_of_path(root),
            url=os.path.abspath(root),
            attributes=m.attributes,
            profiles={p: {} for p in m.profiles},
        )
    ]


def _resolve_location(loc: str, depth: int = 0) -> list[CatalogEntry]:
    """One location -> dataset entries, per the catalog.md §2.2 directory
    roles. Recurses through catalogs.yaml lists (bounded depth: a config
    tree is shallow by construction; a cycle is a user error)."""
    if depth > 8:
        raise ValueError(f"catalog location chain too deep at {loc!r}")
    loc = _expand(loc)
    tail = loc.rstrip("/").rsplit("/", 1)[-1].lower()

    # a catalogs-list file (local or http)
    if tail in _CATALOG_LIST_NAMES:
        out = []
        for sub in _load_location_list(loc):
            out.extend(_resolve_location(sub, depth + 1))
        return out
    # an explicit dataset.yaml path -> single-dataset entry
    if tail == "dataset.yaml":
        return _entries_from_dataset_dir(os.path.dirname(loc) or ".")
    # an explicit catalog definition file
    if tail in _CATALOG_DEF_NAMES:
        base = loc.rsplit("/", 1)[0] if _is_http(loc) else os.path.dirname(loc)
        return _entries_from_catalog_file(loc, base)

    if not _is_http(loc) and os.path.isdir(loc):
        for n in _CATALOG_LIST_NAMES:  # config dir
            if os.path.exists(os.path.join(loc, n)):
                return _resolve_location(os.path.join(loc, n), depth + 1)
        for n in _CATALOG_DEF_NAMES:  # catalog dir
            if os.path.exists(os.path.join(loc, n)):
                return _entries_from_catalog_file(os.path.join(loc, n), loc)
        if os.path.exists(os.path.join(loc, "dataset.yaml")):  # dataset dir
            return _entries_from_dataset_dir(loc)
        raise FileNotFoundError(
            f"directory {loc!r} contains none of catalogs.yaml/catalog.json/"
            "dataset.yaml (TestDataSources.java createUrl contract)"
        )
    if _is_http(loc):
        # bare remote base: append catalog.json (Catalog.java fileFor)
        return _entries_from_catalog_file(
            loc.rstrip("/") + "/catalog.json", loc.rstrip("/")
        )
    raise FileNotFoundError(f"catalog location not found: {loc!r}")


@dataclass(frozen=True)
class TestDataSources:
    """Immutable chain of required + optional catalog locations
    (TestDataSources.java:36). Build with configure()/add_catalogs(), then
    ``.catalog()`` aggregates every location into one Catalog, source order
    preserved (first entry wins name conflicts via Catalog.find_exact)."""

    # not a pytest class despite the reference-parity Test* name
    __test__ = False

    locations: tuple = field(default_factory=tuple)
    optional_locations: tuple = field(default_factory=tuple)

    # --- builders (each returns a new instance) -------------------------
    def configure(self, configdir: str | None = None) -> "TestDataSources":
        """Append the locations listed in ``<configdir>/catalogs.yaml``
        (default ~/.config/vectordata). Missing file raises — the required
        form (TestDataSources.java:151 configure)."""
        configdir = _expand(configdir or DEFAULT_CONFIG_DIR)
        list_file = self._find_list_file(configdir)
        if list_file is None:
            raise FileNotFoundError(
                f"no catalogs.yaml/catalogs.json found in {configdir}"
            )
        return TestDataSources(
            self.locations + tuple(_load_location_list(list_file)),
            self.optional_locations,
        )

    def configure_optional(self, configdir: str | None = None) -> "TestDataSources":
        """Like configure() but a missing config file yields no change
        (TestDataSources.java:164 configureOptional)."""
        configdir = _expand(configdir or DEFAULT_CONFIG_DIR)
        list_file = self._find_list_file(configdir)
        if list_file is None:
            return self
        return TestDataSources(
            self.locations,
            self.optional_locations + tuple(_load_location_list(list_file)),
        )

    def add_catalogs(self, *basepaths: str) -> "TestDataSources":
        return TestDataSources(
            self.locations + tuple(_expand(p) for p in basepaths),
            self.optional_locations,
        )

    def add_optional_catalogs(self, *basepaths: str) -> "TestDataSources":
        return TestDataSources(
            self.locations,
            self.optional_locations + tuple(_expand(p) for p in basepaths),
        )

    @staticmethod
    def of_url(url: str) -> "TestDataSources":
        return TestDataSources((url,), ())

    # --- aggregation ----------------------------------------------------
    def catalog(self) -> Catalog:
        if not self.locations and not self.optional_locations:
            raise ValueError(
                "no catalogs specified; call configure() for the default "
                f"config from {DEFAULT_CONFIG_DIR}/catalogs.yaml or "
                "add_catalogs(...)"
            )
        entries: list[CatalogEntry] = []
        for loc in self.locations:
            entries.extend(_resolve_location(loc))
        for loc in self.optional_locations:
            try:
                entries.extend(_resolve_location(loc))
            except Exception:
                continue  # optional: skip quietly (Catalog.java:required=false)
        return Catalog(entries)

    @staticmethod
    def _find_list_file(configdir: str) -> str | None:
        for n in _CATALOG_LIST_NAMES:
            p = os.path.join(configdir, n)
            if os.path.exists(p):
                return p
        return None
