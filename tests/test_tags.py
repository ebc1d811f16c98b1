"""Tag filtering conformance (spec/tagging/TagFilter.java, TagFilterTest.java)
plus the Spark Column compilation differential."""

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.functions.tags import TagFilter, parse_tag_filter, tag_filter_column
from nbdatatools_spark.sources.catalog import Catalog, CatalogEntry


# --- driver-side conformance: each case mirrors a TagFilterTest method ----

def test_name_only_filter_map():
    tf = TagFilter("name")
    assert len(tf.map) == 1 and tf.map["name"] is None


def test_empty_filter_matches_everything():
    assert TagFilter("").matches({"a": "tag"}).matched
    assert TagFilter(None).matches({}).matched


def test_filter_tags_but_no_item_tags():
    assert not TagFilter("tag=foo").matches({}).matched


def test_name_only_matches_presence_even_null_value():
    tf = TagFilter("one")
    assert tf.matches({"one": "two"}).matched
    assert tf.matches({"one": None}).matched


def test_plural_fallback():
    tf = TagFilter("ones")
    assert tf.matches({"one": "two"}).matched
    assert tf.matches({"one": None}).matched
    r = tf.matches({"one": "two"})
    assert "'ones' tags do not exist: try 'one'" in r.get_log()


def test_value_match_and_mismatch():
    assert not TagFilter("one:two").matches({"one": "four"}).matched
    assert TagFilter("one:four").matches({"one": "four"}).matched


def test_value_regex():
    tags = {"one": "four-five-six"}
    assert TagFilter("one:'four-.*'").matches(tags).matched
    assert TagFilter("one:'.*-five-.*'").matches(tags).matched
    assert TagFilter("one:'.*-six'").matches(tags).matched
    # raw substring is NOT a match: the pattern is anchored
    assert not TagFilter("one:'five'").matches(tags).matched
    assert TagFilter("one:'four.*|seven'").matches(tags).matched


def test_space_separated_pairs_are_one_assignment():
    """TagFilterTest.testMatchingDetails: pairs split on commas ONLY — a
    space-separated spec is a single assignment whose value includes
    everything after the first ':', and the log pins the exact diagnostic."""
    tags = {"one": "four-five-six", "two": "three-seven-nine", "five": None, "six": None}
    tf = TagFilter("one:'four-.*' five two seven six=again ")
    r = tf.matches(tags)
    assert not r.matched
    assert (
        "(☑,☐) filter(one:'four-.*' five two seven six=again) tag(one:four-five-six): "
        "did not match '^'four-.*' five two seven six=again$'"
    ) in r.get_log()


def test_whole_spec_unquote_and_value_trim():
    # "\"block: main\"" -> unquoted spec, value trimmed after split
    assert TagFilter('"block: main"').matches({"block": "main"}).matched


def test_any_all_none_conjugates():
    tags = {"block": "main", "truck": "car"}
    assert TagFilter("any(truck:car,block:moon)").matches(tags).matched
    assert not TagFilter("any(car:truck,block:moon)").matches(tags).matched
    assert TagFilter("none(unseen)").matches(tags).matched
    assert not TagFilter("none(truck)").matches(tags).matched
    assert not TagFilter("none(truck:car)").matches(tags).matched
    assert TagFilter("block:main,truck:car").matches(tags).matched
    assert not TagFilter("block:main,truck:boat").matches(tags).matched


def test_first_separator_wins():
    # Java split("[:=]", 2): "a=b:c" -> key a, value "b:c"
    _, filt = parse_tag_filter("a=b:c")
    assert filt == {"a": "b:c"}


def test_catalog_match_tags():
    cat = Catalog(
        [
            CatalogEntry(name="glove-25", tags={"model": "glove", "dims": "25"}),
            CatalogEntry(name="glove-100", tags={"model": "glove", "dims": "100"}),
            CatalogEntry(name="openai-small", tags={"model": "openai.*small"}),
        ]
    )
    assert {e.name for e in cat.match_tags("model:glove")} == {"glove-25", "glove-100"}
    assert {e.name for e in cat.match_tags("model:glove,dims:25")} == {"glove-25"}
    assert {e.name for e in cat.match_tags("none(model:glove)")} == {"openai-small"}
    assert len(cat.match_tags("")) == 3


# --- Column compilation: same verdicts as the driver-side filter ----------

CASES = [
    "",
    "one",
    "ones",
    "one:four",
    "one:'four-.*'",
    "one:'five'",
    "one:'four.*|seven'",
    "tag=foo",
    "missing",
    "any(one:four-five-six,two:nope)",
    "none(one)",
    "none(unseen)",
    "all(one:'four.*',two:'three.*')",
]

TAGSETS = [
    {"one": "four-five-six", "two": "three-seven-nine"},
    {"one": "four"},
    {"ones": "explicit-plural"},
    {"two": "three"},
    {},
    {"one": None},
]


def test_tag_filter_column_differential(spark):
    rows = [(i, t) for i, t in enumerate(TAGSETS)]
    df = spark.createDataFrame(rows, "id INT, tags MAP<STRING,STRING>")
    for spec in CASES:
        expected = {i for i, t in rows if TagFilter(spec).matches(t).matched}
        got = {
            r["id"]
            for r in df.where(tag_filter_column(spec, "tags")).select("id").collect()
        }
        assert got == expected, f"spec {spec!r}: column {got} != driver {expected}"


def test_tag_filter_column_stays_codegen(spark):
    """No UDF: the compiled predicate must survive into the physical plan as
    native expressions (rlike / map ops)."""
    df = spark.createDataFrame([(1, {"a": "b"})], "id INT, tags MAP<STRING,STRING>")
    plan = (
        df.where(tag_filter_column("a:'b.*',c", "tags"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan
