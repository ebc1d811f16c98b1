"""Conformance tests for the PNode binary wire formats and the CQL/CDDL
render codecs, pinned against the reference's own documented examples
(specs/predicate_protocol.md worked examples; PNodeCqlCodec.java /
PNodeCddlCodec.java doc examples)."""

import struct

import pytest

from nbdatatools_spark.predicates import (
    Conjugate,
    PredicateLeaf,
    decode_framed,
    decode_pnode,
    encode_framed,
    encode_pnode,
    parse_pnode,
    render_cddl,
    render_cql,
)


def _packed(fmt, *vals):
    return struct.pack("<" + fmt, *vals)


# --- indexed wire format: golden vectors from predicate_protocol.md -------

def test_indexed_golden_eq():
    # company = 7  ->  [0, 0, 2, 1, 7] packed BBBHQ, length 13
    node = PredicateLeaf(op="EQ", values=(7,), field=0)
    raw = encode_pnode(node, "indexed")
    assert raw == _packed("BBBhq", 0, 0, 2, 1, 7)
    assert len(raw) == 13
    assert decode_pnode(raw, "indexed") == node


def test_indexed_golden_in():
    # division IN (1,3,5)  ->  [0, 1, 6, 3, 1, 3, 5] packed BBBHQQQ, length 29
    node = PredicateLeaf(op="IN", values=(1, 3, 5), field=1)
    raw = encode_pnode(node, "indexed")
    assert raw == _packed("BBBhqqq", 0, 1, 6, 3, 1, 3, 5)
    assert len(raw) == 29
    assert decode_pnode(raw, "indexed") == node


def test_indexed_golden_or():
    # market = 10 OR company = 13 -> [2,2, 0,2,2,1,10, 0,0,2,1,13] length 28
    node = Conjugate(
        "OR",
        (
            PredicateLeaf(op="EQ", values=(10,), field=2),
            PredicateLeaf(op="EQ", values=(13,), field=0),
        ),
    )
    raw = encode_pnode(node, "indexed")
    assert raw == _packed("BB", 2, 2) + _packed("BBBhq", 0, 2, 2, 1, 10) + _packed(
        "BBBhq", 0, 0, 2, 1, 13
    )
    assert len(raw) == 28
    assert decode_pnode(raw, "indexed") == node


def test_indexed_golden_nested():
    # company = 12 AND (division IN (11,13) OR market = 15) -> length 51
    node = Conjugate(
        "AND",
        (
            PredicateLeaf(op="EQ", values=(12,), field=0),
            Conjugate(
                "OR",
                (
                    PredicateLeaf(op="IN", values=(11, 13), field=1),
                    PredicateLeaf(op="EQ", values=(15,), field=2),
                ),
            ),
        ),
    )
    raw = encode_pnode(node, "indexed")
    assert len(raw) == 51
    assert decode_pnode(raw, "indexed") == node


# --- typed named format + framing ----------------------------------------

@pytest.mark.parametrize(
    "node",
    [
        PredicateLeaf(op="EQ", values=("it's",), field_name="name"),
        PredicateLeaf(op="GT", values=(0.5,), field_name="score"),
        PredicateLeaf(op="EQ", values=(True,), field_name="flag"),
        PredicateLeaf(op="EQ", values=(None,), field_name="name"),
        PredicateLeaf(op="EQ", values=(b"\x01\xff",), field_name="blob"),
        PredicateLeaf(op="IN", values=("a", "b", "c"), field_name="cat"),
        Conjugate(
            "AND",
            (
                PredicateLeaf(op="GE", values=(42,), field_name="age"),
                Conjugate(
                    "OR",
                    (
                        PredicateLeaf(op="MATCHES", values=("n.*",), field_name="name"),
                        PredicateLeaf(op="NE", values=(False,), field_name="flag"),
                    ),
                ),
            ),
        ),
    ],
)
def test_typed_roundtrip(node):
    assert decode_pnode(encode_pnode(node, "typed"), "typed") == node


def test_framed_autodetect():
    idx = PredicateLeaf(op="LT", values=(9,), field=3)
    typed = PredicateLeaf(op="LT", values=(9,), field_name="f")
    fr_i = encode_framed(idx, "indexed")
    fr_t = encode_framed(typed, "typed")
    assert fr_i[0] == 0x02 and fr_t[:2] == b"\x02\xff"
    assert decode_framed(fr_i) == idx
    assert decode_framed(fr_t) == typed


def test_framed_bad_leader_raises():
    with pytest.raises(ValueError, match="dialect leader"):
        decode_framed(b"\x07\x00")


def test_indexed_requires_positional_field():
    with pytest.raises(ValueError, match="positional"):
        encode_pnode(PredicateLeaf(op="EQ", values=(1,), field_name="x"), "indexed")


def test_typed_unnamed_falls_back_to_findex():
    # encodeTyped writes "F<index>" when no name is set (PredicateNode.java:258)
    node = PredicateLeaf(op="EQ", values=(1,), field=4)
    out = decode_pnode(encode_pnode(node, "typed"), "typed")
    assert out.field_name == "F4"


# --- CQL codec (PNodeCqlCodec.java doc examples) --------------------------

def test_cql_simple_and_conjugate():
    assert render_cql(PredicateLeaf(op="GT", values=(42,), field_name="age")) == "age > 42"
    tree = parse_pnode(
        {
            "op": "AND",
            "nodes": [
                {"fieldName": "age", "op": "GT", "values": [42]},
                {"fieldName": "city", "op": "EQ", "values": ["nyc"]},
            ],
        }
    )
    # no parenthesized grouping in CQL
    assert render_cql(tree) == "age > 42 AND city = 'nyc'"


def test_cql_in_and_matches():
    assert (
        render_cql(PredicateLeaf(op="IN", values=(1, 2), field_name="division"))
        == "division IN (1, 2)"
    )
    assert (
        render_cql(PredicateLeaf(op="MATCHES", values=("n.*",), field_name="name"))
        == "name /* MATCHES */ 'n.*'"
    )


def test_cql_positional_field_ref():
    assert render_cql(PredicateLeaf(op="EQ", values=(7,), field=0)) == "F0 = 7"


# --- CDDL codec (PNodeCddlCodec.java doc examples) ------------------------

def test_cddl_leaf_types():
    assert render_cddl(PredicateLeaf(op="GT", values=(42,), field_name="age")) == "age: int > 42"
    assert (
        render_cddl(PredicateLeaf(op="EQ", values=(0.5,), field_name="score"))
        == "score: float = 0.5"
    )
    assert (
        render_cddl(PredicateLeaf(op="EQ", values=('say "hi"',), field_name="name"))
        == 'name: tstr = "say \\"hi\\""'
    )
    assert (
        render_cddl(PredicateLeaf(op="EQ", values=(True,), field_name="flag"))
        == "flag: bool = true"
    )
    assert (
        render_cddl(PredicateLeaf(op="EQ", values=(None,), field_name="name"))
        == "name: null = null"
    )
    assert (
        render_cddl(PredicateLeaf(op="EQ", values=(b"\x01",), field_name="blob"))
        == "blob: bstr = h'...'"
    )


def test_cddl_conjugate_and_multivalue():
    tree = Conjugate(
        "AND",
        (
            PredicateLeaf(op="GT", values=(42,), field_name="age"),
            PredicateLeaf(op="IN", values=(1, 2, 3), field_name="division"),
        ),
    )
    assert render_cddl(tree) == "AND { age: int > 42, division: int IN [1, 2, 3] }"


# --- property-based round-trips (Hypothesis) ------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_values_typed = st.one_of(
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=40),
    st.booleans(),
    st.binary(max_size=20),
    st.none(),
)


def _leaf_typed():
    return st.builds(
        lambda name, op, vs: PredicateLeaf(
            op=op, values=tuple(vs), field_name=name or "f"
        ),
        st.text(
            alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=12
        ),
        st.sampled_from(["GT", "LT", "EQ", "NE", "GE", "LE", "IN", "MATCHES"]),
        st.lists(_values_typed, min_size=1, max_size=4),
    )


def _leaf_indexed():
    return st.builds(
        lambda fld, op, vs: PredicateLeaf(op=op, values=tuple(vs), field=fld),
        st.integers(min_value=0, max_value=127),
        st.sampled_from(["GT", "LT", "EQ", "NE", "GE", "LE", "IN"]),
        st.lists(
            st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=5
        ),
    )


def _trees(leaf):
    return st.recursive(
        leaf,
        lambda kids: st.builds(
            lambda op, nodes: Conjugate(op, tuple(nodes)),
            st.sampled_from(["AND", "OR"]),
            st.lists(kids, min_size=1, max_size=4),
        ),
        max_leaves=8,
    )


@settings(max_examples=200, deadline=None, derandomize=True)
@given(node=_trees(_leaf_indexed()))
def test_indexed_roundtrip_property(node):
    assert decode_framed(encode_framed(node, "indexed")) == node


@settings(max_examples=200, deadline=None, derandomize=True)
@given(node=_trees(_leaf_typed()))
def test_typed_roundtrip_property(node):
    assert decode_framed(encode_framed(node, "typed")) == node
