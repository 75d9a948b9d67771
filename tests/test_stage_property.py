"""Property-based round-trips for the round-9 stage formats.

Invariant: writing ANY (long, string, double) rows through the Spark
XML writer / pyarrow ORC writer and reading them back through the stage
readers reproduces the exact multiset — types, NULLs, unicode and the
XML-special characters (&, <, >, quotes) that an escaping bug would
mangle first. One Spark job per example, so max_examples stays small;
breadth comes from the row generator.

Deliberate strategy bounds (documented format semantics, not bugs):
- XML strings have no leading/trailing whitespace (the parser's
  ``ignoreSurroundingSpaces`` default trims them) and are non-empty
  (empty element = "" and missing element = NULL — pinned below);
- no NaN/Infinity doubles in XML (text format, no canonical spelling);
- XML strings exclude control characters (invalid in XML 1.0).
"""

from __future__ import annotations

import os

import pytest
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from example_dms_dataexport_spark.sources.orc_stage import read_stage_orc
from example_dms_dataexport_spark.sources.xml_stage import read_stage_xml

SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("s", StringType()),
        StructField("v", DoubleType()),
    ]
)

# printable ASCII incl. the XML specials, plus some multibyte unicode
_XML_ALPHABET = st.sampled_from(
    list("&<>\"'ab0 _;/\\.,=-+*()[]{}") + list("äßøλ中文😀")
)
_xml_string = (
    st.text(alphabet=_XML_ALPHABET, min_size=1, max_size=12)
    .map(lambda s: s.strip())
    .filter(lambda s: s != "")
)

_row = st.tuples(
    st.integers(min_value=-(2**62), max_value=2**62),
    st.one_of(st.none(), _xml_string),
    st.one_of(
        st.none(),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
    ),
)


def _roundtrip_xml(spark, rows):
    base = tempfile.mkdtemp()
    try:
        df = spark.createDataFrame(rows, SCHEMA)
        out = os.path.join(base, "x")
        df.coalesce(1).write.option("rowTag", "row").format("xml").save(out)
        files = [
            os.path.join(out, f)
            for f in sorted(os.listdir(out))
            if f.startswith("part-")
        ]
        back = read_stage_xml(spark, files, SCHEMA, on_error="failfast")
        return [tuple(r) for r in back.collect()]
    finally:
        shutil.rmtree(base, ignore_errors=True)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_row, min_size=1, max_size=10))
@pytest.mark.slow
def test_xml_roundtrip_exact(spark, rows):
    got = _roundtrip_xml(spark, rows)
    assert sorted(got, key=repr) == sorted(rows, key=repr)


def test_xml_empty_vs_missing_element(spark):
    # pinned semantics (Spark 4 XML source): an empty <s></s> element
    # parses as the EMPTY STRING; a MISSING element parses as NULL
    base = tempfile.mkdtemp()
    try:
        p = os.path.join(base, "t.xml")
        with open(p, "w") as f:
            f.write(
                "<rows>"
                "<row><k>1</k><s></s><v>2.0</v></row>"
                "<row><k>2</k><v>3.0</v></row>"
                "</rows>"
            )
        rows = sorted(read_stage_xml(spark, [p], SCHEMA).collect())
        assert [tuple(r) for r in rows] == [(1, "", 2.0), (2, None, 3.0)]
    finally:
        shutil.rmtree(base, ignore_errors=True)


_orc_row = st.tuples(
    st.one_of(st.none(), st.integers(min_value=-(2**62), max_value=2**62)),
    st.one_of(st.none(), st.text(min_size=0, max_size=12)),
    st.one_of(
        st.none(),
        st.floats(allow_nan=False, width=64),  # ±inf allowed: binary format
    ),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_orc_row, min_size=1, max_size=10))
def test_orc_positional_roundtrip_exact(spark, rows):
    import pyarrow as pa
    import pyarrow.orc as orc

    base = tempfile.mkdtemp()
    try:
        p = os.path.join(base, "t.orc")
        cols = list(zip(*rows))
        orc.write_table(
            pa.table(
                {
                    "FOREIGN_A": pa.array(cols[0], type=pa.int64()),
                    "FOREIGN_B": pa.array(cols[1], type=pa.string()),
                    "FOREIGN_C": pa.array(cols[2], type=pa.float64()),
                }
            ),
            p,
        )
        back = read_stage_orc(spark, [p], SCHEMA)
        got = [tuple(r) for r in back.collect()]
        assert sorted(got, key=repr) == sorted(rows, key=repr)
    finally:
        shutil.rmtree(base, ignore_errors=True)
