"""Stage file-format coverage beyond CSV/parquet: ORC, XML, Avro.

The reference's metadata carries a per-table ``file_format`` (ref
control_migration_schema_script.sql:26) and its load primitive —
Snowflake COPY INTO (ref :291,341-348) — accepts CSV/Parquet/ORC/XML/
Avro. These tests drive the ORC and XML readers through the SAME
end-to-end full-load + CDC scenarios as the CSV/parquet suites
(test_pipeline.py): latest-row-in-file wins, later-file wins, D
deletes, watermark advances, idempotent re-run. Avro is
capability-gated (the spark-avro module is external); the gate itself
is asserted.
"""

import os

import pytest
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from example_dms_dataexport_spark.cdc import incremental_load
from example_dms_dataexport_spark.full_load import full_load
from example_dms_dataexport_spark.metadata import MetadataStore, TableMeta
from example_dms_dataexport_spark.sources.csv_stage import (
    cdc_schema,
    split_quarantine,
)
from example_dms_dataexport_spark.sources.orc_stage import read_stage_orc
from example_dms_dataexport_spark.sources.stage import (
    STAGE_FORMATS,
    stage_extension,
)
from example_dms_dataexport_spark.sources.warehouse import ParquetWarehouse
from example_dms_dataexport_spark.sources.xml_stage import read_stage_xml

CUST_SCHEMA = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_acctbal", DoubleType()),
    ]
)


def _write_orc(root, rel, rows, names):
    import pyarrow as pa
    import pyarrow.orc as orc

    path = os.path.join(root, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cols = list(zip(*rows)) if rows else [[] for _ in names]
    orc.write_table(pa.table({n: list(c) for n, c in zip(names, cols)}), path)


def _write_xml(root, rel, rows):
    """rows = list of dicts {element_name: text}; one <row> element each."""
    path = os.path.join(root, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    body = "".join(
        "<row>" + "".join(f"<{k}>{v}</{k}>" for k, v in r.items()) + "</row>"
        for r in rows
    )
    with open(path, "w") as f:
        f.write(f"<rows>{body}</rows>")


def _env(tmp_path, stage, file_format):
    store = MetadataStore(str(tmp_path / "meta.json"))
    store.register(
        TableMeta(
            full_path="erp/customer",
            db_schema="erp",
            db_table="customer",
            stage=stage,
            primary_keys=["c_custkey"],
            file_format=file_format,
        )
    )
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    return store, wh


def _rows(spark, wh):
    return {
        (r.c_custkey, r.c_name, r.c_acctbal)
        for r in wh.read(spark, "erp_customer").collect()
    }


def test_stage_extension_new_formats():
    assert stage_extension("orc") == "orc"
    assert stage_extension("xml") == "xml"
    assert stage_extension("avro") == "avro"
    assert set(STAGE_FORMATS) == {"csv", "parquet", "orc", "xml", "avro"}
    with pytest.raises(ValueError, match="unsupported stage file_format"):
        stage_extension("protobuf")


def test_orc_stage_full_then_incremental(spark, tmp_path):
    stage = str(tmp_path / "stage")
    # full-load file: source column names differ (positional contract)
    _write_orc(
        stage,
        "erp/customer/LOAD00000001.orc",
        [(1, "alice", 10.5), (2, "bob", 20.0), (3, "carol", 30.25)],
        ["C_CUSTKEY", "C_NAME", "C_ACCTBAL"],
    )
    store, wh = _env(tmp_path, stage, "orc")
    assert full_load(spark, store, wh, "erp/customer", schema=CUST_SCHEMA) == 3

    # CDC: intra-file order (pk=2 twice, last wins) + later file overrides
    _write_orc(
        stage,
        "erp/customer/20240101-000000001.orc",
        [("U", 2, "bob2a", 21.0), ("U", 2, "bob2b", 22.0), ("D", 3, "x", 0.0)],
        ["Op", "C_CUSTKEY", "C_NAME", "C_ACCTBAL"],
    )
    _write_orc(
        stage,
        "erp/customer/20240102-000000002.orc",
        [("U", 2, "bob3", 23.0), ("I", 4, "dave", 40.0)],
        ["Op", "C_CUSTKEY", "C_NAME", "C_ACCTBAL"],
    )
    assert incremental_load(spark, store, wh, "erp/customer").startswith(
        "Rows affected:"
    )
    assert _rows(spark, wh) == {
        (1, "alice", 10.5),
        (2, "bob3", 23.0),
        (4, "dave", 40.0),
    }
    assert (
        store.get("erp/customer").last_incremental_file
        == "20240102-000000002.orc"
    )
    assert (
        incremental_load(spark, store, wh, "erp/customer")
        == "No files to process."
    )


def test_orc_stage_rejects_column_count_mismatch(spark, tmp_path):
    stage = str(tmp_path)
    _write_orc(stage, "t.orc", [(1, "a")], ["K", "N"])
    with pytest.raises(ValueError, match="positional contract"):
        read_stage_orc(
            spark, [os.path.join(stage, "t.orc")], CUST_SCHEMA
        ).collect()


def test_xml_stage_full_then_incremental(spark, tmp_path):
    stage = str(tmp_path / "stage")
    # NAMED contract: elements carry the target schema's field names
    # (case-insensitive — DMS writes 'Op', upper-cased source names work)
    _write_xml(
        stage,
        "erp/customer/LOAD00000001.xml",
        [
            {"C_CUSTKEY": 1, "C_NAME": "alice", "C_ACCTBAL": 10.5},
            {"C_CUSTKEY": 2, "C_NAME": "bob", "C_ACCTBAL": 20.0},
            {"C_CUSTKEY": 3, "C_NAME": "carol", "C_ACCTBAL": 30.25},
        ],
    )
    store, wh = _env(tmp_path, stage, "xml")
    assert full_load(spark, store, wh, "erp/customer", schema=CUST_SCHEMA) == 3

    _write_xml(
        stage,
        "erp/customer/20240101-000000001.xml",
        [
            {"Op": "U", "C_CUSTKEY": 2, "C_NAME": "bob2a", "C_ACCTBAL": 21.0},
            {"Op": "U", "C_CUSTKEY": 2, "C_NAME": "bob2b", "C_ACCTBAL": 22.0},
            {"Op": "D", "C_CUSTKEY": 3, "C_NAME": "carol", "C_ACCTBAL": 0.0},
        ],
    )
    _write_xml(
        stage,
        "erp/customer/20240102-000000002.xml",
        [
            {"Op": "U", "C_CUSTKEY": 2, "C_NAME": "bob3", "C_ACCTBAL": 23.0},
            {"Op": "I", "C_CUSTKEY": 4, "C_NAME": "dave", "C_ACCTBAL": 40.0},
        ],
    )
    assert incremental_load(spark, store, wh, "erp/customer").startswith(
        "Rows affected:"
    )
    assert _rows(spark, wh) == {
        (1, "alice", 10.5),
        (2, "bob3", 23.0),
        (4, "dave", 40.0),
    }
    assert (
        incremental_load(spark, store, wh, "erp/customer")
        == "No files to process."
    )


def test_xml_stage_missing_element_is_null(spark, tmp_path):
    stage = str(tmp_path)
    _write_xml(
        stage, "t.xml", [{"C_CUSTKEY": 7, "C_ACCTBAL": 1.5}]  # no C_NAME
    )
    rows = read_stage_xml(
        spark, [os.path.join(stage, "t.xml")], CUST_SCHEMA
    ).collect()
    assert [(r.c_custkey, r.c_name, r.c_acctbal) for r in rows] == [
        (7, None, 1.5)
    ]


def test_xml_stage_quarantine_and_failfast(spark, tmp_path):
    stage = str(tmp_path)
    schema = StructType(
        [StructField("k", IntegerType()), StructField("v", StringType())]
    )
    _write_xml(
        stage,
        "t.xml",
        [{"k": 1, "v": "ok"}, {"k": "notanint", "v": "bad"}],
    )
    files = [os.path.join(stage, "t.xml")]
    good, bad = split_quarantine(
        read_stage_xml(spark, files, schema, on_error="quarantine")
    )
    assert [(r.k, r.v) for r in good.collect()] == [(1, "ok")]
    assert bad.count() == 1
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        read_stage_xml(spark, files, schema, on_error="failfast").collect()
    with pytest.raises(ValueError, match="on_error"):
        read_stage_xml(spark, files, schema, on_error="abort")


def test_xml_stage_cdc_rownum_order(spark, tmp_path):
    """Two ops for one pk in one file: _dms_rownum reflects document
    order, which is what makes latest-in-file win in the merge."""
    stage = str(tmp_path)
    _write_xml(
        stage,
        "c1.xml",
        [
            {"Op": "U", "C_CUSTKEY": 5, "C_NAME": "first", "C_ACCTBAL": 1.0},
            {"Op": "U", "C_CUSTKEY": 5, "C_NAME": "second", "C_ACCTBAL": 2.0},
        ],
    )
    rows = read_stage_xml(
        spark,
        [os.path.join(stage, "c1.xml")],
        cdc_schema(CUST_SCHEMA),
        with_file_metadata=True,
    ).collect()
    by_rownum = {r._dms_rownum: r.c_name for r in rows}
    assert by_rownum == {1: "first", 2: "second"}


def test_avro_stage_fallback_roundtrip(spark, tmp_path):
    """Without spark-avro the stdlib OCF fallback reads the stage file
    distributed (binaryFile + mapInPandas): positional cast, exact
    per-file row numbers, null/deflate codecs, nullable unions."""
    from example_dms_dataexport_spark.sources.avro_stage import (
        avro_available,
        read_stage_avro,
        write_container,
    )

    if avro_available(spark):
        pytest.skip("spark-avro present — fallback not exercisable here")
    names = ["k", "n", "b"]  # physical names differ: position is the contract
    types = ["long", "string?", "double"]
    write_container(
        str(tmp_path / "a1.avro"), names, types,
        [(1, "alice", 10.5), (2, None, 20.0)],
    )
    write_container(
        str(tmp_path / "a2.avro"), names, types,
        [(3, "carol", 30.25)], codec="deflate",
    )
    got = read_stage_avro(
        spark,
        [str(tmp_path / "a1.avro"), str(tmp_path / "a2.avro")],
        CUST_SCHEMA,
        with_file_metadata=True,
    ).collect()
    by_key = {r.c_custkey: (r.c_name, r.c_acctbal, r._dms_rownum) for r in got}
    assert by_key == {
        1: ("alice", 10.5, 1),
        2: (None, 20.0, 2),
        3: ("carol", 30.25, 1),
    }
    assert all(r._dms_filename.endswith((".avro",)) for r in got)


def test_avro_fallback_rejects_out_of_subset(spark, tmp_path):
    """Unsupported types/codecs fail LOUDLY with spark-avro guidance —
    never a silent misread."""
    from example_dms_dataexport_spark.sources.avro_stage import (
        decode_container,
        write_container,
    )

    write_container(str(tmp_path / "ok.avro"), ["k"], ["long"], [(1,)])
    blob = open(tmp_path / "ok.avro", "rb").read()
    # splice an unsupported field type into the header schema
    bad = blob.replace(b'"type": "long"', b'"type": "enum"')
    if bad == blob:
        bad = blob.replace(b'"type":"long"', b'"type":"enum"')
    with pytest.raises(ValueError, match="spark-avro"):
        decode_container(bad)
    names, rows = decode_container(blob)
    assert names == ["k"] and rows == [(1,)]


def test_avro_stage_full_then_incremental(spark, tmp_path):
    """The whole DMS pipeline over the Avro stage fallback: full load,
    intra-file latest-wins, later-file override, delete, watermark."""
    from example_dms_dataexport_spark.sources.avro_stage import (
        write_container,
    )

    stage = str(tmp_path / "stage")
    os.makedirs(os.path.join(stage, "erp/customer"))
    names = ["A", "B", "C"]
    types = ["long", "string?", "double"]
    write_container(
        os.path.join(stage, "erp/customer/LOAD00000001.avro"),
        names, types,
        [(1, "alice", 10.5), (2, "bob", 20.0), (3, "carol", 30.25)],
    )
    store, wh = _env(tmp_path, stage, "avro")
    assert full_load(spark, store, wh, "erp/customer", schema=CUST_SCHEMA) == 3

    cdc_names = ["Op", "A", "B", "C"]
    cdc_types = ["string", "long", "string?", "double"]
    write_container(
        os.path.join(stage, "erp/customer/20240101-000000001.avro"),
        cdc_names, cdc_types,
        [("U", 2, "bob2a", 21.0), ("U", 2, "bob2b", 22.0), ("D", 3, "x", 0.0)],
    )
    write_container(
        os.path.join(stage, "erp/customer/20240102-000000002.avro"),
        cdc_names, cdc_types,
        [("U", 2, "bob3", 23.0), ("I", 4, "dave", 40.0)],
        codec="deflate",
    )
    assert incremental_load(spark, store, wh, "erp/customer").startswith(
        "Rows affected:"
    )
    assert _rows(spark, wh) == {
        (1, "alice", 10.5),
        (2, "bob3", 23.0),
        (4, "dave", 40.0),
    }
    assert (
        store.get("erp/customer").last_incremental_file
        == "20240102-000000002.avro"
    )
    assert (
        incremental_load(spark, store, wh, "erp/customer")
        == "No files to process."
    )
