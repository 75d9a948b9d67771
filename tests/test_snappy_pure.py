"""Pure-Python snappy raw-format codec (the stdlib Avro fallback's
snappy path). The compressor is literal-only by design; the
decompressor must handle the full element grammar — literals with all
four length encodings and the three copy forms, including overlapping
(RLE) copies — because real snappy OCFs from DMS use real compressors.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from example_dms_dataexport_spark.sources.snappy_pure import (
    snappy_compress,
    snappy_decompress,
)


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


@given(st.binary(min_size=0, max_size=5000))
@settings(max_examples=200, deadline=None)
def test_roundtrip_arbitrary_bytes(data):
    assert snappy_decompress(snappy_compress(data)) == data


def test_roundtrip_large_literal_chunks():
    # exercise the 1/2/3-byte literal length encodings
    for n in (61, 256, 257, 65536, 65537, 1 << 20):
        data = bytes(i % 251 for i in range(n))
        assert snappy_decompress(snappy_compress(data)) == data


def test_copy_elements_decode():
    """Hand-built blocks using each copy form (what real compressors
    emit and the literal-only compressor never does)."""
    # "abcdabcd": literal "abcd" + copy-1 (len 4, offset 4)
    blob = _varint(8) + bytes([3 << 2]) + b"abcd" + bytes(
        [(0 << 5) | ((4 - 4) << 2) | 1, 4]
    )
    assert snappy_decompress(blob) == b"abcdabcd"
    # copy with 2-byte offset: len 5 → tag (5-1)<<2 | 2
    blob = _varint(9) + bytes([3 << 2]) + b"abcd" + bytes(
        [(5 - 1) << 2 | 2]
    ) + (4).to_bytes(2, "little")
    assert snappy_decompress(blob) == b"abcdabcda"
    # copy with 4-byte offset
    blob = _varint(8) + bytes([3 << 2]) + b"abcd" + bytes(
        [(4 - 1) << 2 | 3]
    ) + (4).to_bytes(4, "little")
    assert snappy_decompress(blob) == b"abcdabcd"


def test_overlapping_copy_is_rle():
    # literal "ab" + copy (len 6, offset 1): offset 1 re-reads the byte
    # just written each step — run-length "b" × 6
    blob = _varint(8) + bytes([1 << 2]) + b"ab" + bytes(
        [(6 - 4) << 2 | 1, 1]
    )
    assert snappy_decompress(blob) == b"abbbbbbb"


def test_corrupt_blocks_fail_loudly():
    with pytest.raises(ValueError):
        snappy_decompress(b"")  # no preamble
    with pytest.raises(ValueError):  # copy before any output
        snappy_decompress(_varint(4) + bytes([(4 - 4) << 2 | 1, 1]))
    with pytest.raises(ValueError):  # declared length ≠ output
        snappy_decompress(_varint(10) + bytes([3 << 2]) + b"abcd")
    with pytest.raises(ValueError):  # truncated literal body
        snappy_decompress(_varint(4) + bytes([3 << 2]) + b"ab")


def test_avro_snappy_container_roundtrip(tmp_path):
    """OCF blocks with the snappy codec: CRC32-suffixed per the Avro
    spec, decoded by the stdlib container reader."""
    from example_dms_dataexport_spark.sources.avro_stage import (
        decode_container,
        write_container,
    )

    p = str(tmp_path / "s.avro")
    rows = [(i, f"name{i}" if i % 3 else None, i * 1.5) for i in range(500)]
    write_container(
        p, ["k", "n", "v"], ["long", "string?", "double"], rows,
        codec="snappy", records_per_block=64,
    )
    names, got = decode_container(open(p, "rb").read())
    assert names == ["k", "n", "v"]
    assert got == rows


def test_avro_snappy_crc_mismatch_fails(tmp_path):
    from example_dms_dataexport_spark.sources.avro_stage import (
        decode_container,
        write_container,
    )

    p = str(tmp_path / "s.avro")
    write_container(
        p, ["k"], ["long"], [(1,), (2,)], codec="snappy",
    )
    blob = bytearray(open(p, "rb").read())
    # flip a bit in the last data byte before the trailing sync marker:
    # bytes [-20:-16] are the CRC, so -17 corrupts the CRC itself
    blob[-17] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_container(bytes(blob))


def test_read_stage_avro_snappy_distributed(spark, tmp_path):
    """The binaryFile+mapInPandas fallback decodes snappy OCFs end to
    end (positional cast + per-file rownum), same contract as deflate."""
    from example_dms_dataexport_spark.sources.avro_stage import (
        avro_available,
        read_stage_avro,
        write_container,
    )
    from tests.test_pipeline import CUST_SCHEMA

    if avro_available(spark):
        pytest.skip("spark-avro present — fallback not exercisable here")
    write_container(
        str(tmp_path / "a1.avro"), ["k", "n", "b"],
        ["long", "string?", "double"],
        [(1, "alice", 10.5), (2, None, 20.0)], codec="snappy",
    )
    got = read_stage_avro(
        spark, [str(tmp_path / "a1.avro")], CUST_SCHEMA,
        with_file_metadata=True,
    ).collect()
    assert {
        r.c_custkey: (r.c_name, r.c_acctbal, r._dms_rownum) for r in got
    } == {1: ("alice", 10.5, 1), 2: (None, 20.0, 2)}
