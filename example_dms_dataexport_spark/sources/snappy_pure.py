"""Pure-Python Snappy RAW-format codec (decompress + a literal-only
compressor) for the stdlib Avro fallback.

Snappy's raw block format (the one Avro OCF blocks use — NOT the
framing format) is public and tiny: a little-endian varint preamble
carrying the uncompressed length, then a sequence of elements, each a
tag byte whose low 2 bits select literal / 1-byte-offset copy /
2-byte-offset copy / 4-byte-offset copy. Copies may overlap their own
output (run-length semantics), so the decompressor appends byte-wise
when offset < length.

This exists so snappy-codec Avro OCFs — the most common codec in the
wild — decode in-environment without the spark-avro module or
python-snappy (neither is installable here; the scale path remains
spark-avro, see ``avro_stage.read_stage_avro``). The decompressor is
complete for the raw format. The COMPRESSOR is deliberately
literal-only: it emits valid snappy that any decoder accepts, but
performs no matching (output ≈ input + ~0.5% framing) — it exists so
round-trip fixtures and the fallback writer can produce snappy OCFs,
not to save bytes. Do not use it as a real compressor.
"""

from __future__ import annotations


def snappy_decompress(data: bytes) -> bytes:
    """Decompress one raw-format snappy block."""
    n = len(data)
    pos = 0
    # preamble: uncompressed length, little-endian varint
    expected = 0
    shift = 0
    while True:
        if pos >= n:
            raise ValueError("snappy: truncated length preamble")
        b = data[pos]
        pos += 1
        expected |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 32:
            raise ValueError("snappy: length varint too long")
    out = bytearray()
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:  # 60..63 → that many extra length bytes (LE)
                extra = ln - 59
                if pos + extra > n:
                    raise ValueError("snappy: truncated literal length")
                ln = int.from_bytes(data[pos : pos + extra], "little")
                pos += extra
            ln += 1
            if pos + ln > n:
                raise ValueError("snappy: truncated literal body")
            out += data[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 3-bit length, 11-bit offset
            if pos >= n:
                raise ValueError("snappy: truncated copy-1")
            ln = ((tag >> 2) & 0x07) + 4
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 6-bit length, 2-byte offset
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy-2")
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 6-bit length, 4-byte offset
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy-4")
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy: copy offset out of range")
        if off >= ln:
            start = len(out) - off
            out += out[start : start + ln]
        else:
            # overlapping copy: RLE semantics, byte-wise append
            for _ in range(ln):
                out.append(out[-off])
    if len(out) != expected:
        raise ValueError(
            f"snappy: decompressed {len(out)} bytes, preamble said {expected}"
        )
    return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    """Emit ``data`` as a valid snappy block using literal elements only
    (no match search — see module docstring)."""
    out = bytearray()
    # preamble varint
    ln = len(data)
    while True:
        b = ln & 0x7F
        ln >>= 7
        if ln:
            out.append(b | 0x80)
        else:
            out.append(b)
            break
    pos = 0
    n = len(data)
    while pos < n:
        chunk = min(n - pos, 1 << 24)  # 3 extra length bytes max needed
        if chunk <= 60:
            out.append((chunk - 1) << 2)
        elif chunk <= 0x100:
            out.append(60 << 2)
            out += (chunk - 1).to_bytes(1, "little")
        elif chunk <= 0x10000:
            out.append(61 << 2)
            out += (chunk - 1).to_bytes(2, "little")
        else:
            out.append(62 << 2)
            out += (chunk - 1).to_bytes(3, "little")
        out += data[pos : pos + chunk]
        pos += chunk
    return bytes(out)
