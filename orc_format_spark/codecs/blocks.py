"""ORC-style block compression framing.

Mirrors the reference's `CompressionStream` (src/writer/compression.rs:
95-218): the stream is cut into fixed ``block_size`` chunks (256 KiB
default, matching zstd.rs:15-19 / snappy.rs:14); each block is compressed
and prefixed with a 3-byte little-endian header ``length*2 + is_original``;
if compression made a block strictly larger, the original bytes are stored
with ``is_original=1`` (the ORC-spec fallback, compression.rs:146-163).

One deviation, forced by pyarrow's decompress API (it requires the exact
decompressed size): compressed streams are prefixed with a single varint of
the total uncompressed length. Since the reference flushes blocks at
exactly ``block_size`` boundaries, every block's uncompressed size is
``block_size`` except the last, so this one number suffices. Overhead is
<=10 bytes per stream and is included in all of our size accounting.

Codecs are pyarrow's bundled zstd (level 3 default, the reference default
zstd.rs:15-19) and snappy.
"""

from __future__ import annotations

import pyarrow as pa

from .varint import decode_varint_one, encode_varint_one

DEFAULT_BLOCK_SIZE = 262_144  # reference zstd.rs:15 / snappy.rs:14
DEFAULT_ZSTD_LEVEL = 3  # reference zstd.rs:17

_CODECS: dict[tuple[str, int], pa.Codec] = {}


class _ZlibCodec:
    """stdlib-zlib block codec (the proto's ZLIB kind,
    orc_proto.proto:217-224 — proto-only in the reference)."""

    def compress(self, block, asbytes=True):
        import zlib

        return zlib.compress(block, 6)

    def decompress(self, payload, decompressed_size=None, asbytes=True):
        import zlib

        return zlib.decompress(bytes(payload))


class _LzoCodec:
    """Pure-Python LZO1X block codec (the proto's LZO kind,
    orc_proto.proto:217-224 — proto-only in the reference AND in every
    Apache writer; implemented from the public bitstream spec in
    codecs/lzo.py, externally validated through Apache ORC C++)."""

    def compress(self, block, asbytes=True):
        from .lzo import lzo1x_compress

        return lzo1x_compress(bytes(block))

    def decompress(self, payload, decompressed_size=None, asbytes=True):
        from .lzo import lzo1x_decompress

        return lzo1x_decompress(bytes(payload), max_out=decompressed_size)


def _codec(kind: str, level: int):
    key = (kind, level)
    c = _CODECS.get(key)
    if c is None:
        if kind == "zstd":
            c = pa.Codec("zstd", compression_level=level)
        elif kind == "snappy":
            c = pa.Codec("snappy")
        elif kind == "lz4":
            c = pa.Codec("lz4_raw")
        elif kind == "zlib":
            c = _ZlibCodec()
        elif kind == "lzo":
            c = _LzoCodec()
        else:
            raise ValueError(f"unknown compression kind: {kind}")
        _CODECS[key] = c
    return c


def compress_stream(
    data: bytes,
    kind: str = "zstd",
    block_size: int = DEFAULT_BLOCK_SIZE,
    level: int = DEFAULT_ZSTD_LEVEL,
) -> bytes:
    """Compress ``data`` with ORC block framing. kind in {none,zstd,snappy}."""
    if kind == "none":
        return data
    codec = _codec(kind, level)
    parts = [encode_varint_one(len(data))]
    for start in range(0, len(data), block_size):
        block = data[start : start + block_size]
        comp = codec.compress(block, asbytes=True)
        if len(comp) > len(block):  # strictly larger -> store original
            header = len(block) * 2 + 1
            payload = block
        else:
            header = len(comp) * 2
            payload = comp
        parts.append(header.to_bytes(3, "little"))
        parts.append(payload)
    return b"".join(parts)


def decompress_stream(
    buf: bytes,
    kind: str = "zstd",
    block_size: int = DEFAULT_BLOCK_SIZE,
) -> bytes:
    if kind == "none":
        return bytes(buf)
    codec = _codec(kind, 1 if kind != "zstd" else DEFAULT_ZSTD_LEVEL)
    total, pos = decode_varint_one(buf, 0)
    out: list[bytes] = []
    remaining = total
    n = len(buf)
    while pos < n:
        header = int.from_bytes(buf[pos : pos + 3], "little")
        pos += 3
        is_original = header & 1
        length = header >> 1
        payload = buf[pos : pos + length]
        pos += length
        usize = min(block_size, remaining)
        if is_original:
            out.append(bytes(payload))
        else:
            out.append(codec.decompress(payload, decompressed_size=usize, asbytes=True))
        remaining -= usize
    data = b"".join(out)
    if len(data) != total:
        raise ValueError(f"decompressed {len(data)} bytes, expected {total}")
    return data
