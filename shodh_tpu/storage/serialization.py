"""Canonical record serialization: msgpack + magic + version + checksum.

The reference's canonical codec is postcard framed with a ``SHO`` magic,
format tag, and checksum, with a hard 10 MB decode limit everywhere
(``src/serialization.rs:1-12``, ``lib.rs:61-71``). Same contract here with
msgpack as the wire format:

    [4-byte magic b'STPU'][1-byte version][8-byte crc32 (zero-padded)]
    [msgpack payload]

Decode refuses payloads over the limit and verifies the checksum, so a
corrupted or truncated record raises instead of deserializing garbage.
"""

from __future__ import annotations

import struct
import zlib

import msgpack

MAGIC = b"STPU"
VERSION = 1
MAX_DECODE_BYTES = 10 * 1024 * 1024  # 10 MB (constants.rs MAX_DECOMPRESSED_SIZE)
_HEADER = struct.Struct("<4sBQ")


class CorruptRecordError(ValueError):
    pass


def encode(obj) -> bytes:
    payload = msgpack.packb(obj, use_bin_type=True)
    crc = zlib.crc32(payload)
    return _HEADER.pack(MAGIC, VERSION, crc) + payload


def decode(data: bytes):
    if len(data) < _HEADER.size:
        raise CorruptRecordError(f"record too short: {len(data)} bytes")
    if len(data) > MAX_DECODE_BYTES + _HEADER.size:
        raise CorruptRecordError(f"record exceeds decode limit: {len(data)} bytes")
    magic, version, crc = _HEADER.unpack_from(data)
    if magic != MAGIC:
        raise CorruptRecordError(f"bad magic {magic!r}")
    if version != VERSION:
        raise CorruptRecordError(f"unsupported format version {version}")
    payload = data[_HEADER.size :]
    if zlib.crc32(payload) != crc:
        raise CorruptRecordError("checksum mismatch")
    return msgpack.unpackb(payload, raw=False, strict_map_key=False)
