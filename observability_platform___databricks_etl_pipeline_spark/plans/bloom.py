"""Parquet-native bloom filters: footer discovery + driver-side membership.

The engine writes split-block bloom filters INTO its parquet data files via
Spark's parquet options (``parquet.bloom.filter.enabled#<col>`` + adaptive
sizing — measured +~3% file bytes for hash-like columns at ~1% FPR). That
alone buys the 100 TB path: Spark's parquet reader (parquet-mr) applies the
blooms to row groups DISTRIBUTED at scan time whenever an equality predicate
is pushed down, so a point probe on a high-cardinality non-key column (e.g.
``commit`` — a hex hash where min/max spans everything and stats-based
skipping is useless) reads bloom bytes instead of data pages.

This module adds the complementary DRIVER-side use: ``LakeVault.scan``'s
``column_equals`` pruning reads just a file's bloom bitset (a ranged read,
never data pages) and drops definite-absent files before Spark ever
schedules a task for them. That is only the right trade when bucket/key
pruning already shrank the candidate set (reading 50M blooms on the driver
is not a plan) — scan caps it accordingly and leaves the rest to the
distributed reader-side skip.

pyarrow 16 exposes no bloom API, so discovery parses the parquet footer's
thrift (compact protocol) directly for ``ColumnMetaData.bloom_filter_offset``
(field 14) / ``bloom_filter_length`` (field 15), and membership implements
the parquet spec's split-block bloom check (XXH64 of the plain-encoded
value, 32-byte blocks, the 8 salt constants). Everything here is stdlib —
deterministic across driver and executors.

Format references (public): parquet-format BloomFilter.md (split-block
algorithm, salts, XXH64 seed 0), parquet-format Thrift definitions
(FileMetaData/RowGroup/ColumnChunk/ColumnMetaData field ids), and the
XXH64 reference spec. No reference-repo analog: the reference's Delta
tables rely on min/max stats only (04_hive_sql_analysis.py:236-273), which
cannot skip anything for uniformly distributed hash columns.
"""

from __future__ import annotations

import os
import struct
from typing import Any, BinaryIO

# ---------------------------------------------------------------------------
# XXH64 (seed 0) — parquet's bloom hash. Pure-python, used driver-side on
# single probe values only (never in a row loop; executor-side hashing is
# parquet-mr's, JVM-side).
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def xxhash64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        i = 0
        for i in range(0, n - 31, 32):
            l1, l2, l3, l4 = struct.unpack_from("<QQQQ", data, i)
            v1, v2, v3, v4 = _round(v1, l1), _round(v2, l2), _round(v3, l3), _round(v4, l4)
        i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M64
    else:
        i = 0
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h = ((_rotl(h ^ _round(0, k), 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h = ((_rotl(h ^ ((k * _P1) & _M64), 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M64), 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# Thrift compact-protocol walker — just enough to pull bloom offsets out of
# FileMetaData without a thrift runtime. Struct fields are (delta-encoded
# id, type) headers; we capture the fields we need and generically skip the
# rest.
# ---------------------------------------------------------------------------

_CT_STOP = 0
_CT_TRUE = 1
_CT_FALSE = 2
_CT_BYTE = 3
_CT_I16 = 4
_CT_I32 = 5
_CT_I64 = 6
_CT_DOUBLE = 7
_CT_BINARY = 8
_CT_LIST = 9
_CT_SET = 10
_CT_MAP = 11
_CT_STRUCT = 12


class _Reader:
    __slots__ = ("b", "i")

    def __init__(self, b: bytes, i: int = 0):
        self.b = b
        self.i = i

    def varint(self) -> int:
        out = shift = 0
        while True:
            byte = self.b[self.i]
            self.i += 1
            out |= (byte & 0x7F) << shift
            if not byte & 0x80:
                return out
            shift += 7

    def zigzag(self) -> int:
        v = self.varint()
        return (v >> 1) ^ -(v & 1)

    def skip(self, ctype: int) -> None:
        if ctype in (_CT_TRUE, _CT_FALSE):
            return
        if ctype == _CT_BYTE:
            self.i += 1
        elif ctype in (_CT_I16, _CT_I32, _CT_I64):
            self.varint()
        elif ctype == _CT_DOUBLE:
            self.i += 8
        elif ctype == _CT_BINARY:
            # NB: two statements — `self.i += self.varint()` loads the OLD
            # self.i before varint() advances it past the length byte
            ln = self.varint()
            self.i += ln
        elif ctype in (_CT_LIST, _CT_SET):
            size, etype = self._list_header()
            for _ in range(size):
                self.skip(etype)
        elif ctype == _CT_MAP:
            size = self.varint()
            if size:
                kv = self.b[self.i]
                self.i += 1
                for _ in range(size):
                    self.skip(kv >> 4)
                    self.skip(kv & 0x0F)
        elif ctype == _CT_STRUCT:
            self.skip_struct()
        else:
            raise ValueError(f"unknown compact type {ctype}")

    def _list_header(self) -> tuple[int, int]:
        h = self.b[self.i]
        self.i += 1
        size = h >> 4
        if size == 15:
            size = self.varint()
        return size, h & 0x0F

    def skip_struct(self) -> None:
        fid = 0
        while True:
            h = self.b[self.i]
            self.i += 1
            if h == _CT_STOP:
                return
            delta, ctype = h >> 4, h & 0x0F
            fid = fid + delta if delta else self.zigzag()
            self.skip(ctype)

    def fields(self):
        """Yield (field_id, ctype) with the reader positioned at the value;
        the CALLER must consume or skip the value before the next yield."""
        fid = 0
        while True:
            h = self.b[self.i]
            self.i += 1
            if h == _CT_STOP:
                return
            delta, ctype = h >> 4, h & 0x0F
            fid = fid + delta if delta else self.zigzag()
            yield fid, ctype


def _parse_column_meta(r: _Reader) -> tuple[str, int | None, int | None]:
    """ColumnMetaData → (dotted path_in_schema, bloom_offset, bloom_len)."""
    path = ""
    off = length = None
    for fid, ctype in r.fields():
        if fid == 3 and ctype == _CT_LIST:  # path_in_schema: list<string>
            size, _etype = r._list_header()
            parts = []
            for _ in range(size):
                ln = r.varint()
                parts.append(r.b[r.i : r.i + ln].decode("utf-8", "replace"))
                r.i += ln
            path = ".".join(parts)
        elif fid == 14 and ctype == _CT_I64:  # bloom_filter_offset
            off = r.zigzag()
        elif fid == 15 and ctype == _CT_I32:  # bloom_filter_length
            length = r.zigzag()
        else:
            r.skip(ctype)
    return path, off, length


def bloom_offsets(path: str) -> dict[str, list[tuple[int, int | None]]]:
    """{column path → [(bloom_filter_offset, bloom_filter_length|None) per
    row group]}. Returns {} for files written without blooms. Footer-only
    I/O (one ranged read of the thrift metadata)."""
    out: dict[str, list[tuple[int, int | None]]] = {}
    with open(path, "rb") as f:
        f.seek(-8, os.SEEK_END)
        flen = struct.unpack("<I", f.read(4))[0]
        if f.read(4) != b"PAR1":
            raise ValueError(f"not a parquet file: {path}")
        f.seek(-8 - flen, os.SEEK_END)
        meta = f.read(flen)
    r = _Reader(meta)
    for fid, ctype in r.fields():
        if fid == 4 and ctype == _CT_LIST:
            n_rg, _ = r._list_header()
            for _ in range(n_rg):
                for rfid, rctype in r.fields():
                    if rfid == 1 and rctype == _CT_LIST:
                        n_cc, _ = r._list_header()
                        for _ in range(n_cc):
                            for cfid, cctype in r.fields():
                                if cfid == 3 and cctype == _CT_STRUCT:
                                    col, off, ln = _parse_column_meta(r)
                                    if off is not None:
                                        out.setdefault(col, []).append((off, ln))
                                else:
                                    r.skip(cctype)
                    else:
                        r.skip(rctype)
        else:
            r.skip(ctype)
    return out


# ---------------------------------------------------------------------------
# Split-block membership (parquet-format BloomFilter.md)
# ---------------------------------------------------------------------------

_SALT = (
    0x47B6137B,
    0x44974D91,
    0x8824AD5B,
    0xA2B7289D,
    0x705495C7,
    0x2DF1424B,
    0x9EFC4947,
    0x5C6BFB31,
)


def _read_bitset(f: BinaryIO, off: int) -> bytes:
    """Parse the BloomFilterHeader (thrift compact) at ``off`` and return the
    bitset bytes that follow it."""
    f.seek(off)
    # header is tiny (<=20B: i32 + three empty-struct unions); read a chunk
    buf = f.read(64)
    r = _Reader(buf)
    num_bytes = None
    for fid, ctype in r.fields():
        if fid == 1 and ctype == _CT_I32:
            num_bytes = r.zigzag()
        else:
            r.skip(ctype)
    if num_bytes is None or num_bytes <= 0 or num_bytes % 32:
        raise ValueError(f"bad bloom header at {off}")
    f.seek(off + r.i)
    return f.read(num_bytes)


def _block_check(bitset: bytes, h: int) -> bool:
    nblocks = len(bitset) // 32
    block = ((h >> 32) * nblocks) >> 32
    x = h & 0xFFFFFFFF
    base = block * 32
    for i in range(8):
        bit = ((x * _SALT[i]) & 0xFFFFFFFF) >> 27
        (word,) = struct.unpack_from("<I", bitset, base + 4 * i)
        if not (word >> bit) & 1:
            return False
    return True


def _plain_encode(value: Any, col_type: str | None) -> bytes:
    """Parquet PLAIN encoding of a probe value for hashing. The bloom was
    built over the column's PHYSICAL encoding, so fixed-width numerics must
    be packed at the file's width: an ``int`` column is INT32 (4 bytes) and
    a ``float`` column is FLOAT (4 bytes) — hashing 8 bytes for those would
    be a silent FALSE NEGATIVE (wrongly pruned files). ``col_type`` is the
    engine schema type of the column IN THE FILE'S schema version (so
    int→long promoted tables probe old files at 4 bytes and new ones at 8).
    Unsupported combinations raise TypeError; callers keep the file."""
    if col_type in ("string", None) and isinstance(value, str):
        return value.encode("utf-8")
    if isinstance(value, bytes):
        return value
    if isinstance(value, bool):
        raise TypeError("bloom probe on boolean columns is pointless")
    if col_type == "int" and isinstance(value, int):
        return struct.pack("<i", value)
    if col_type == "long" and isinstance(value, int):
        return struct.pack("<q", value)
    if col_type == "float" and isinstance(value, float):
        return struct.pack("<f", value)
    if col_type == "double" and isinstance(value, float):
        return struct.pack("<d", value)
    raise TypeError(
        f"unsupported bloom probe: {type(value).__name__} against column type {col_type!r}"
    )


def probe_file(path: str, probes: dict[str, tuple[Any, str | None]]) -> bool:
    """``{physical column → (value, engine type)}`` — True unless some
    column's blooms say its value is definitely absent from EVERY row group.
    Files/columns without blooms, unparseable blooms, and unsupported probe
    types all return True: pruning stays a superset guarantee. One footer
    parse per file regardless of probe count; reads bloom bytes only."""
    try:
        offs_by_col = bloom_offsets(path)
    except (OSError, ValueError, struct.error, IndexError):
        return True  # unreadable footer: keep the file
    if not offs_by_col:
        return True
    with open(path, "rb") as f:
        for column, (value, col_type) in probes.items():
            offs = offs_by_col.get(column)
            if not offs:
                continue  # no bloom for this column in this file
            try:
                h = xxhash64(_plain_encode(value, col_type))
                if not any(_block_check(_read_bitset(f, off), h) for off, _ln in offs):
                    return False  # definitely absent in every row group
            except (ValueError, TypeError, struct.error, IndexError, OSError):
                continue  # unparseable/unsupported: this probe can't prune
    return True


def file_may_contain(
    path: str, column: str, value: Any, col_type: str | None = None
) -> bool:
    """Single-column convenience wrapper over ``probe_file``."""
    return probe_file(path, {column: (value, col_type)})
