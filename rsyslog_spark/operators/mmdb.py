"""MaxMind-DB reader + mmdblookup enrichment (ref: plugins/
mmdblookup/mmdblookup.c; file format per the PUBLIC MaxMind-DB spec,
https://maxmind.github.io/MaxMind-DB/ — implemented from the spec,
no libmaxminddb translation).

Engine shape: the .mmdb search tree EXPORTS to an IPv4 range table
once at config load (driver-side, dimension-sized), which feeds the
broadcast range join (operators/lookup.geoip_range_join) — the fact
side never shuffles, records ride along as JSON text. Per-row deep
field reads then use variant gets so numeric leaves stay numeric
(goldens mmdb-multilevel.sh latitude 51.5142 / accuracy_radius 100).
"""

from __future__ import annotations

import json
import struct

_METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"
_DATA_SEP = 16          # 16-byte zero separator after the tree


class MMDBError(ValueError):
    pass


class MMDBReader:
    """Decode a MaxMind-DB file: metadata, per-IP lookup, and a full
    IPv4 range export."""

    def __init__(self, path: str):
        with open(path, "rb") as fh:
            self.buf = fh.read()
        idx = self.buf.rfind(_METADATA_MARKER)
        if idx < 0:
            raise MMDBError(f"{path}: no MaxMind metadata marker")
        self.metadata, _ = self._decode(idx + len(_METADATA_MARKER),
                                        base=idx + len(_METADATA_MARKER))
        md = self.metadata
        self.node_count = int(md["node_count"])
        self.record_size = int(md["record_size"])
        self.ip_version = int(md.get("ip_version", 4))
        self.node_bytes = self.record_size * 2 // 8
        self.tree_size = self.node_count * self.node_bytes
        self.data_start = self.tree_size + _DATA_SEP

    # -- search tree -----------------------------------------------------

    def _record(self, node: int, side: int) -> int:
        b = self.buf
        off = node * self.node_bytes
        rs = self.record_size
        if rs == 24:
            o = off + side * 3
            return (b[o] << 16) | (b[o + 1] << 8) | b[o + 2]
        if rs == 28:
            if side == 0:
                return ((b[off + 3] & 0xF0) << 20) | (b[off] << 16) \
                    | (b[off + 1] << 8) | b[off + 2]
            return ((b[off + 3] & 0x0F) << 24) | (b[off + 4] << 16) \
                | (b[off + 5] << 8) | b[off + 6]
        if rs == 32:
            o = off + side * 4
            return struct.unpack_from(">I", b, o)[0]
        raise MMDBError(f"unsupported record size {rs}")

    def _ipv4_root(self) -> int:
        """The node reached after 96 zero bits — where the IPv4 space
        lives inside an IPv6 tree (the spec's IPv4-mapped layout)."""
        node = 0
        if self.ip_version == 6:
            for _ in range(96):
                if node >= self.node_count:
                    return node
                node = self._record(node, 0)
        return node

    def lookup_v4(self, ip: str):
        """dotted quad → decoded record dict, or None."""
        try:
            parts = [int(x) for x in ip.split(".")]
            if len(parts) != 4 or any(not 0 <= p <= 255
                                      for p in parts):
                return None
        except ValueError:
            return None
        num = (parts[0] << 24) | (parts[1] << 16) \
            | (parts[2] << 8) | parts[3]
        node = self._ipv4_root()
        for bit in range(31, -1, -1):
            if node >= self.node_count:
                break
            node = self._record(node, (num >> bit) & 1)
        if node <= self.node_count:
            return None
        return self._data_at(node)

    def iter_v4_ranges(self):
        """Walk the IPv4 subtree → (lo, hi, record_dict) per leaf
        network. Leaf count is dimension-sized by construction (a
        GeoIP city DB is a few million networks at most)."""
        root = self._ipv4_root()
        stack = [(root, 0, 0)]          # node, prefix, depth
        while stack:
            node, prefix, depth = stack.pop()
            if node == self.node_count:
                continue                 # no data
            if node > self.node_count:
                lo = prefix << (32 - depth) if depth < 32 else prefix
                span = 1 << (32 - depth)
                yield lo, lo + span - 1, self._data_at(node)
                continue
            if depth >= 32:
                continue
            stack.append((self._record(node, 1),
                          (prefix << 1) | 1, depth + 1))
            stack.append((self._record(node, 0),
                          prefix << 1, depth + 1))

    def _data_at(self, record_value: int):
        off = record_value - self.node_count - _DATA_SEP \
            + self.data_start
        val, _ = self._decode(off, base=self.data_start)
        return val

    # -- data section decoder (spec §"Data Section") ---------------------

    def _decode(self, off: int, base: int):
        b = self.buf
        ctrl = b[off]
        off += 1
        typ = ctrl >> 5
        if typ == 0:                     # extended type
            typ = 7 + b[off]
            off += 1
        size = ctrl & 0x1F
        if typ == 1:                     # pointer
            ss = (ctrl >> 3) & 0x3
            v = ctrl & 0x7
            if ss == 0:
                ptr = (v << 8) | b[off]
                off += 1
            elif ss == 1:
                ptr = ((v << 16) | (b[off] << 8) | b[off + 1]) + 2048
                off += 2
            elif ss == 2:
                ptr = ((v << 24) | (b[off] << 16) | (b[off + 1] << 8)
                       | b[off + 2]) + 526336
                off += 3
            else:
                ptr = struct.unpack_from(">I", b, off)[0]
                off += 4
            val, _ = self._decode(base + ptr, base)
            return val, off
        if size == 29:
            size = 29 + b[off]
            off += 1
        elif size == 30:
            size = 285 + struct.unpack_from(">H", b, off)[0]
            off += 2
        elif size == 31:
            size = 821 + (struct.unpack_from(">I", b, off - 1)[0]
                          & 0xFFFFFF)
            off += 3
        if typ == 2:                     # utf8
            return b[off:off + size].decode("utf-8"), off + size
        if typ == 3:                     # double
            return struct.unpack_from(">d", b, off)[0], off + 8
        if typ == 4:                     # bytes
            return b[off:off + size], off + size
        if typ in (5, 6, 9, 10):         # unsigned ints
            return int.from_bytes(b[off:off + size], "big"), off + size
        if typ == 7:                     # map
            out = {}
            for _ in range(size):
                k, off = self._decode(off, base)
                v, off = self._decode(off, base)
                out[k] = v
            return out, off
        if typ == 8:                     # int32
            return int.from_bytes(b[off:off + size], "big",
                                  signed=True), off + size
        if typ == 11:                    # array
            arr = []
            for _ in range(size):
                v, off = self._decode(off, base)
                arr.append(v)
            return arr, off
        if typ == 14:                    # boolean (size IS the value)
            return bool(size), off
        if typ == 15:                    # float
            return struct.unpack_from(">f", b, off)[0], off + 4
        raise MMDBError(f"unsupported data type {typ}")


def mmdb_ranges_df(spark, path: str):
    """.mmdb → DataFrame(range_lo, range_hi, record) with the record
    as JSON text — the broadcast side of geoip_range_join."""
    reader = MMDBReader(path)
    rows = [(lo, hi, json.dumps(rec, ensure_ascii=False))
            for lo, hi, rec in reader.iter_v4_ranges()]
    return spark.createDataFrame(
        rows, "range_lo long, range_hi long, record string")
