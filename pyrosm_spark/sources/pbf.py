"""Native .osm.pbf source and sink — a from-scratch OSM PBF codec.

Closes the engine's last product-boundary gaps vs the reference
(S4-S7 ingest: ``pbfreader.pyx:48-98``, ``primitive_block_decoder.pyx``;
S10/S11 byte-level export: ``pbf_export.pyx:551-638``, ``pbf_writer.py``)
WITHOUT porting them: everything here is derived from the public
OSM PBF format specification (fileformat.proto / osmformat.proto wire
layout), implemented as numpy-vectorized kernels + Spark distribution.

Layout of a .pbf file (public spec):

* repeated blobs, each: 4-byte big-endian length, ``BlobHeader``
  protobuf {1: type str, 3: datasize}, then datasize bytes of ``Blob``
  {1: raw bytes | 3: zlib bytes, 2: raw_size};
* first blob type ``OSMHeader`` (bbox in nanodegrees, feature flags),
  then ``OSMData`` blobs, each one zlib-compressed ``PrimitiveBlock``
  {1: string table, 2: primitive groups, 17: granularity=100,
  18: date_granularity=1000, 19/20: lat/lon offset};
* DenseNodes pack ids/lats/lons as delta-coded zigzag varints with
  tags as interleaved string-table indices; ways delta-code their node
  refs; relations delta-code member ids.

Scale shape: the WRITER encodes blocks per partition inside
``mapInPandas`` (the numeric payloads — deltas, zigzag, varint bytes —
are fully numpy-vectorized; only message framing touches per-element
Python) and the driver streams the framed blobs to the file in
partition order via ``toLocalIterator`` (bounded memory: one blob at a
time). The READER scans only the ~20-byte blob headers driver-side to
build an (offset, length) index, then decodes blobs DISTRIBUTED in
``mapInPandas`` — the classic Hadoop PBF input-format split strategy,
so a planet file decodes with one task per blob range, not one driver
pass.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pandas as pd

GRANULARITY = 100           # nanodegree units per coordinate step
DATE_GRANULARITY = 1000     # Info timestamps stored in seconds
_NANO = 1_000_000_000

_MEMBER_TYPES = ("node", "way", "relation")
_MEMBER_CODE = {t: i for i, t in enumerate(_MEMBER_TYPES)}


# --------------------------------------------------------------------------
# varint / zigzag kernels (vectorized)
# --------------------------------------------------------------------------

def encode_uvarints(vals) -> bytes:
    """Protobuf base-128 varints for an int array, vectorized: byte
    counts by threshold comparison, then <=10 scatter passes (one per
    varint byte position) instead of a per-value loop."""
    v = np.asarray(vals, dtype=np.uint64)
    if v.size == 0:
        return b""
    nb = np.ones(v.shape, dtype=np.int64)
    for b in range(1, 10):
        nb += (v >= (np.uint64(1) << np.uint64(7 * b))).astype(np.int64)
    ends = np.cumsum(nb)
    out = np.empty(int(ends[-1]), dtype=np.uint8)
    starts = ends - nb
    for b in range(10):
        m = nb > b
        if not m.any():
            break
        idx = starts[m] + b
        byte = (v[m] >> np.uint64(7 * b)) & np.uint64(0x7F)
        cont = (nb[m] - 1 > b)
        out[idx] = byte.astype(np.uint8) | (cont.astype(np.uint8) << 7)
    return out.tobytes()


def decode_uvarints(buf) -> np.ndarray:
    """Inverse of :func:`encode_uvarints` over a packed byte buffer,
    vectorized: terminator bytes (high bit clear) mark value ends; the
    per-byte contributions scatter-OR into their value slot.

    Buffers under ~128 bytes (way refs, per-element tag lists) take a
    scalar loop instead — numpy's fixed per-call overhead dominates
    tiny arrays by ~20x."""
    raw = bytes(buf)
    if len(raw) < 128:
        out = []
        val = 0
        shift = 0
        for byte in raw:
            val |= (byte & 0x7F) << shift
            if byte & 0x80:
                shift += 7
            else:
                out.append(val & 0xFFFFFFFFFFFFFFFF)
                val = 0
                shift = 0
        return np.array(out, dtype=np.uint64)
    b = np.frombuffer(raw, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    end = (b & 0x80) == 0
    g = np.zeros(b.size, dtype=np.int64)
    g[1:] = np.cumsum(end[:-1])
    starts = np.flatnonzero(np.concatenate(([True], end[:-1])))
    pos = np.arange(b.size, dtype=np.int64) - starts[g]
    vals = np.zeros(int(end.sum()), dtype=np.uint64)
    contrib = (b.astype(np.uint64) & np.uint64(0x7F)) << (
        np.uint64(7) * pos.astype(np.uint64))
    np.bitwise_or.at(vals, g, contrib)
    return vals


def zigzag_encode(v) -> np.ndarray:
    v = np.asarray(v, dtype=np.int64)
    return (v.astype(np.uint64) << np.uint64(1)) ^ (
        (v >> 63).astype(np.uint64))


def zigzag_decode(u) -> np.ndarray:
    u = np.asarray(u, dtype=np.uint64)
    return ((u >> np.uint64(1)).astype(np.int64)) ^ -(
        (u & np.uint64(1)).astype(np.int64))


def _read_uvarint(buf, i: int):
    """Scalar varint for envelope parsing (message keys/lengths)."""
    shift = 0
    val = 0
    while True:
        byte = buf[i]
        i += 1
        val |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return val, i
        shift += 7


def parse_message(buf):
    """Minimal generic wire parser: [(field, wire_type, value)] where
    value is an int for varints and a memoryview for length-delimited
    fields. Enough protobuf to read every OSM PBF envelope message."""
    buf = memoryview(buf)
    i, out = 0, []
    n = len(buf)
    while i < n:
        key, i = _read_uvarint(buf, i)
        f, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_uvarint(buf, i)
        elif wt == 2:
            ln, i = _read_uvarint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        out.append((f, wt, v))
    return out


def _fields(msg_fields, field):
    return [v for f, _wt, v in msg_fields if f == field]


def _first(msg_fields, field, default=None):
    for f, _wt, v in msg_fields:
        if f == field:
            return v
    return default


def _sint64(v) -> int:
    """Plain protobuf int64 varint -> signed: negatives arrive as
    two's-complement uint64 (way/relation ids can be negative —
    synthesized elements conventionally use negative ids)."""
    v = int(v)
    return v - (1 << 64) if v >= (1 << 63) else v


# --------------------------------------------------------------------------
# message building
# --------------------------------------------------------------------------

def _key_bytes(field: int, wt: int) -> bytes:
    return encode_uvarints([(field << 3) | wt])


def _len_field(field: int, payload: bytes) -> bytes:
    return _key_bytes(field, 2) + encode_uvarints([len(payload)]) + bytes(
        payload)


def _varint_field(field: int, value: int) -> bytes:
    return _key_bytes(field, 0) + encode_uvarints([value & 0xFFFFFFFFFFFFFFFF])


def _packed(field: int, uvarints: np.ndarray) -> bytes:
    if np.asarray(uvarints).size == 0:
        return b""
    return _len_field(field, encode_uvarints(uvarints))


def _delta_zz(vals) -> np.ndarray:
    v = np.asarray(vals, dtype=np.int64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint64)
    d = np.empty_like(v)
    d[0] = v[0]
    d[1:] = v[1:] - v[:-1]
    return zigzag_encode(d)


def _undelta(vals: np.ndarray) -> np.ndarray:
    return np.cumsum(vals.astype(np.int64))


def _info_bytes(version, timestamp, changeset, visible) -> bytes:
    out = b""
    if version is not None:
        out += _varint_field(1, int(version))
    if timestamp is not None:
        out += _varint_field(2, int(timestamp))
    if changeset is not None:
        out += _varint_field(3, int(changeset))
    if visible is not None:
        out += _varint_field(6, 1 if visible else 0)
    return out


class _StringTable:
    """Per-block string table. Index 0 is RESERVED (the spec uses it as
    the DenseNodes keys_vals delimiter), so no real key/value/role may
    resolve to it — an empty string used as an actual value gets its
    own fresh entry."""

    def __init__(self):
        self._index: dict = {}
        self._items = [""]

    def add(self, s: str) -> int:
        i = self._index.get(s)
        if i is None:
            i = len(self._items)
            self._index[s] = i
            self._items.append(s)
        return i

    def encode(self) -> bytes:
        return b"".join(_len_field(1, s.encode("utf-8"))
                        for s in self._items)


def _block_envelope(st: _StringTable, groups: bytes) -> bytes:
    return (
        _len_field(1, st.encode())
        + groups
        + _varint_field(17, GRANULARITY)
        + _varint_field(18, DATE_GRANULARITY)
    )


def _coord_units(deg: np.ndarray) -> np.ndarray:
    return np.round(np.asarray(deg, dtype=np.float64) * _NANO
                    / GRANULARITY).astype(np.int64)


def encode_dense_nodes_block(pdf: pd.DataFrame) -> bytes:
    """One PrimitiveBlock holding all rows of ``pdf`` as DenseNodes.
    ids/lats/lons delta-zigzag packed (vectorized); tags interleave
    string-table indices with 0 terminators per node."""
    st = _StringTable()
    ids = pdf["id"].to_numpy(dtype=np.int64)
    lats = _coord_units(pdf["lat"].to_numpy(dtype=np.float64))
    lons = _coord_units(pdf["lon"].to_numpy(dtype=np.float64))

    kv: list = []
    any_tags = False
    for tags in pdf["tags"]:
        tags = _as_tag_dict(tags)
        if tags:
            any_tags = True
            for k, v in tags.items():
                kv.append(st.add(str(k)))
                kv.append(st.add("" if v is None else str(v)))
        kv.append(0)
    dense = (
        _packed(1, _delta_zz(ids))
        + _len_field(5, _dense_info(pdf))
        + _packed(8, _delta_zz(lats))
        + _packed(9, _delta_zz(lons))
        + (_packed(10, np.asarray(kv, dtype=np.int64).astype(np.uint64))
           if any_tags else b"")
    )
    group = _len_field(2, dense)
    return _block_envelope(st, _len_field(2, group))


def _int_col(pdf: pd.DataFrame, name: str, default: int = 0) -> np.ndarray:
    """Column as int64 with nulls (Arrow NaN/None) -> ``default``."""
    if name not in pdf:
        return np.full(len(pdf), default, dtype=np.int64)
    return (pd.to_numeric(pdf[name], errors="coerce")
            .fillna(default).to_numpy(dtype=np.int64))


def _dense_info(pdf: pd.DataFrame) -> bytes:
    out = _packed(1, _int_col(pdf, "version").astype(np.uint64))
    out += _packed(2, _delta_zz(_int_col(pdf, "timestamp")))
    out += _packed(3, _delta_zz(_int_col(pdf, "changeset")))
    # .astype(bool) before to_numpy: object-dtype fillna stops
    # silently downcasting under pandas 3 (FutureWarning per task)
    vis = (pdf["visible"].fillna(True).astype(bool).to_numpy(dtype=bool)
           if "visible" in pdf else np.ones(len(pdf), dtype=bool))
    out += _packed(6, vis.astype(np.uint64))
    return out


def _as_tag_dict(tags) -> dict:
    """Arrow hands MapType columns to pandas as list-of-(k, v) tuples;
    plain dicts pass through; None/empty -> {}."""
    if tags is None:
        return {}
    if isinstance(tags, dict):
        return tags
    if len(tags) == 0:
        return {}
    return dict(tags)


def _tags_fields(st: _StringTable, tags) -> bytes:
    tags = _as_tag_dict(tags)
    if not tags:
        return b""
    keys = [st.add(str(k)) for k in tags]
    vals = [st.add("" if v is None else str(v)) for v in tags.values()]
    return (_packed(2, np.asarray(keys, dtype=np.uint64))
            + _packed(3, np.asarray(vals, dtype=np.uint64)))


def _opt_int(v, default=None):
    if v is None:
        return default
    if isinstance(v, float) and np.isnan(v):
        return default
    return int(v)


def _row_info(row) -> bytes:
    vis = row.get("visible", True)
    return _info_bytes(
        _opt_int(row.get("version"), 0),
        _opt_int(row.get("timestamp"), 0),
        _opt_int(row.get("changeset")),
        True if vis is None else bool(vis),
    )


def encode_ways_block(pdf: pd.DataFrame) -> bytes:
    """One PrimitiveBlock of Way messages; refs delta-zigzag packed."""
    st = _StringTable()
    ways = []
    for _, row in pdf.iterrows():
        raw = row["refs"]
        refs = (np.empty(0, dtype=np.int64) if raw is None
                else np.asarray(raw, dtype=np.int64))
        msg = (
            _varint_field(1, int(row["id"]))
            + _tags_fields(st, row["tags"])
            + _len_field(4, _row_info(row))
            + _packed(8, _delta_zz(refs))
        )
        ways.append(_len_field(3, msg))
    return _block_envelope(st, _len_field(2, b"".join(ways)))


def encode_relations_block(pdf: pd.DataFrame) -> bytes:
    """One PrimitiveBlock of Relation messages; member ids delta-coded,
    roles via the string table, member types as the spec enum. Relation
    OWN ids are plain (never delta) — reference regression #170."""
    st = _StringTable()
    rels = []
    for _, row in pdf.iterrows():
        members = row["members"]
        members = [] if members is None else list(members)
        roles = np.asarray(
            [st.add(m["member_role"] or "") for m in members],
            dtype=np.uint64)
        memids = np.asarray([int(m["member_id"]) for m in members],
                            dtype=np.int64)
        types = np.asarray(
            [_MEMBER_CODE[str(m["member_type"]).lower()] for m in members],
            dtype=np.uint64)
        msg = (
            _varint_field(1, int(row["id"]))
            + _tags_fields(st, row["tags"])
            + _len_field(4, _row_info(row))
            + _packed(8, roles)
            + _packed(9, _delta_zz(memids))
            + _packed(10, types)
        )
        rels.append(_len_field(4, msg))
    return _block_envelope(st, _len_field(2, b"".join(rels)))


def encode_header_block(bbox=None, history: bool = False) -> bytes:
    out = b""
    if bbox is not None:
        minx, miny, maxx, maxy = bbox
        bb = b"".join(
            _key_bytes(f, 0) + encode_uvarints(
                [int(zigzag_encode(np.int64(round(v * _NANO))))])
            for f, v in ((1, minx), (2, maxx), (3, maxy), (4, miny)))
        out += _len_field(1, bb)
    for feat in ("OsmSchema-V0.6", "DenseNodes"):
        out += _len_field(4, feat.encode())
    if history:
        # REQUIRED feature (field 4): readers that can't interpret
        # multiple versions per id must reject the file rather than
        # treat them as distinct live elements (osmium and the
        # reference's valid_header_block both read it from
        # required_features, utils/__init__.py:230-233)
        out += _len_field(4, b"HistoricalInformation")
    out += _len_field(16, b"pyrosm_spark")
    return out


def frame_blob(blob_type: str, payload: bytes) -> bytes:
    """zlib-compress a block payload and wrap it in the length-prefixed
    BlobHeader + Blob framing."""
    z = zlib.compress(payload)
    blob = _varint_field(2, len(payload)) + _len_field(3, z)
    header = (_len_field(1, blob_type.encode())
              + _varint_field(3, len(blob)))
    return struct.pack(">i", len(header)) + header + blob


# --------------------------------------------------------------------------
# decoding
# --------------------------------------------------------------------------

def iter_blob_index(path: str):
    """Driver-side blob index: yields (type, offset, length) reading
    only the tiny BlobHeaders (seek-skips every payload)."""
    with open(path, "rb") as f:
        while True:
            l4 = f.read(4)
            if len(l4) < 4:
                return
            hdr = f.read(int.from_bytes(l4, "big"))
            fields = parse_message(hdr)
            btype = bytes(_first(fields, 1, b"")).decode()
            datasize = int(_first(fields, 3, 0))
            off = f.tell()
            yield btype, off, datasize
            f.seek(off + datasize)


def decompress_blob(data: bytes) -> bytes:
    fields = parse_message(data)
    raw = _first(fields, 1)
    if raw is not None:
        return bytes(raw)
    z = _first(fields, 3)
    if z is not None:
        return zlib.decompress(bytes(z))
    raise ValueError("unsupported Blob compression (only raw/zlib)")


def _decode_string_table(env) -> list:
    st_msg = _first(env, 1)
    if st_msg is None:
        return [""]
    return [bytes(s).decode("utf-8", "replace")
            for s in _fields(parse_message(st_msg), 1)]


def _info_from_msg(msg, date_gran: int):
    """(version, timestamp_s, changeset, visible) with spec defaults."""
    if msg is None:
        return 0, 0, 0, True
    f = parse_message(msg)
    # timestamp/changeset are plain int64 fields: negatives (pre-1970
    # timestamps) arrive as two's-complement uint64 varints
    ts = _sint64(_first(f, 2, 0)) * date_gran // 1000
    return (int(_first(f, 1, 0)), ts, _sint64(_first(f, 3, 0)),
            bool(int(_first(f, 6, 1))))


def decode_primitive_block(payload: bytes) -> dict:
    """PrimitiveBlock -> {'nodes': DataFrame, 'ways': ..., 'relations':
    ...} (keys only for element types present). Dense numeric payloads
    decode vectorized; tags resolve through the block string table."""
    env = parse_message(payload)
    strings = _decode_string_table(env)
    gran = int(_first(env, 17, GRANULARITY))
    date_gran = int(_first(env, 18, DATE_GRANULARITY))
    # int64 fields (NOT sint64): negative offsets arrive as
    # two's-complement uint64 varints — without the wrap a spec-valid
    # negative offset corrupts every coordinate in the block
    lat_off = _sint64(_first(env, 19, 0))
    lon_off = _sint64(_first(env, 20, 0))
    out: dict = {}

    def coord(units):
        return (lat_off + gran * units.astype(np.float64)) / _NANO

    nodes_parts, ways_rows, rel_rows = [], [], []
    for grp in _fields(env, 2):
        g = parse_message(grp)
        dense = _first(g, 2)
        if dense is not None:
            d = parse_message(dense)
            ids = _undelta(zigzag_decode(decode_uvarints(_first(d, 1, b""))))
            lats = _undelta(zigzag_decode(decode_uvarints(_first(d, 8, b""))))
            lons = _undelta(zigzag_decode(decode_uvarints(_first(d, 9, b""))))
            n = len(ids)
            kv = decode_uvarints(_first(d, 10, b"")).astype(np.int64)
            tags = _dense_tags(kv, n, strings)
            info = _first(d, 5)
            if info is not None:
                i = parse_message(info)
                versions = decode_uvarints(_first(i, 1, b"")).astype(
                    np.int64)
                ts = _undelta(zigzag_decode(
                    decode_uvarints(_first(i, 2, b"")))) * date_gran // 1000
                cs = _undelta(zigzag_decode(
                    decode_uvarints(_first(i, 3, b""))))
                vis = decode_uvarints(_first(i, 6, b"")).astype(bool)
            else:
                versions = ts = cs = np.zeros(0, dtype=np.int64)
                vis = np.zeros(0, dtype=bool)

            def col(arr, default, n=n):
                return arr if len(arr) == n else np.full(n, default)

            nodes_parts.append(pd.DataFrame({
                "id": ids,
                "lat": coord(np.asarray(lats)),
                "lon": (lon_off + gran * np.asarray(
                    lons).astype(np.float64)) / _NANO,
                "tags": tags,
                "version": col(versions, 0),
                "changeset": col(cs, 0),
                "timestamp": col(ts, 0),
                "visible": col(vis, True),
            }))
        for nd in _fields(g, 1):  # plain (non-dense) nodes
            f = parse_message(nd)
            tags = _plain_tags(f, strings)
            ver, ts, cs, vis = _info_from_msg(_first(f, 4), date_gran)
            nodes_parts.append(pd.DataFrame({
                "id": [int(zigzag_decode(np.uint64(_first(f, 1, 0))))],
                "lat": [float((lat_off + gran * int(zigzag_decode(
                    np.uint64(_first(f, 8, 0))))) / _NANO)],
                "lon": [float((lon_off + gran * int(zigzag_decode(
                    np.uint64(_first(f, 9, 0))))) / _NANO)],
                "tags": [tags], "version": [ver], "changeset": [cs],
                "timestamp": [ts], "visible": [vis],
            }))
        for wmsg in _fields(g, 3):
            f = parse_message(wmsg)
            refs = _undelta(zigzag_decode(
                decode_uvarints(_first(f, 8, b""))))
            ver, ts, cs, vis = _info_from_msg(_first(f, 4), date_gran)
            ways_rows.append((_sint64(_first(f, 1, 0)), refs.tolist(),
                              _plain_tags(f, strings), ver, cs, ts, vis))
        for rmsg in _fields(g, 4):
            f = parse_message(rmsg)
            roles = decode_uvarints(_first(f, 8, b"")).astype(np.int64)
            memids = _undelta(zigzag_decode(
                decode_uvarints(_first(f, 9, b""))))
            types = decode_uvarints(_first(f, 10, b"")).astype(np.int64)
            members = [
                {"member_id": int(m),
                 "member_type": _MEMBER_TYPES[int(t)],
                 "member_role": strings[int(r)]}
                for m, t, r in zip(memids, types, roles)
            ]
            ver, ts, cs, vis = _info_from_msg(_first(f, 4), date_gran)
            rel_rows.append((_sint64(_first(f, 1, 0)), members,
                             _plain_tags(f, strings), ver, cs, ts, vis))

    if nodes_parts:
        out["nodes"] = pd.concat(nodes_parts, ignore_index=True)
    if ways_rows:
        out["ways"] = pd.DataFrame(
            ways_rows, columns=["id", "refs", "tags", "version",
                                "changeset", "timestamp", "visible"])
    if rel_rows:
        out["relations"] = pd.DataFrame(
            rel_rows, columns=["id", "members", "tags", "version",
                               "changeset", "timestamp", "visible"])
    return out


def _dense_tags(kv: np.ndarray, n: int, strings: list) -> list:
    if kv.size == 0:
        return [{} for _ in range(n)]
    ends = np.flatnonzero(kv == 0)
    tags, start = [], 0
    for e in ends:
        pairs = kv[start:e]
        tags.append({strings[pairs[i]]: strings[pairs[i + 1]]
                     for i in range(0, len(pairs), 2)})
        start = e + 1
    while len(tags) < n:
        tags.append({})
    return tags[:n]


def _plain_tags(msg_fields, strings: list) -> dict:
    keys = decode_uvarints(_first(msg_fields, 2, b"")).astype(np.int64)
    vals = decode_uvarints(_first(msg_fields, 3, b"")).astype(np.int64)
    return {strings[int(k)]: strings[int(v)] for k, v in zip(keys, vals)}


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------

_UNION_SCHEMA = (
    "osm_type string, id long, lon double, lat double, "
    "refs array<long>, "
    "members array<struct<member_id:long, member_type:string, "
    "member_role:string>>, "
    "tags map<string,string>, version int, changeset long, "
    "timestamp long, visible boolean"
)


def read_pbf_union(spark, path: str, partitions: int | None = None):
    """All elements of a .pbf as one DataFrame with an ``osm_type``
    discriminator; blob decode runs distributed over the driver-built
    blob index (one task range per blob). ``path`` may also be a
    directory of shard files (``write_pbf_sharded`` output — every
    ``*.pbf`` inside is read).

    Cluster note: tasks open ``path`` directly, so on a real cluster it
    must live on storage every executor mounts (NFS/fuse-mounted object
    store) — the standard contract for any non-Hadoop file source. The
    blob index itself reads only the ~20-byte headers (seek-skipping
    payloads), so indexing a planet file is a few MB of driver I/O."""
    path = os.path.abspath(path)
    if os.path.isdir(path):
        import glob as _glob

        files = sorted(_glob.glob(os.path.join(path, "*.pbf")))
        if not files:
            raise ValueError(f"no .pbf files in directory {path}")
    else:
        files = [path]
    _SUPPORTED_FEATURES = {"OsmSchema-V0.6", "DenseNodes",
                           "HistoricalInformation"}
    for f in files:
        # header validation, reference valid_header_block
        # (utils/__init__.py:230-233): an unknown REQUIRED feature
        # means the file can't be interpreted correctly — reject
        # instead of silently misreading (e.g. LocationsOnWays)
        with open(f, "rb") as fh:
            head = fh.read(64 * 1024)
        for t, off, ln in iter_blob_index(f):
            if t != "OSMHeader":
                break
            if off + ln <= len(head):
                env = parse_message(decompress_blob(head[off:off + ln]))
                for fld, _wt, v in env:
                    if fld == 4 and bytes(v).decode(
                            "utf-8", "replace") not in _SUPPORTED_FEATURES:
                        raise ValueError(
                            "Required feature %s not implemented!"
                            % bytes(v).decode("utf-8", "replace"))
            break
    index = [
        (f, off, ln)
        for f in files
        for t, off, ln in iter_blob_index(f)
        if t == "OSMData"
    ]
    if not index:
        # header-only file (e.g. an empty crop): valid, zero elements
        return spark.createDataFrame([], _UNION_SCHEMA)
    idx = spark.createDataFrame(
        index, "path string, offset long, length long")
    parts = partitions or min(len(index),
                              spark.sparkContext.defaultParallelism)

    def decode(batches):
        for pdf in batches:
            frames = []
            for p, off, ln in zip(pdf["path"], pdf["offset"],
                                  pdf["length"]):
                with open(p, "rb") as f:
                    f.seek(int(off))
                    payload = decompress_blob(f.read(int(ln)))
                dec = decode_primitive_block(payload)
                for typ, key in (("node", "nodes"), ("way", "ways"),
                                 ("relation", "relations")):
                    if key not in dec:
                        continue
                    fr = dec[key]
                    fr.insert(0, "osm_type", typ)
                    for c in ("lon", "lat"):
                        if c not in fr.columns:
                            fr[c] = np.full(len(fr), np.nan)
                    for c in ("refs", "members"):
                        if c not in fr.columns:
                            fr[c] = pd.Series(
                                [None] * len(fr), dtype=object)
                    frames.append(fr[[
                        "osm_type", "id", "lon", "lat", "refs",
                        "members", "tags", "version", "changeset",
                        "timestamp", "visible"]])
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return idx.repartition(parts).mapInPandas(decode, _UNION_SCHEMA)


def read_pbf(spark, path: str, partitions: int | None = None):
    """(nodes, ways, relations) DataFrames with the engine schemas of
    ``osm_source.load_osm`` — the PBF counterpart of the parquet
    source, so every downstream operator runs unchanged on .pbf
    input."""
    u = read_pbf_union(spark, path, partitions)
    from pyspark.sql import functions as F

    nodes = u.filter(F.col("osm_type") == "node").select(
        "id", "lon", "lat", "tags", "version", "changeset",
        "timestamp", "visible")
    ways = u.filter(F.col("osm_type") == "way").select(
        "id", "refs", "tags", "version", "changeset", "timestamp",
        "visible")
    rels = u.filter(F.col("osm_type") == "relation").select(
        "id", "members", "tags", "version", "changeset", "timestamp",
        "visible")
    return nodes, ways, rels


def write_pbf(nodes, ways, relations, path: str,
              block_size: int = 8000, partitions: int | None = None) -> dict:
    """Write (nodes, ways, relations) DataFrames as a single .osm.pbf.

    Encoding is distributed: each partition emits framed blobs (id-range
    partitioned so the file is globally id-sorted per element type, the
    convention readers expect); the driver streams blobs to disk in
    partition order via ``toLocalIterator`` — never holding more than
    one blob. Returns {'nodes': n, 'ways': n, 'relations': n, 'blobs':
    n}.

    ``partitions`` fixes the encode parallelism. ``partitions=1`` is
    the CANONICAL REPACK mode: block boundaries then depend only on
    (id, version) order and ``block_size``, so the same element set
    produces byte-identical files no matter how the input was sharded
    or how many workers wrote it — the reference's repack invariant
    (pyrosm.py:1251-1253). With >1 partitions, range-sampler boundary
    placement may split blocks differently run-to-run (element content
    and order are still identical)."""
    from pyspark.sql import functions as F

    # ONE nodes pass computes the header bbox AND the nodes'
    # any-invisible flag (separate jobs would re-run the whole input
    # lineage — e.g. a full blob re-decode when the input is itself a
    # read_pbf frame)
    n_aggs = [F.min("lon"), F.min("lat"), F.max("lon"), F.max("lat")]
    if "visible" in nodes.columns:
        n_aggs.append(F.max(F.when(~F.col("visible"), 1).otherwise(0)))
    stats = nodes.agg(*n_aggs).first()
    bbox = None
    if stats[0] is not None:
        bbox = (stats[0], stats[1], stats[2], stats[3])
    history = bool(len(stats) > 4 and stats[4])
    for df in (ways, relations):
        if history:
            break
        if "visible" in df.columns and df.filter(
                ~F.col("visible")).limit(1).count():
            history = True

    def blob_stream(df, cols, encoder):
        d = df
        for c in cols:
            if c not in d.columns:
                d = d.withColumn(c, F.lit(None))
        # (id, version) within each id-range partition: history files
        # carry multiple versions per id and readers expect
        # version-ascending order within an id
        d = d.select(*cols).repartitionByRange(
            partitions or max(1, d.rdd.getNumPartitions()), "id"
        ).sortWithinPartitions("id", "version")

        def enc(batches):
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            buf: list = []
            total = 0
            seq = 0
            for pdf in batches:
                if not len(pdf):
                    continue
                buf.append(pdf)
                total += len(pdf)
                if total < block_size:
                    continue
                # concat once per flush, slice by running offset —
                # never re-copy the whole shrinking tail per block
                cat = pd.concat(buf, ignore_index=True)
                off = 0
                while len(cat) - off >= block_size:
                    chunk = cat.iloc[off:off + block_size]
                    yield pd.DataFrame({
                        "pid": [pid], "seq": [seq], "n": [len(chunk)],
                        "blob": [frame_blob("OSMData", encoder(chunk))]})
                    seq += 1
                    off += block_size
                buf = [cat.iloc[off:].reset_index(drop=True)]
                total = len(buf[0])
            if total:
                cat = pd.concat(buf, ignore_index=True)
                yield pd.DataFrame({
                    "pid": [pid], "seq": [seq], "n": [len(cat)],
                    "blob": [frame_blob("OSMData", encoder(cat))]})

        # NO orderBy: mapInPandas preserves the range partitioning and
        # toLocalIterator yields partitions in index order, so (pid,
        # seq) is already the global order — a sort here would run the
        # range-sampler over the encode plan, doubling the encode work
        return d.mapInPandas(enc, "pid int, seq int, n long, blob binary")

    streams = [
        ("nodes", blob_stream(nodes, _NODE_COLS,
                              encode_dense_nodes_block)),
        ("ways", blob_stream(ways, _WAY_COLS, encode_ways_block)),
        ("relations", blob_stream(relations, _REL_COLS,
                                  encode_relations_block)),
    ]
    counts = {"blobs": 1}
    # per-process temp name: two processes racing to publish the same
    # path (check-then-act callers like _world_pbf) must not share a
    # temp file — a shared name lets writer B's open() truncate the
    # inode writer A is mid-write on, and B's replace() fails ENOENT
    # after A renames it away. Unique temps make os.replace a clean
    # last-writer-wins.
    tmp = f"{path}.inprogress-{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            f.write(frame_blob("OSMHeader",
                               encode_header_block(bbox, history)))
            for name, stream in streams:
                n = 0
                for row in stream.toLocalIterator():
                    f.write(bytes(row["blob"]))
                    n += int(row["n"])
                    counts["blobs"] += 1
                counts[name] = n
        os.replace(tmp, path)
    except BaseException:
        try:
            os.remove(tmp)
        except OSError:
            pass
        raise
    return counts


_NODE_COLS = ["id", "lon", "lat", "tags", "version", "changeset",
              "timestamp", "visible"]
_WAY_COLS = ["id", "refs", "tags", "version", "changeset", "timestamp",
             "visible"]
_REL_COLS = ["id", "members", "tags", "version", "changeset",
             "timestamp", "visible"]


def write_pbf_sharded(nodes, ways, relations, out_dir: str,
                      block_size: int = 8000,
                      partitions: int | None = None) -> dict:
    """Executor-parallel .osm.pbf sink: one shard file per id-range
    partition per element type (``nodes-00012.osm.pbf`` ...), each a
    complete standalone PBF with its own OSMHeader.

    This is the sink that scales: ``write_pbf`` streams every blob
    through the driver (fine for one interchange file, a bottleneck at
    planet size), while here every task encodes AND writes its own
    shard — the same contract as any distributed file sink, no driver
    byte-stream, wall-clock bounded by the largest partition. The shard
    directory reads back through ``read_pbf``/``read_pbf_union``
    (and each shard through any public OSM PBF tool).

    Returns {'nodes': n, 'ways': n, 'relations': n, 'files': n}.
    """
    import glob as _glob

    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    # clear shards from any PREVIOUS run: a rewrite with fewer
    # partitions would otherwise leave stale high-numbered shards that
    # read_pbf_union silently globs back in, duplicating elements
    for stale in _glob.glob(os.path.join(out_dir, "*.osm.pbf")) + \
            _glob.glob(os.path.join(out_dir, "*.osm.pbf.inprogress*")):
        base = os.path.basename(stale)
        if base.split("-", 1)[0] in ("nodes", "ways", "relations"):
            os.remove(stale)

    def shard(df, cols, encoder, typ):
        d = df
        for c in cols:
            if c not in d.columns:
                d = d.withColumn(c, F.lit(None))
        nparts = partitions or max(1, d.rdd.getNumPartitions())
        # (id, version): history readers expect version-ascending
        # order within an id
        d = d.select(*cols).repartitionByRange(
            nparts, "id").sortWithinPartitions("id", "version")

        def enc(batches):
            from pyspark import TaskContext

            tc = TaskContext.get()
            pid = tc.partitionId()
            frames = [pdf for pdf in batches if len(pdf)]
            if not frames:
                return
            cat = pd.concat(frames, ignore_index=True)
            # .astype(bool) — object-dtype fillna stops silently
            # downcasting under pandas 3; ~ on an object column of
            # Python bools would int-invert instead
            history = ("visible" in cat and bool(
                (~cat["visible"].fillna(True).astype(bool)).any()))
            bbox = None
            if typ == "nodes" and len(cat):
                bbox = (float(cat["lon"].min()), float(cat["lat"].min()),
                        float(cat["lon"].max()), float(cat["lat"].max()))
            path = os.path.join(out_dir, f"{typ}-{pid:05d}.osm.pbf")
            # attempt-unique tmp: speculative/retried attempts of the
            # same partition must never interleave writes into one
            # file before the atomic publish
            tmp = f"{path}.inprogress-{tc.taskAttemptId()}"
            nblobs = 1
            with open(tmp, "wb") as f:
                f.write(frame_blob(
                    "OSMHeader", encode_header_block(bbox, history)))
                for s in range(0, len(cat), block_size):
                    chunk = cat.iloc[s:s + block_size]
                    f.write(frame_blob("OSMData", encoder(chunk)))
                    nblobs += 1
            os.replace(tmp, path)
            yield pd.DataFrame({"typ": [typ], "path": [path],
                                "rows": [len(cat)], "blobs": [nblobs]})

        return d.mapInPandas(
            enc, "typ string, path string, rows long, blobs int")

    manifest_rows = []
    for typ, df, cols, encoder in (
            ("nodes", nodes, _NODE_COLS, encode_dense_nodes_block),
            ("ways", ways, _WAY_COLS, encode_ways_block),
            ("relations", relations, _REL_COLS, encode_relations_block)):
        manifest_rows += shard(df, cols, encoder, typ).collect()
    out = {"nodes": 0, "ways": 0, "relations": 0, "files": 0}
    for r in manifest_rows:
        out[r["typ"]] += int(r["rows"])
        out["files"] += 1
    if out["files"] == 0:
        # fully empty dataset (e.g. an empty crop): emit one
        # header-only shard so the directory round-trips through
        # read_pbf_union as an empty frame, matching write_pbf's
        # header-only empty file
        path = os.path.join(out_dir, "nodes-00000.osm.pbf")
        with open(path, "wb") as f:
            f.write(frame_blob("OSMHeader", encode_header_block(None, False)))
        out["files"] = 1
    return out
