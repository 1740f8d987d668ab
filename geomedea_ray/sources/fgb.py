"""FlatGeobuf ⇄ feature-table bridge (round-3 VERDICT item 4).

The reference's geozero CLI converts ``{geojson,fgb,csv,…}`` both ways
(reference README.md:30-43) and the geomedea format itself is "heavily
inspired by the excellent flatgeobuf project" (README.md:48) — FGB is
the one format the reference explicitly positions itself against, so a
working FGB ingest/export is the strongest remaining bridge.

No ``flatgeobuf``/``flatbuffers`` package exists in this sandbox, so
this module implements the PUBLIC FlatGeobuf 3.x specification
(https://flatgeobuf.org, schema files ``header.fbs``/``feature.fbs``
in the flatgeobuf repo, BSD-2) directly, including a minimal
FlatBuffers wire-format builder/parser (public format,
https://flatbuffers.dev/internals):

    magic(8) = 66 67 62 03 66 67 62 PP   ("fgb", major 3, "fgb", patch)
    header   = size-prefixed flatbuffer (Header table)
    index    = optional packed Hilbert R-tree (node_size>0; we WRITE
               node_size=0 — valid per spec — and SKIP it on read
               using the public node-count formula)
    features = sequence of size-prefixed flatbuffer Feature tables

Feature properties use FGB's custom binary row encoding: per non-null
value a LE u16 column index then the value (Bool=u8, Long=i64 LE,
Double=f64 LE, String/Json/DateTime = u32 len + utf8, Binary = u32
len + bytes). Geometry ``ends`` are in coordinate-pair units
(cumulative), matching the public TS/Rust implementations.

Supported geometry both ways: Point, MultiPoint, LineString,
MultiLineString, Polygon (ends), MultiPolygon (parts of Polygon
geometries), GeometryCollection (parts of heterogeneous geometries,
each part table carrying its own type code — the recursive scheme the
reference's geozero bridge uses, geozero_writer.rs:206-609; round-4
VERDICT item 6). Nested collections roundtrip recursively.

Ray side: ``read_fgb_features`` scans the size-prefixed feature
stream ONCE on the driver to collect byte spans (4 bytes of length
per feature — the stream has no other split points without an index),
then fans the spans out as byte-range chunks; each task re-reads its
range and parses into the same columnar feature table the GeoJSON/CSV
bridges emit (sources/geojson.parse_features_batch), so everything
downstream (spatial_write, bbox_slice, typed props) is shared.
"""

from __future__ import annotations

import math
import os
import struct

MAGIC_PREFIX = b"fgb\x03"
MAGIC = b"fgb\x03fgb\x01"

GEOM_TYPE_NAMES = {
    0: "Unknown", 1: "Point", 2: "LineString", 3: "Polygon",
    4: "MultiPoint", 5: "MultiLineString", 6: "MultiPolygon",
    7: "GeometryCollection",
}
GEOM_TYPE_CODES = {v: k for k, v in GEOM_TYPE_NAMES.items()}

# FGB ColumnType codes (header.fbs) — the subset we emit, all parsed.
COL_BYTE, COL_UBYTE, COL_BOOL, COL_SHORT, COL_USHORT = 0, 1, 2, 3, 4
COL_INT, COL_UINT, COL_LONG, COL_ULONG = 5, 6, 7, 8
COL_FLOAT, COL_DOUBLE, COL_STRING, COL_JSON, COL_DATETIME, COL_BINARY = (
    9, 10, 11, 12, 13, 14)

_SCALAR_COL_FMT = {
    COL_BYTE: "b", COL_UBYTE: "B", COL_BOOL: "?", COL_SHORT: "h",
    COL_USHORT: "H", COL_INT: "i", COL_UINT: "I", COL_LONG: "q",
    COL_ULONG: "Q", COL_FLOAT: "f", COL_DOUBLE: "d",
}


# --------------------------------------------------------------------
# minimal FlatBuffers builder (back-to-front; offsets tracked from the
# buffer END so they are independent of the final total size)

class FBBuilder:
    def __init__(self):
        # reversed storage: self._b[0] is the LAST byte of the buffer,
        # so extend(reversed(data)) is an O(len) logical PREPEND
        self._b = bytearray()
        self._max_align = 4

    @property
    def head(self) -> int:
        """Bytes between the current front and the buffer end."""
        return len(self._b)

    def _prep(self, align: int, upcoming: int) -> None:
        self._max_align = max(self._max_align, align)
        while (self.head + upcoming) % align:
            self._b.append(0)

    def _push(self, data: bytes) -> None:
        self._b.extend(data[::-1])

    def string(self, s: str) -> int:
        raw = s.encode("utf-8")
        # pad FIRST (padding lands after the terminator in final order)
        self._prep(4, len(raw) + 5)
        self._push(b"\x00")  # terminator (excluded from length)
        self._push(raw)
        self._push(struct.pack("<I", len(raw)))
        return self.head

    def scalar_vector(self, fmt: str, vals) -> int:
        n = len(vals)
        elem = struct.calcsize(fmt)
        payload = struct.pack(f"<{n}{fmt}", *vals)
        self._prep(max(4, elem), len(payload) + 4)
        self._push(payload)
        self._push(struct.pack("<I", n))
        return self.head

    def byte_vector(self, data: bytes) -> int:
        self._prep(4, len(data) + 4)
        self._push(bytes(data))
        self._push(struct.pack("<I", len(data)))
        return self.head

    def offset_vector(self, offs: list[int]) -> int:
        n = len(offs)
        self._prep(4, 4 * n + 4)
        vec_pos = self.head + 4 + 4 * n  # start (count field) from end
        vals = [(vec_pos - 4 - 4 * i) - offs[i] for i in range(n)]
        self._push(struct.pack(f"<{n}I", *vals))
        self._push(struct.pack("<I", n))
        return self.head

    def table(self, fields: list[tuple]) -> int:
        """fields: (slot, fmt_or_None, value). fmt None ⇒ ``value`` is
        an offset (from-end position of an already-written object)."""
        sized = []
        for slot, fmt, val in fields:
            size = 4 if fmt is None else struct.calcsize(fmt)
            sized.append((slot, fmt, val, size))
        # inline layout: larger scalars first (standard alignment trick)
        pos = 4  # after the 4-byte soffset-to-vtable
        off_in_table = {}
        for slot, fmt, val, size in sorted(sized, key=lambda f: -f[3]):
            pos += (-pos) % size
            off_in_table[slot] = pos
            pos += size
        tbl_size = pos
        max_scalar = max([4] + [s for _, f, _, s in sized if f is not None])
        self._prep(max_scalar, tbl_size)
        table_pos = self.head + tbl_size
        tb = bytearray(tbl_size)
        for slot, fmt, val, size in sized:
            o = off_in_table[slot]
            if fmt is None:
                field_pos = table_pos - o
                struct.pack_into("<I", tb, o, field_pos - val)
            else:
                struct.pack_into("<" + fmt, tb, o, val)
        self._push(bytes(tb))
        # vtable (no dedup — fine at this scale)
        nslots = (max(s for s, _, _, _ in sized) + 1) if sized else 0
        vt_size = 4 + 2 * nslots
        vt = bytearray(vt_size)
        struct.pack_into("<H", vt, 0, vt_size)
        struct.pack_into("<H", vt, 2, tbl_size)
        for slot, _, _, _ in sized:
            struct.pack_into("<H", vt, 4 + 2 * slot, off_in_table[slot])
        self._prep(2, vt_size)
        self._push(bytes(vt))
        vtable_pos = self.head
        soff = struct.pack("<i", vtable_pos - table_pos)
        for k in range(4):  # patch the table's leading soffset in place
            self._b[table_pos - 1 - k] = soff[k]
        return table_pos

    def finish_size_prefixed(self, root: int) -> bytes:
        self._prep(self._max_align, 4)
        self._push(struct.pack("<I", self.head + 4 - root))
        inner = bytes(reversed(self._b))
        return struct.pack("<I", len(inner)) + inner


# --------------------------------------------------------------------
# minimal FlatBuffers parser

class FBTable:
    __slots__ = ("buf", "pos")

    def __init__(self, buf, pos: int):
        self.buf, self.pos = buf, pos

    @classmethod
    def root(cls, buf, base: int = 0) -> "FBTable":
        (uoff,) = struct.unpack_from("<I", buf, base)
        return cls(buf, base + uoff)

    def _field(self, slot: int) -> int | None:
        (soff,) = struct.unpack_from("<i", self.buf, self.pos)
        vt = self.pos - soff
        (vt_size,) = struct.unpack_from("<H", self.buf, vt)
        entry = 4 + 2 * slot
        if entry + 2 > vt_size:
            return None
        (o,) = struct.unpack_from("<H", self.buf, vt + entry)
        return self.pos + o if o else None

    def scalar(self, slot: int, fmt: str, default):
        p = self._field(slot)
        if p is None:
            return default
        return struct.unpack_from("<" + fmt, self.buf, p)[0]

    def _indirect(self, slot: int) -> int | None:
        p = self._field(slot)
        if p is None:
            return None
        (uoff,) = struct.unpack_from("<I", self.buf, p)
        return p + uoff

    def string(self, slot: int) -> str | None:
        t = self._indirect(slot)
        if t is None:
            return None
        (n,) = struct.unpack_from("<I", self.buf, t)
        return bytes(self.buf[t + 4:t + 4 + n]).decode("utf-8")

    def scalar_vector(self, slot: int, fmt: str) -> list:
        t = self._indirect(slot)
        if t is None:
            return []
        (n,) = struct.unpack_from("<I", self.buf, t)
        return list(struct.unpack_from(f"<{n}{fmt}", self.buf, t + 4))

    def byte_vector(self, slot: int) -> bytes:
        t = self._indirect(slot)
        if t is None:
            return b""
        (n,) = struct.unpack_from("<I", self.buf, t)
        return bytes(self.buf[t + 4:t + 4 + n])

    def table_vector(self, slot: int) -> list["FBTable"]:
        t = self._indirect(slot)
        if t is None:
            return []
        (n,) = struct.unpack_from("<I", self.buf, t)
        out = []
        for i in range(n):
            p = t + 4 + 4 * i
            (uoff,) = struct.unpack_from("<I", self.buf, p)
            out.append(FBTable(self.buf, p + uoff))
        return out

    def table(self, slot: int) -> "FBTable | None":
        t = self._indirect(slot)
        return None if t is None else FBTable(self.buf, t)


# --------------------------------------------------------------------
# column typing

def _pa_type_to_col(t) -> int:
    import pyarrow as pa

    if pa.types.is_boolean(t):
        return COL_BOOL
    if pa.types.is_integer(t):
        return COL_LONG
    if pa.types.is_floating(t):
        return COL_DOUBLE
    if pa.types.is_binary(t):
        return COL_BINARY
    return COL_STRING


def _col_to_pa_type(code: int):
    import pyarrow as pa

    if code == COL_BOOL:
        return pa.bool_()
    if code in (COL_BYTE, COL_UBYTE, COL_SHORT, COL_USHORT, COL_INT,
                COL_UINT, COL_LONG, COL_ULONG):
        return pa.int64()
    if code in (COL_FLOAT, COL_DOUBLE):
        return pa.float64()
    if code == COL_BINARY:
        return pa.binary()
    return pa.string()


# --------------------------------------------------------------------
# geometry encode/decode

def _encode_geometry(b: FBBuilder, geom: dict) -> int:
    gt = geom["type"]
    code = GEOM_TYPE_CODES[gt]
    if gt == "Point":
        xy = list(geom["coordinates"])
        fields_xy, ends, parts = xy, None, None
    elif gt in ("LineString", "MultiPoint"):
        fields_xy = [v for pt in geom["coordinates"] for v in pt]
        ends, parts = None, None
    elif gt == "Polygon":
        rings = geom["coordinates"]
        fields_xy = [v for r in rings for pt in r for v in pt]
        ends = None
        if len(rings) > 1:
            acc, ends = 0, []
            for r in rings:
                acc += len(r)
                ends.append(acc)  # pair units, cumulative (public impls)
        parts = None
    elif gt == "MultiLineString":
        lines = geom["coordinates"]
        fields_xy = [v for ln in lines for pt in ln for v in pt]
        ends = None
        if len(lines) > 1:
            acc, ends = 0, []
            for ln in lines:
                acc += len(ln)
                ends.append(acc)
        parts = None
    elif gt == "MultiPolygon":
        parts = [
            _encode_geometry(b, {"type": "Polygon", "coordinates": poly})
            for poly in geom["coordinates"]
        ]
        fields_xy, ends = None, None
    elif gt == "GeometryCollection":
        # heterogeneous parts, each carrying its own type code (slot 6)
        # — same parts-vector mechanism as MultiPolygon, recursive per
        # the FGB spec / the reference's geozero GC handling
        parts = [_encode_geometry(b, g2) for g2 in geom["geometries"]]
        fields_xy, ends = None, None
    else:
        raise NotImplementedError(f"FGB bridge does not encode {gt}")
    fields = []
    if parts:
        fields.append((7, None, b.offset_vector(parts)))
    if fields_xy is not None and fields_xy:
        fields.append((1, None, b.scalar_vector("d", fields_xy)))
    if ends:
        fields.append((0, None, b.scalar_vector("I", ends)))
    fields.append((6, "B", code))
    return b.table(fields)


def _pairs(xy: list) -> list[list[float]]:
    return [[xy[i], xy[i + 1]] for i in range(0, len(xy), 2)]


def _split_ends(xy: list, ends: list[int]) -> list[list[list[float]]]:
    pts = _pairs(xy)
    if not ends:
        return [pts]
    out, s = [], 0
    for e in ends:
        out.append(pts[s:e])
        s = e
    return out


def _decode_geometry(g: FBTable, header_type: int) -> dict:
    code = g.scalar(6, "B", 0) or header_type
    gt = GEOM_TYPE_NAMES.get(code)
    xy = g.scalar_vector(1, "d")
    ends = g.scalar_vector(0, "I")
    if gt == "Point":
        return {"type": "Point", "coordinates": [xy[0], xy[1]]}
    if gt in ("LineString", "MultiPoint"):
        return {"type": gt, "coordinates": _pairs(xy)}
    if gt == "Polygon":
        return {"type": "Polygon", "coordinates": _split_ends(xy, ends)}
    if gt == "MultiLineString":
        return {"type": "MultiLineString",
                "coordinates": _split_ends(xy, ends)}
    if gt == "MultiPolygon":
        polys = [
            _decode_geometry(p, GEOM_TYPE_CODES["Polygon"])["coordinates"]
            for p in g.table_vector(7)
        ]
        return {"type": "MultiPolygon", "coordinates": polys}
    if gt == "GeometryCollection":
        # each part table carries its own type code — header_type 0
        # forces the part to self-describe (parts always encode slot 6)
        return {"type": "GeometryCollection",
                "geometries": [_decode_geometry(p, 0) for p in g.table_vector(7)]}
    raise NotImplementedError(f"FGB bridge does not decode type code {code}")


# --------------------------------------------------------------------
# properties encode/decode

def _encode_properties(props: dict, columns: list[tuple[str, int]]) -> bytes:
    out = bytearray()
    for idx, (name, code) in enumerate(columns):
        v = props.get(name)
        if v is None:
            continue  # null ⇒ omitted from the row blob (spec)
        out += struct.pack("<H", idx)
        if code in _SCALAR_COL_FMT:
            if code == COL_BOOL:
                out += struct.pack("<?", bool(v))
            elif code in (COL_FLOAT, COL_DOUBLE):
                out += struct.pack("<" + _SCALAR_COL_FMT[code], float(v))
            else:
                out += struct.pack("<" + _SCALAR_COL_FMT[code], int(v))
        elif code == COL_BINARY:
            raw = bytes(v)
            out += struct.pack("<I", len(raw)) + raw
        else:  # String / Json / DateTime
            raw = str(v).encode("utf-8")
            out += struct.pack("<I", len(raw)) + raw
    return bytes(out)


def _decode_properties(blob: bytes, columns: list[tuple[str, int]]) -> dict:
    props: dict = {}
    pos, n = 0, len(blob)
    while pos + 2 <= n:
        (idx,) = struct.unpack_from("<H", blob, pos)
        pos += 2
        name, code = columns[idx]
        if code in _SCALAR_COL_FMT:
            fmt = _SCALAR_COL_FMT[code]
            (v,) = struct.unpack_from("<" + fmt, blob, pos)
            pos += struct.calcsize(fmt)
            if code == COL_BOOL:
                v = bool(v)
            elif code in (COL_FLOAT, COL_DOUBLE):
                v = float(v)
            else:
                v = int(v)
        else:
            (ln,) = struct.unpack_from("<I", blob, pos)
            pos += 4
            raw = blob[pos:pos + ln]
            pos += ln
            v = bytes(raw) if code == COL_BINARY else raw.decode("utf-8")
        props[name] = v
    return props


# --------------------------------------------------------------------
# file writer

def _feature_bounds(geom: dict, lo, hi):
    t = geom["type"]
    if t == "Point":
        pts = [geom["coordinates"]]
    elif t in ("LineString", "MultiPoint"):
        pts = geom["coordinates"]
    elif t in ("Polygon", "MultiLineString"):
        pts = [p for part in geom["coordinates"] for p in part]
    elif t == "MultiPolygon":
        pts = [p for poly in geom["coordinates"] for ring in poly
               for p in ring]
    elif t == "GeometryCollection":
        for g2 in geom["geometries"]:
            _feature_bounds(g2, lo, hi)
        return
    else:
        raise NotImplementedError(
            f"FGB bridge does not encode {t} (see module docstring)")
    for x, y in pts:
        lo[0] = min(lo[0], x); lo[1] = min(lo[1], y)
        hi[0] = max(hi[0], x); hi[1] = max(hi[1], y)


def write_fgb(path: str, features: list[dict], name: str = "geomedea_ray",
              prop_types: dict | None = None) -> int:
    """GeoJSON-style Feature dicts → a FlatGeobuf 3 file (no spatial
    index: ``index_node_size=0``, valid per spec). Column schema is
    inferred from properties exactly like the GeoJSON bridge
    (``infer_prop_types``) unless ``prop_types`` is given.
    Returns the feature count."""
    from geomedea_ray.sources.geojson import infer_prop_types

    if prop_types is None:
        prop_types = {
            k: t for k, t in infer_prop_types(features).items()
            if not str(t).startswith(("list", "map"))
        }
    columns = [(k, _pa_type_to_col(t)) for k, t in sorted(prop_types.items())]

    geom_codes = {GEOM_TYPE_CODES[f["geometry"]["type"]] for f in features
                  if f.get("geometry")}
    header_type = geom_codes.pop() if len(geom_codes) == 1 else 0

    lo, hi = [math.inf, math.inf], [-math.inf, -math.inf]
    for f in features:
        if f.get("geometry"):
            _feature_bounds(f["geometry"], lo, hi)
    envelope = [] if math.isinf(lo[0]) else [lo[0], lo[1], hi[0], hi[1]]

    hb = FBBuilder()
    col_offs = []
    for cname, code in columns:
        noff = hb.string(cname)
        col_offs.append(hb.table([(0, None, noff), (1, "B", code)]))
    hfields: list[tuple] = [(0, None, hb.string(name))]
    if envelope:
        hfields.append((1, None, hb.scalar_vector("d", envelope)))
    if col_offs:
        hfields.append((7, None, hb.offset_vector(col_offs)))
    hfields.append((2, "B", header_type))
    hfields.append((8, "Q", len(features)))
    hfields.append((9, "H", 0))  # index_node_size=0 ⇒ no index section
    header = hb.finish_size_prefixed(hb.table(hfields))

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(header)
        for feat in features:
            fb = FBBuilder()
            fields: list[tuple] = []
            blob = _encode_properties(feat.get("properties") or {}, columns)
            if blob:
                fields.append((1, None, fb.byte_vector(blob)))
            if feat.get("geometry"):
                fields.append((0, None, _encode_geometry(fb, feat["geometry"])))
            f.write(fb.finish_size_prefixed(fb.table(fields)))
    os.replace(tmp, path)
    return len(features)


# --------------------------------------------------------------------
# file reader

def packed_rtree_size(num_items: int, node_size: int) -> int:
    """Size in bytes of FGB's packed Hilbert R-tree section (public
    formula: 40-byte nodes — 4 f64 bounds + u64 offset — level sizes
    ceil-divided up to the root)."""
    if num_items == 0 or node_size == 0:
        return 0
    node_size = max(node_size, 2)
    n, total = num_items, num_items
    while n != 1:
        n = (n + node_size - 1) // node_size
        total += n
    return total * 40


def read_fgb_header(path: str):
    """→ (columns [(name, code)], header_type, features_count,
    feature_section_offset)."""
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic[:4] != MAGIC_PREFIX:
            raise ValueError(f"{path}: not a FlatGeobuf 3 file "
                             f"(magic {magic[:4]!r})")
        (hsize,) = struct.unpack("<I", f.read(4))
        hbuf = f.read(hsize)
        h = FBTable.root(hbuf)
        columns = [(c.string(0), c.scalar(1, "B", 0))
                   for c in h.table_vector(7)]
        header_type = h.scalar(2, "B", 0)
        count = h.scalar(8, "Q", 0)
        node_size = h.scalar(9, "H", 16)
        feat_off = 8 + 4 + hsize + packed_rtree_size(count, node_size)
    return columns, header_type, count, feat_off


def scan_feature_spans(path: str) -> list[tuple[int, int]]:
    """One sequential pass over the size-prefixed feature stream →
    [(offset, nbytes)] per feature (offset of the u32 size prefix).
    This is the only way to find split points in an unindexed FGB."""
    _, _, count, off = read_fgb_header(path)
    spans = []
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        f.seek(off)
        while off + 4 <= size and len(spans) < count:
            (n,) = struct.unpack("<I", f.read(4))
            spans.append((off, 4 + n))
            off += 4 + n
            f.seek(off)
    if len(spans) != count:
        raise ValueError(f"{path}: header says {count} features, "
                         f"stream has {len(spans)}")
    return spans


def _parse_feature_blob(buf: bytes, columns, header_type: int) -> dict:
    feat = FBTable.root(buf, 4)  # skip the u32 size prefix
    props = _decode_properties(feat.byte_vector(1), columns)
    g = feat.table(0)
    geometry = _decode_geometry(g, header_type) if g is not None else None
    return {"type": "Feature", "geometry": geometry, "properties": props}


def read_fgb(path: str) -> list[dict]:
    """Whole-file convenience parse → GeoJSON-style Feature dicts."""
    columns, header_type, _, _ = read_fgb_header(path)
    out = []
    with open(path, "rb") as f:
        for off, n in scan_feature_spans(path):
            f.seek(off)
            out.append(_parse_feature_blob(f.read(n), columns, header_type))
    return out


def read_fgb_features(path: str, target_chunk_rows: int = 20_000):
    """FGB file → Dataset of columnar features (same schema/typing as
    the GeoJSON/CSV bridges). Driver does ONE cheap span scan, then
    byte-range chunks fan out to tasks; ``fid`` is the file feature
    order, so the result is deterministic regardless of chunking."""
    import ray.data

    from geomedea_ray.sources.geojson import parse_features_batch

    columns, header_type, count, _ = read_fgb_header(path)
    prop_types = {name: _col_to_pa_type(code) for name, code in columns}
    spans = scan_feature_spans(path)
    if not spans:
        return ray.data.from_arrow(
            parse_features_batch([], prop_types=prop_types))
    chunks = []
    for s in range(0, len(spans), target_chunk_rows):
        part = spans[s:s + target_chunk_rows]
        chunks.append({
            "path": path, "start": part[0][0],
            "end": part[-1][0] + part[-1][1], "fid_start": s,
            "nfeat": len(part),
        })

    def _parse_chunk(batch):
        import pyarrow as pa

        tabs = []
        for i in range(len(batch["path"])):
            p, start = str(batch["path"][i]), int(batch["start"][i])
            end, fid0 = int(batch["end"][i]), int(batch["fid_start"][i])
            nfeat = int(batch["nfeat"][i])
            with open(p, "rb") as f:
                f.seek(start)
                raw = f.read(end - start)
            feats, pos = [], 0
            for _ in range(nfeat):
                (n,) = struct.unpack_from("<I", raw, pos)
                feats.append(_parse_feature_blob(raw[pos:pos + 4 + n],
                                                 columns, header_type))
                pos += 4 + n
            tabs.append(parse_features_batch(feats, fid_start=fid0,
                                             prop_types=prop_types))
        return pa.concat_tables(tabs)

    return ray.data.from_items(chunks).map_batches(
        _parse_chunk, batch_format="numpy", batch_size=1)


def write_fgb_from_dataset(ds, path: str, max_rows: int = 2_000_000) -> int:
    """Feature-table Dataset → one FGB file (export direction).
    FGB is a single sequential stream, so this sink necessarily
    funnels to the driver — size-guarded like write_geojson."""
    from geomedea_ray.sources.geojson import feature_to_geojson

    n = ds.count()
    if n > max_rows:
        raise ValueError(
            f"write_fgb_from_dataset: {n} rows > max_rows={max_rows}; "
            "export a bbox slice or use the sharded GeoJSON sink")
    feats = [feature_to_geojson(r) for r in ds.sort("fid").take_all()]
    return write_fgb(path, feats)
