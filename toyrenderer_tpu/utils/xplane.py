"""Minimal XSpace/XPlane protobuf reader (no TF/TSL dependency).

jax.profiler.trace writes `*.xplane.pb` (tsl.profiler XSpace).  This is a
hand-rolled wire-format decoder for exactly the fields the per-pass
attribution tool needs — the equivalent of the reference consuming its
microprofile dumps (SURVEY.md §5.1).  Schema subset (field numbers from
tsl/profiler/protobuf/xplane.proto):

  XSpace  { repeated XPlane planes = 1; }
  XPlane  { int64 id=1; string name=2; repeated XLine lines=3;
            map<int64,XEventMetadata> event_metadata=4;
            map<int64,XStatMetadata>  stat_metadata=5; }
  XLine   { int64 id=1; string name=2; int64 timestamp_ns=3;
            repeated XEvent events=4; }
  XEvent  { int64 metadata_id=1; int64 offset_ps=2; int64 duration_ps=3;
            repeated XStat stats=4; }
  XStat   { int64 metadata_id=1; double double_value=2;
            uint64 uint64_value=3; int64 int64_value=4;
            string str_value=5; bytes bytes_value=6; uint64 ref_value=7; }
  XEventMetadata { int64 id=1; string name=2; repeated XStat stats=5; }
  XStatMetadata  { int64 id=1; string name=2; }
"""

from __future__ import annotations

import struct


def _varint(buf: bytes, i: int):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:                       # varint
            v, i = _varint(buf, i)
        elif wt == 1:                     # 64-bit
            v = buf[i:i + 8]
            i += 8
        elif wt == 2:                     # length-delimited
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:                     # 32-bit
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def _zigzagless_i64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _parse_stat(buf: bytes) -> dict:
    st = {}
    for fno, wt, v in _fields(buf):
        if fno == 1:
            st['metadata_id'] = v
        elif fno == 2:
            st['value'] = struct.unpack('<d', v)[0]
        elif fno == 3:
            st['value'] = v
        elif fno == 4:
            st['value'] = _zigzagless_i64(v)
        elif fno == 5:
            st['value'] = v.decode('utf-8', 'replace')
        elif fno == 6:
            st['value'] = v
        elif fno == 7:
            st['ref'] = v
    return st


def _parse_event(buf: bytes) -> dict:
    ev = dict(metadata_id=0, offset_ps=0, duration_ps=0, stats=[])
    for fno, wt, v in _fields(buf):
        if fno == 1:
            ev['metadata_id'] = v
        elif fno == 2:
            ev['offset_ps'] = _zigzagless_i64(v)
        elif fno == 3:
            ev['duration_ps'] = _zigzagless_i64(v)
        elif fno == 4:
            ev['stats'].append(_parse_stat(v))
    return ev


def _parse_line(buf: bytes) -> dict:
    ln = dict(id=0, name='', events=[])
    for fno, wt, v in _fields(buf):
        if fno == 1:
            ln['id'] = v
        elif fno == 2:
            ln['name'] = v.decode('utf-8', 'replace')
        elif fno == 4:
            ln['events'].append(_parse_event(v))
    return ln


def _parse_event_metadata(buf: bytes) -> dict:
    md = dict(id=0, name='', stats=[])
    for fno, wt, v in _fields(buf):
        if fno == 1:
            md['id'] = v
        elif fno == 2:
            md['name'] = v.decode('utf-8', 'replace')
        elif fno == 5:
            md['stats'].append(_parse_stat(v))
    return md


def _parse_map_entry(buf: bytes, value_parser):
    key = None
    val = None
    for fno, wt, v in _fields(buf):
        if fno == 1:
            key = v
        elif fno == 2:
            val = value_parser(v)
    return key, val


def _parse_stat_metadata(buf: bytes) -> dict:
    md = dict(id=0, name='')
    for fno, wt, v in _fields(buf):
        if fno == 1:
            md['id'] = v
        elif fno == 2:
            md['name'] = v.decode('utf-8', 'replace')
    return md


def _parse_plane(buf: bytes) -> dict:
    pl = dict(id=0, name='', lines=[], event_metadata={}, stat_metadata={})
    for fno, wt, v in _fields(buf):
        if fno == 1:
            pl['id'] = v
        elif fno == 2:
            pl['name'] = v.decode('utf-8', 'replace')
        elif fno == 3:
            pl['lines'].append(_parse_line(v))
        elif fno == 4:
            k, md = _parse_map_entry(v, _parse_event_metadata)
            pl['event_metadata'][k if k is not None else md['id']] = md
        elif fno == 5:
            k, md = _parse_map_entry(v, _parse_stat_metadata)
            pl['stat_metadata'][k if k is not None else md['id']] = md
    return pl


def parse_xspace(data: bytes) -> list[dict]:
    """XSpace bytes -> list of plane dicts."""
    planes = []
    for fno, wt, v in _fields(data):
        if fno == 1:
            planes.append(_parse_plane(v))
    return planes


def stat_values(plane: dict, event: dict) -> dict:
    """Resolve an event's stats to {stat_name: value} via stat_metadata."""
    smd = plane['stat_metadata']
    out = {}
    for st in event['stats']:
        name = smd.get(st.get('metadata_id'), {}).get(
            'name', str(st.get('metadata_id')))
        out[name] = st.get('value', st.get('ref'))
    return out
