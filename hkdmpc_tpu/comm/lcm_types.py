"""Mini lcm-gen: parse LCM message definitions (.lcm), compute wire
fingerprints, and encode/decode messages — wire-compatible with the
reference's LCM 1.4 ecosystem.

Replaces the reference's lcm-gen codegen step (scripts/make_types.sh) with a
runtime implementation: the reference's .lcm schema files (lcmtypes/*.lcm)
load directly and messages interoperate byte-for-byte with the reference's
low-level controller and visualizers.

The type-hash algorithm follows the public LCM type specification
(signed-64-bit rolling hash over member names/types/dimensions); verified
against fingerprints produced by lcm-gen (tests/test_comm.py).
"""

from __future__ import annotations

import dataclasses
import re
import struct
from typing import Dict, List, Tuple

import numpy as np

_PRIMS = {
    "int8_t": ("b", 1), "byte": ("B", 1), "boolean": ("b", 1),
    "int16_t": ("h", 2), "int32_t": ("i", 4), "int64_t": ("q", 8),
    "float": ("f", 4), "double": ("d", 8),
}
_M64 = (1 << 64) - 1


def _hash_update(v: int, c: int) -> int:
    sv = v - (1 << 64) if v & (1 << 63) else v
    return ((((sv << 8) & _M64) ^ ((sv >> 55) & _M64)) + c) & _M64


def _hash_string(v: int, s: str) -> int:
    v = _hash_update(v, len(s))
    for ch in s:
        v = _hash_update(v, ord(ch))
    return v


@dataclasses.dataclass
class Member:
    name: str
    type: str
    dims: List[Tuple[int, str]]  # (mode: 0 const / 1 var, size literal or member name)


class LCMType:
    """A parsed LCM struct: fingerprint + encode/decode.

    decode/encode work with dicts of numpy arrays / python scalars.
    Only fixed-size and length-prefixed variable arrays of primitives are
    supported (covers every type in the reference's lcmtypes/)."""

    def __init__(self, name: str, members: List[Member]):
        self.name = name
        self.members = members

    @property
    def base_hash(self) -> int:
        v = 0x12345678
        for m in self.members:
            v = _hash_string(v, m.name)
            if m.type in _PRIMS or m.type == "string":
                v = _hash_string(v, m.type)
            v = _hash_update(v, len(m.dims))
            for mode, size in m.dims:
                v = _hash_update(v, mode)
                v = _hash_string(v, size)
        return v

    @property
    def fingerprint(self) -> bytes:
        h = self.base_hash
        h = ((h << 1) & _M64) + (h >> 63)  # rotate (no nested types)
        return struct.pack(">Q", h)

    # -- encoding ----------------------------------------------------------

    def _resolve_dims(self, m: Member, values: dict) -> List[int]:
        out = []
        for mode, size in m.dims:
            out.append(int(size) if mode == 0 else int(values[size]))
        return out

    def encode(self, values: dict) -> bytes:
        out = [self.fingerprint]
        for m in self.members:
            code, _ = _PRIMS[m.type]
            dims = self._resolve_dims(m, values)
            if not dims:
                v = values[m.name]
                if m.type == "boolean":
                    v = 1 if v else 0
                out.append(struct.pack(">" + code, v))
            else:
                a = np.asarray(values[m.name]).reshape(dims)
                flat = a.flatten()
                out.append(struct.pack(f">{flat.size}{code}", *flat.tolist()))
        return b"".join(out)

    def decode(self, buf: bytes) -> dict:
        if buf[:8] != self.fingerprint:
            raise ValueError(
                f"fingerprint mismatch for {self.name}: "
                f"{buf[:8].hex()} != {self.fingerprint.hex()}")
        off = 8
        values: dict = {}
        for m in self.members:
            code, sz = _PRIMS[m.type]
            dims = self._resolve_dims(m, values)
            if not dims:
                (v,) = struct.unpack_from(">" + code, buf, off)
                off += sz
                values[m.name] = bool(v) if m.type == "boolean" else v
            else:
                n = int(np.prod(dims))
                vals = struct.unpack_from(f">{n}{code}", buf, off)
                off += n * sz
                values[m.name] = np.array(vals).reshape(dims)
        return values


_STRUCT_RE = re.compile(r"struct\s+(\w+)\s*\{([^}]*)\}", re.S)
_MEMBER_RE = re.compile(r"(\w+)\s+(\w+)((?:\s*\[\s*\w+\s*\])*)\s*;")
_DIM_RE = re.compile(r"\[\s*(\w+)\s*\]")


def parse_lcm_text(text: str) -> Dict[str, LCMType]:
    text = re.sub(r"//[^\n]*", "", text)
    out = {}
    for sm in _STRUCT_RE.finditer(text):
        name, body = sm.group(1), sm.group(2)
        members = []
        for mm in _MEMBER_RE.finditer(body):
            typ, mname, dimstr = mm.group(1), mm.group(2), mm.group(3)
            dims = []
            for d in _DIM_RE.findall(dimstr or ""):
                dims.append((0, d) if d.isdigit() else (1, d))
            members.append(Member(mname, typ, dims))
        out[name] = LCMType(name, members)
    return out


def parse_lcm_file(path: str) -> Dict[str, LCMType]:
    with open(path) as f:
        return parse_lcm_text(f.read())


def load_reference_types(lcmtypes_dir: str) -> Dict[str, LCMType]:
    """Load every .lcm schema in a directory (e.g. the reference's
    lcmtypes/)."""
    import os
    out: Dict[str, LCMType] = {}
    for fn in sorted(os.listdir(lcmtypes_dir)):
        if fn.endswith(".lcm"):
            out.update(parse_lcm_file(os.path.join(lcmtypes_dir, fn)))
    return out
