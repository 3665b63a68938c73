"""From-scratch decoder for Draco-compressed triangular meshes
(KHR_draco_mesh_compression), bitstream version 2.2.

The reference's demo scenes (`/root/reference/example/public/gltf/*.glb`,
loaded by `example/main.js:760-809`) are all Draco-compressed by
`gltf-transform draco` (see `example/public/gltf/optimize.js`), so a
decoder is required to render any of them. No Draco library ships in
this environment; this module implements the decode path from the
public bitstream format:

- rANS entropy coding (binary + symbol alphabets)
- standard-traversal EdgeBreaker connectivity (CLERS replay, topology
  split events, hole/interior start-face configurations)
- per-attribute seam connectivity and point assignment
- sequential integer attribute decoding with difference /
  (constrained-multi-)parallelogram / portable-texcoord / geometric-
  normal prediction, wrap + octahedron transforms, dequantization

This is the pure-Python reference implementation; `native/draco.cpp`
is the production C++ port (ctypes), with this module as the fallback
and the cross-check in tests. Scope: triangular meshes, bitstream
>= 2.2, standard EdgeBreaker traversal (what `gltf-transform draco`
emits); valence traversal and point clouds raise ``DracoError``.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["DracoError", "decode", "DecodedMesh"]


class DracoError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Bitstream primitives
# ---------------------------------------------------------------------------

class Buffer:
    """Byte reader with Draco varints and LSB-first bit sections."""

    __slots__ = ("data", "pos", "_bit_base", "_bit_offset")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self._bit_base = -1
        self._bit_offset = 0

    def u8(self) -> int:
        v = self.data[self.pos]
        self.pos += 1
        return v

    def i8(self) -> int:
        v = self.u8()
        return v - 256 if v >= 128 else v

    def u16(self) -> int:
        v = struct.unpack_from("<H", self.data, self.pos)[0]
        self.pos += 2
        return v

    def u32(self) -> int:
        v = struct.unpack_from("<I", self.data, self.pos)[0]
        self.pos += 4
        return v

    def f32(self) -> float:
        v = struct.unpack_from("<f", self.data, self.pos)[0]
        self.pos += 4
        return v

    def raw(self, n: int) -> bytes:
        v = self.data[self.pos:self.pos + n]
        if len(v) != n:
            raise DracoError("buffer underrun")
        self.pos += n
        return v

    def varint(self) -> int:
        v = 0
        shift = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            v |= (b & 0x7F) << shift
            if not (b & 0x80):
                return v
            shift += 7
            if shift > 70:
                raise DracoError("varint overflow")

    # bit sections (DecoderBuffer::StartBitDecoding; bits LSB-first)
    def start_bits(self, decode_size: bool) -> int:
        size = self.varint() if decode_size else 0
        self._bit_base = self.pos
        self._bit_offset = 0
        return size

    def bits(self, n: int) -> int:
        v = 0
        base = self._bit_base
        off = self._bit_offset
        data = self.data
        for i in range(n):
            v |= ((data[base + (off >> 3)] >> (off & 7)) & 1) << i
            off += 1
        self._bit_offset = off
        return v

    def end_bits(self):
        self.pos = self._bit_base + ((self._bit_offset + 7) >> 3)
        self._bit_base = -1


# rANS constants (reference: Draco ans.h semantics)
_ANS_IO_BASE = 256
_ANS_P8_PRECISION = 256
_ANS_L_BASE = 4096  # binary (rabs) coder


class RAnsBitDecoder:
    """Binary rANS decoder (Draco RAnsBitDecoder: uint8 prob_zero +
    varint-sized byte blob; state bytes consumed from the end)."""

    def __init__(self, buf: Buffer):
        self.prob_zero = buf.u8()
        size = buf.varint()
        self.buf = buf.raw(size)
        offset = size
        if offset < 1:
            self.state = _ANS_L_BASE
            self.offset = 0
            return
        x = self.buf[offset - 1] >> 6
        if x == 0:
            self.state = self.buf[offset - 1] & 0x3F
            offset -= 1
        elif x == 1:
            if offset < 2:
                raise DracoError("rans init underrun")
            self.state = struct.unpack_from("<H", self.buf, offset - 2)[0] & 0x3FFF
            offset -= 2
        elif x == 2:
            if offset < 3:
                raise DracoError("rans init underrun")
            self.state = (self.buf[offset - 3]
                          | (self.buf[offset - 2] << 8)
                          | (self.buf[offset - 1] << 16)) & 0x3FFFFF
            offset -= 3
        else:
            raise DracoError("invalid rans bit-decoder init")
        self.state += _ANS_L_BASE
        self.offset = offset

    def bit(self) -> int:
        p0 = self.prob_zero
        p1 = _ANS_P8_PRECISION - p0
        state = self.state
        while state < _ANS_L_BASE and self.offset > 0:
            self.offset -= 1
            state = state * _ANS_IO_BASE + self.buf[self.offset]
        x = state % _ANS_P8_PRECISION
        quot = state // _ANS_P8_PRECISION
        if x < p1:
            self.state = quot * p1 + x
            return 1
        self.state = quot * p0 + (x - p1)
        return 0


class RAnsSymbolDecoder:
    """Multi-symbol rANS decoder (Draco RAnsSymbolDecoder): probability
    table with 2-bit token encoding, precision derived from the
    alphabet's bit length, state bytes consumed from the end."""

    def __init__(self, buf: Buffer, unique_symbols_bit_length: int):
        precision_bits = (3 * unique_symbols_bit_length) // 2
        precision_bits = max(12, min(20, precision_bits))
        self.precision = 1 << precision_bits
        self.l_base = self.precision * 4

        num_symbols = buf.varint()
        probs = np.zeros(num_symbols, np.uint32)
        i = 0
        while i < num_symbols:
            prob_data = buf.u8()
            token = prob_data & 3
            if token == 3:
                offset = prob_data >> 2
                if i + offset >= num_symbols:
                    raise DracoError("prob table overflow")
                # offset+1 symbols in a row have zero probability
                i += offset + 1
            else:
                prob = prob_data >> 2
                for b in range(token):
                    prob |= buf.u8() << (8 * (b + 1) - 2)
                probs[i] = prob
                i += 1
        total = int(probs.sum())
        if total != self.precision:
            raise DracoError(
                f"prob table sum {total} != precision {self.precision}")
        self.cum = np.zeros(num_symbols + 1, np.uint32)
        np.cumsum(probs, out=self.cum[1:])
        self.probs = probs
        # slot -> symbol lookup for O(1) decode
        self.lut = np.repeat(
            np.arange(num_symbols, dtype=np.uint32), probs)

        size = buf.varint()
        self.buf = buf.raw(size)
        offset = size
        if offset < 1:
            raise DracoError("empty rans stream")
        x = self.buf[offset - 1] >> 6
        if x == 0:
            self.state = self.buf[offset - 1] & 0x3F
            offset -= 1
        elif x == 1:
            self.state = struct.unpack_from("<H", self.buf, offset - 2)[0] & 0x3FFF
            offset -= 2
        elif x == 2:
            self.state = (self.buf[offset - 3]
                          | (self.buf[offset - 2] << 8)
                          | (self.buf[offset - 1] << 16)) & 0x3FFFFF
            offset -= 3
        else:
            self.state = struct.unpack_from("<I", self.buf, offset - 4)[0] & 0x3FFFFFFF
            offset -= 4
        self.state += self.l_base
        self.offset = offset

    def symbol(self) -> int:
        state = self.state
        while state < self.l_base and self.offset > 0:
            self.offset -= 1
            state = state * _ANS_IO_BASE + self.buf[self.offset]
        rem = state % self.precision
        quot = state // self.precision
        s = int(self.lut[rem])
        self.state = quot * int(self.probs[s]) + rem - int(self.cum[s])
        return s


def decode_symbols(buf: Buffer, num_values: int, num_components: int) -> np.ndarray:
    """Draco DecodeSymbols: tagged (bit-length tags) or raw rANS."""
    out = np.zeros(num_values, np.uint32)
    if num_values == 0:
        return out
    scheme = buf.u8()
    if scheme == 0:  # TAGGED
        tag_decoder = RAnsSymbolDecoder(buf, 5)
        buf.start_bits(False)
        i = 0
        while i < num_values:
            bit_length = tag_decoder.symbol()
            for _ in range(num_components):
                out[i] = buf.bits(bit_length)
                i += 1
        buf.end_bits()
    elif scheme == 1:  # RAW
        max_bit_length = buf.u8()
        dec = RAnsSymbolDecoder(buf, max_bit_length)
        for i in range(num_values):
            out[i] = dec.symbol()
    else:
        raise DracoError(f"unknown symbol coding scheme {scheme}")
    return out


def _symbols_to_signed(symbols: np.ndarray) -> np.ndarray:
    """Draco ConvertSymbolsToSignedInts (zigzag)."""
    vals = (symbols >> np.uint32(1)).astype(np.int64)
    return np.where(symbols & 1, -vals - 1, vals)


# ---------------------------------------------------------------------------
# Header / connectivity containers
# ---------------------------------------------------------------------------

class DecodedMesh:
    """Result: faces (F, 3) int32 point indices + per-attribute arrays
    (num_points, C) keyed by the draco unique attribute id."""

    def __init__(self, faces, attributes, num_points):
        self.faces = faces
        self.attributes = attributes
        self.num_points = num_points


# ---------------------------------------------------------------------------
# EdgeBreaker connectivity (standard traversal)
# ---------------------------------------------------------------------------

TOPOLOGY_C = 0
TOPOLOGY_S = 1
TOPOLOGY_L = 3
TOPOLOGY_R = 5
TOPOLOGY_E = 7


def _next(c):
    return c - (c % 3) + (c + 1) % 3


def _prev(c):
    return c - (c % 3) + (c + 2) % 3


class CornerTable:
    """Corner table built during EdgeBreaker replay.

    Face f owns corners 3f..3f+2; ``opposite`` links corners across
    shared edges; ``cv`` maps corner -> vertex id; ``leftmost[v]`` is
    the corner at v whose CCW-adjacent edge is on the active boundary
    (Draco's CornerTable::LeftMostCorner)."""

    def __init__(self, num_faces: int, num_vertex_slots: int):
        self.opposite = np.full(3 * num_faces, -1, np.int64)
        self.cv = np.full(3 * num_faces, -1, np.int64)
        self.leftmost = np.full(num_vertex_slots, -1, np.int64)

    def set_opposite(self, a, b):
        self.opposite[a] = b
        self.opposite[b] = a

    def swing_left(self, c):
        """CCW rotation around Vertex(c); -1 when crossing a boundary."""
        o = self.opposite[_next(c)]
        return -1 if o < 0 else _next(o)

    def swing_right(self, c):
        o = self.opposite[_prev(c)]
        return -1 if o < 0 else _prev(o)


class _Connectivity:
    """Replay of the CLERS symbol stream (reverse encoding order),
    mirroring Draco's MeshEdgebreakerDecoderImpl::DecodeConnectivity."""

    def __init__(self, num_faces, num_encoded_vertices, num_split_symbols,
                 num_symbols, num_attribute_data):
        self.num_symbols = num_symbols
        self.num_faces = num_faces
        self.num_attribute_data = num_attribute_data
        # vertex slots: encoded vertices + one temp per S merge
        self.table = CornerTable(
            num_faces, num_encoded_vertices + num_split_symbols + 3)
        self.is_vert_hole = np.ones(
            num_encoded_vertices + num_split_symbols + 3, bool)
        self.next_vert = 0
        self.active_stack: list[int] = []
        # decoder symbol id -> list of (corner registered for future S)
        self.split_corners: dict[int, int] = {}
        # seam corners per attribute-data index (corner c s.t. the edge
        # opposite c is an attribute seam)
        self.seam_corners = [[] for _ in range(num_attribute_data)]
        self.interior_start_faces: list[int] = []

    def new_vertex(self):
        v = self.next_vert
        self.next_vert += 1
        return v

    def decode(self, symbols, split_events, start_face_bits: RAnsBitDecoder,
               seam_decoders: list[RAnsBitDecoder]):
        """symbols: list of CLERS ids in decode order. split_events:
        list of (source_symbol_id, split_symbol_id, source_edge) in
        ENCODER symbol ids; converted to decoder ids here."""
        t = self.table
        nsym = self.num_symbols
        # encoder ids count from the end of the decoder's symbol order
        by_source: dict[int, list] = {}
        for src, spl, edge in split_events:
            by_source.setdefault(nsym - src - 1, []).append(
                (nsym - spl - 1, edge))

        face = 0
        for i in range(nsym):
            sym = symbols[i]
            corner = 3 * face
            face += 1
            if sym == TOPOLOGY_C:
                corner_a = self.active_stack[-1]
                vertex_x = t.cv[_next(corner_a)]
                corner_b = _next(t.leftmost[vertex_x])
                t.set_opposite(corner_a, corner + 1)
                t.set_opposite(corner_b, corner + 2)
                t.cv[corner] = vertex_x
                t.cv[corner + 1] = t.cv[_next(corner_b)]
                t.cv[corner + 2] = t.cv[_prev(corner_a)]
                t.leftmost[t.cv[corner + 2]] = corner + 2
                self.active_stack[-1] = corner
                self.is_vert_hole[vertex_x] = False
            elif sym == TOPOLOGY_R or sym == TOPOLOGY_L:
                corner_a = self.active_stack[-1]
                if sym == TOPOLOGY_R:
                    opp, corner_l, corner_r = corner + 2, corner + 1, corner
                else:
                    opp, corner_l, corner_r = corner + 1, corner, corner + 2
                t.set_opposite(opp, corner_a)
                v_new = self.new_vertex()
                t.cv[opp] = v_new
                t.leftmost[v_new] = opp
                vertex_r = t.cv[_prev(corner_a)]
                t.cv[corner_r] = vertex_r
                t.leftmost[vertex_r] = corner_r
                t.cv[corner_l] = t.cv[_next(corner_a)]
                self.active_stack[-1] = corner
            elif sym == TOPOLOGY_E:
                for k in range(3):
                    v = self.new_vertex()
                    t.cv[corner + k] = v
                    t.leftmost[v] = corner + k
                self.active_stack.append(corner)
            elif sym == TOPOLOGY_S:
                corner_b = self.active_stack.pop()
                reg = self.split_corners.pop(i, None)
                if reg is not None:
                    self.active_stack.append(reg)
                corner_a = self.active_stack[-1]
                t.set_opposite(corner_a, corner + 2)
                t.set_opposite(corner_b, corner + 1)
                vertex_p = t.cv[_prev(corner_a)]
                t.cv[corner] = vertex_p
                t.cv[corner + 1] = t.cv[_next(corner_a)]
                t.cv[corner + 2] = t.cv[_prev(corner_b)]
                t.leftmost[t.cv[corner + 2]] = corner + 2
                # merge Vertex(Next(corner_b)) into vertex_p; walk its
                # whole fan (boundary fan: walk CW from its leftmost end)
                vertex_n = t.cv[_next(corner_b)]
                self.is_vert_hole[vertex_n] = False
                c = t.leftmost[vertex_n]
                while c >= 0:
                    t.cv[c] = vertex_p
                    c = t.swing_right(c)
                t.leftmost[vertex_p] = t.leftmost[vertex_n]
                self.active_stack[-1] = corner
            else:
                raise DracoError(f"bad CLERS symbol {sym}")
            # register topology-split corners sourced at this symbol
            for spl_id, edge in by_source.get(i, ()):  
                act = self.active_stack[-1]
                reg = _next(act) if edge == 1 else _prev(act)
                self.split_corners[spl_id] = reg
            # attribute seams: one bit per already-connected edge
            if self.num_attribute_data:
                for c in (corner, corner + 1, corner + 2):
                    if t.opposite[c] >= 0:
                        for a, dec in enumerate(seam_decoders):
                            if dec.bit():
                                self.seam_corners[a].append(c)
        # remaining active boundaries: interior start faces or holes
        while self.active_stack:
            corner_a = self.active_stack.pop()
            interior = start_face_bits.bit()
            if not interior:
                continue  # boundary hole: leave open
            if face >= self.num_faces:
                raise DracoError("too many interior faces")
            corner = 3 * face
            face += 1
            self.interior_start_faces.append(face - 1)
            corner_b = _prev(corner_a)
            while t.opposite[corner_b] >= 0:
                corner_b = _prev(t.opposite[corner_b])
            corner_c = _next(corner_a)
            while t.opposite[corner_c] >= 0:
                corner_c = _next(t.opposite[corner_c])
            t.set_opposite(corner, corner_a)
            t.set_opposite(corner + 1, corner_b)
            t.set_opposite(corner + 2, corner_c)
            vert_a = t.cv[_next(corner_a)]   # == cv[prev(corner_b)]
            vert_b = t.cv[_next(corner_b)]   # == cv[prev(corner_c)]
            vert_c = t.cv[_next(corner_c)]   # == cv[prev(corner_a)]
            t.cv[corner] = vert_b
            t.cv[corner + 1] = vert_c
            t.cv[corner + 2] = vert_a
            self.is_vert_hole[vert_a] = False
            self.is_vert_hole[vert_b] = False
            self.is_vert_hole[vert_c] = False
            if self.num_attribute_data:
                for c in (corner, corner + 1, corner + 2):
                    for a, dec in enumerate(seam_decoders):
                        if dec.bit():
                            self.seam_corners[a].append(c)
        if face != self.num_faces:
            raise DracoError(
                f"face count mismatch: replay {face} != {self.num_faces}")
        return t
