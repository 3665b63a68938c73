"""Draco test-vector generator: assemble small valid bitstreams with a
chosen prediction scheme.

The reference corpus only exercises difference/parallelogram prediction,
so the constrained-multi-parallelogram and portable-texcoords decode
paths (scene/draco.py + native/draco.cpp) need synthetic streams. This
module builds them from scratch: a hand-written CLERS strip, an rANS
bit *encoder* matching ``scene.draco.RAnsBitDecoder``, raw
(uncompressed) correction integers, and forward runs of the decoder's
own predictors to derive the corrections for arbitrary target values.

Everything here mirrors the byte layout parsed by
``scene/draco.py::decode_py`` (see its line references); used by
``tests/test_draco.py::TestSyntheticStreams``.
"""

from __future__ import annotations

import numpy as np

ANS_IO_BASE = 256
ANS_P8_PRECISION = 256
ANS_L_BASE = 4096


def varint(v: int) -> bytes:
    out = b""
    while True:
        b7, v = v & 0x7F, v >> 7
        out += bytes([b7 | 0x80] if v else [b7])
        if not v:
            return out


def zigzag_encode(v: int) -> int:
    return (v << 1) if v >= 0 else (-v - 1 << 1 | 1)


def rans_bit_encode(bits, prob_zero: int = 128) -> bytes:
    """Encode a bit sequence so RAnsBitDecoder(prob_zero) replays it.

    Inverse of ``scene.draco.RAnsBitDecoder``: rABS with 8-bit
    probability, byte renormalization, final state stored at the buffer
    end with a 2-bit width marker. Returns the payload WITHOUT the
    prob_zero/size prefix (callers add ``bytes([prob_zero]) +
    varint(len(payload)) + payload``).
    """
    p0 = prob_zero
    p1 = ANS_P8_PRECISION - p0
    state = ANS_L_BASE
    out = bytearray()
    # renorm bound = (L_BASE // PRECISION) * IO_BASE * freq keeps the
    # post-encode state in [L_BASE, L_BASE * IO_BASE), the decoder's
    # working range
    bound_scale = (ANS_L_BASE // ANS_P8_PRECISION) * ANS_IO_BASE
    for bit in reversed(list(bits)):
        start, freq = (0, p1) if bit else (p1, p0)
        while state >= bound_scale * freq:
            out.append(state % ANS_IO_BASE)
            state //= ANS_IO_BASE
        state = (state // freq) * ANS_P8_PRECISION + start + (state % freq)
    value = state - ANS_L_BASE
    if value < (1 << 6):
        out.append(value | (0 << 6))
    elif value < (1 << 14):
        out.append(value & 0xFF)
        out.append(((value >> 8) & 0x3F) | (1 << 6))
    elif value < (1 << 22):
        out.append(value & 0xFF)
        out.append((value >> 8) & 0xFF)
        out.append(((value >> 16) & 0x3F) | (2 << 6))
    else:
        raise ValueError("rans state out of range")
    return bytes(out)


def rans_bit_stream(bits, prob_zero: int = 128) -> bytes:
    payload = rans_bit_encode(bits, prob_zero)
    return bytes([prob_zero]) + varint(len(payload)) + payload


def pack_bits_lsb(values_and_widths) -> bytes:
    """LSB-first bit packing matching ``Buffer.bits``."""
    acc = 0
    nbits = 0
    out = bytearray()
    for value, width in values_and_widths:
        acc |= (value & ((1 << width) - 1)) << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def raw_integers(symbols) -> bytes:
    """Uncompressed SequentialIntegerAttributeDecoder payload
    (``_decode_raw_integers``): width byte + little-endian values."""
    symbols = [int(s) for s in symbols]
    width = 1
    mx = max(symbols) if symbols else 0
    while mx >= (1 << (8 * width)):
        width += 1
    out = bytearray([width])
    for s in symbols:
        for k in range(width):
            out.append((s >> (8 * k)) & 0xFF)
    return bytes(out)


# CLERS topology symbols (decode order); bit encoding per decode_py:
# 1 bit (0 -> C) else 2 more bits
TOP_C, TOP_S, TOP_L, TOP_R, TOP_E = 0, 1, 3, 5, 7


def clers_bits(symbols) -> bytes:
    parts = []
    for s in symbols:
        if s == TOP_C:
            parts.append((0, 1))
        else:
            parts.append((1, 1))
            parts.append((s >> 1, 2))
    return pack_bits_lsb(parts)


def strip_connectivity(num_faces: int):
    """CLERS for a simple triangle strip: E then alternating R.

    Returns (symbols, num_encoded_vertices). Decoding E R R R ... grows
    a strip; each R adds one vertex, E adds three."""
    symbols = [TOP_E] + [TOP_R] * (num_faces - 1)
    return symbols, 3 + (num_faces - 1)


def fan_connectivity(num_rim: int):
    """CLERS with an interior vertex (E R...R C): a closed fan whose C
    entry sees MULTIPLE complete parallelograms — coverage for the
    constrained-multi averaging path."""
    return [TOP_E] + [TOP_R] * num_rim + [TOP_C, TOP_C]


def encoded_vertex_count(symbols) -> int:
    return sum(3 if s == TOP_E else (1 if s in (TOP_R, TOP_L) else 0)
               for s in symbols)


class _CountingBits:
    """Stand-in start-face decoder that answers 0 and counts reads."""

    def __init__(self):
        self.n = 0

    def bit(self):
        self.n += 1
        return 0


def hole_bit_count(symbols) -> int:
    """How many start-face bits decode_py will consume (one per
    remaining boundary loop, all answered 0 = hole)."""
    from realism_effects_tpu.scene import draco as D

    conn = D._Connectivity(len(symbols), encoded_vertex_count(symbols), 0,
                           len(symbols), 0)
    counter = _CountingBits()
    conn.decode(list(symbols), [], counter, [])
    return counter.n


def assemble(num_faces: int, attribute_blocks) -> bytes:
    """Build a full stream: header + strip connectivity + attribute
    decoder blocks.

    ``attribute_blocks``: list of (desc_table_bytes, data_bytes) pairs,
    one per attributes decoder (att_data_id = -1, i.e. the real corner
    table). Byte order matches decode_py: all config triplets, then all
    descriptor tables, then all data blocks. ``num_faces`` may instead
    be a CLERS symbol list.
    """
    if isinstance(num_faces, int):
        symbols, num_verts = strip_connectivity(num_faces)
    else:
        symbols = list(num_faces)
        num_verts = encoded_vertex_count(symbols)
        num_faces = len(symbols)
    header = (b"DRACO" + bytes([2, 2, 1, 1]) + (0).to_bytes(2, "little")
              + bytes([0]))
    header += varint(num_verts) + varint(num_faces) + bytes([0])
    header += varint(len(symbols)) + varint(0)   # num_symbols, split syms
    header += varint(0)                          # topology splits
    cl = clers_bits(symbols)
    header += varint(len(cl)) + cl
    # start faces: one bit per remaining boundary loop, all 0 = hole
    header += rans_bit_stream([0] * hole_bit_count(symbols))
    # no attribute seam decoders (num_attribute_data = 0)

    body = bytes([len(attribute_blocks)])        # num_att_decoders
    for _ in attribute_blocks:
        body += bytes([0xFF, 0, 0])              # att_data_id=-1, type, trav
    for desc_table, _ in attribute_blocks:
        body += desc_table
    for _, data in attribute_blocks:
        body += data
    return header + body


def desc_table(att_type: int, nc: int, unique_id: int,
               seq_type: int) -> bytes:
    """One-attribute descriptor table (natt=1): att_type, data_type
    (f32 = 9), nc, normalized, unique_id; then the seq decoder type."""
    return (varint(1) + bytes([att_type]) + bytes([9]) + bytes([nc])
            + bytes([0]) + varint(unique_id) + bytes([seq_type]))


def connectivity_context(num_faces):
    """Decode the connectivity exactly as decode_py will, returning
    (view, value_to_corner, vertex_to_value, corner_to_point,
    num_points). ``num_faces``: face count (strip) or CLERS list."""
    from realism_effects_tpu.scene import draco as D

    if isinstance(num_faces, int):
        symbols, num_verts = strip_connectivity(num_faces)
    else:
        symbols = list(num_faces)
        num_verts = encoded_vertex_count(symbols)
        num_faces = len(symbols)
    conn = D._Connectivity(num_faces, num_verts, 0, len(symbols), 0)
    nbits = hole_bit_count(symbols)
    start = D.RAnsBitDecoder(D.Buffer(rans_bit_stream([0] * nbits)))
    table = conn.decode(list(symbols), [], start, [])
    view = D.RealTableView(table, conn.next_vert)
    seeds = [3 * f for f in range(num_faces)]
    v2c, vert2val = D.depth_first_traverse(view, seeds)
    corner_to_point, num_points = D.assemble_points(table, {}, num_faces)
    return view, v2c, vert2val, corner_to_point, num_points


def wrap_corrections(values: np.ndarray, preds: np.ndarray,
                     vmin: int, vmax: int) -> np.ndarray:
    """Corrections c s.t. WrapTransform.original(pred, c) == value."""
    dif = vmax - vmin + 1
    out = np.empty(len(values), np.int64)
    for i, (v, p) in enumerate(zip(values, preds)):
        p = min(max(p, vmin), vmax)
        c = int(v - p)
        # decoder wraps the RESULT into [vmin, vmax]; choose the small c
        if c > (vmax - vmin):
            c -= dif
        elif c < -(vmax - vmin):
            c += dif
        out[i] = c
    return out


# ---------------------------------------------------------------------------
# Attribute-block authoring: run the decoder's predictor FORWARD over
# target values to derive the corrections it will consume
# ---------------------------------------------------------------------------

def _clamp(v, vmin, vmax):
    return min(max(int(v), vmin), vmax)


def _wrap_corr(value, pred, vmin, vmax):
    pred = _clamp(pred, vmin, vmax)
    c = int(value) - pred
    dif = vmax - vmin + 1
    # pick the correction whose wrapped decode lands on value
    if pred + c > vmax:
        pass
    if c > vmax - vmin:
        c -= dif
    elif c < -(vmax - vmin):
        c += dif
    return c


def author_difference(values, nc, vmin, vmax):
    n = len(values) // nc
    corr = np.zeros(len(values), np.int64)
    prev = [0] * nc
    for p in range(n):
        for c in range(nc):
            pred = 0 if p == 0 else values[(p - 1) * nc + c]
            corr[p * nc + c] = _wrap_corr(values[p * nc + c], pred,
                                          vmin, vmax)
    return corr, None


def author_parallelogram(values, nc, ctx, vmin, vmax):
    view, v2c, vert2val, _, _ = ctx
    n = len(values) // nc
    corr = np.zeros(len(values), np.int64)
    opposite, cv = view.opposite, view.cv
    for p in range(n):
        pred = [0] * nc
        if p > 0:
            pred = [values[(p - 1) * nc + c] for c in range(nc)]
            opp = opposite[v2c[p]]
            if opp >= 0:
                vo = vert2val[cv[opp]]
                vn = vert2val[cv[opp - opp % 3 + (opp + 1) % 3]]
                vp = vert2val[cv[opp - opp % 3 + (opp + 2) % 3]]
                if 0 <= vo < p and 0 <= vn < p and 0 <= vp < p:
                    pred = [int(values[vn * nc + c]) + int(values[vp * nc + c])
                            - int(values[vo * nc + c]) for c in range(nc)]
        for c in range(nc):
            corr[p * nc + c] = _wrap_corr(values[p * nc + c], pred[c],
                                          vmin, vmax)
    return corr, None


def author_constrained_multi(values, nc, ctx, vmin, vmax,
                             crease_every: int = 0):
    """Returns (corr, crease_bits list of 4 arrays). With
    ``crease_every`` = N > 0, every Nth flag (per context) is a crease
    (that parallelogram excluded from the average) — exercising the
    selective-use and all-creased-fallback paths."""
    from realism_effects_tpu.scene.draco import _c_div

    view, v2c, vert2val, _, _ = ctx
    n = len(values) // nc
    corr = np.zeros(len(values), np.int64)
    opposite, cv = view.opposite, view.cv
    flags = [[], [], [], []]

    def _next(c):
        return c - c % 3 + (c + 1) % 3

    def _prev(c):
        return c - c % 3 + (c + 2) % 3

    for p in range(n):
        pred = [0] * nc
        if p > 0:
            first = v2c[p]
            corner = first
            preds = []
            while corner >= 0 and len(preds) < 4:
                opp = opposite[corner]
                if opp >= 0:
                    vo = vert2val[cv[opp]]
                    vn = vert2val[cv[_next(opp)]]
                    vp = vert2val[cv[_prev(opp)]]
                    if 0 <= vo < p and 0 <= vn < p and 0 <= vp < p:
                        preds.append([
                            int(values[vn * nc + c]) + int(values[vp * nc + c])
                            - int(values[vo * nc + c]) for c in range(nc)])
                o2 = opposite[_prev(corner)]
                corner = -1 if o2 < 0 else _prev(o2)
                if corner == first:
                    break
            if preds:
                ctx_i = len(preds) - 1
                used = []
                for q in preds:
                    k = len(flags[ctx_i])
                    crease = bool(crease_every) and (k % crease_every
                                                     == crease_every - 1)
                    flags[ctx_i].append(crease)
                    if not crease:
                        used.append(q)
                if used:
                    total = [sum(q[c] for q in used) for c in range(nc)]
                    pred = [_c_div(total[c], len(used)) for c in range(nc)]
                else:
                    pred = [values[(p - 1) * nc + c] for c in range(nc)]
            else:
                pred = [values[(p - 1) * nc + c] for c in range(nc)]
        for c in range(nc):
            corr[p * nc + c] = _wrap_corr(values[p * nc + c], pred[c],
                                          vmin, vmax)
    crease = [np.asarray(flags[i], bool) for i in range(4)]
    return corr, crease


def author_texcoords(values, ctx, vmin, vmax, pos_entry_values):
    """Portable-texcoords authoring: orientation chosen per predictable
    entry (alternating), consumed from the END of the orientation list
    like the decoder. ``pos_entry_values``: (num_entries, 3) portable
    position ints of the SAME decoder run (the positions block that
    precedes this one)."""
    import math

    from realism_effects_tpu.scene.draco import _c_div

    view, v2c, vert2val, corner_to_point, num_points = ctx
    nc = 2
    n = len(values) // nc
    corr = np.zeros(len(values), np.int64)
    cv = view.cv

    def _next(c):
        return c - c % 3 + (c + 1) % 3

    def _prev(c):
        return c - c % 3 + (c + 2) % 3

    # entry -> point and point -> position (authored positions per entry)
    entry_to_point = [int(corner_to_point[v2c[e]]) for e in range(n)]
    pos_of_point = {}
    for e in range(n):
        pos_of_point[entry_to_point[e]] = np.asarray(
            pos_entry_values[e], np.int64)

    consumed = []   # orientation per predictable entry, in consumption order
    flip = False
    for p in range(n):
        corner = v2c[p]
        ne = vert2val[cv[_next(corner)]]
        pe = vert2val[cv[_prev(corner)]]
        pred = None
        if 0 <= ne < p and 0 <= pe < p:
            n_uv = np.asarray(values[ne * 2: ne * 2 + 2], np.int64)
            p_uv = np.asarray(values[pe * 2: pe * 2 + 2], np.int64)
            if np.array_equal(n_uv, p_uv):
                pred = p_uv
            else:
                tip = pos_of_point[entry_to_point[p]]
                npos = pos_of_point[entry_to_point[ne]]
                ppos = pos_of_point[entry_to_point[pe]]
                pn = ppos - npos
                pn_norm2 = int(pn @ pn)
                if pn_norm2 != 0:
                    cn = tip - npos
                    cn_dot_pn = int(pn @ cn)
                    pn_uv = p_uv - n_uv
                    x_uv = n_uv * pn_norm2 + cn_dot_pn * pn_uv
                    x_pos = npos + np.array(
                        [_c_div(cn_dot_pn * int(pn[i]), pn_norm2)
                         for i in range(3)], np.int64)
                    d = tip - x_pos
                    s = math.isqrt(int(d @ d) * pn_norm2)
                    perp = np.array([pn_uv[1], -pn_uv[0]], np.int64)
                    ori = flip
                    flip = not flip
                    consumed.append(ori)
                    v = x_uv + perp * s if ori else x_uv - perp * s
                    pred = np.array([_c_div(int(v[0]), pn_norm2),
                                     _c_div(int(v[1]), pn_norm2)], np.int64)
                else:
                    pred = p_uv
        if pred is None:
            pred = (np.zeros(2, np.int64) if p == 0
                    else np.asarray(values[(p - 1) * 2: p * 2], np.int64))
        for c in range(2):
            corr[p * 2 + c] = _wrap_corr(values[p * 2 + c], int(pred[c]),
                                         vmin, vmax)
    # decoder consumes orientations[len-1], len-2, ... -> reverse
    orientations = list(reversed(consumed))
    return corr, orientations


def orientation_bits(orientations):
    """Toggle encoding read by decode_py: last=True; bit==0 flips."""
    bits = []
    last = True
    for o in orientations:
        bits.append(1 if o == last else 0)
        last = o
    return bits


def quantized_data_block(values, method: int, nc: int,
                         scheme_data: bytes, bits: int) -> bytes:
    """Data bytes for one SEQ_QUANTIZATION attribute: prediction header,
    raw zigzag corrections, scheme data, wrap transform, quant tail."""
    import struct

    corr = values  # already corrections at this point
    out = bytearray()
    out += struct.pack("<b", method)
    out += struct.pack("<b", 1)            # TRANSFORM_WRAP
    out.append(0)                           # compressed = 0 (raw ints)
    out += raw_integers([zigzag_encode(int(c)) for c in corr])
    out += scheme_data
    vmax = (1 << bits) - 1
    out += struct.pack("<ii", 0, vmax)      # wrap min/max
    # quantization tail: mins, range, bits
    out += struct.pack("<" + "f" * nc, *([0.0] * nc))
    out += struct.pack("<f", float(vmax))
    out.append(bits)
    return bytes(out)
