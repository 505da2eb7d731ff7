"""MPEG-1 Audio Layer II decode (ISO/IEC 11172-3 — the perceptual
rung above the companded/predictive codecs in the audio tier: G.711
maps bytes, ADPCM tracks one predictor, Layer II carries QUANTIZED
SUBBAND coefficients that only become PCM through a 32-band polyphase
synthesis filterbank).

Implemented from the public spec, integer-exact end to end:

- **Frame header** (§2.4.1.3): 32-bit syncword/ID/layer parse with the
  real Layer II bitrate table (32..384 kbps) and sample-rate table
  (44100/48000/32000 Hz).
- **Bit allocation** (§2.4.1.5 shape): 2 bits per subband over the
  low-rate 8-subband region (the B.2c table family), mapping to
  {0, 3, 7, 15}-level quantizers; 3-level codes are GROUPED — one
  5-bit code per granule carrying three samples base-3 (§2.4.2.1).
- **Scalefactors** (Table B.1): 6-bit indices into the 2·2^(−idx/3)
  progression, held as a shared Q20 integer table so both engines
  replay identical values; scfsi=0 (three scalefactors, one per
  4-granule part).
- **Requantization**: symmetric midtread mapping
  v = (2c − (n−1))·sf / (n−1) in Q20, realized sign-split
  (±(|q|·sf // (n−1))) so Python floor-division and SQL `//`
  (truncating) agree on every sample.
- **Synthesis filterbank** (§2.4.3.2.2 structure): the matrixing
  V[i] = Σₖ cos((16+i)(2k+1)π/64)·S[k] with the cosine matrix as a
  shared Q14 integer table, then the 512-tap windowed overlap-add
  over the V FIFO — the spec's X/U indexing reduces to the closed
  form out(t,j) = Σ_{p=0..15} W[j+32p]·V_{t−p}[j+32·(p%2)], which is
  what both the decoder and its SQL twin compute.

DOCUMENTED STAND-IN: the 512 window coefficients of ISO Table 3-B.3
(annex D) are not reproduced verbatim; ``_WIN`` is a deterministic
sign-alternating raised-sine prototype of the same shape/scale (Q15,
±sign per 64-block).  The filterbank STRUCTURE, indexing, and integer
algebra are exact; swapping in the ISO table is a one-list change.

Scale shape: decode is Arrow-batched map-only work next to each
payload; every shared table is a module constant (control-plane).
"""

from __future__ import annotations

import math

__all__ = [
    "MP2_BITRATES_KBPS",
    "MP2_SAMPLE_RATES",
    "encode_mp2_frame",
    "mp2_decode_stats",
    "mp2_closed_form_plan",
]

#: Layer II bitrate table, ISO 11172-3 Table B (index 0 = free format)
MP2_BITRATES_KBPS = [
    0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384,
]
#: MPEG-1 sample-rate table (index 3 reserved)
MP2_SAMPLE_RATES = [44100, 48000, 32000]

_SBLIMIT = 8
#: allocation code → quantizer levels (low-rate 8-subband table shape)
_ALLOC_LEVELS = [0, 3, 7, 15]
#: per-sample code widths; 3-level is GROUPED (5 bits per 3 samples)
_CODE_BITS = {7: 3, 15: 4}
_GROUP_BITS = {3: 5}

#: Table B.1 scalefactors 2·2^(−idx/3), fixed-point Q20 (shared with
#: the SQL twin as literals — the ADPCM step-table precedent)
SF_Q20 = [int(2 ** 20 * 2.0 * 2.0 ** (-i / 3.0)) for i in range(63)]

#: synthesis cosine matrix N[i][k] = cos((16+i)(2k+1)π/64), Q14
COS_Q14 = [
    [
        int(round(2 ** 14 * math.cos((16 + i) * (2 * k + 1)
                                     * math.pi / 64)))
        for k in range(32)
    ]
    for i in range(64)
]

#: 512-tap synthesis window, Q15 — deterministic raised-sine stand-in
#: for ISO Table 3-B.3 (sign alternates per 64-block like the ISO
#: window; see module docstring)
WIN_Q15 = [
    int(round(2 ** 15 * math.sin(math.pi * (n + 0.5) / 512) ** 2))
    * (1 if (n // 64) % 2 == 0 else -1)
    for n in range(512)
]

_OUT_DESCALE = 1 << 29  # final Q49 → Q20 scale-down (sign-split)


def _sdiv(a: int, b: int) -> int:
    """Sign-split integer division: ±(|a| // b) for b > 0 — identical
    in Python (floor) and SQL (truncating) because the magnitude is
    non-negative on both sides."""
    return -((-a) // b) if a < 0 else a // b


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)

    def bytes(self) -> bytes:
        if self.n:
            return bytes(self.buf) + bytes(
                [(self.acc << (8 - self.n)) & 0xFF]
            )
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        out = 0
        for _ in range(bits):
            byte = self.data[self.pos >> 3]
            out = (out << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out


def _closed_form(doc_id: int):
    """The deterministic frame content for ``doc_id`` — shared by the
    encoder and the SQL twin (which replays it in closed form instead
    of parsing bits): allocation codes, scalefactor indices and sample
    codes."""
    d = int(doc_id)
    alloc = [(d + sb) % 4 for sb in range(_SBLIMIT)]

    def sf_idx(sb, part):
        return (2 * d + 5 * sb + 11 * part) % 48

    def code(sb, t, levels):
        return (d * 7 + sb * 13 + t * 3) % levels

    return alloc, sf_idx, code


def encode_mp2_frame(doc_id: int) -> bytes:
    """Spec-valid single-channel Layer II frame: real 32-bit header
    (sync/ID/layer-II/bitrate/sample-rate), allocation bits, scfsi=0,
    scalefactors, then 12 granules of grouped / individual codes —
    all content derived from ``doc_id`` by :func:`_closed_form`."""
    d = int(doc_id)
    br_idx = 1 + d % 3          # 48 / 56 / 64 kbps
    sr_idx = 2                  # 32000 Hz
    w = _BitWriter()
    w.write(0xFFF, 12)          # syncword
    w.write(1, 1)               # ID = 1 (MPEG-1)
    w.write(0b10, 2)            # layer II
    w.write(1, 1)               # protection_bit = 1 (no CRC)
    w.write(br_idx, 4)
    w.write(sr_idx, 2)
    w.write(0, 1)               # padding
    w.write(0, 1)               # private
    w.write(0b11, 2)            # mode: single channel
    w.write(0, 2)               # mode extension
    w.write(0, 1)               # copyright
    w.write(0, 1)               # original
    w.write(0, 2)               # emphasis
    alloc, sf_idx, code = _closed_form(d)
    for sb in range(_SBLIMIT):
        w.write(alloc[sb], 2)
    for sb in range(_SBLIMIT):
        if alloc[sb]:
            w.write(0, 2)       # scfsi = 0: three scalefactors follow
    for sb in range(_SBLIMIT):
        if alloc[sb]:
            for part in range(3):
                w.write(sf_idx(sb, part), 6)
    for gr in range(12):
        for sb in range(_SBLIMIT):
            levels = _ALLOC_LEVELS[alloc[sb]]
            if not levels:
                continue
            if levels in _GROUP_BITS:
                c = [code(sb, gr * 3 + k, levels) for k in range(3)]
                w.write(c[0] + 3 * c[1] + 9 * c[2],
                        _GROUP_BITS[levels])
            else:
                for k in range(3):
                    w.write(code(sb, gr * 3 + k, levels),
                            _CODE_BITS[levels])
    return w.bytes()


def mp2_decode_stats(payload: bytes):
    """REAL Layer II decode: header → allocation → scfsi →
    scalefactors → code unpacking (grouped base-3 and individual) →
    Q20 requantization → Q14 matrixing → 512-tap windowed overlap-add
    over the V FIFO, reduced to exact integer stats.  Returns
    (bitrate_kbps, sample_rate_hz, n_samples, out_sum, out_min,
    out_max) or None for a non-Layer-II payload."""
    if len(payload) < 4:
        return None
    h = int.from_bytes(payload[:4], "big")
    if (h >> 20) != 0xFFF:      # sync + ID
        return None
    layer = (h >> 17) & 0x3
    if layer != 0b10:           # Layer II only
        return None
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    bitrate = MP2_BITRATES_KBPS[br_idx]
    sample_rate = MP2_SAMPLE_RATES[sr_idx]
    r = _BitReader(payload)
    r.pos = 32
    alloc = [r.read(2) for _ in range(_SBLIMIT)]
    scfsi = {sb: r.read(2) for sb in range(_SBLIMIT) if alloc[sb]}
    if any(v != 0 for v in scfsi.values()):
        return None             # encoder always writes scfsi=0
    sf = {}
    for sb in range(_SBLIMIT):
        if alloc[sb]:
            sf[sb] = [r.read(6) for _ in range(3)]
    # unpack + requantize to Q20 subband samples S[t][sb]
    S = [[0] * 32 for _ in range(36)]
    for gr in range(12):
        part = gr // 4
        for sb in range(_SBLIMIT):
            levels = _ALLOC_LEVELS[alloc[sb]]
            if not levels:
                continue
            if levels in _GROUP_BITS:
                g = r.read(_GROUP_BITS[levels])
                cs = [g % 3, (g // 3) % 3, (g // 9) % 3]
            else:
                cs = [r.read(_CODE_BITS[levels]) for _ in range(3)]
            sfi = SF_Q20[sf[sb][part]]
            for k, c in enumerate(cs):
                q = 2 * c - (levels - 1)
                S[gr * 3 + k][sb] = _sdiv(q * sfi, levels - 1)
    # matrixing: V[t][i] = Σ_k N[i][k]·S[t][k]  (Q34, exact)
    V = [
        [
            sum(COS_Q14[i][k] * S[t][k] for k in range(_SBLIMIT))
            for i in range(64)
        ]
        for t in range(36)
    ]
    # windowed overlap-add over the V FIFO (spec X/U indexing reduced
    # to the closed form; V_{t<0} = 0):
    #   out(t,j) = Σ_{p=0..15} W[j+32p] · V_{t−p}[j + 32·(p%2)]
    out_sum = 0
    out_min = None
    out_max = None
    n = 0
    for t in range(36):
        for j in range(32):
            acc = 0
            for p in range(16):
                s = t - p
                if s < 0:
                    continue
                acc += WIN_Q15[j + 32 * p] * V[s][j + 32 * (p % 2)]
            o = _sdiv(acc, _OUT_DESCALE)
            out_sum += o
            out_min = o if out_min is None else min(out_min, o)
            out_max = o if out_max is None else max(out_max, o)
            n += 1
    return (bitrate, sample_rate, n, out_sum, out_min, out_max)


def mp2_closed_form_plan() -> dict:
    """The shared integer tables for the SQL twin, as literal-row
    strings (the ADPCM oracle precedent): scalefactors, cosine matrix
    restricted to the 8 used subbands, and the window taps indexed by
    (j, p)."""
    sfs = ",".join(f"({i},{v})" for i, v in enumerate(SF_Q20[:48]))
    cos = ",".join(
        f"({i},{k},{COS_Q14[i][k]})"
        for i in range(64)
        for k in range(_SBLIMIT)
    )
    win = ",".join(
        f"({j},{p},{WIN_Q15[j + 32 * p]})"
        for j in range(32)
        for p in range(16)
    )
    return {"sf": sfs, "cos": cos, "win": win,
            "descale": _OUT_DESCALE}
