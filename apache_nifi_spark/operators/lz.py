"""From-scratch Snappy and LZ4 BLOCK codecs (NiFi CompressContent's two
remaining menu entries [2.7.2-surface] — no snappy/lz4 library ships in
this environment, so both byte formats are implemented from their
public format descriptions):

- **Snappy** (google/snappy ``format_description.txt``): varint
  uncompressed length, then tagged elements — literals (tag 00, 6-bit
  length with 1–4 little-endian extension bytes), copies with 1-byte
  (tag 01: 3-bit length 4–11, 11-bit offset), 2-byte (tag 10: 6-bit
  length 1–64, 16-bit LE offset) or 4-byte (tag 11) offsets.
- **LZ4** (``lz4_Block_format.md``): token byte (high nibble literal
  length, low nibble match length − 4, 15 ⇒ 255-continued extension
  bytes), literals, 2-byte LE offset ≥ 1, with the spec's end rules
  (last sequence is literals-only; no match starts within the final 12
  bytes; last 5 bytes are literals).

Both compressors are greedy single-pass hash matchers (4-byte keys) —
deterministic byte-for-byte, which keeps the operators value-oracle-able
— and both DECOMPRESSORS implement the full element grammar, so
third-party output decodes too (overlapping copies replay byte-wise per
both specs).  Compression here is per-RECORD content (the NiFi
FlowFile semantic), wired into ``operators/content._codecs``.
"""

from __future__ import annotations

__all__ = [
    "snappy_compress",
    "snappy_decompress",
    "lz4_compress",
    "lz4_decompress",
]

_MIN_MATCH = 4


def _hash4(data: bytes, i: int) -> int:
    # multiplicative hash of the 4 bytes at i (the snappy/lz4 family trick)
    v = (
        data[i]
        | (data[i + 1] << 8)
        | (data[i + 2] << 16)
        | (data[i + 3] << 24)
    )
    return ((v * 2654435761) >> 18) & 0x3FFF


def _find_matches(data: bytes, max_offset: int, tail_guard: int):
    """Greedy (literal_run, match_off, match_len) element stream shared
    by both compressors; ``tail_guard`` bytes at the end never start a
    match (LZ4's end rule; 0 for snappy)."""
    n = len(data)
    table: dict[int, int] = {}
    i = 0
    lit_start = 0
    out = []
    limit = n - tail_guard
    while i + _MIN_MATCH <= limit:
        h = _hash4(data, i)
        cand = table.get(h, -1)
        table[h] = i
        if (
            cand >= 0
            and i - cand <= max_offset
            and data[cand : cand + _MIN_MATCH] == data[i : i + _MIN_MATCH]
        ):
            mlen = _MIN_MATCH
            while i + mlen < limit and data[cand + mlen] == data[i + mlen]:
                mlen += 1
            out.append((data[lit_start:i], i - cand, mlen))
            i += mlen
            lit_start = i
        else:
            i += 1
    out.append((data[lit_start:], 0, 0))
    return out


# ----------------------------------------------------------------- snappy --


def _snappy_varint(n: int) -> bytes:
    out = bytearray()
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def _snappy_literal(chunk: bytes) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(chunk):
        piece = chunk[pos : pos + 65536]
        n = len(piece) - 1
        if n < 60:
            out.append(n << 2)
        elif n < 256:
            out.append(60 << 2)
            out.append(n)
        else:
            out.append(61 << 2)
            out += n.to_bytes(2, "little")
        out += piece
        pos += len(piece)
    return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    data = bytes(data)
    out = bytearray(_snappy_varint(len(data)))
    for lit, off, mlen in _find_matches(data, 65535, 0):
        if lit:
            out += _snappy_literal(lit)
        while mlen >= _MIN_MATCH:
            # 2-byte-offset copies carry lengths 1..64; keep every piece
            # ≥ MIN_MATCH so the remainder never drops below emit range
            piece = min(mlen, 64)
            if mlen - piece < _MIN_MATCH:
                piece = mlen
            if piece > 64:
                piece = 60  # leaves ≥ 4 (mlen ≤ 124 here)
            out.append(0b10 | ((piece - 1) << 2))
            out += off.to_bytes(2, "little")
            mlen -= piece
    return bytes(out)


def snappy_decompress(data: bytes) -> bytes:
    data = bytes(data)
    # varint preamble
    n = shift = pos = 0
    while True:
        b = data[pos]
        n |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            break
        shift += 7
    out = bytearray()
    while pos < len(data):
        tag = data[pos]
        ttype = tag & 0x03
        if ttype == 0:  # literal
            ln = tag >> 2
            pos += 1
            if ln >= 60:
                ext = ln - 59
                ln = int.from_bytes(data[pos : pos + ext], "little")
                pos += ext
            ln += 1
            out += data[pos : pos + ln]
            pos += ln
            continue
        if ttype == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 0x07) + 4
            off = ((tag >> 5) << 8) | data[pos + 1]
            pos += 2
        elif ttype == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos + 1 : pos + 3], "little")
            pos += 3
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos + 1 : pos + 5], "little")
            pos += 5
        if off == 0 or off > len(out):
            raise ValueError("snappy copy offset out of range")
        for _ in range(ln):  # overlapping copies replay byte-wise
            out.append(out[-off])
    if len(out) != n:
        raise ValueError(
            f"snappy length mismatch: preamble {n}, decoded {len(out)}"
        )
    return bytes(out)


# -------------------------------------------------------------------- lz4 --


def _lz4_len_ext(n: int) -> bytes:
    out = bytearray()
    while n >= 255:
        out.append(255)
        n -= 255
    out.append(n)
    return bytes(out)


def lz4_compress(data: bytes) -> bytes:
    data = bytes(data)
    out = bytearray()
    if len(data) == 0:
        return b"\x00"  # one literals-only token of length 0
    # spec end rules: no match in the final 12 bytes (which also keeps
    # the last 5 bytes literal)
    for lit, off, mlen in _find_matches(data, 65535, 12):
        lit_len = len(lit)
        if off == 0:  # final literals-only sequence
            token = min(lit_len, 15) << 4
            out.append(token)
            if lit_len >= 15:
                out += _lz4_len_ext(lit_len - 15)
            out += lit
            break
        token = (min(lit_len, 15) << 4) | min(mlen - 4, 15)
        out.append(token)
        if lit_len >= 15:
            out += _lz4_len_ext(lit_len - 15)
        out += lit
        out += off.to_bytes(2, "little")
        if mlen - 4 >= 15:
            out += _lz4_len_ext(mlen - 4 - 15)
    return bytes(out)


def lz4_decompress(data: bytes) -> bytes:
    data = bytes(data)
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        token = data[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = data[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        out += data[pos : pos + lit_len]
        pos += lit_len
        if pos >= n:  # last sequence: literals only
            break
        off = int.from_bytes(data[pos : pos + 2], "little")
        pos += 2
        if off == 0 or off > len(out):
            raise ValueError("lz4 match offset out of range")
        mlen = (token & 0x0F) + 4
        if (token & 0x0F) == 15:
            while True:
                b = data[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        for _ in range(mlen):
            out.append(out[-off])
    return bytes(out)
