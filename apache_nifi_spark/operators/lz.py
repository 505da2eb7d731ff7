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
    "lz4_frame_compress",
    "lz4_frame_decompress",
    "xxhash32",
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
    # hot loop (r16): _hash4 inlined (a Python call per input byte) and
    # the 4 index/shift/or ops folded into one int.from_bytes; match
    # extension compares 8-byte slices before the byte tail.  Greedy
    # semantics identical — same hash, same table updates, same
    # byte-equality extension — so compressed output is byte-identical
    # (locked by the round-trip + interop unit tests).
    ifb = int.from_bytes
    get = table.get
    while i + _MIN_MATCH <= limit:
        h = ((ifb(data[i : i + 4], "little") * 2654435761) >> 18) & 0x3FFF
        cand = get(h, -1)
        table[h] = i
        if (
            cand >= 0
            and i - cand <= max_offset
            and data[cand : cand + _MIN_MATCH] == data[i : i + _MIN_MATCH]
        ):
            mlen = _MIN_MATCH
            while (
                i + mlen + 8 <= limit
                and data[cand + mlen : cand + mlen + 8]
                == data[i + mlen : i + mlen + 8]
            ):
                mlen += 8
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


# ------------------------------------------------------------- lz4 frame --
#
# The interchange format the ``lz4`` tool speaks (lz4_Frame_format.md):
# magic 0x184D2204, FLG/BD descriptor + xxHash32 header check, 4-byte
# block headers (high bit = stored uncompressed), EndMark, optional
# content checksum.  xxHash32 implemented from its public spec below —
# the frame is what makes the block codec interoperable (the unit test
# round-trips against the real ``lz4`` binary when present).

_XXH_P1, _XXH_P2, _XXH_P3, _XXH_P4, _XXH_P5 = (
    2654435761, 2246822519, 3266489917, 668265263, 374761393,
)
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxhash32(data: bytes, seed: int = 0) -> int:
    """xxHash32 from the public spec (Collet) — the frame format's
    header-check and content-checksum function."""
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _XXH_P1 + _XXH_P2) & _M32
        v2 = (seed + _XXH_P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _XXH_P1) & _M32
        # stripe loop unrolled with the rotate inlined (r16): the
        # enumerate/tuple inner loop cost a Python iteration per lane
        # per stripe; math unchanged, digests byte-identical (locked by
        # the interop unit tests against the real lz4 binary's frames).
        ifb = int.from_bytes
        while pos + 16 <= n:
            v1 = (v1 + ifb(data[pos : pos + 4], "little") * _XXH_P2) & _M32
            v1 = (((v1 << 13) | (v1 >> 19)) & _M32) * _XXH_P1 & _M32
            v2 = (v2 + ifb(data[pos + 4 : pos + 8], "little") * _XXH_P2) & _M32
            v2 = (((v2 << 13) | (v2 >> 19)) & _M32) * _XXH_P1 & _M32
            v3 = (v3 + ifb(data[pos + 8 : pos + 12], "little") * _XXH_P2) & _M32
            v3 = (((v3 << 13) | (v3 >> 19)) & _M32) * _XXH_P1 & _M32
            v4 = (v4 + ifb(data[pos + 12 : pos + 16], "little") * _XXH_P2) & _M32
            v4 = (((v4 << 13) | (v4 >> 19)) & _M32) * _XXH_P1 & _M32
            pos += 16
        acc = (
            _rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12)
            + _rotl32(v4, 18)
        ) & _M32
    else:
        acc = (seed + _XXH_P5) & _M32
    acc = (acc + n) & _M32
    while pos + 4 <= n:
        lane = int.from_bytes(data[pos : pos + 4], "little")
        acc = (acc + lane * _XXH_P3) & _M32
        acc = (_rotl32(acc, 17) * _XXH_P4) & _M32
        pos += 4
    while pos < n:
        acc = (acc + data[pos] * _XXH_P5) & _M32
        acc = (_rotl32(acc, 11) * _XXH_P1) & _M32
        pos += 1
    acc ^= acc >> 15
    acc = (acc * _XXH_P2) & _M32
    acc ^= acc >> 13
    acc = (acc * _XXH_P3) & _M32
    acc ^= acc >> 16
    return acc


def lz4_frame_compress(data: bytes, block_max: int = 1 << 22) -> bytes:
    """One LZ4 frame: FLG = version 01 + block-independence + content
    checksum; BD = 4 MiB max block; each block stores the SMALLER of
    the lz4-block compression and the raw bytes (high header bit =
    uncompressed, per spec)."""
    data = bytes(data)
    flg = (0b01 << 6) | (1 << 5) | (1 << 2)  # v01, b.indep, c.checksum
    bd = 7 << 4  # 4 MiB
    desc = bytes([flg, bd])
    hc = (xxhash32(desc) >> 8) & 0xFF
    out = bytearray((0x184D2204).to_bytes(4, "little") + desc + bytes([hc]))
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + block_max]
        comp = lz4_compress(chunk)
        if len(comp) < len(chunk):
            out += len(comp).to_bytes(4, "little") + comp
        else:
            out += (len(chunk) | 0x80000000).to_bytes(4, "little") + chunk
        pos += len(chunk)
    out += (0).to_bytes(4, "little")  # EndMark
    out += xxhash32(data).to_bytes(4, "little")
    return bytes(out)


def lz4_frame_decompress(data: bytes) -> bytes:
    """Decode an LZ4 frame (the ``lz4`` tool's output): verifies the
    header check, handles stored/compressed blocks, optional block
    checksums, and the content checksum when present."""
    data = bytes(data)
    if int.from_bytes(data[:4], "little") != 0x184D2204:
        raise ValueError("not an LZ4 frame (bad magic)")
    flg = data[4]
    if (flg >> 6) != 0b01:
        raise ValueError(f"unsupported LZ4 frame version {flg >> 6}")
    b_checksum = bool(flg & (1 << 4))
    c_size = bool(flg & (1 << 3))
    c_checksum = bool(flg & (1 << 2))
    dict_id = bool(flg & 1)
    pos = 6  # past FLG + BD
    desc_end = pos
    if c_size:
        desc_end += 8
    if dict_id:
        desc_end += 4
    hc = data[desc_end]
    if (xxhash32(data[4:desc_end]) >> 8) & 0xFF != hc:
        raise ValueError("LZ4 frame header checksum mismatch")
    pos = desc_end + 1
    out = bytearray()
    while True:
        bsize = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        if bsize == 0:  # EndMark
            break
        stored = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        block = data[pos : pos + bsize]
        if len(block) != bsize:
            raise ValueError("LZ4 frame block overruns payload")
        pos += bsize
        if b_checksum:
            want = int.from_bytes(data[pos : pos + 4], "little")
            if xxhash32(block) != want:
                raise ValueError("LZ4 block checksum mismatch")
            pos += 4
        out += block if stored else lz4_decompress(block)
    if c_checksum:
        want = int.from_bytes(data[pos : pos + 4], "little")
        if xxhash32(bytes(out)) != want:
            raise ValueError("LZ4 content checksum mismatch")
    return bytes(out)
