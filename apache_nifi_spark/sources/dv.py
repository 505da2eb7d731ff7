"""Deletion-vector codecs for the Delta log (delta.io PROTOCOL.md
"Deletion Vectors"): a DV marks row ordinals of a data file as deleted
without rewriting the file — the merge-on-read half of DML that
copy-on-write (``streaming/jdbc_sink``-style bucket rewrite) trades
write amplification against.

Two public-spec codecs, implemented from scratch:

- **RoaringBitmap** (RoaringFormatSpec, the ``portable`` wire format):
  32-bit values chunked by their high 16 bits into containers — sorted
  ``array`` containers up to 4096 values, 8 KiB ``bitmap`` containers
  above (and ``run`` containers on the read path, cookie 12347).  The
  WRITER emits the no-run layout (cookie 12346: container count,
  per-container key/cardinality headers, offsets, container data) —
  always spec-legal; run encoding is an optional compression.
- **RoaringBitmapArray** (Delta's 64-bit extension, PROTOCOL.md): magic
  ``1681511377`` (int32 LE) + bitmap count (int64 LE) + one standard
  32-bit roaring per high word, densely indexed — value ``v`` lives in
  bitmap ``v >> 32`` as member ``v & 0xFFFFFFFF``.
- **Z85** (ZeroMQ RFC 32) for the inline descriptor encoding
  (``storageType "i"``): 4 bytes → 5 chars over the 85-char alphabet.
  Z85 requires a 4-byte multiple, so the serialized bitmap is
  zero-padded and the descriptor's ``sizeInBytes`` records the true
  length for decode-side truncation.

Scale shape: a DV is per-FILE state of at most ``rows-in-file`` bits —
kilobytes against multi-hundred-MB parquet — carried inside the add
action (control-plane), decoded executor-side next to the file scan.
"""

from __future__ import annotations

import struct

__all__ = [
    "z85_encode",
    "z85_decode",
    "roaring_serialize",
    "roaring_deserialize",
    "rbm_array_serialize",
    "rbm_array_deserialize",
    "make_inline_dv",
    "read_inline_dv",
]

_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_REV = {c: i for i, c in enumerate(_Z85)}


def z85_encode(data: bytes) -> str:
    """ZeroMQ RFC 32: each big-endian 4-byte word → 5 base-85 chars,
    most significant digit first.  ``len(data)`` must be a multiple
    of 4 (the RFC's precondition)."""
    if len(data) % 4:
        raise ValueError("z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(data), 4):
        (v,) = struct.unpack(">I", data[i : i + 4])
        chunk = []
        for _ in range(5):
            chunk.append(_Z85[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(s: str) -> bytes:
    """Inverse of :func:`z85_encode`; rejects bad lengths/characters."""
    if len(s) % 5:
        raise ValueError("z85 input must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for c in s[i : i + 5]:
            v = v * 85 + _Z85_REV[c]
        out += struct.pack(">I", v)
    return bytes(out)


_COOKIE_NO_RUN = 12346
_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4


def roaring_serialize(values) -> bytes:
    """32-bit RoaringBitmap, portable no-run layout (cookie 12346):
    sorted array containers ≤ 4096 values, bitmap containers above."""
    vals = sorted(set(values))
    if any(v < 0 or v > 0xFFFFFFFF for v in vals):
        raise ValueError("roaring values must be uint32")
    chunks: dict[int, list[int]] = {}
    for v in vals:
        chunks.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(chunks)
    header = struct.pack("<ii", _COOKIE_NO_RUN, len(keys))
    desc = b"".join(
        struct.pack("<HH", k, len(chunks[k]) - 1) for k in keys
    )
    bodies = []
    for k in keys:
        members = chunks[k]
        if len(members) <= 4096:
            bodies.append(struct.pack(f"<{len(members)}H", *members))
        else:
            bits = bytearray(8192)
            for m in members:
                bits[m >> 3] |= 1 << (m & 7)
            bodies.append(bytes(bits))
    # offsets measured from the start of the stream (spec: always
    # present with the no-run cookie)
    base = len(header) + len(desc) + 4 * len(keys)
    offsets, pos = [], base
    for b in bodies:
        offsets.append(pos)
        pos += len(b)
    return (
        header
        + desc
        + struct.pack(f"<{len(keys)}I", *offsets)
        + b"".join(bodies)
    )


def roaring_deserialize(blob: bytes, offset: int = 0) -> tuple[set, int]:
    """Parse one 32-bit roaring at ``offset`` → (values, bytes consumed).
    Handles all three container types and both cookies (run layout per
    the spec: run-flag bitset after the cookie, offsets only at ≥ 4
    containers)."""
    start = offset
    (cookie,) = struct.unpack_from("<i", blob, offset)
    offset += 4
    run_flags = b""
    if (cookie & 0xFFFF) == _COOKIE_RUN:
        n = (cookie >> 16) + 1
        nbytes = (n + 7) // 8
        run_flags = blob[offset : offset + nbytes]
        offset += nbytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<i", blob, offset)
        offset += 4
        has_offsets = True
    else:
        raise ValueError(f"not a roaring bitmap (cookie {cookie})")
    keys, cards = [], []
    for _ in range(n):
        k, c = struct.unpack_from("<HH", blob, offset)
        offset += 4
        keys.append(k)
        cards.append(c + 1)
    if has_offsets:
        offset += 4 * n  # absolute offsets; containers follow in order
    out: set[int] = set()
    for i in range(n):
        hi = keys[i] << 16
        is_run = bool(run_flags) and (run_flags[i >> 3] >> (i & 7)) & 1
        if is_run:
            (n_runs,) = struct.unpack_from("<H", blob, offset)
            offset += 2
            for _ in range(n_runs):
                s, l = struct.unpack_from("<HH", blob, offset)
                offset += 4
                out.update(hi | m for m in range(s, s + l + 1))
        elif cards[i] <= 4096:
            members = struct.unpack_from(f"<{cards[i]}H", blob, offset)
            offset += 2 * cards[i]
            out.update(hi | m for m in members)
        else:
            bits = blob[offset : offset + 8192]
            offset += 8192
            out.update(
                hi | (byte_i << 3) | bit
                for byte_i, b in enumerate(bits)
                if b
                for bit in range(8)
                if (b >> bit) & 1
            )
    # offsets (when present) are relative to the bitmap's own start
    return out, offset - start


def rbm_array_serialize(values) -> bytes:
    """Delta's 64-bit RoaringBitmapArray (PROTOCOL.md portable format):
    magic + bitmap count + one 32-bit roaring per high word, densely
    indexed 0..max_high (gap words serialize as empty bitmaps)."""
    vals = sorted(set(values))
    if any(v < 0 for v in vals):
        raise ValueError("row ordinals are non-negative")
    by_hi: dict[int, list[int]] = {}
    for v in vals:
        by_hi.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    count = (max(by_hi) + 1) if by_hi else 0
    out = struct.pack("<iq", 1681511377, count)
    for hi in range(count):
        out += roaring_serialize(by_hi.get(hi, []))
    return out


def rbm_array_deserialize(blob: bytes) -> set:
    magic, count = struct.unpack_from("<iq", blob, 0)
    if magic != 1681511377:
        raise ValueError(f"not a RoaringBitmapArray (magic {magic})")
    offset, out = 12, set()
    for hi in range(count):
        vals, used = roaring_deserialize(blob, offset)
        offset += used
        out.update((hi << 32) | v for v in vals)
    return out


def make_inline_dv(positions) -> dict:
    """Inline deletion-vector descriptor (``storageType "i"``) for the
    given deleted row ordinals: the serialized RoaringBitmapArray,
    zero-padded to Z85's 4-byte granule, in ``pathOrInlineDv``;
    ``sizeInBytes`` is the TRUE (pre-pad) length, ``cardinality`` the
    deleted-row count."""
    blob = rbm_array_serialize(positions)
    padded = blob + b"\x00" * (-len(blob) % 4)
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(padded),
        "sizeInBytes": len(blob),
        "cardinality": len(set(positions)),
    }


def read_inline_dv(descriptor: dict) -> set:
    """Deleted row ordinals from an inline descriptor."""
    if descriptor["storageType"] != "i":
        raise ValueError("only inline (storageType 'i') DVs supported")
    raw = z85_decode(descriptor["pathOrInlineDv"])
    return rbm_array_deserialize(raw[: descriptor["sizeInBytes"]])
