"""Dependency-free crypto primitives for the SSH transport (§2.1 SFTP).

The environment ships no SSH/crypto library and the stdlib has no AES
or curve arithmetic, so the three primitives the SSH-2 mandatory-ish
suite needs are implemented here directly from their public
specifications:

- **X25519** (RFC 7748 §5): the Montgomery-ladder scalar multiply,
  verbatim math from the RFC, used by the ``curve25519-sha256`` key
  exchange (RFC 8731).
- **Ed25519** (RFC 8032 §5.1): twisted-Edwards point arithmetic in
  extended homogeneous coordinates, SHA-512 based signing/verification,
  used for the ``ssh-ed25519`` host key.
- **AES-128-CTR** (FIPS 197 + SP 800-38A): encrypt-only block function
  (CTR needs no decryptor) with the S-box GENERATED from its GF(2^8)
  definition (multiplicative inverse + affine transform) rather than
  pasted as a table.

All three are validated in tests/test_ssh.py against the RFCs' own
test vectors.  Performance notes: pure-Python AES runs ~1 MB/s per
core — adequate for control-plane SFTP transfers (listings + fixture
files); the seam for a native cipher is this module's three classes.
"""

from __future__ import annotations

import hashlib
import os

__all__ = [
    "x25519",
    "X25519_BASE",
    "x25519_keypair",
    "ed25519_publickey",
    "ed25519_sign",
    "ed25519_verify",
    "AesCtr",
]

# ------------------------------------------------------------- X25519 ---

_P = 2**255 - 19
_A24 = 121665
X25519_BASE = (9).to_bytes(32, "little")


def _decode_scalar(k: bytes) -> int:
    a = bytearray(k)
    a[0] &= 248
    a[31] &= 127
    a[31] |= 64
    return int.from_bytes(a, "little")


def x25519(k: bytes, u: bytes) -> bytes:
    """RFC 7748 §5 scalar multiplication on Curve25519."""
    x1 = int.from_bytes(u, "little") & ((1 << 255) - 1)
    scalar = _decode_scalar(k)
    x2, z2, x3, z3 = 1, 0, x1, 1
    swap = 0
    for t in reversed(range(255)):
        k_t = (scalar >> t) & 1
        swap ^= k_t
        if swap:
            x2, x3 = x3, x2
            z2, z3 = z3, z2
        swap = k_t
        a = (x2 + z2) % _P
        aa = a * a % _P
        b = (x2 - z2) % _P
        bb = b * b % _P
        e = (aa - bb) % _P
        c = (x3 + z3) % _P
        d = (x3 - z3) % _P
        da = d * a % _P
        cb = c * b % _P
        x3 = (da + cb) % _P
        x3 = x3 * x3 % _P
        z3 = (da - cb) % _P
        z3 = z3 * z3 % _P
        z3 = z3 * x1 % _P
        x2 = aa * bb % _P
        z2 = e * (aa + _A24 * e) % _P
    if swap:
        x2, x3 = x3, x2
        z2, z3 = z3, z2
    return (x2 * pow(z2, _P - 2, _P) % _P).to_bytes(32, "little")


def x25519_keypair(seed: bytes | None = None) -> tuple[bytes, bytes]:
    """(private, public) — private is 32 random bytes (clamped at use)."""
    priv = seed if seed is not None else os.urandom(32)
    return priv, x25519(priv, X25519_BASE)


# ------------------------------------------------------------ Ed25519 ---

_Q = 2**255 - 19
_L = 2**252 + 27742317777372353535851937790883648493
_D = (-121665 * pow(121666, _Q - 2, _Q)) % _Q
_I_SQRT = pow(2, (_Q - 1) // 4, _Q)


def _ed_recover_x(y: int, sign: int) -> int:
    xx = (y * y - 1) * pow(_D * y * y + 1, _Q - 2, _Q) % _Q
    x = pow(xx, (_Q + 3) // 8, _Q)
    if (x * x - xx) % _Q != 0:
        x = x * _I_SQRT % _Q
    if (x * x - xx) % _Q != 0:
        raise ValueError("invalid point encoding")
    if x & 1 != sign:
        x = _Q - x
    return x


_ED_BY = 4 * pow(5, _Q - 2, _Q) % _Q
_ED_BX = _ed_recover_x(_ED_BY, 0)
_ED_B = (_ED_BX, _ED_BY, 1, _ED_BX * _ED_BY % _Q)  # extended coords
_ED_IDENT = (0, 1, 1, 0)


def _ed_add(p, q):
    x1, y1, z1, t1 = p
    x2, y2, z2, t2 = q
    a = (y1 - x1) * (y2 - x2) % _Q
    b = (y1 + x1) * (y2 + x2) % _Q
    c = 2 * t1 * t2 * _D % _Q
    dd = 2 * z1 * z2 % _Q
    e, f, g, h = b - a, dd - c, dd + c, b + a
    return (e * f % _Q, g * h % _Q, f * g % _Q, e * h % _Q)


def _ed_mul(p, s: int):
    out = _ED_IDENT
    while s:
        if s & 1:
            out = _ed_add(out, p)
        p = _ed_add(p, p)
        s >>= 1
    return out


def _ed_compress(p) -> bytes:
    x, y, z, _t = p
    zi = pow(z, _Q - 2, _Q)
    x, y = x * zi % _Q, y * zi % _Q
    return (y | ((x & 1) << 255)).to_bytes(32, "little")


def _ed_decompress(b: bytes):
    n = int.from_bytes(b, "little")
    y = n & ((1 << 255) - 1)
    x = _ed_recover_x(y, n >> 255)
    return (x, y, 1, x * y % _Q)


def _ed_secret_expand(seed: bytes) -> tuple[int, bytes]:
    h = hashlib.sha512(seed).digest()
    a = int.from_bytes(h[:32], "little")
    a &= (1 << 254) - 8
    a |= 1 << 254
    return a, h[32:]


def ed25519_publickey(seed: bytes) -> bytes:
    a, _prefix = _ed_secret_expand(seed)
    return _ed_compress(_ed_mul(_ED_B, a))


def ed25519_sign(seed: bytes, msg: bytes) -> bytes:
    a, prefix = _ed_secret_expand(seed)
    pub = _ed_compress(_ed_mul(_ED_B, a))
    r = int.from_bytes(hashlib.sha512(prefix + msg).digest(), "little") % _L
    rb = _ed_compress(_ed_mul(_ED_B, r))
    k = (
        int.from_bytes(hashlib.sha512(rb + pub + msg).digest(), "little") % _L
    )
    s = (r + k * a) % _L
    return rb + s.to_bytes(32, "little")


def ed25519_verify(pub: bytes, msg: bytes, sig: bytes) -> bool:
    if len(sig) != 64 or len(pub) != 32:
        return False
    try:
        a_pt = _ed_decompress(pub)
        r_pt = _ed_decompress(sig[:32])
    except ValueError:
        return False
    s = int.from_bytes(sig[32:], "little")
    if s >= _L:
        return False
    k = int.from_bytes(hashlib.sha512(sig[:32] + pub + msg).digest(), "little") % _L
    lhs = _ed_mul(_ED_B, s)
    rhs = _ed_add(r_pt, _ed_mul(a_pt, k))
    return _ed_compress(lhs) == _ed_compress(rhs)


# -------------------------------------------------------- AES-128-CTR ---


def _gen_sbox() -> list[int]:
    """FIPS 197 §5.1.1: multiplicative inverse in GF(2^8) followed by
    the affine transform — generated, not transcribed."""
    # exp/log tables over generator 3
    exp = [0] * 512
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        # multiply by 3 = x * 2 ^ x
        x ^= (x << 1) ^ (0x11B if x & 0x80 else 0)
    for i in range(255, 512):
        exp[i] = exp[i - 255]

    def inv(b: int) -> int:
        return 0 if b == 0 else exp[255 - log[b]]

    sbox = []
    for b in range(256):
        c = inv(b)
        r = 0x63
        for i in range(8):
            bit = (
                (c >> i)
                ^ (c >> ((i + 4) % 8))
                ^ (c >> ((i + 5) % 8))
                ^ (c >> ((i + 6) % 8))
                ^ (c >> ((i + 7) % 8))
            ) & 1
            r ^= bit << i
        sbox.append(r)  # r starts at the 0x63 affine constant
    return sbox


_SBOX = _gen_sbox()


def _xtime(b: int) -> int:
    b <<= 1
    return (b ^ 0x11B) & 0xFF if b & 0x100 else b


# T-tables for the combined SubBytes+ShiftRows+MixColumns step
_T0 = []
for _s in _SBOX:
    _s2 = _xtime(_s)
    _s3 = _s2 ^ _s
    _T0.append((_s2 << 24) | (_s << 16) | (_s << 8) | _s3)
_T1 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _T0]
_T2 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _T1]
_T3 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _T2]

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


class _Aes128:
    """Encrypt-only AES-128 (10 rounds), T-table implementation."""

    __slots__ = ("rk",)

    def __init__(self, key: bytes):
        assert len(key) == 16
        w = [int.from_bytes(key[i : i + 4], "big") for i in range(0, 16, 4)]
        for i in range(4, 44):
            t = w[i - 1]
            if i % 4 == 0:
                t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF  # RotWord
                t = (
                    (_SBOX[(t >> 24) & 0xFF] << 24)
                    | (_SBOX[(t >> 16) & 0xFF] << 16)
                    | (_SBOX[(t >> 8) & 0xFF] << 8)
                    | _SBOX[t & 0xFF]
                )
                t ^= _RCON[i // 4 - 1] << 24
            w.append(w[i - 4] ^ t)
        self.rk = w

    def encrypt_block(self, block: bytes) -> bytes:
        rk = self.rk
        s0 = int.from_bytes(block[0:4], "big") ^ rk[0]
        s1 = int.from_bytes(block[4:8], "big") ^ rk[1]
        s2 = int.from_bytes(block[8:12], "big") ^ rk[2]
        s3 = int.from_bytes(block[12:16], "big") ^ rk[3]
        for rnd in range(1, 10):
            t0 = (
                _T0[(s0 >> 24) & 0xFF]
                ^ _T1[(s1 >> 16) & 0xFF]
                ^ _T2[(s2 >> 8) & 0xFF]
                ^ _T3[s3 & 0xFF]
                ^ rk[4 * rnd]
            )
            t1 = (
                _T0[(s1 >> 24) & 0xFF]
                ^ _T1[(s2 >> 16) & 0xFF]
                ^ _T2[(s3 >> 8) & 0xFF]
                ^ _T3[s0 & 0xFF]
                ^ rk[4 * rnd + 1]
            )
            t2 = (
                _T0[(s2 >> 24) & 0xFF]
                ^ _T1[(s3 >> 16) & 0xFF]
                ^ _T2[(s0 >> 8) & 0xFF]
                ^ _T3[s1 & 0xFF]
                ^ rk[4 * rnd + 2]
            )
            t3 = (
                _T0[(s3 >> 24) & 0xFF]
                ^ _T1[(s0 >> 16) & 0xFF]
                ^ _T2[(s1 >> 8) & 0xFF]
                ^ _T3[s2 & 0xFF]
                ^ rk[4 * rnd + 3]
            )
            s0, s1, s2, s3 = t0, t1, t2, t3
        # final round: SubBytes + ShiftRows + AddRoundKey (no MixColumns)
        out = bytearray(16)
        for c, (a, b, cc, d) in enumerate(
            ((s0, s1, s2, s3), (s1, s2, s3, s0), (s2, s3, s0, s1), (s3, s0, s1, s2))
        ):
            v = (
                (_SBOX[(a >> 24) & 0xFF] << 24)
                | (_SBOX[(b >> 16) & 0xFF] << 16)
                | (_SBOX[(cc >> 8) & 0xFF] << 8)
                | _SBOX[d & 0xFF]
            ) ^ self.rk[40 + c]
            out[4 * c : 4 * c + 4] = v.to_bytes(4, "big")
        return bytes(out)


class AesCtr:
    """SP 800-38A CTR mode over AES-128 with a big-endian 128-bit
    counter (the SSH aes128-ctr convention, RFC 4344)."""

    __slots__ = ("_aes", "_counter", "_stream")

    def __init__(self, key: bytes, iv: bytes):
        self._aes = _Aes128(key)
        self._counter = int.from_bytes(iv, "big")
        self._stream = b""

    def crypt(self, data: bytes) -> bytes:
        need = len(data) - len(self._stream)
        if need > 0:
            blocks = bytearray()
            ctr = self._counter
            for _ in range((need + 15) // 16):
                blocks += self._aes.encrypt_block(
                    (ctr & ((1 << 128) - 1)).to_bytes(16, "big")
                )
                ctr += 1
            self._counter = ctr
            self._stream += bytes(blocks)
        ks, self._stream = self._stream[: len(data)], self._stream[len(data):]
        n = len(data)
        return (
            int.from_bytes(data, "big") ^ int.from_bytes(ks, "big")
        ).to_bytes(n, "big") if n else b""
