"""GeohashRecord (§2.4 [2.7.2-surface]: the nifi-geohash bundle's
encode/decode record processor) as pure column bit arithmetic.

A geohash of precision ``p`` is ``5p`` bits: the binary subdivisions of
longitude and latitude interleaved (lon first), grouped into 5-bit
base-32 digits.  The textbook loop ("halve the interval, emit a bit")
is equivalent to one closed form — the lon bits are simply the binary
expansion of ``floor((lon+180)/360 * 2^n_lon)`` (and lat likewise), so
encode = two scale-and-floors + a compile-time-unrolled bit interleave
+ an alphabet lookup per digit.  Zero UDFs, whole-stage codegen, and
every step (floor, shift, and, concat) is integer-exact, so the same
arithmetic value-oracles bit-for-bit in any engine.

Decode inverts it: alphabet positions reassemble the interleaved word,
the compile-time-unrolled de-interleave splits lon/lat words, and the
cell CENTER is ``min + (x + 0.5) * span / 2^n`` — matching the
reference processor's decoded lat/lon output.

Scale: map-only (no shuffle, no state); at 100 TB this is
scan-bandwidth-bound, the optimal shape for a per-record enrichment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["GEOHASH_ALPHABET", "geohash_encode", "geohash_decode", "geohash_record"]

#: The (public, fixed) geohash base-32 alphabet — no a/i/l/o.
GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _bit_counts(precision: int) -> tuple[int, int]:
    total = 5 * precision
    n_lon = (total + 1) // 2  # lon leads the interleave → gets the extra bit
    n_lat = total // 2
    return n_lon, n_lat


def geohash_encode(lat: Column, lon: Column, precision: int = 8) -> Column:
    """Geohash string of the cell containing (lat, lon) at ``precision``
    characters (1..12; 12 = 60 bits, the bigint limit)."""
    if not 1 <= precision <= 12:
        raise ValueError("geohash precision must be in 1..12")
    n_lon, n_lat = _bit_counts(precision)
    x = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << n_lon)))
    y = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << n_lat)))
    # Clamp the closed upper edge (lon=180, lat=90 scale to 2^n exactly).
    x = F.least(x, F.lit((1 << n_lon) - 1)).cast("long")
    y = F.least(y, F.lit((1 << n_lat) - 1)).cast("long")
    # Interleave into one word: bit k of the word (k=0 ⇒ MSB) comes from
    # lon for even k, lat for odd k.  Unrolled at plan-build time.
    total = 5 * precision
    z: Column = F.lit(0).cast("long")
    for k in range(total):
        if k % 2 == 0:  # lon bit (n_lon-1 - k//2)
            src, bit = x, n_lon - 1 - k // 2
        else:
            src, bit = y, n_lat - 1 - k // 2
        z = z + F.shiftleft(
            F.shiftright(src, bit).bitwiseAND(F.lit(1)), total - 1 - k
        )
    digits = [
        F.substring(
            F.lit(GEOHASH_ALPHABET),
            (F.shiftright(z, 5 * (precision - 1 - i)).bitwiseAND(F.lit(31)) + 1)
            .cast("int"),
            1,
        )
        for i in range(precision)
    ]
    return F.concat(*digits)


def geohash_decode(gh: Column, precision: int = 8) -> tuple[Column, Column]:
    """(lat, lon) center of the geohash cell.  ``precision`` must match
    the string length (fixed-width codegen — the record-pipeline case)."""
    n_lon, n_lat = _bit_counts(precision)
    total = 5 * precision
    z: Column = F.lit(0).cast("long")
    for i in range(precision):
        digit = (F.instr(F.lit(GEOHASH_ALPHABET), F.substring(gh, i + 1, 1)) - 1).cast(
            "long"
        )
        z = z + F.shiftleft(digit, 5 * (precision - 1 - i))
    x: Column = F.lit(0).cast("long")
    y: Column = F.lit(0).cast("long")
    for k in range(total):
        bit = F.shiftright(z, total - 1 - k).bitwiseAND(F.lit(1))
        if k % 2 == 0:
            x = x + F.shiftleft(bit, n_lon - 1 - k // 2)
        else:
            y = y + F.shiftleft(bit, n_lat - 1 - k // 2)
    lon = F.lit(-180.0) + (x.cast("double") + F.lit(0.5)) * F.lit(360.0) / F.lit(
        float(1 << n_lon)
    )
    lat = F.lit(-90.0) + (y.cast("double") + F.lit(0.5)) * F.lit(180.0) / F.lit(
        float(1 << n_lat)
    )
    return lat, lon


def geohash_record(
    df: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    precision: int = 8,
    out_col: str = "geohash",
) -> DataFrame:
    """The GeohashRecord processor's ENCODE mode: append the geohash of
    each record's (lat, lon)."""
    return df.withColumn(
        out_col, geohash_encode(F.col(lat_col), F.col(lon_col), precision)
    )


def geohash_oracle_sql(
    precision: int = 8, lat: str = "lat", lon: str = "lon"
) -> tuple[str, str, str, str]:
    """The identical closed-form encode as engine-portable SQL fragments
    (DuckDB dialect): (x_expr, y_expr, z_expr-over-gx/gy,
    digits_expr-over-gz).  Used by the registry oracle so both engines
    run the SAME arithmetic, not two implementations of 'geohash'."""
    n_lon, n_lat = _bit_counts(precision)
    total = 5 * precision
    x = f"least(CAST(floor(({lon} + 180.0) / 360.0 * {float(1 << n_lon)}) AS BIGINT), {(1 << n_lon) - 1})"
    y = f"least(CAST(floor(({lat} + 90.0) / 180.0 * {float(1 << n_lat)}) AS BIGINT), {(1 << n_lat) - 1})"
    parts = []
    for k in range(total):
        if k % 2 == 0:
            src, bit = "gx", n_lon - 1 - k // 2
        else:
            src, bit = "gy", n_lat - 1 - k // 2
        # Fully parenthesized: SQL shift binds looser than '+', so an
        # unwrapped `a << 39 + b << 37` would parse as nested shifts.
        parts.append(f"((({src} >> {bit}) & 1) << {total - 1 - k})")
    z = " + ".join(parts)
    digits = " || ".join(
        f"substr('{GEOHASH_ALPHABET}', CAST(((gz >> {5 * (precision - 1 - i)}) & 31) + 1 AS INT), 1)"
        for i in range(precision)
    )
    return x, y, z, digits
