"""Pixel payload layouts.

The engine's dominant cost at scale is its ONE wide shuffle: pixel
chunks moving into their (band, tile) stitch groups. Two storage
layouts for the ``pixels`` column:

* ``array<int>`` ("i4") — 4 bytes/px on the wire; the compatibility
  layout (plain SQL can aggregate it directly).
* ``binary`` ("u2") — row-major uint16 little-endian, 2 bytes/px;
  HALVES the bytes of every pixel shuffle/scan/spill. Valid for the
  uint16 rasters the reference targets (SURVEY §7.4); kernels decode
  zero-copy with ``np.frombuffer(buf, '<u2')``.

The layout is detected from the blocks DataFrame's schema — no config
knob to keep in sync — and the stitch output uses the same layout as
its input. Pack/unpack below are JVM-side column expressions (hex
string bridge; linear, no Python), used at generation and
correctness-query boundaries, never in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T


def pixels_are_binary(df: DataFrame, col: str = "pixels") -> bool:
    return isinstance(df.schema[col].dataType, T.BinaryType)


def hex4_le(value: int) -> str:
    """The 4-hex-char little-endian encoding of one uint16 value —
    the unit for JVM-side repeat/concat construction of binary rows."""
    v = int(value)
    if not (0 <= v <= 0xFFFF):
        raise ValueError(f"pixel value {v} outside uint16 range")
    return f"{v & 0xFF:02X}{v >> 8:02X}"


def _u2_le_hex(x: Column) -> Column:
    """4-hex-char little-endian encoding of one uint16 column value.
    Values outside [0, 65535] raise at runtime (lpad would otherwise
    TRUNCATE the high-byte hex and silently corrupt the pixel — the
    column twin of hex4_le's ValueError)."""
    guard = F.assert_true(
        (x >= 0) & (x <= 0xFFFF), F.concat(F.lit("pixel value outside uint16: "), x)
    )
    lo = F.lpad(F.hex(x % 256), 2, "0")
    hi = F.lpad(F.hex((x / 256).cast("int")), 2, "0")
    # assert_true yields NULL when the predicate holds; coalesce routes
    # execution through the guard without changing the value
    return F.coalesce(guard.cast("string"), F.concat(lo, hi))


def pack_u2(arr: Column) -> Column:
    """array<int> -> binary (uint16 LE). Values must fit uint16
    (runtime-guarded)."""
    return F.unhex(F.array_join(F.transform(arr, _u2_le_hex), ""))


def pack_row_u2(first_value: Column, xsize: Column, ysize: Column) -> Column:
    """binary of ``ysize`` repeats of the packed row
    [first_value, first_value+1, ..., first_value+xsize-1] — the cheap
    generator for column-index-valued synthetic chunks (pack one row's
    hex, repeat per row: ~30x fewer string ops than per-pixel packing)."""
    row_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0), xsize.cast("int") - 1),
            lambda u: _u2_le_hex(first_value + u),
        ),
        "",
    )
    return F.unhex(F.repeat(row_hex, ysize.cast("int")))


def unpack_u2(bin_col: Column, chunk_bytes: int = 512) -> Column:
    """binary (uint16 LE) -> array<int>.

    Two-level decode: slice the blob into ``chunk_bytes`` pieces first,
    then decode pixels within each small piece. Per-element expressions
    inside higher-order lambdas run interpreted and pay O(operand size)
    per element — decoding a 128 KB blob with per-pixel substr directly
    on it is quadratic (measured 16x slower at 64k px; hex-ing the
    whole blob per element 280x slower)."""
    chunks = F.transform(
        F.sequence(
            F.lit(0), F.ceil(F.length(bin_col) / chunk_bytes).cast("int") - 1
        ),
        lambda j: bin_col.substr(j * chunk_bytes + 1, F.lit(chunk_bytes)),
    )
    decoded = F.flatten(
        F.transform(
            chunks,
            lambda ch: F.transform(
                F.sequence(F.lit(1), (F.length(ch) / 2).cast("int")),
                lambda i: F.conv(
                    F.concat(
                        F.hex(ch.substr(i * 2, F.lit(1))),
                        F.hex(ch.substr(i * 2 - 1, F.lit(1))),
                    ),
                    16,
                    10,
                ).cast("int"),
            ),
        )
    )
    # sequence(0, -1) would produce a DESCENDING series on empty input
    empty = F.array().cast("array<int>")
    return F.when(F.length(bin_col) == 0, empty).otherwise(decoded)


def repeat_u2(value: int, count: Column) -> Column:
    """binary of ``count`` repeats of one uint16 value (null-fill rows),
    synthesized JVM-side."""
    return F.unhex(F.repeat(F.lit(hex4_le(value)), count.cast("int")))


def pixel_count(col: Column, binary: bool) -> Column:
    """Number of pixels in a payload regardless of layout."""
    return (F.length(col) / 2).cast("long") if binary else F.size(col).cast("long")
