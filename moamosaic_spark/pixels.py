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


def pack_u2(arr: Column) -> Column:
    """array<int> -> binary (uint16 LE). Values must fit uint16."""
    return F.unhex(
        F.array_join(
            F.transform(
                arr,
                lambda x: F.concat(
                    F.lpad(F.hex(x % 256), 2, "0"),
                    F.lpad(F.hex((x / 256).cast("int")), 2, "0"),
                ),
            ),
            "",
        )
    )


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
