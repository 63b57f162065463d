"""Vector expression helpers over ``array<float>`` embedding columns.

Native `zip_with`/`aggregate` expressions (JVM-side) — the brute-force
baseline. The LSH/IVF scale paths live in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def normalize_l2(a: Column) -> Column:
    """Unit-normalize an embedding (NULL-safe: zero vectors stay
    all-zero rather than dividing by zero). Pre-normalizing lets the
    dot product alone serve as cosine in downstream ANN stages.

    The norm is BOUND once per row (single-element-array transform):
    higher-order lambdas are interpreted, and a lambda body that
    inlines the norm expression re-aggregates the whole vector at
    every element — an O(d^2) blowup per row."""
    n = norm(a)
    return F.when(n == 0, a).otherwise(
        F.transform(
            F.array(n), lambda nn: F.transform(a, lambda x: x.cast("double") / nn)
        )[0]
    )


def quantize_int8(a: Column) -> Column:
    """Symmetric per-vector int8 quantization: scale = max|x| / 127,
    codes = round(x / scale) in [-127, 127]. Returns a struct
    (scale double, codes array<int>) — a 4x storage cut (8x vs f64)
    that preserves cosine to ~1e-2, which is what a 100 TB embedding
    store ships to the ANN index. Deterministic per row: both engines
    produce identical codes, so the op is exactly oracle-checkable.

    The scale is BOUND once per row (see normalize_l2) — inlining it
    in the codes lambda re-scans the vector per element, O(d^2)."""
    scale = F.array_max(F.transform(a, lambda x: F.abs(x.cast("double")))) / 127
    codes = F.transform(
        F.array(scale),
        lambda s: F.transform(
            a,
            lambda x: F.when(s == 0, F.lit(0)).otherwise(
                F.round(x.cast("double") / s).cast("int")
            ),
        ),
    )[0]
    return F.struct(scale.alias("scale"), codes.alias("codes"))


def dequantize_int8(q: Column) -> Column:
    """Inverse of :func:`quantize_int8` (up to scale/2 per element)."""
    return F.transform(q["codes"], lambda c: c.cast("double") * q["scale"])
