"""Scalar text-feature functions (reference R/feature_engineering.R:141-161,
R/utils.R:18-33) as JVM-side Column expressions — no Python UDFs.

Each helper returns a ``pyspark.sql.Column``; NULL input yields NULL
output (the reference's NA passthrough, R/feature_engineering.R:141,161).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def is_capitalised(col) -> Column:
    """'^[[:upper:]]' test → 'true'/'false' string (feature_engineering.R:143-145)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        c.rlike(r"^[A-ZÀ-Þ]").cast("string")
    )


def is_url(col) -> Column:
    """case-insensitive 'https?' match (feature_engineering.R:145-147)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.lower(c).rlike("https?").cast("string")
    )


def is_email(col) -> Column:
    """'.+@.+\\.' match (feature_engineering.R:147-149)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        c.rlike(r".+@.+\.").cast("string")
    )


def is_number(col) -> Column:
    """'^[[:digit:].,]+$' match (feature_engineering.R:149-151)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        c.rlike(r"^[0-9.,]+$").cast("string")
    )


def prefix(col, n: int) -> Column:
    """first n chars (feature_engineering.R:151-153)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, n)


def suffix(col, n: int) -> Column:
    """last n chars, clamped at string start (feature_engineering.R:153-157).

    Spark's substring(col, -n, n) returns '' (not the full string) when
    len < n, so clamp explicitly like the reference does.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(c) <= n, c).otherwise(F.substring(c, -n, n))


def shape(col) -> Column:
    """lowercase→x, uppercase→X (feature_engineering.R:157-160)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.regexp_replace(c, r"[a-zß-ÿ]", "x"), r"[A-ZÀ-Þ]", "X")


TXT_FEATURES = {
    "is_capitalised": is_capitalised,
    "is_url": is_url,
    "is_email": is_email,
    "is_number": is_number,
    "shape": shape,
}


def txt_feature(col, feature_type: str, n: int = 4) -> Column:
    """Dispatcher mirroring txt_feature(x, type, n) (feature_engineering.R:119-161)."""
    if feature_type == "prefix":
        return prefix(col, n)
    if feature_type == "suffix":
        return suffix(col, n)
    try:
        return TXT_FEATURES[feature_type](col)
    except KeyError:
        raise ValueError(f"unknown feature type: {feature_type}") from None


def txt_sprintf(fmt: str, *cols) -> Column:
    """NA-propagating format_string (R/utils.R:18-33): returns NULL when
    ANY argument is NULL, so missing neighbours emit no attribute."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    cond = None
    for c in cs:
        cond = c.isNull() if cond is None else (cond | c.isNull())
    out = F.format_string(fmt, *cs)
    return out if cond is None else F.when(cond, F.lit(None).cast("string")).otherwise(out)


def tag(name: str, col) -> Column:
    """'colname=value' attribute name-tagging, NULL-propagating
    (feature_engineering.R:107-111). Uses concat which is null-propagating."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit(name + "="), c)
