"""Window-offset CRF feature templates — the reference's signature query.

Re-expresses ``crf_cbind_attributes`` (reference
R/feature_engineering.R:48-111) as a single Spark window pass:

- W1 lag/lead neighbour columns per term per offset (R lines 74-85),
- W2 n-gram combinations of the shifted columns joined with ``sep``,
  NULL-propagating like txt_sprintf (R lines 92-104),
- W3 ``field=value`` name-tagging of every generated column (107-111),
- W5 BOS/EOS positional features (vignettes/crfsuite-nlp.Rmd:252-256),
- and the final packing of all attribute columns into one
  ``array<string>`` with NULLs dropped — mirroring the C bridge's
  NA-attribute drop (src/rcpp_crfsuite.cpp:87-89).

Scale notes: all offsets for all terms share ONE window spec
(partitionBy(*by) orderBy(order_col)), so Catalyst plans a single
shuffle + sort for the whole template set; everything is JVM-side
expression codegen — zero Python UDFs.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cbind_attributes(
    df: DataFrame,
    terms: list[str],
    by: list[str],
    order_col: str,
    from_offset: int = -2,
    to_offset: int = 2,
    ngram_max: int = 3,
    sep: str = "-",
    bos_eos: bool = True,
    out_col: str = "attrs",
    keep_attr_cols: bool = False,
) -> DataFrame:
    """Add an ``array<string>`` attribute column built from window templates.

    Defaults mirror the reference: offsets -2..+2, ngram_max=3, sep='-'
    (R/feature_engineering.R:48).
    """
    w = Window.partitionBy(*by).orderBy(order_col)
    attr_cols: list[str] = []
    exprs = {}
    for term in terms:
        level1: list[str] = []  # the shifted single columns for this term
        for off in range(from_offset, to_offset + 1):
            cname = f"{term}[t{'' if off == 0 else ('%+d' % off)}]"
            if off < 0:
                shifted = F.lag(term, -off).over(w)
            elif off > 0:
                shifted = F.lead(term, off).over(w)
            else:
                shifted = F.col(term)
            exprs[cname] = shifted
            level1.append(cname)
        # W2: n-gram pastes of consecutive-subset combinations (combn in R)
        for size in range(2, min(ngram_max, len(level1)) + 1):
            for combo in combinations(level1, size):
                cname = sep.join(combo)
                parts = [exprs[c] for c in combo]
                null_any = parts[0].isNull()
                for p in parts[1:]:
                    null_any = null_any | p.isNull()
                exprs[cname] = F.when(null_any, F.lit(None).cast("string")).otherwise(
                    F.concat_ws(sep, *parts)
                )
        attr_cols.extend(list(exprs.keys())[len(attr_cols):])

    tagged = [
        F.concat(F.lit(name + "="), expr.cast("string")).alias(name)
        for name, expr in exprs.items()
    ]
    out = df.select("*", *tagged)
    attr_names = list(exprs.keys())

    if bos_eos:
        rn = F.row_number().over(w)
        cnt = F.count(F.lit(1)).over(Window.partitionBy(*by))
        # BOS+k for the first 2 positions, EOS-k for the last 2 (vignette W5)
        out = out.select(
            "*",
            F.when(rn - 1 <= 1, F.format_string("BOS+%d", rn - 1)).alias("__bos"),
            F.when(cnt - rn <= 1, F.format_string("EOS-%d", cnt - rn)).alias("__eos"),
        )
        attr_names = attr_names + ["__bos", "__eos"]

    # pack into array<string>, dropping NULL attributes (rcpp NA-drop)
    arr = F.array_compact(F.array(*[F.col(f"`{c}`") for c in attr_names]))
    out = out.withColumn(out_col, arr)
    if not keep_attr_cols:
        out = out.drop(*attr_names)
    return out


def cbind_attribute_hashes(
    df: DataFrame,
    terms: list[str],
    by: list[str],
    order_col: str,
    from_offset: int = -2,
    to_offset: int = 2,
    ngram_max: int = 3,
    sep: str = "-",
    bos_eos: bool = True,
    out_col: str = "attrs",
) -> DataFrame:
    """Decode-path twin of :func:`cbind_attributes` that never
    materializes the ``name=value`` attribute strings: each feature is
    emitted directly as ``xxhash64(name, value)`` (or ``xxhash64(attr)``
    for the '='-less BOS/EOS markers), yielding ``array<bigint>``.

    The hash basis matches ``CRFModel.attr_hash_table(basis="pair")``,
    which splits the model's stored attribute strings at the first '='
    and hashes the (name, value) pair the same way — so a model trained
    through the string templates decodes identically through this path
    while the hot loop skips ~500 bytes of string building per token.
    NULL values yield no feature (NA-drop, rcpp_crfsuite.cpp:87-89).
    """
    w = Window.partitionBy(*by).orderBy(order_col)
    hash_exprs = []
    for term in terms:
        level1: list[tuple[str, "F.Column"]] = []
        for off in range(from_offset, to_offset + 1):
            name = f"{term}[t{'' if off == 0 else ('%+d' % off)}]"
            if off < 0:
                shifted = F.lag(term, -off).over(w)
            elif off > 0:
                shifted = F.lead(term, off).over(w)
            else:
                shifted = F.col(term)
            level1.append((name, shifted))
            hash_exprs.append(
                F.when(shifted.isNull(), F.lit(None).cast("long")).otherwise(
                    F.xxhash64(F.lit(name), shifted.cast("string"))
                )
            )
        for size in range(2, min(ngram_max, len(level1)) + 1):
            for combo in combinations(level1, size):
                name = sep.join(n for n, _ in combo)
                parts = [e for _, e in combo]
                null_any = parts[0].isNull()
                for p in parts[1:]:
                    null_any = null_any | p.isNull()
                hash_exprs.append(
                    F.when(null_any, F.lit(None).cast("long")).otherwise(
                        F.xxhash64(F.lit(name), F.concat_ws(sep, *parts))
                    )
                )
    out = df
    if bos_eos:
        rn = F.row_number().over(w)
        cnt = F.count(F.lit(1)).over(Window.partitionBy(*by))
        hash_exprs.append(
            F.when(rn - 1 <= 1, F.xxhash64(F.format_string("BOS+%d", rn - 1)))
        )
        hash_exprs.append(
            F.when(cnt - rn <= 1, F.xxhash64(F.format_string("EOS-%d", cnt - rn)))
        )
    return out.withColumn(out_col, F.array_compact(F.array(*hash_exprs)))
