"""N-Triples interchange for the triple table (W3C RDF 1.1 N-Triples).

The reference exports annotations to R data frames only; a KG engine
needs the standard graph interchange format so its output feeds any
RDF store. Entities/predicates here are engine ids (``per:ada``), so
every term serializes as an IRI under a caller-chosen base namespace:
``<urn:kg:per:ada> <urn:kg:works_at> <urn:kg:org:acme> .``

Everything is JVM Column expressions — one projection to write, one
regexp split to read, zero shuffles either way, so a 100 TB export is
a map-only pass.

Escaping: the N-Triples grammar forbids a small fixed set inside IRIs
(space, angle brackets, quotes, backslash, braces, pipe, caret,
backtick); those are percent-encoded with chained ``regexp_replace``
(``%`` itself first, so the coding is bijective and the reader's
decode chain inverts it exactly — roundtrip-tested on adversarial
ids). ASCII control characters are NOT escaped (engine ids never
contain them; documented limit, the writer would emit an invalid line
rather than silently altering the id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

#: (char, %XX) in ENCODE order — '%' must come first.
_ESCAPES = [
    ("%", "%25"),
    (" ", "%20"),
    ("<", "%3C"),
    (">", "%3E"),
    ('"', "%22"),
    ("\\", "%5C"),
    ("{", "%7B"),
    ("}", "%7D"),
    ("|", "%7C"),
    ("^", "%5E"),
    ("`", "%60"),
]


def _encode(col: Column) -> Column:
    for ch, enc in _ESCAPES:
        col = F.replace(col, F.lit(ch), F.lit(enc))
    return col


def _decode(col: Column) -> Column:
    for ch, enc in reversed(_ESCAPES):
        col = F.replace(col, F.lit(enc), F.lit(ch))
    return col


def to_ntriples(triples: DataFrame, base: str = "urn:kg:") -> DataFrame:
    """Serialize (subj, pred, obj) rows to one-line N-Triples strings:
    a single-column ``line`` frame ready for ``df.write.text``."""
    def iri(name: str) -> Column:
        return F.concat(F.lit("<" + base), _encode(F.col(name)), F.lit(">"))

    return triples.select(
        F.concat_ws(" ", iri("subj"), iri("pred"), iri("obj"), F.lit("."))
        .alias("line")
    )


def from_ntriples(lines: DataFrame, base: str = "urn:kg:") -> DataFrame:
    """Parse IRI-only N-Triples lines (``line`` column) back to
    (subj, pred, obj). Comment and blank lines are dropped; lines not
    matching the three-IRI-under-``base`` shape are dropped too (this
    reader ingests this writer's output and any store's re-export of
    it, not arbitrary RDF with literals/bnodes — documented subset)."""
    b = "\\Q" + base + "\\E"  # literal-quote the base inside the regex
    pat = f"^<{b}([^>]*)> <{b}([^>]*)> <{b}([^>]*)> \\.\\s*$"
    parsed = lines.select(
        *[
            F.regexp_extract(F.col("line"), pat, i).alias(c)
            for i, c in enumerate(("subj", "pred", "obj"), start=1)
        ],
        F.col("line").rlike(pat).alias("__ok"),
    )
    return parsed.filter("__ok").select(
        *[_decode(F.col(c)).alias(c) for c in ("subj", "pred", "obj")]
    )
