"""Lexical relevance scoring over document corpora: inverted-index
term statistics, TF-IDF weights, and BM25 ranking (Robertson et al.,
Okapi BM25; the idf variant is Lucene's always-positive
ln(1 + (N - df + 0.5)/(df + 0.5))).

The reference stops at token-level sequence tagging
(bnosac/crfsuite R/crf.R); a transcript-scale corpus also needs the
retrieval side — dedup triage, query-based decontamination audits,
"which conversations talk about X" — so these are the standard
lexical primitives, shaped for 10^12-token tables:

- the (doc, term, tf) inverted-index frame is ONE explode + ONE
  partial-aggregated groupBy on the uniform (doc, term) key — a hot
  stopword collapses map-side inside each partition before it ever
  shuffles;
- document frequencies aggregate the ALREADY per-doc-distinct index
  frame (groupBy(term).count()), never the raw token stream;
- corpus scalars (N, avgdl) stay in 1-row frames crossJoin-broadcast
  onto the index — no driver-side .count() round trip, the whole
  score is one job;
- BM25 filters the index to the query's terms FIRST (scan-local
  ``isin`` — predicate-pushable), so per-query cost is proportional
  to the posting lists touched, not the corpus.

Tokenization is functions/analysis.py's ``_tokens`` (lower, trim,
split on whitespace) so every operator in the repo agrees on what a
token is, and the DuckDB oracles reproduce it byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crfsuite_spark.functions.analysis import _tokens, token_count


def term_frequencies(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term, tf): the inverted-index frame. Empty tokens (from
    empty/NULL text) are dropped, so token-less documents are absent —
    they carry no postings."""
    toks = docs.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("term")
    ).where(F.col("term") != "")
    return toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))


def tfidf_terms(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term, tf, df, tfidf) with the classic raw weighting
    tfidf = tf · ln(N / df). df ≥ 1 for every emitted term and
    N ≥ df, so the log is total and ≥ 0 (ANSI-safe).

    The document-frequency frame aggregates the index frame (one row
    per (doc, term) already), and N rides in as a broadcast 1-row
    aggregate — three partial-aggregated shuffles total, none of them
    carrying document text."""
    tf = term_frequencies(docs, id_col, text_col)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("__n"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            (F.col("tf") * F.log(F.col("__n") / F.col("df"))).alias(
                "tfidf"
            ),
        )
    )


def bm25_score(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, score): Okapi BM25 of every document against a bag of
    query terms (deduplicated; multiplicity in the query carries no
    weight, per the standard formulation):

        score(D, Q) = Σ_t idf(t) · tf · (k1 + 1)
                          / (tf + k1 · (1 − b + b · |D| / avgdl))
        idf(t)      = ln(1 + (N − df + 0.5) / (df + 0.5))

    Documents sharing no term with the query are absent (score 0 by
    convention). df is corpus-wide document frequency; |D| counts all
    tokens of D (not just query terms); avgdl averages over ALL
    documents, token-less ones included at length 0 — the corpus
    constant, not a function of the query.

    Cost shape: the index frame is filtered to the query's terms at
    the scan, then one groupBy(term) for df, one broadcast of the
    (term, df) postings-list-count frame back onto the filtered index,
    and one final partial-aggregated sum per doc. Document length is
    a scan-local column expression on the docs table."""
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    dl = docs.select(
        F.col(id_col),
        token_count(text_col).cast("double").alias("__dl"),
    )
    stats = dl.agg(
        F.count("*").alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    tf = term_frequencies(docs, id_col, text_col).where(
        F.col("term").isin(terms)
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            (
                F.log(
                    1.0
                    + (F.col("__n") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1
                    * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
                )
            ).alias("__s"),
        )
        .groupBy(id_col)
        .agg(F.sum("__s").alias("score"))
    )
