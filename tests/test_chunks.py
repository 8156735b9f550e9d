"""merge_chunkrange vs the reference semantics (R/training_data.R:52-106):
containment, last-wins overlap tie-break, default 'O', IOB recode."""

import pytest

from crfsuite_spark.operators.chunks import merge_chunkrange


@pytest.fixture(scope="module")
def fixture(spark):
    # doc d1: "Nice flat in Brussels" — tokens with char spans
    tokens = spark.createDataFrame(
        [
            ("d1", 0, "Nice", 0, 3),
            ("d1", 1, "flat", 5, 8),
            ("d1", 2, "in", 10, 11),
            ("d1", 3, "Brussels", 13, 20),
            ("d2", 0, "Uncovered", 0, 8),
        ],
        "doc_id string, token_idx int, token string, start int, end int",
    )
    # chunk 1 covers tokens 0-1 (PROPERTY); chunk 2 covers tokens 1-3
    # (LOCATION) — token 1 is in both → last chunk (id 2) wins
    chunks = spark.createDataFrame(
        [
            ("d1", 1, 0, 8, "PROPERTY"),
            ("d1", 2, 5, 20, "LOCATION"),
        ],
        "doc_id string, chunk_id int, start int, end int, chunk_entity string",
    )
    return tokens, chunks


def test_containment_last_wins_default(fixture):
    tokens, chunks = fixture
    out = merge_chunkrange(tokens, chunks, iob=False).toPandas()
    m = dict(zip(zip(out["doc_id"], out["token_idx"]), out["label"]))
    assert m[("d1", 0)] == "PROPERTY"
    assert m[("d1", 1)] == "LOCATION"  # overlap → last chunk wins
    assert m[("d1", 2)] == "LOCATION"
    assert m[("d1", 3)] == "LOCATION"
    assert m[("d2", 0)] == "O"  # uncovered → default
    assert len(out) == 5  # no row duplication from the range join


def test_iob_recode(fixture):
    tokens, chunks = fixture
    out = merge_chunkrange(tokens, chunks, iob=True).toPandas()
    m = dict(zip(zip(out["doc_id"], out["token_idx"]), out["label"]))
    assert m[("d1", 0)] == "B-PROPERTY"
    assert m[("d1", 1)] == "B-LOCATION"  # first token of chunk 2's run
    assert m[("d1", 2)] == "I-LOCATION"
    assert m[("d1", 3)] == "I-LOCATION"
    assert m[("d2", 0)] == "O"


def test_annotation_sink_roundtrip(spark, tmp_path):
    """S9: chunkrange annotation rows persist in the app's record layout
    (inst/app/annotation.Rmd:87-95) and feed merge_chunkrange back."""
    from crfsuite_spark.operators.chunks import (
        ANNOTATION_SCHEMA, merge_chunkrange, read_annotations,
        write_annotations,
    )
    import datetime

    rows = [
        (datetime.datetime(2024, 1, 1), "d1", "Jan Peeters woont in Gent",
         "Jan Peeters woont in Gent", 0, 10, 1, "PER", "Jan Peeters"),
        (datetime.datetime(2024, 1, 1), "d1", "Jan Peeters woont in Gent",
         "Jan Peeters woont in Gent", 21, 24, 2, "LOC", "Gent"),
    ]
    ann = spark.createDataFrame(rows, ANNOTATION_SCHEMA)
    path = str(tmp_path / "annotations")
    write_annotations(ann, path)
    back = read_annotations(spark, path)
    assert back.count() == 2
    assert back.columns[0] == "annotation_time"
    # missing-column contract
    import pytest as _pytest
    with _pytest.raises(ValueError):
        write_annotations(ann.drop("chunk_id"), path)
    # feeds the containment join
    toks = spark.createDataFrame(
        [("d1", 1, "Jan", 0, 2), ("d1", 2, "Peeters", 4, 10),
         ("d1", 3, "woont", 12, 16), ("d1", 4, "Gent", 21, 24)],
        "doc_id string, token_idx int, token string, start int, end int",
    )
    out = merge_chunkrange(toks, back).toPandas().set_index("token")
    assert out.loc["Jan", "label"] == "B-PER"
    assert out.loc["Peeters", "label"] == "I-PER"
    assert out.loc["woont", "label"] == "O"
    assert out.loc["Gent", "label"] == "B-LOC"
