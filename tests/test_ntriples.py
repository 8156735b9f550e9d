"""N-Triples writer/reader (kg/ntriples.py): exact roundtrip incl.
adversarial ids, through real text files."""

import pytest
from pyspark.sql import functions as F

from crfsuite_spark.kg.ntriples import from_ntriples, to_ntriples

NASTY = [
    ("per:ada lovelace", "works at", "org:acme <hq>"),
    ('say:"hi"', "rel\\slash", "x{y}|z^w`t"),
    ("pct:100%", "p", "o"),
    ("plain", "p", "o"),
]


@pytest.fixture(scope="module")
def nasty(spark):
    return spark.createDataFrame(NASTY, ["subj", "pred", "obj"])


def test_roundtrip_exact(nasty):
    back = from_ntriples(to_ntriples(nasty))
    assert sorted(map(tuple, back.collect())) == sorted(NASTY)


def test_lines_are_valid_ntriples_shape(nasty):
    for r in to_ntriples(nasty).collect():
        line = r["line"]
        assert line.endswith(" .")
        assert line.count("<urn:kg:") == 3
        # no forbidden raw chars inside any IRI
        for part in line.split(" ")[:3]:
            inner = part[1:-1]
            for ch in ' <>"\\{}|^`':
                assert ch not in inner[len("urn:kg:"):], (line, ch)


def test_reader_drops_comments_blank_and_foreign(spark, nasty):
    lines = to_ntriples(nasty).collect()
    extra = [
        ("# a comment",),
        ("",),
        ('<urn:kg:a> <urn:kg:p> "a literal" .',),  # literal: out of subset
        ("<urn:other:a> <urn:other:p> <urn:other:b> .",),  # wrong base
    ]
    mixed = spark.createDataFrame(
        [(r["line"],) for r in lines] + extra, ["line"]
    )
    back = from_ntriples(mixed)
    assert sorted(map(tuple, back.collect())) == sorted(NASTY)


def test_file_roundtrip(spark, nasty, tmp_path):
    path = str(tmp_path / "graph.nt")
    to_ntriples(nasty).write.text(path)
    back = from_ntriples(spark.read.text(path).withColumnRenamed("value", "line"))
    assert sorted(map(tuple, back.collect())) == sorted(NASTY)
