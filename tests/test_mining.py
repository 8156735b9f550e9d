"""Alias/acronym mining (kg/mining.py) — exact-value + plan shape.

The reference ships a hand-curated alias dictionary (the linking stage
of vignettes/crfsuite-nlp.Rmd is left to the caller); mining closes the
dictionary-growth loop from supervision.  These tests prune the
generator's own dictionary, mine it back from the gold mention stream,
and check exact recovery.
"""

import pytest
from pyspark.sql import functions as F

from crfsuite_spark.datagen.transcripts import build_alias_dict, generate
from crfsuite_spark.kg.mining import mine_aliases, mine_acronyms


@pytest.fixture(scope="module")
def mining_data(spark):
    data = generate(n_convs=120, turns_per_conv=8, seed=91, entity_pool=3)
    mentions = spark.createDataFrame(data.gold_mentions)
    alias_dict = spark.createDataFrame(build_alias_dict())
    return mentions, alias_dict


def test_mine_aliases_recovers_pruned_entries(mining_data):
    mentions, alias_dict = mining_data
    pruned = alias_dict.where(F.col("alias") == F.lower("canonical_name"))
    out = mine_aliases(mentions, pruned, min_support=2, min_confidence=0.6)
    rows = {(r["alias"], r["canonical_id"]): r for r in out.collect()}

    # gold surfaces are unambiguous -> every mined pair has confidence 1
    assert rows and all(r["confidence"] == 1.0 for r in rows.values())
    # high-frequency held-out aliases come back with the right entity
    for pair in [
        ("nyc", "loc:new_york"),
        ("sf", "loc:san_francisco"),
        ("acme", "org:acme_corp"),
        ("mr smith", "per:bob_smith"),
    ]:
        assert pair in rows, pair
    # nothing already in the pruned dictionary is re-emitted
    kept = {
        (r["alias"], r["canonical_id"])
        for r in pruned.select(F.col("alias"), "canonical_id").collect()
    }
    assert not (set(rows) & kept)
    # support actually counts the stream
    gold = mentions.where(F.lower("surface") == "nyc").count()
    assert rows[("nyc", "loc:new_york")]["support"] == gold


def test_mine_aliases_confidence_filters_ambiguity(spark):
    # one surface split 3:1 across two entities: 0.75 passes at 0.6,
    # the 0.25 minority is dropped; a support-1 singleton is dropped
    mentions = spark.createDataFrame(
        [("jo", "per:a")] * 3 + [("jo", "per:b")] + [("zed", "per:c")],
        "surface string, canonical_id string",
    )
    empty_dict = spark.createDataFrame(
        [], "alias string, canonical_id string"
    )
    out = mine_aliases(
        mentions, empty_dict, min_support=2, min_confidence=0.6
    ).collect()
    assert {(r["alias"], r["canonical_id"]) for r in out} == {("jo", "per:a")}
    assert out[0]["support"] == 3 and out[0]["confidence"] == 0.75


def test_mine_acronyms_needs_conv_evidence(mining_data):
    mentions, alias_dict = mining_data
    pruned = alias_dict.where(
        ~((F.length("alias") <= 3) & (~F.col("alias").contains(" ")))
    )
    out = mine_acronyms(mentions, pruned, min_convs=2)
    got = {(r["alias"], r["canonical_id"]) for r in out.collect()}
    assert got == {("sf", "loc:san_francisco"), ("nyc", "loc:new_york")}


def test_mine_acronyms_rejects_unevidenced(spark):
    # "gk" spells grace kim's initials but no conversation also uses a
    # known alias of per:grace_kim -> rejected
    mentions = spark.createDataFrame(
        [("c1", "gk"), ("c2", "gk"), ("c3", "Bob Smith")],
        "conv_id string, surface string",
    )
    d = spark.createDataFrame(
        [("grace kim", "per:grace_kim"), ("bob smith", "per:bob_smith")],
        "alias string, canonical_id string",
    )
    assert mine_acronyms(mentions, d, min_convs=1).count() == 0
    # with evidence in the same convs it is accepted
    mentions2 = spark.createDataFrame(
        [("c1", "gk"), ("c1", "Grace Kim"), ("c2", "gk"),
         ("c2", "grace kim")],
        "conv_id string, surface string",
    )
    out = mine_acronyms(mentions2, d, min_convs=2).collect()
    assert [(r["alias"], r["canonical_id"], r["support"], r["n_convs"])
            for r in out] == [("gk", "per:grace_kim", 2, 2)]


def test_mine_aliases_plan_partial_agg_no_window(mining_data):
    mentions, alias_dict = mining_data
    out = mine_aliases(mentions, alias_dict)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_count" in plan  # map-side combine on the raw stream
    assert "BroadcastHashJoin" in plan  # known-pair anti-join broadcasts


def test_dictionary_spans_longest_match_and_ambiguity(spark):
    """Longest match suppresses contained candidates; token_idx gaps
    survive through the packed arrays; ambiguous aliases resolve by
    weight then id; non-nested overlaps both survive (documented)."""
    from crfsuite_spark.kg.mining import dictionary_spans

    tok_cols = ["conv_id", "turn_idx", "token_idx", "token"]
    toks = spark.createDataFrame(
        [
            # gap: token_idx jumps 0 -> 2 (double space upstream)
            ("c1", 0, 0, "Met"),
            ("c1", 0, 2, "Alice"),
            ("c1", 0, 3, "Johnson"),
            ("c1", 0, 4, "today"),
            # overlap-not-nested: "acme corp" and "corp holdings"
            ("c1", 1, 0, "Acme"),
            ("c1", 1, 1, "Corp"),
            ("c1", 1, 2, "Holdings"),
        ],
        tok_cols,
    )
    alias = spark.createDataFrame(
        [
            ("alice johnson", "per:alice", "PER", 1.0),
            ("alice", "per:alice", "PER", 0.5),           # contained: drop
            ("alice", "per:other_alice", "PER", 0.9),     # contained: drop
            ("acme corp", "org:acme", "ORG", 1.0),
            ("corp holdings", "org:corp_holdings", "ORG", 1.0),
            ("today", "misc:today", "MISC", 0.2),
            ("today", "misc:today_b", "MISC", 0.2),       # tie -> min id
        ],
        ["alias", "canonical_id", "entity_type", "weight"],
    )
    got = {
        (r["conv_id"], r["turn_idx"], r["start_tok"], r["end_tok"]):
        (r["canonical_id"], r["alias"])
        for r in dictionary_spans(toks, alias).collect()
    }
    # gap-aware ids: alice johnson spans real token ids 2..3
    assert got[("c1", 0, 2, 3)] == ("per:alice", "alice johnson")
    assert ("c1", 0, 2, 2) not in got          # contained single-token
    # equal-weight ambiguity -> lexicographically first id
    assert got[("c1", 0, 4, 4)][0] == "misc:today"
    # overlapping but not nested: both survive
    assert got[("c1", 1, 0, 1)][0] == "org:acme"
    assert got[("c1", 1, 1, 2)][0] == "org:corp_holdings"
    assert len(got) == 4


def test_spans_to_bio_labels(spark):
    from crfsuite_spark.kg.mining import spans_to_bio

    toks = spark.createDataFrame(
        [("c1", 0, i, w) for i, w in
         enumerate(["Met", "Alice", "Johnson", "at", "Acme"])],
        ["conv_id", "turn_idx", "token_idx", "token"],
    )
    spans = spark.createDataFrame(
        [
            ("c1", 0, 1, 2, "per:alice", "PER"),
            ("c1", 0, 4, 4, "org:acme", "ORG"),
            # overlapping span on token 2: later start loses min_by
            ("c1", 0, 2, 3, "per:johnson", "PER"),
        ],
        ["conv_id", "turn_idx", "start_tok", "end_tok",
         "canonical_id", "entity_type"],
    )
    got = {
        r["token_idx"]: r["label"]
        for r in spans_to_bio(toks, spans).collect()
    }
    assert got == {0: "O", 1: "B-PER", 2: "I-PER", 3: "I-PER", 4: "B-ORG"}


def test_distant_supervision_bootstrap_e2e(spark):
    """The full weak-supervision loop: dictionary spans on an
    UNLABELED token stream -> BIO silver labels -> CRF training ->
    decode, evaluated against the generator's gold labels. Silver
    projection must agree strongly with gold where the dictionary
    covers, and the trained tagger must recover high token accuracy —
    no gold label ever enters training."""
    from crfsuite_spark.datagen.transcripts import generate
    from crfsuite_spark.decode.tagger import decode
    from crfsuite_spark.functions.templates import cbind_attributes
    from crfsuite_spark.kg.mining import dictionary_spans, spans_to_bio
    from crfsuite_spark.train.trainer import train_crf
    from pyspark.sql import functions as F

    data = generate(n_convs=24, turns_per_conv=6, seed=13)
    gold = spark.createDataFrame(data.tokens)
    alias = spark.createDataFrame(data.alias_dict)
    unlabeled = gold.drop("label")
    silver = spans_to_bio(
        unlabeled, dictionary_spans(unlabeled, alias)
    )
    # the dictionary knows ENTITIES, not relation triggers — silver
    # must agree with gold EXACTLY outside the REL label family, and
    # the only disagreements overall must be gold REL tokens
    both = silver.withColumnRenamed("label", "silver").join(
        gold.select("conv_id", "turn_idx", "token_idx", "label"),
        ["conv_id", "turn_idx", "token_idx"],
    )
    ent = both.where(~F.col("label").endswith("REL"))
    agree = ent.agg(
        F.avg((F.col("silver") == F.col("label")).cast("double"))
    ).first()[0]
    assert agree == 1.0, agree
    n_bad = both.where(
        (F.col("silver") != F.col("label"))
        & ~F.col("label").endswith("REL")
    ).count()
    assert n_bad == 0
    feat = cbind_attributes(
        silver, ["token", "pos"], ["conv_id", "turn_idx"], "token_idx"
    )
    model = train_crf(
        feat, ["conv_id", "turn_idx"], "token_idx", max_iterations=25
    )
    pred = decode(feat, model, ["conv_id", "turn_idx"], "token_idx")
    acc = (
        pred.select("conv_id", "turn_idx", "token_idx",
                    F.col("label").alias("label_pred"))
        .join(gold.select("conv_id", "turn_idx", "token_idx", "label"),
              ["conv_id", "turn_idx", "token_idx"])
        .where(~F.col("label").endswith("REL"))  # silver never sees REL
        .agg(F.avg((F.col("label_pred") == F.col("label")).cast("double")))
        .first()[0]
    )
    assert acc > 0.9, acc


def test_dictionary_health_ambiguity_and_coverage(spark):
    from crfsuite_spark.kg.mining import dictionary_health, dictionary_spans

    toks = spark.createDataFrame(
        [("c1", 0, 0, "Alice"), ("c1", 0, 1, "visited")],
        ["conv_id", "turn_idx", "token_idx", "token"],
    )
    alias = spark.createDataFrame(
        [
            ("alice", "per:alice", "PER", 1.0),
            ("alice", "per:other", "PER", 0.5),      # ambiguous
            ("ghost corp", "org:ghost", "ORG", 1.0), # dead alias
        ],
        ["alias", "canonical_id", "entity_type", "weight"],
    )
    got = {
        r["alias"]: r
        for r in dictionary_health(
            alias, dictionary_spans(toks, alias)
        ).collect()
    }
    a = got["alice"]
    assert (a["n_canonicals"], a["ambiguous"]) == (2, True)
    assert (a["n_spans"], a["matched"]) == (1, True)
    g = got["ghost corp"]
    assert (g["n_canonicals"], g["ambiguous"]) == (1, False)
    assert (g["n_spans"], g["matched"]) == (0, False)
    # dictionary-only view
    solo = {r["alias"]: r for r in dictionary_health(alias).collect()}
    assert solo["alice"]["n_spans"] == 0 and not solo["alice"]["matched"]
