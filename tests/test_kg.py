"""KG stages: span assembly, relation assembly, entity linking,
connected components, triple materialization (idempotent resume), and
the headline end-to-end gate: triple-set P/R ≥ 0.95 vs gold on
held-out conversations."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crfsuite_spark.kg.spans import assemble_spans, assemble_relations
from crfsuite_spark.kg.linking import link_mentions
from crfsuite_spark.kg.canonicalize import connected_components
from crfsuite_spark.kg.triples import materialize, read_triples, completed_buckets
from crfsuite_spark.kg.pipeline import extract_triples
from crfsuite_spark.operators.evaluate import set_prf, crf_evaluation


def test_assemble_spans_gold(spark, synth):
    toks = spark.createDataFrame(synth.tokens)
    spans = assemble_spans(toks).toPandas()
    ent = spans[spans["entity_type"] != "REL"]
    gold = synth.gold_mentions
    got = set(map(tuple, ent[["conv_id", "turn_idx", "start_tok", "end_tok", "entity_type", "surface"]].to_numpy()))
    exp = set(map(tuple, gold[["conv_id", "turn_idx", "start_tok", "end_tok", "entity_type", "surface"]].to_numpy()))
    assert got == exp


def test_assemble_relations_gold(spark, synth):
    toks = spark.createDataFrame(synth.tokens)
    spans = assemble_spans(toks)
    rels = assemble_relations(spans).toPandas()
    # every gold triple's (conv, turn) appears with the right predicate
    gold = synth.gold_triples
    got = set(map(tuple, rels[["conv_id", "turn_idx", "pred"]].to_numpy()))
    exp = set(map(tuple, gold[["conv_id", "turn_idx", "pred"]].to_numpy()))
    assert got == exp


def test_link_mentions_exact_fuzzy_surrogate(spark, synth):
    alias = spark.createDataFrame(synth.alias_dict)
    mentions = spark.createDataFrame(
        [("Acme Corp",), ("acme corporation",), ("Acme Corpp",), ("Zzz Unknown Qq",)],
        "surface string",
    )
    out = {r["surface"]: (r["canonical_id"], r["link_method"])
           for r in link_mentions(mentions, alias, fuzzy=True, jaccard_threshold=0.4).collect()}
    assert out["Acme Corp"] == ("org:acme_corp", "exact")
    assert out["acme corporation"] == ("org:acme_corp", "exact")
    assert out["Acme Corpp"][0] == "org:acme_corp"  # typo → fuzzy
    assert out["Acme Corpp"][1] == "fuzzy"
    assert out["Zzz Unknown Qq"] == ("unk:zzz unknown qq", "surrogate")


def test_connected_components(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("f", "f")],
        "src string, dst string",
    )
    cc = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert cc["a"] == cc["b"] == cc["c"] == "a"
    assert cc["d"] == cc["e"] == "d"
    assert cc["f"] == "f"


def test_connected_components_chain(spark):
    # long chain exercises multiple iterations
    edges = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i+1:02d}") for i in range(12)], "src string, dst string"
    )
    cc = connected_components(edges).toPandas()
    assert (cc["component"] == "n00").all()
    assert len(cc) == 13


def test_materialize_idempotent_resume(spark, synth, tmp_path):
    path = str(tmp_path / "triples")
    gold = spark.createDataFrame(synth.gold_triples)
    r1 = materialize(gold, path, n_buckets=8)
    assert sorted(r1["written_buckets"]) == list(range(8))
    n1 = read_triples(spark, path).count()
    # simulate a crash: drop two manifest records but keep data? no —
    # resume contract: re-running with a complete manifest writes nothing
    r2 = materialize(gold, path, n_buckets=8)
    assert r2["written_buckets"] == [] and r2["skipped_buckets"] == list(range(8))
    assert read_triples(spark, path).count() == n1
    # partial manifest: only missing buckets get (re)written
    import os
    os.remove(str(tmp_path / "triples/_manifest/bucket=3.json"))
    # also remove that bucket's data to mimic an uncommitted partition
    import shutil
    shutil.rmtree(str(tmp_path / "triples/data/bucket=3"))
    r3 = materialize(gold, path, n_buckets=8)
    assert r3["written_buckets"] == [3]
    assert read_triples(spark, path).count() == n1
    assert completed_buckets(path) == set(range(8))


def test_e2e_triples_from_gold_labels(spark, synth):
    """Triple extraction from GOLD labels must reproduce the gold triple
    set exactly (pipeline-correctness independent of model quality)."""
    toks = spark.createDataFrame(synth.tokens)
    alias = spark.createDataFrame(synth.alias_dict)
    triples = extract_triples(toks, alias)
    gold = spark.createDataFrame(synth.gold_triples)
    prf = set_prf(triples, gold, ["conv_id", "turn_idx", "subj", "pred", "obj"])
    assert prf["precision"] == 1.0 and prf["recall"] == 1.0, prf


@pytest.mark.slow
def test_e2e_triples_from_model_heldout(spark, synth):
    """The BASELINE gate: train on a split, decode held-out convs, extract
    triples, P/R ≥ 0.95 vs gold (entity-level eval per the reference's
    CoNLL-2002 contract)."""
    from crfsuite_spark.functions.templates import cbind_attributes
    from crfsuite_spark.train.trainer import train_crf
    from crfsuite_spark.decode.tagger import decode

    toks = spark.createDataFrame(synth.tokens)
    feat = cbind_attributes(
        toks, terms=["token", "pos"], by=["conv_id", "turn_idx"],
        order_col="token_idx", from_offset=-2, to_offset=2, ngram_max=2,
    ).persist()
    convs = sorted(r[0] for r in feat.select("conv_id").distinct().collect())
    holdout = set(convs[: len(convs) // 4])
    model = train_crf(
        feat.where(~F.col("conv_id").isin(list(holdout))),
        seq_cols=["conv_id", "turn_idx"], order_col="token_idx",
        minfreq=1.0, c2=0.5, max_iterations=60, num_partitions=8,
    )
    test_feat = feat.where(F.col("conv_id").isin(list(holdout)))
    decoded = decode(test_feat, model, ["conv_id", "turn_idx"], "token_idx",
                     with_marginal=False)
    alias = spark.createDataFrame(synth.alias_dict)
    triples = extract_triples(decoded, alias)
    gold = spark.createDataFrame(
        synth.gold_triples[synth.gold_triples["conv_id"].isin(holdout)]
    )
    prf = set_prf(triples, gold, ["conv_id", "turn_idx", "subj", "pred", "obj"])
    assert prf["precision"] >= 0.95 and prf["recall"] >= 0.95, prf
    # entity-level label eval per the reference contract
    gold_toks = spark.createDataFrame(
        synth.tokens[synth.tokens["conv_id"].isin(holdout)]
    ).select("conv_id", "turn_idx", "token_idx", F.col("label").alias("label_gold"))
    ev = crf_evaluation(
        decoded.withColumnRenamed("label", "label_pred").join(
            gold_toks, ["conv_id", "turn_idx", "token_idx"]
        )
    )
    assert ev["overall"]["precision_weighted"] >= 0.95
    assert ev["overall"]["recall_weighted"] >= 0.95
    feat.unpersist()


def test_canonicalize_surrogates(spark):
    """unk: surrogates with near-duplicate surfaces merge to one cluster
    id; dictionary-linked ids pass through untouched."""
    from crfsuite_spark.kg.linking import canonicalize_surrogates

    rows = [
        ("Acme Corporation", "unk:acme corporation", "surrogate"),
        ("Acme Corporatoin", "unk:acme corporatoin", "surrogate"),   # typo near-dup
        ("acme corporation inc", "unk:acme corporation inc", "surrogate"),
        ("Zeta Systems", "unk:zeta systems", "surrogate"),           # unrelated
        ("Dave Miller", "per:dave_miller", "exact"),
    ]
    linked = spark.createDataFrame(
        rows, "surface string, canonical_id string, link_method string"
    )
    # both paths must agree: driver-side small path (default) and the
    # distributed LSH+CC chain (driver_threshold=0) — identical output
    outs = []
    for thr in (20_000, 0):
        out = canonicalize_surrogates(
            linked, jaccard_threshold=0.5, driver_threshold=thr
        ).toPandas()
        by_surface = dict(zip(out["surface"], out["canonical_id"]))
        # dictionary id untouched
        assert by_surface["Dave Miller"] == "per:dave_miller"
        # the three acme variants collapse to ONE representative (min id)
        acme = {by_surface["Acme Corporation"], by_surface["Acme Corporatoin"],
                by_surface["acme corporation inc"]}
        assert len(acme) == 1, acme
        # unrelated surrogate keeps its own id
        assert by_surface["Zeta Systems"] == "unk:zeta systems"
        assert by_surface["Zeta Systems"] not in acme
        outs.append(by_surface)
    assert outs[0] == outs[1], "driver and distributed paths diverge"


def test_fuzzy_link_normalizes_dictionary_side(spark):
    """An alias with punctuation ("Ms. Johnson") must fuzzy-link a typo'd
    mention: the dictionary side is normalized before shingling."""
    from crfsuite_spark.kg.linking import link_mentions

    mentions = spark.createDataFrame(
        [("ms johnsonn",), ("unrelated gibberish zqx",)], "surface string"
    )
    alias = spark.createDataFrame(
        [("Ms. Johnson", "E1", "Johnson", "PER", 1.0)],
        "alias string, canonical_id string, canonical_name string, "
        "entity_type string, weight double",
    )
    out = link_mentions(mentions, alias, fuzzy=True, jaccard_threshold=0.5).toPandas()
    m = out.set_index("surface")
    assert m.loc["ms johnsonn", "canonical_id"] == "E1"
    assert m.loc["ms johnsonn", "link_method"] == "fuzzy"
    assert m.loc["unrelated gibberish zqx", "link_method"] == "surrogate"


def test_link_null_weight_loses_tiebreak(spark):
    """A NULL-weight alias must not beat a weighted one for the same
    surface (regression: NULLs sorted first in the struct tie-break)."""
    from crfsuite_spark.kg.linking import link_mentions

    mentions = spark.createDataFrame([("acme",)], "surface string")
    alias = spark.createDataFrame(
        [("acme", "E_null", "n", "ORG", None), ("acme", "E_w", "w", "ORG", 0.9)],
        "alias string, canonical_id string, canonical_name string, "
        "entity_type string, weight double",
    )
    out = link_mentions(mentions, alias, fuzzy=False).toPandas()
    assert out.iloc[0]["canonical_id"] == "E_w"


def test_materialize_crash_between_data_and_manifest(spark, synth, tmp_path):
    """Kill injected BETWEEN the bucket data rename and its manifest
    write: the re-run must discard the uncommitted bucket data and
    produce the identical final table — no duplicate triples."""
    path = str(tmp_path / "triples_crash")
    gold = spark.createDataFrame(synth.gold_triples)

    # reference run (no fault) for the expected final table
    ref_path = str(tmp_path / "triples_ref")
    materialize(gold, ref_path, n_buckets=8)
    expected = {
        tuple(r) for r in read_triples(spark, ref_path)
        .select("conv_id", "turn_idx", "subj", "pred", "obj").collect()
    }

    class Boom(Exception):
        pass

    state = {"committed": 0}

    def fault(bucket):
        # let 3 buckets commit, then crash before the 4th manifest write
        # (its data directory is already renamed into data/)
        if state["committed"] == 3:
            raise Boom()
        state["committed"] += 1

    import pytest as _pytest
    with _pytest.raises(Boom):
        materialize(gold, path, n_buckets=8, fault_hook=fault)
    assert len(completed_buckets(path)) == 3
    # the crashed bucket's data is on disk but uncommitted
    import os
    n_data_dirs = len([d for d in os.listdir(os.path.join(path, "data"))
                       if d.startswith("bucket=")])
    assert n_data_dirs >= 4  # 3 committed + >=1 uncommitted leftover

    r2 = materialize(gold, path, n_buckets=8)
    assert len(r2["written_buckets"]) == 5
    got = {
        tuple(r) for r in read_triples(spark, path)
        .select("conv_id", "turn_idx", "subj", "pred", "obj").collect()
    }
    assert got == expected
    # per-bucket row counts must equal the reference run's
    import json
    for b in range(8):
        with open(os.path.join(path, "_manifest", f"bucket={b}.json")) as f:
            rb = json.load(f)["rows"]
        with open(os.path.join(ref_path, "_manifest", f"bucket={b}.json")) as f:
            assert rb == json.load(f)["rows"]


def test_streaming_spans_parity_and_plan(spark, synth, lexicon_model):
    """assemble_spans_streaming over decode output must equal the
    shuffle-based assemble_spans row-for-row, and its physical plan must
    contain NO Exchange between the decode UDF and the span UDF."""
    from crfsuite_spark.kg.pipeline import featurize_transcripts
    from crfsuite_spark.decode.tagger import decode
    from crfsuite_spark.kg.spans import assemble_spans, assemble_spans_streaming

    tdf = spark.createDataFrame(synth.transcripts)
    feat = featurize_transcripts(tdf)
    decoded = decode(
        feat, lexicon_model, ["conv_id", "turn_idx"], "token_idx",
        with_marginal=False,
        passthrough_cols=["conv_id", "turn_idx", "token_idx", "token"],
    )
    a = assemble_spans(decoded, seq_cols=["conv_id", "turn_idx"], order_col="token_idx")
    b = assemble_spans_streaming(decoded, seq_cols=["conv_id", "turn_idx"], order_col="token_idx")
    cols = ["conv_id", "turn_idx", "span_id", "entity_type", "surface",
            "start_tok", "end_tok"]
    sa = {tuple(r) for r in a.select(*cols).collect()}
    sb = {tuple(r) for r in b.select(*cols).collect()}
    assert sa == sb and len(sa) > 0
    # plan: the streaming variant adds no shuffle on top of decode's one
    plan_b = b._jdf.queryExecution().executedPlan().toString()
    plan_decoded = decoded._jdf.queryExecution().executedPlan().toString()
    assert plan_b.count("Exchange") == plan_decoded.count("Exchange")
    plan_a = a._jdf.queryExecution().executedPlan().toString()
    assert plan_a.count("Exchange") > plan_decoded.count("Exchange")


def test_span_type_suffix_not_continuation(spark):
    """A type that is a string-suffix of another ("XLOC" vs "LOC") must
    not merge spans: B-XLOC followed by I-LOC is TWO spans, identically
    in the JVM and streaming variants."""
    from crfsuite_spark.kg.spans import assemble_spans, assemble_spans_streaming

    rows = [
        ("c1", 0, 0, "alpha", "B-XLOC"),
        ("c1", 0, 1, "beta", "I-LOC"),
        ("c1", 0, 2, "gamma", "I-LOC"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, token_idx int, token string, label string"
    ).repartition(1, "conv_id", "turn_idx").sortWithinPartitions(
        "conv_id", "turn_idx", "token_idx"
    )
    for fn in (assemble_spans, assemble_spans_streaming):
        out = fn(df, seq_cols=["conv_id", "turn_idx"], order_col="token_idx").toPandas()
        out = out.sort_values("start_tok").reset_index(drop=True)
        assert len(out) == 2, fn.__name__
        assert out.loc[0, "entity_type"] == "XLOC" and out.loc[0, "surface"] == "alpha"
        assert out.loc[1, "entity_type"] == "LOC" and out.loc[1, "surface"] == "beta gamma"


def test_connected_components_paths_agree(spark):
    """The driver-side union-find fast path and the distributed
    small-star rounds produce identical components."""
    from crfsuite_spark.kg.canonicalize import connected_components

    import numpy as np
    rng = np.random.default_rng(5)
    edges = [(f"n{int(a)}", f"n{int(b)}")
             for a, b in rng.integers(0, 60, size=(120, 2)) if a != b]
    df = spark.createDataFrame(edges, "src string, dst string")
    fast = {(r.node, r.component)
            for r in connected_components(df).collect()}
    dist = {(r.node, r.component)
            for r in connected_components(df, small_graph_threshold=0).collect()}
    assert fast == dist and len(fast) > 0


def test_connected_components_empty_edges(spark):
    """Zero-edge graph: the small-graph fast path must return a typed
    empty frame instead of raising on empty-schema inference."""
    from crfsuite_spark.kg.canonicalize import connected_components

    edges = spark.createDataFrame([], "src string, dst string")
    out = connected_components(edges)
    assert out.columns == ["node", "component"]
    assert out.count() == 0


def test_minhash_dedup_no_near_dups(spark):
    """Dedup of a corpus with zero near-duplicate pairs keeps every row
    (the empty-edge CC path used to crash here)."""
    from crfsuite_spark.operators.dedup import minhash_dedup

    df = spark.createDataFrame(
        [("a", "completely different text one"),
         ("b", "zqx unrelated gibberish words"),
         ("c", "third totally distinct sentence")],
        "doc_id string, text string",
    )
    assert minhash_dedup(df, "doc_id", "text").count() == 3


def test_link_mentions_distributed_fuzzy_path(spark, synth):
    """Above the collect threshold the fuzzy link table stays distributed
    (no driver materialization); links match the collect path exactly."""
    alias = spark.createDataFrame(synth.alias_dict)
    mentions = spark.createDataFrame(
        [("Acme Corp",), ("Acme Corpp",), ("Zzz Unknown Qq",)], "surface string"
    )
    key = lambda rows: {(r["surface"], r["canonical_id"], r["link_method"])
                        for r in rows}
    collected = key(link_mentions(
        mentions, alias, fuzzy=True, jaccard_threshold=0.4).collect())
    distributed = key(link_mentions(
        mentions, alias, fuzzy=True, jaccard_threshold=0.4,
        fuzzy_collect_threshold=0).collect())
    assert distributed == collected
    assert any(m == "fuzzy" for _, _, m in distributed)


def test_link_mentions_preserves_duplicate_rows(spark):
    """Identical mention rows (same surface, same metadata, no span id)
    are a legitimate public-API input and must survive linking 1:1 —
    disambiguation happens on the broadcast dictionary side, never by
    grouping the mention stream."""
    mentions = spark.createDataFrame(
        [("Acme Corp", 1), ("Acme Corp", 1), ("Acme Corp", 1),
         ("zzz nowhere qq", 2), ("zzz nowhere qq", 2)],
        "surface string, turn_idx int",
    )
    alias = spark.createDataFrame(
        [("acme corp", "E1", "Acme", "ORG", 2.0),
         ("acme corp", "E2", "Acme2", "ORG", 1.0)],
        "alias string, canonical_id string, canonical_name string, "
        "entity_type string, weight double",
    )
    out = link_mentions(mentions, alias, fuzzy=True,
                        jaccard_threshold=0.9).toPandas()
    assert len(out) == 5  # duplicates preserved, incl. on the fuzzy path
    acme = out[out["surface"] == "Acme Corp"]
    assert len(acme) == 3 and set(acme["canonical_id"]) == {"E1"}
    unk = out[out["surface"] == "zzz nowhere qq"]
    assert len(unk) == 2 and set(unk["link_method"]) == {"surrogate"}
    # exact-only path preserves duplicates too
    out2 = link_mentions(mentions, alias, fuzzy=False).toPandas()
    assert len(out2) == 5


def test_canonicalize_surrogates_edges_cached(spark, monkeypatch):
    """The LSH edge chain is materialized exactly once: by the time
    connected_components is invoked, the edges frame it receives is
    persisted AND every partition is already cached (the count() probe
    materializes all of them — take(1) would cache only the partitions
    it touched, leaving CC to recompute the rest from lineage). Spied
    at the CC call boundary so the assertion survives plan evolution.

    Deliberately NOT a comparative stage/task-count test: instrumented
    runs showed AQE's cross-reference exchange reuse already skips most
    recompute without the persist on this Spark version, and toy-scale
    stage counts are dominated by AQE partition coalescing — the
    explicit persist pins the guarantee engine-version-independently,
    and THIS is the testable contract."""
    import crfsuite_spark.kg.canonicalize as canon_mod
    from crfsuite_spark.kg.linking import canonicalize_surrogates

    rows = [
        ("Acme Corporation", "unk:acme corporation", "surrogate"),
        ("Acme Corporatoin", "unk:acme corporatoin", "surrogate"),
        ("acme corporation inc", "unk:acme corporation inc", "surrogate"),
        ("Zeta Systems", "unk:zeta systems", "surrogate"),
        ("Dave Miller", "per:dave_miller", "exact"),
    ]
    linked = spark.createDataFrame(
        rows, "surface string, canonical_id string, link_method string"
    )

    captured = {}
    real_cc = canon_mod.connected_components

    def spy_cc(edges, **kw):
        captured["use_memory"] = edges.storageLevel.useMemory
        infos = edges.sparkSession.sparkContext._jsc.sc().getRDDStorageInfo()
        captured["cached"] = [
            (i.numCachedPartitions(), i.numPartitions())
            for i in infos
            if i.id() not in pre
        ]
        return real_cc(edges, **kw)

    monkeypatch.setattr(canon_mod, "connected_components", spy_cc)
    # snapshot pre-existing caches (shared test session — other tests
    # legitimately leave persisted frames); only OUR new ones must drain
    pre = {
        i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }
    # driver_threshold=0 pins the distributed path — the small path never
    # builds the edge frame this contract is about
    out = canonicalize_surrogates(
        linked, jaccard_threshold=0.5, driver_threshold=0
    ).toPandas()

    assert captured["use_memory"], "edges not persisted before CC"
    assert any(
        cached == total and total > 0 for cached, total in captured["cached"]
    ), f"edges cache not fully materialized at CC entry: {captured['cached']}"
    # the cache is dropped once canonicalization finishes (unpersist is
    # non-blocking, so allow it a moment to drain)
    import time

    for _ in range(50):
        left = [
            i
            for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
            if i.id() not in pre
        ]
        if all(i.numCachedPartitions() == 0 for i in left):
            break
        time.sleep(0.1)
    else:
        raise AssertionError(
            "edges cache not dropped: "
            + str([(i.id(), i.numCachedPartitions()) for i in left])
        )
    # semantics unchanged: the three acme variants collapse to one
    # canonical id, zeta stays its own, the exact link passes through
    assert len(out) == len(rows)
    acme = out[out.surface.str.lower().str.startswith("acme")]
    assert acme.canonical_id.nunique() == 1
    assert set(out[out.link_method == "exact"].canonical_id) == {
        "per:dave_miller"
    }


def test_canonicalize_by_embedding(spark):
    """Embedding-proximity canonicalization: two tight cosine clusters
    plus a singleton; transitivity closes a~b~c even when a·c alone
    sits below threshold pairs' bucket path (CC over the pair edges)."""
    import numpy as np

    from crfsuite_spark.kg.canonicalize import canonicalize_by_embedding

    rng = np.random.RandomState(3)
    base1 = rng.randn(8)
    base2 = rng.randn(8)
    rows = []
    for i in range(3):
        v = base1 + 0.01 * rng.randn(8)
        rows.append((f"a{i}", (v / np.linalg.norm(v)).tolist()))
    for i in range(2):
        v = base2 + 0.01 * rng.randn(8)
        rows.append((f"b{i}", (v / np.linalg.norm(v)).tolist()))
    lone = rng.randn(8)
    rows.append(("solo", (lone / np.linalg.norm(lone)).tolist()))
    emb = spark.createDataFrame(rows, "entity string, embedding array<double>")

    out = canonicalize_by_embedding(emb, dim=8, threshold=0.99, n_planes=4)
    got = {r.entity: r.entity_cluster for r in out.collect()}
    if out.bucketed_frame is not None:
        out.bucketed_frame.unpersist()
    assert len(got) == 6
    assert got["a0"] == got["a1"] == got["a2"] == "a0"
    assert got["b0"] == got["b1"] == "b0"
    assert got["solo"] == "solo"
    assert got["a0"] != got["b0"]


def test_bcubed_matches_per_item_definition(spark):
    """Contingency-form B³ equals the textbook per-item average on a
    hand-built clustering with both an over-merge and an over-split."""
    from crfsuite_spark.kg.canonicalize import bcubed

    # pred cluster -> gold id per item; includes NULLs to be excluded
    rows = [
        ("p1", "g1"), ("p1", "g1"), ("p1", "g2"),   # over-merge
        ("p2", "g2"),
        ("p3", "g3"), ("p4", "g3"),                 # over-split
        (None, "g1"), ("p5", None),
    ]
    df = spark.createDataFrame(rows, ["cluster", "canonical_id"])
    got = bcubed(df).collect()[0]

    items = [(p, g) for p, g in rows if p is not None and g is not None]
    def prec_i(p, g):
        same_p = [x for x in items if x[0] == p]
        return sum(1 for x in same_p if x[1] == g) / len(same_p)
    def rec_i(p, g):
        same_g = [x for x in items if x[1] == g]
        return sum(1 for x in same_g if x[0] == p) / len(same_g)
    prec = sum(prec_i(*it) for it in items) / len(items)
    rec = sum(rec_i(*it) for it in items) / len(items)
    assert got["n_items"] == len(items)
    assert got["b3_precision"] == pytest.approx(prec)
    assert got["b3_recall"] == pytest.approx(rec)
    assert got["b3_f1"] == pytest.approx(2 * prec * rec / (prec + rec))


def test_bcubed_perfect_clustering_is_one(spark):
    from crfsuite_spark.kg.canonicalize import bcubed

    rows = [("a", "g1"), ("a", "g1"), ("b", "g2")]
    got = bcubed(
        spark.createDataFrame(rows, ["cluster", "canonical_id"])
    ).collect()[0]
    assert got["b3_precision"] == pytest.approx(1.0)
    assert got["b3_recall"] == pytest.approx(1.0)
    assert got["b3_f1"] == pytest.approx(1.0)
