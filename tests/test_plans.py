"""Physical-plan shape assertions — the scale contract.

These tests pin the properties that make the 100 TB plan work:
filters reach the parquet scan, projection pruning reaches ReadSchema,
the whole feature-template stage costs exactly one Exchange, decode
adds no second shuffle on top of the template window, and dictionary
joins broadcast instead of shuffling the big side.
"""

import re

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_and_column_pruning(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = docs.where(F.col("lang") == "en").select("doc_id", "lang")
    plan = _formatted(q)
    assert "PushedFilters" in plan
    assert re.search(r"PushedFilters: \[.*lang.*\]", plan), plan
    m = re.search(r"ReadSchema: ([^\n]+)", plan)
    assert m and "text" not in m.group(1), m.group(1)  # unused column pruned


def test_feature_templates_single_exchange(spark, synth):
    from crfsuite_spark.functions.templates import cbind_attributes

    # the filter keeps this plan distinct from other tests' persisted
    # identical frames (cache substitution double-prints the cached
    # child plan's Exchange)
    toks = spark.createDataFrame(synth.tokens).where(F.col("token_idx") >= 0)
    feat = cbind_attributes(
        toks, terms=["token", "pos"], by=["conv_id", "turn_idx"],
        order_col="token_idx", from_offset=-2, to_offset=2, ngram_max=2,
    )
    plan = _plan(feat).split("== Initial Plan ==")[0]
    n_exchange = plan.count("Exchange")
    assert n_exchange == 1, f"feature templates should cost exactly one shuffle, got {n_exchange}\n{plan}"


def test_decode_adds_no_extra_shuffle(spark, synth, lexicon_model):
    """The decode repartition matches the template window's partitioning
    (same keys, same partition count), so Catalyst elides it: the whole
    featurize→decode chain is ONE Exchange."""
    from crfsuite_spark.decode.tagger import decode
    from crfsuite_spark.functions.templates import cbind_attributes

    toks = spark.createDataFrame(synth.tokens)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # the extra filter keeps the plan distinct from other tests' persisted
    # frames — otherwise the cache manager substitutes an InMemoryRelation
    # whose stored child plan double-prints its own Exchange
    feat = cbind_attributes(
        toks.where(F.col("token_idx") >= 0), terms=["token"],
        by=["conv_id", "turn_idx"],
        order_col="token_idx", from_offset=-1, to_offset=1, ngram_max=1,
    )
    out = decode(feat, lexicon_model, ["conv_id", "turn_idx"], "token_idx",
                 with_marginal=False, num_partitions=n_part)
    plan = _plan(out).split("== Initial Plan ==")[0]
    n_exchange = plan.count("Exchange")
    assert n_exchange <= 1, f"decode chain should reuse the window shuffle, got {n_exchange}\n{plan}"


def test_linking_broadcasts_dictionary(spark):
    from crfsuite_spark.datagen.transcripts import build_alias_dict
    from crfsuite_spark.kg.linking import link_mentions

    mentions = spark.createDataFrame(
        [("Dave Miller",), ("acme",)], "surface string"
    )
    alias = spark.createDataFrame(build_alias_dict())
    out = link_mentions(mentions, alias, fuzzy=False)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_tpch_q1_whole_stage_codegen(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = (li.groupBy("l_returnflag", "l_linestatus")
         .agg(F.sum("l_quantity").alias("sum_qty")))
    q.collect()  # AQE only finalizes (and shows codegen spans) on execution
    plan = _plan(q)
    assert "isFinalPlan=true" in plan, plan
    # "*(n)" node prefixes are the WholeStageCodegen stage markers
    assert re.search(r"\*\(\d+\) HashAggregate", plan), plan


def test_pack_documents_single_exchange(spark):
    """pack_documents plans exactly ONE hash exchange: the slot
    window's (shard, chunk) clustered distribution is satisfied by the
    offset window's shard partitioning, so Catalyst adds only a sort."""
    from crfsuite_spark.operators.sampling import pack_documents

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(pack_documents(d, "doc_id", "text", 256, 8))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_pack_with_spans_single_exchange(spark):
    """pack_with_spans shares pack_documents' ONE-hash-exchange shape:
    the text rides the shard window shuffle once (a materialized packed
    corpus must move each byte once); span parse/clip/re-base and the
    slot window add no further exchange."""
    from crfsuite_spark.operators.sampling import pack_with_spans

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text",
        F.lit("0:5,10:20").alias("mask_spans"),
    )
    plan = _plan(pack_with_spans(d, "doc_id", "text", "mask_spans", 256, 8))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_exact_dedup_partial_agg_no_window(spark):
    """exact_dedup is a partial-aggregated groupBy (map-side min_by
    combine — only one candidate row per (partition, digest) crosses
    the shuffle), NOT a window sort: a Window row_number form would
    shuffle every full corpus row with no partial aggregation."""
    from crfsuite_spark.operators.dedup import exact_dedup

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(exact_dedup(d, "doc_id", "text"))
    assert "Window" not in plan, plan
    assert re.search(r"partial_min_by|HashAggregate.*min_by", plan), plan
    # exactly one exchange: the digest groupBy (uniform md5 key)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_link_mentions_no_mention_stream_shuffle(spark):
    """link_mentions (exact path): the mention stream joins the
    pre-disambiguated dictionary via broadcast — no sort-merge or
    shuffled-hash join anywhere, so the 10^12-row side never moves."""
    from crfsuite_spark.kg.linking import link_mentions

    ev = spark.read.parquet(f"{SF}/events.parquet")
    mentions = ev.select(F.col("event_type").alias("surface"), "user_id")
    alias = spark.createDataFrame(
        [("click", "e1", "c", "t", 1.0)],
        "alias string, canonical_id string, canonical_name string, "
        "entity_type string, weight double",
    )
    plan = _plan(link_mentions(mentions, alias, fuzzy=False))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_minhash_verify_joins_are_sort_merge(spark, monkeypatch):
    """minhash_self_pairs picks screen/verify join strategy from EXACT
    measured sizes of the persisted signature frame, never from planner
    estimates (whose input-proportional guess auto-broadcast the
    shingle frame and aborted the sf10 bench). Above the byte cap the
    shape is the spillable sort-merge chain with no hash build; below
    it the fixed-width signature-vector and shingle sides broadcast so
    the candidate stream is never sorted."""
    from crfsuite_spark.operators import minhash as mh

    d = spark.read.parquet(f"{SF}/documents.parquet")
    # corpus-scale regime: force the cap to 0 — every join must be the
    # spill-safe sort-merge, no broadcast, no shuffled-hash build
    monkeypatch.setattr(mh, "_BROADCAST_CAP", 0)
    plan = _plan(mh.minhash_self_pairs(d, "doc_id", "text", 32, 8, 5, 0.8))
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    # small regime (this fixture): both sides measure under the default
    # cap, so the screen/verify joins broadcast the array sides
    monkeypatch.setattr(mh, "_BROADCAST_CAP", 48 * 1024 * 1024)
    plan = _plan(mh.minhash_self_pairs(d, "doc_id", "text", 32, 8, 5, 0.8))
    assert "BroadcastHashJoin" in plan, plan
    assert "ShuffledHashJoin" not in plan, plan


def test_ntriples_export_zero_exchange(spark):
    from crfsuite_spark.kg.ntriples import to_ntriples

    t = spark.createDataFrame(
        [("a", "p", "b"), ("c", "q", "d")], ["subj", "pred", "obj"]
    )
    plan = _plan(to_ntriples(t)).split("== Initial Plan ==")[0]
    assert "Exchange" not in plan, plan  # map-only export


def test_negative_samples_broadcasts_type_counts(spark):
    from crfsuite_spark.kg.negatives import negative_samples

    t = spark.createDataFrame(
        [("a", "p", "x:1"), ("b", "p", "x:2"), ("c", "p", "y:1"),
         ("d", "p", "y:2")],
        ["subj", "pred", "obj"],
    )
    plan = _plan(negative_samples(t, k=1))
    # the per-type count frame must broadcast, never shuffle the
    # mention side on etype
    assert "BroadcastHashJoin" in plan, plan


def test_split_triples_eval_filter_is_semi_join(spark):
    from crfsuite_spark.kg.splits import split_triples

    t = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d")],
        ["subj", "pred", "obj"],
    )
    plan = _plan(split_triples(t))
    # endpoint-closure filtering: two LeftSemi joins against the
    # vocabulary-sized entity set, no full-row window/sort
    assert plan.count("LeftSemi") >= 2, plan


def test_conv_entity_overlap_no_window_semi_shape(spark):
    """Related-conversation Jaccard: candidates come from the entity-key
    self-join (pairs only where an entity is shared), counts are
    partial-aggregated, and nothing plans a Window sort."""
    from crfsuite_spark.operators.transcripts import conv_entity_overlap

    m = spark.createDataFrame(
        [("c1", "e1", 0), ("c2", "e1", 0), ("c2", "e2", 1)],
        ["conv_id", "canonical_id", "turn_idx"],
    )
    plan = _plan(conv_entity_overlap(m))
    assert "Window" not in plan, plan
    assert "partial" in plan.lower(), plan


def test_k_core_semi_join_peeling(spark):
    """Each peel round prunes edges via LeftSemi against the surviving
    node set (node-cardinality), never a row-fanout inner join or a
    window."""
    from crfsuite_spark.kg.graph import k_core

    t = spark.createDataFrame(
        [("c", 0, "a", "r", "b"), ("c", 1, "b", "r", "x")],
        ["conv_id", "turn_idx", "subj", "pred", "obj"],
    )
    out = k_core(t, k=2, rounds=2)
    plan = _plan(out)
    for df in out.pinned_caches:
        df.unpersist()
    assert plan.count("LeftSemi") >= 4, plan  # 2 endpoints x 2 rounds
    assert "Window" not in plan, plan


def test_comention_pmi_broadcasts_entity_counts(spark):
    """The entity scope-count and N_scopes sides broadcast back onto
    the pair frame — the mention-derived pair stream never shuffles on
    the vocabulary join."""
    from crfsuite_spark.kg.graph import comention_pmi

    t = spark.createDataFrame(
        [("c1", 0, "a", "r", "b"), ("c2", 0, "a", "r", "b")],
        ["conv_id", "turn_idx", "subj", "pred", "obj"],
    )
    plan = _plan(comention_pmi(t))
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, plan


def test_dictionary_spans_broadcast_dict_no_window(spark):
    """The alias dictionary joins broadcast against the exploded turn
    positions; no Window anywhere (suppression is an anti-join, the
    winner a map-side min_by groupBy)."""
    from crfsuite_spark.kg.mining import dictionary_spans

    toks = spark.createDataFrame(
        [("c1", 0, 0, "Alice")],
        ["conv_id", "turn_idx", "token_idx", "token"],
    )
    alias = spark.createDataFrame(
        [("alice", "per:alice", "PER", 1.0)],
        ["alias", "canonical_id", "entity_type", "weight"],
    )
    plan = _plan(dictionary_spans(toks, alias))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan, plan
    assert "Window" not in plan, plan
    assert "partial" in plan.lower(), plan


def test_infer_entity_types_broadcast_signatures(spark):
    """The signature table broadcasts onto the surrogate evidence; the
    winner is a max_by groupBy, never a Window sort."""
    from crfsuite_spark.kg.graph import infer_entity_types

    t = spark.createDataFrame(
        [("c", 0, "per:a", "works_at", "org:x"),
         ("c", 1, "unk:m", "works_at", "org:x")],
        ["conv_id", "turn_idx", "subj", "pred", "obj"],
    )
    plan = _plan(infer_entity_types(t))
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, plan
