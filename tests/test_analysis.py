"""Text-analysis functions + multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from crfsuite_spark.functions import analysis as an
from crfsuite_spark.multimodal import binary as mm


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox is one of the animals in the garden"),
        (1, "el perro y el gato en la casa de los abuelos"),
        (2, "12345 67890 !!! ???"),
        (3, ""),
        (4, None),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_lang_id(docs):
    out = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", an.lang_id("text").alias("lang")).collect()}
    assert out[0] == "en"
    assert out[1] == "es"
    assert out[2] == "und"


def test_token_count_and_subwords(docs):
    out = {r["doc_id"]: (r["tc"], r["sw"]) for r in docs.select(
        "doc_id", an.token_count("text").alias("tc"), an.subword_estimate("text").alias("sw")
    ).collect()}
    assert out[0][0] == 12
    assert out[3][0] == 0 and out[4][0] == 0
    assert out[0][1] >= out[0][0]


def test_quality_and_ratios(docs):
    out = {r["doc_id"]: r.asDict() for r in docs.select(
        "doc_id",
        an.punct_ratio("text").alias("punct"),
        an.digit_ratio("text").alias("digit"),
        an.stopword_ratio("text").alias("stop"),
        an.quality_score("text").alias("q"),
    ).collect()}
    assert out[0]["q"] > out[2]["q"]  # prose beats digit noise
    assert out[2]["digit"] > 0.5
    assert out[0]["stop"] > 0.3
    assert out[3]["q"] is not None  # empty-safe


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(0, "Hello,   World!"), (1, "hello world"), (2, "different")],
        "id int, text string",
    )
    fps = {r["id"]: (r["fp"], r["m"]) for r in df.select(
        "id", an.fingerprint("text").alias("fp"), an.md5_fingerprint("text").alias("m")
    ).collect()}
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_image_feature_plumbing(spark):
    rows = [(i, bytes([i] * 20)) for i in range(5)]
    df = spark.createDataFrame(rows, "media_id int, blob binary")
    out = mm.extract_image_features(df).toPandas()
    assert len(out) == 5
    assert all(len(v) == 8 for v in out["features"])
    # deterministic: same blob → same features
    out2 = mm.extract_image_features(df).toPandas()
    a = [list(v) for v in out.sort_values("media_id")["features"]]
    b = [list(v) for v in out2.sort_values("media_id")["features"]]
    assert a == b


def test_audio_frame_plumbing(spark):
    df = spark.createDataFrame([(1, b"audio-bytes-here")], "media_id int, blob binary")
    out = mm.sample_audio_frames(df, n_frames=4).toPandas()
    assert len(out) == 4
    assert (out["rms"] > 0).all()


def test_media_metadata_sniffing(spark):
    rows = [
        (0, bytes([0x89, 0x50, 0x4E, 0x47, 1, 2])),
        (1, bytes([0xFF, 0xD8, 0xFF, 0xE0, 1, 2])),
        (2, b"plain"),
    ]
    df = spark.createDataFrame(rows, "media_id int, blob binary")
    out = {r["media_id"]: r["media_type"] for r in mm.media_metadata(df).collect()}
    assert out[0] == "image/png" and out[1] == "image/jpeg"
    assert out[2] == "application/octet-stream"


def test_winnow_guarantee(spark):
    """Winnowing guarantee (Schleimer et al. 2003): documents sharing a
    substring of length >= k + w - 1 share at least one fingerprint;
    disjoint documents share none (w.h.p.)."""
    from crfsuite_spark.functions.analysis import winnow_fingerprints

    shared = "the identical shared passage of text"  # len 36 >= 5+4-1
    rows = [
        (1, "prefix one " + shared + " suffix alpha"),
        (2, "totally different lead-in " + shared + " and tail"),
        (3, "no overlap here whatsoever zqxv"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = df.select(
        "doc_id", winnow_fingerprints("text", k=5, w=4).alias("fps")
    ).toPandas()
    fps = {r.doc_id: set(r.fps) for r in out.itertuples()}
    assert fps[1] & fps[2], "shared substring must share a fingerprint"
    assert not (fps[1] & fps[3])
    # density sanity: far fewer fingerprints than k-grams
    assert len(fps[1]) < len(rows[0][1])


def test_video_frame_sampling_plumbing(spark):
    """Video stub: evenly-spaced keyframe sampling with deterministic
    fake frames; one row per sampled frame, bounded by n_sample."""
    rows = [(1, b"short"), (2, b"a much longer blob simulating video!!")]
    df = spark.createDataFrame(rows, "media_id int, blob binary")
    out = mm.sample_video_frames(df, n_sample=3).toPandas()
    assert set(out["media_id"]) == {1, 2}
    per = out.groupby("media_id").size()
    assert (per <= 3).all() and (per >= 1).all()
    assert ((out["ts_frac"] >= 0) & (out["ts_frac"] <= 1)).all()
    assert all(len(v) == 3 for v in out["rgb"])
    # deterministic: same blob -> same frames
    out2 = mm.sample_video_frames(df, n_sample=3).toPandas()
    a = [list(v) for v in out.sort_values(["media_id", "frame_idx"])["rgb"]]
    b = [list(v) for v in out2.sort_values(["media_id", "frame_idx"])["rgb"]]
    assert a == b
    # strict mode raises NotImplementedError (declared stub contract)
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        mm._decode_video_bytes(b"x", strict=True)


def test_c4_filters(spark):
    """C4 heuristics: word count / mean word length / sentence proxy /
    composite keep flag on hand-computed edge cases."""
    from crfsuite_spark.functions import analysis as an

    rows = [
        (1, "The quick brown fox jumps over the lazy dog today. "
            "It runs far away. Then it sleeps well tonight."),
        (2, None),
        (3, ""),
        (4, "word " * 60 + "end."),          # long enough, 1 sentence
        (5, "code { block } " * 30),          # curly brace -> drop
        (6, "Lorem ipsum dolor sit amet. " * 20),  # lorem -> drop
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            an.word_count("text").alias("wc"),
            F.round(an.mean_word_length("text"), 6).alias("mwl"),
            an.sentence_count("text").alias("ns"),
            an.c4_keep("text", min_words=10, min_sentences=3).alias("keep"),
        ).collect()
    }
    assert out[1]["wc"] == 19 and out[1]["ns"] == 3 and out[1]["keep"]
    assert out[2]["wc"] == 0 and out[2]["mwl"] == 0.0 and not out[2]["keep"]
    assert out[3]["wc"] == 0 and not out[3]["keep"]
    assert not out[4]["keep"]      # only 1 sentence
    assert not out[5]["keep"]      # curly brace
    assert not out[6]["keep"]      # lorem ipsum


def test_hash_sample_deterministic_and_nested(spark):
    """Hash sampling: stable across runs/partitionings and NESTED —
    the 5% sample is a strict subset of the 20% sample (thresholded
    hash property df.sample lacks)."""
    from crfsuite_spark.operators.sampling import hash_sample

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s20 = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.20).collect()}
    s05 = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.05).collect()}
    s20b = {r["doc_id"] for r in
            hash_sample(df.repartition(13), "doc_id", 0.20).collect()}
    assert s20 == s20b
    assert s05 <= s20
    assert 0.15 < len(s20) / 2000 < 0.25
    assert 0.02 < len(s05) / 2000 < 0.08


def test_stratified_hash_sample(spark):
    from crfsuite_spark.operators.sampling import stratified_hash_sample

    df = spark.range(0, 900).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )
    out = stratified_hash_sample(
        df, "doc_id", "lang", {"en": 1.0, "de": 0.3}, default_fraction=0.0
    ).groupBy("lang").count().toPandas().set_index("lang")["count"]
    assert out.get("en", 0) == 300          # keep all
    assert 50 < out.get("de", 0) < 130      # ~30%
    assert "fr" not in out.index            # default 0


def test_pack_documents_invariants(spark):
    """Packing v2 (real packed layout): documents split across chunk
    boundaries; per document the pieces tile [0, n_tokens) gap-free in
    chunk order; per pack the pieces tile [0, budget) exactly (final
    pack of each shard may be short); slots are contiguous ordinals;
    deterministic under repartitioning."""
    from crfsuite_spark.operators.sampling import pack_documents

    # 5..294 tokens per doc against budget 100 → many docs span 2+ packs
    rows = [(i, "tok " * (5 + (i * 37) % 290)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_documents(df, "doc_id", "text", token_budget=100, n_shards=4).toPandas()
    assert len(out) > 300  # boundary-spanning docs emit multiple pieces
    # per-document reconstruction: pieces in chunk order cover [0, n)
    for doc_id, g in out.sort_values("chunk").groupby("doc_id"):
        n = g["n_tokens"].iloc[0]
        spans = list(zip(g["token_start"], g["token_end"]))
        assert spans[0][0] == 0 and spans[-1][1] == n
        assert all(e0 == s1 for (_, e0), (s1, _) in zip(spans, spans[1:]))
        # consecutive chunks
        assert list(g["chunk"]) == list(range(g["chunk"].iloc[0], g["chunk"].iloc[-1] + 1))
    # per-pack tiling: Σ spans == budget except the last pack per shard
    for shard, g in out.groupby("shard"):
        last_chunk = g["chunk"].max()
        for chunk, p in g.groupby("chunk"):
            p = p.sort_values("slot")
            assert list(p["slot"]) == list(range(len(p)))
            assert p["pack_id"].iloc[0] == shard * 4294967296 + chunk
            cum = 0
            for r in p.itertuples():
                assert r.pack_offset == cum
                cum += r.token_end - r.token_start
            if chunk < last_chunk:
                assert cum == 100
    out2 = pack_documents(
        df.repartition(7), "doc_id", "text", token_budget=100, n_shards=4
    ).toPandas()
    key = ["doc_id", "chunk"]
    a = out.sort_values(key).reset_index(drop=True)
    b = out2.sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_pack_documents_zero_token_doc(spark):
    """A zero-token document emits exactly one empty audit piece."""
    from crfsuite_spark.operators.sampling import pack_documents

    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, None), (4, "d e")],
        "doc_id long, text string",
    )
    out = pack_documents(df, "doc_id", "text", token_budget=4, n_shards=1).toPandas()
    empty = out[out["n_tokens"] == 0]
    assert len(empty) == 2
    assert (empty["token_start"] == empty["token_end"]).all()
    nonempty = out[out["n_tokens"] > 0]
    assert (nonempty["token_end"] > nonempty["token_start"]).all()


def test_pack_with_spans_mask_invariants(spark):
    """Mask-preserving packing over real chat renders: (a) piece_text
    slices the original render exactly and reconstructs it in chunk
    order; (b) mask coverage in characters is exactly conserved through
    clipping/splitting; (c) every re-based pack-local span slices
    masked text out of the assembled pack string — per document, those
    slices concatenate (chunk order, span order) to the document's
    original masked text; (d) deterministic under repartitioning."""
    from crfsuite_spark.datagen.transcripts import generate
    from crfsuite_spark.operators.sampling import pack_with_spans
    from crfsuite_spark.operators.transcripts import chat_examples

    data = generate(n_convs=12, turns_per_conv=8, seed=42)
    ce = chat_examples(spark.createDataFrame(data.transcripts))
    src = {r["conv_id"]: (r["example_text"], r["mask_spans"])
           for r in ce.collect()}
    # budget far below a render's length → every conv splits, many
    # masks straddle pack boundaries
    out = pack_with_spans(ce, "conv_id", "example_text", "mask_spans",
                          char_budget=64, n_shards=3).toPandas()
    assert (out.groupby("conv_id").size() > 1).all()

    def spans_of(s):
        return [tuple(map(int, p.split(":"))) for p in s.split(",") if p]

    # (a) piece slicing + reconstruction
    for conv_id, g in out.sort_values("chunk").groupby("conv_id"):
        text, _ = src[conv_id]
        for r in g.itertuples():
            assert r.piece_text == text[r.char_start:r.char_end]
        assert "".join(g["piece_text"]) == text

    # (b) mask character count conserved
    orig_mask_chars = sum(b - a for (_, ms) in src.values()
                          for (a, b) in spans_of(ms))
    piece_mask_chars = sum(b - a for ms in out["piece_mask_spans"]
                           for (a, b) in spans_of(ms))
    assert orig_mask_chars > 0 and piece_mask_chars == orig_mask_chars

    # (c) pack-local spans slice masked text; per-doc concatenation in
    # (chunk, span) order rebuilds the original masked text exactly
    packs = {}
    for pack_id, g in out.groupby("pack_id"):
        buf = {}
        for r in g.itertuples():
            for i, ch in enumerate(r.piece_text):
                buf[r.pack_offset + i] = ch
        packs[pack_id] = "".join(buf[i] for i in range(len(buf)))
    for conv_id, g in out.sort_values("chunk").groupby("conv_id"):
        text, ms = src[conv_id]
        got = "".join(
            packs[r.pack_id][a:b]
            for r in g.itertuples()
            for (a, b) in spans_of(r.piece_mask_spans)
        )
        want = "".join(text[a:b] for (a, b) in spans_of(ms))
        assert got == want

    # (d) repartition-invariant
    out2 = pack_with_spans(ce.repartition(7), "conv_id", "example_text",
                           "mask_spans", char_budget=64, n_shards=3).toPandas()
    key = ["conv_id", "chunk"]
    a = out.sort_values(key).reset_index(drop=True)
    b = out2.sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_pack_with_spans_edges(spark):
    """Hand-checked clipping: a span exactly on a boundary splits into
    two adjacent pieces; a span outside a piece vanishes; empty
    mask_spans and empty text stay well-formed."""
    from crfsuite_spark.operators.sampling import pack_with_spans

    # one doc, 10 chars, budget 4 → pieces [0,4) [4,8) [8,10);
    # spans: 2:6 straddles the first boundary, 8:10 sits in the tail
    df = spark.createDataFrame(
        [("a", "0123456789", "2:6,8:10"), ("b", "", ""), ("c", None, None)],
        "conv_id string, example_text string, mask_spans string",
    )
    out = pack_with_spans(df, char_budget=4, n_shards=1).toPandas()
    a = out[out["conv_id"] == "a"].sort_values("chunk")
    assert len(a) == 3
    # each piece is alone in its pack here (single shard, docs b/c are
    # empty) — but offsets are pack-local regardless
    by_piece = list(zip(a["char_start"], a["char_end"],
                        a["pack_offset"], a["piece_mask_spans"]))
    for cs, ce_, po, ms in by_piece:
        spans = [tuple(map(int, p.split(":"))) for p in ms.split(",") if p]
        # re-derive expected: clip {2:6, 8:10} to [cs, ce), re-base
        want = []
        for (x, y) in [(2, 6), (8, 10)]:
            lo, hi = max(x, cs), min(y, ce_)
            if hi > lo:
                want.append((po + lo - cs, po + hi - cs))
        assert spans == want
    # empty docs emit one empty piece with empty spans
    for cid in ("b", "c"):
        e = out[out["conv_id"] == cid]
        assert len(e) == 1
        assert e["char_start"].iloc[0] == e["char_end"].iloc[0] == 0
        assert e["piece_text"].iloc[0] == "" and e["piece_mask_spans"].iloc[0] == ""


def test_gopher_repetition_signals(spark):
    """Hand-computed duplicate-sentence and top-2-gram fractions,
    including the zero-shuffle sorted-run mode computation."""
    from crfsuite_spark.functions import analysis as an

    rows = [
        (1, "the cat sat. the cat sat. the dog ran."),
        (2, "a b a b a b a b"),   # "a b" 4 of 7 grams
        (3, "x"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in df.select(
        "doc_id",
        F.round(an.dup_sentence_fraction("text"), 4).alias("ds"),
        F.round(an.top_bigram_fraction("text"), 4).alias("tg"),
    ).collect()}
    assert abs(out[1]["ds"] - 1 / 3) < 1e-3
    assert abs(out[2]["tg"] - 4 / 7) < 1e-3
    assert out[3]["tg"] == 0.0 and out[3]["ds"] == 0.0
    assert out[4]["tg"] == 0.0 and out[4]["ds"] == 0.0
    # plan stays shuffle-free (no Exchange): pure project over the scan
    plan = df.select(an.top_bigram_fraction("text"))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_redact_pii(spark):
    from crfsuite_spark.functions import analysis as an

    rows = [
        (1, "mail john.doe+x@sub.example.co.uk now"),
        (2, "server at 192.168.1.254 up"),
        (3, "call +44 (020) 7946 0958 or 555-123-4567"),
        (4, None),
        (5, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r["red"] for r in df.select(
        "doc_id", an.redact_pii("text").alias("red")).collect()}
    assert out[1] == "mail <EMAIL> now"
    assert out[2] == "server at <IP> up"
    assert "<PHONE>" in out[3] and "7946" not in out[3] and "555" not in out[3]
    assert out[4] == ""
    assert out[5] == "no pii here at all"


def test_chunk_documents(spark):
    """Overlapping token windows: coverage, overlap stitching, short/
    empty/NULL docs, and shuffle-free plan."""
    from crfsuite_spark.operators.sampling import chunk_documents

    rows = [(1, " ".join(f"t{i}" for i in range(25))),
            (2, "a b c"), (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = chunk_documents(df, window=10, overlap=2).toPandas()
    d1 = out[out["doc_id"] == 1].sort_values("chunk_idx")
    assert list(d1["n_tokens"]) == [10, 10, 9]
    # overlap: each chunk starts 8 tokens after the previous
    assert d1.iloc[1]["chunk_text"].startswith("t8 t9 t10")
    # concatenating with overlap dropped reconstructs the doc
    rebuilt = d1.iloc[0]["chunk_text"].split()
    for _, r in d1.iloc[1:].iterrows():
        rebuilt += r["chunk_text"].split()[2:]
    assert rebuilt == [f"t{i}" for i in range(25)]
    assert len(out[out["doc_id"] == 2]) == 1
    assert not set(out["doc_id"]) & {3, 4}
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    import pytest as _pt
    for w_, o_ in [(8, 8), (5, -3), (0, 0)]:
        with _pt.raises(ValueError):
            chunk_documents(df, window=w_, overlap=o_)


def test_decontaminate_ngram_overlap(spark):
    """Benchmark decontamination: a doc containing a full benchmark
    8-gram is flagged with the exact distinct-overlap count; a 7-word
    prefix overlap is NOT contamination; drop mode anti-joins flagged
    docs and keeps every column."""
    from crfsuite_spark.operators.decontaminate import (
        decontaminate,
        ngram_overlap,
    )

    bench = spark.createDataFrame(
        [("What is the capital of France Paris is",), ("short",)],
        "text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "training text holds what is the capital of france paris is verbatim inside it"),
            (2, "completely unrelated content with enough words to form many ngrams here today ok"),
            (3, "what is the capital of france but then diverges for the rest of the text"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    hits = ngram_overlap(docs, bench, n=8).toPandas()
    assert dict(zip(hits["doc_id"], hits["n_contaminated"])) == {1: 1}
    clean = decontaminate(docs, bench, n=8).toPandas()
    assert sorted(clean["doc_id"]) == [2, 3, 4]
    assert list(clean.columns) == ["doc_id", "text"]


def _skewed_domains(spark):
    # 1600 web / 400 books / 100 code — 16:4:1 skew
    return spark.range(0, 2100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1600, "web")
        .when(F.col("id") < 2000, "books")
        .otherwise("code")
        .alias("domain"),
    )


def test_temperature_mix_rates_and_determinism(spark):
    """alpha=0.5 keep-rates are sqrt(n_min/n_d): code (smallest) kept
    whole, web kept at 1/4, books at 1/2 — realized counts within hash
    noise; output identical across partitionings (retry/AQE-stable)."""
    from crfsuite_spark.operators.sampling import temperature_mix

    df = _skewed_domains(spark)
    out = temperature_mix(df, "doc_id", "domain", alpha=0.5)
    rows = out.groupBy("domain").count().collect()
    got = {r["domain"]: r["count"] for r in rows}
    # expected: code 100 (rate 1.0 exactly), web ~400, books ~200
    assert got["code"] == 100
    assert abs(got["web"] - 400) < 60
    assert abs(got["books"] - 200) < 45
    ids = {r["doc_id"] for r in out.collect()}
    ids_b = {
        r["doc_id"]
        for r in temperature_mix(
            df.repartition(17), "doc_id", "domain", alpha=0.5
        ).collect()
    }
    assert ids == ids_b


def test_temperature_mix_alpha_extremes(spark):
    """alpha=1 is a no-op (every domain rate 1.0); alpha=0 levels every
    domain down to ~n_min; alpha outside [0,1] raises."""
    import pytest as _pytest

    from crfsuite_spark.operators.sampling import temperature_mix

    df = _skewed_domains(spark)
    assert temperature_mix(df, "doc_id", "domain", alpha=1.0).count() == 2100
    flat = temperature_mix(df, "doc_id", "domain", alpha=0.0)
    got = {r["domain"]: r["count"]
           for r in flat.groupBy("domain").count().collect()}
    assert got["code"] == 100
    assert abs(got["web"] - 100) < 40
    assert abs(got["books"] - 100) < 35
    with _pytest.raises(ValueError):
        temperature_mix(df, "doc_id", "domain", alpha=1.5)


def test_temperature_mix_general_alpha_driver_path(spark):
    """Non-sqrt alphas go through the driver-computed thresholds: same
    contract (smallest domain whole, monotone rates), and the kept set
    is a SUBSET of a higher-alpha run with the same seed (thresholds
    shrink monotonically as alpha drops — nested-sample property)."""
    from crfsuite_spark.operators.sampling import temperature_mix

    df = _skewed_domains(spark)
    a7 = {r["doc_id"] for r in
          temperature_mix(df, "doc_id", "domain", alpha=0.7).collect()}
    a3 = {r["doc_id"] for r in
          temperature_mix(df, "doc_id", "domain", alpha=0.3).collect()}
    assert a3 <= a7
    out = temperature_mix(df, "doc_id", "domain", alpha=0.3)
    got = {r["domain"]: r["count"]
           for r in out.groupBy("domain").count().collect()}
    assert got["code"] == 100
    # rates: web (16/1)^-0.7 ~ 0.1436 -> ~230; books (4/1)^-0.7 ~ 0.379 -> ~151
    assert abs(got["web"] - 1600 * (1 / 16) ** 0.7) < 50
    assert abs(got["books"] - 400 * (1 / 4) ** 0.7) < 40


def test_temperature_mix_scale_factor(spark):
    """scale < 1 subsamples every domain by the same factor on top of
    the temperature rates (the 'take a 10% pilot of the mixed corpus'
    knob), preserving the mix ratios."""
    from crfsuite_spark.operators.sampling import temperature_mix

    df = _skewed_domains(spark)
    out = temperature_mix(df, "doc_id", "domain", alpha=0.5, scale=0.5)
    got = {r["domain"]: r["count"]
           for r in out.groupBy("domain").count().collect()}
    assert abs(got["code"] - 50) < 25
    assert abs(got["web"] - 200) < 45
    assert abs(got["books"] - 100) < 35


def _token_skewed_domains(spark):
    # token-mass skew opposite the doc-count skew: 100 web docs × 10
    # tokens, 20 books docs × 100 tokens, 10 code docs × 5 tokens
    return spark.range(0, 130).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, "web")
        .when(F.col("id") < 120, "books")
        .otherwise("code")
        .alias("domain"),
        F.when(F.col("id") < 100, F.array_repeat(F.lit("w"), 10))
        .when(F.col("id") < 120, F.array_repeat(F.lit("b"), 100))
        .otherwise(F.array_repeat(F.lit("c"), 5))
        .alias("toks"),
    ).select(
        "doc_id", "domain", F.array_join("toks", " ").alias("text")
    )


def test_token_budget_mix_hits_budgets(spark):
    """Kept token mass per domain ≈ its budget (hash noise), an
    under-budget domain is kept WHOLE, and a domain absent from the
    budget spec (default_budget=0) is dropped entirely."""
    from crfsuite_spark.functions.analysis import token_count
    from crfsuite_spark.operators.sampling import token_budget_mix

    df = _token_skewed_domains(spark)
    out = token_budget_mix(
        df, "doc_id", "domain", "text",
        {"web": 500, "books": 200, "code": 1000},
    )
    got = {
        r["domain"]: r["toks"]
        for r in out.groupBy("domain")
        .agg(F.sum(token_count("text")).alias("toks"))
        .collect()
    }
    assert got["code"] == 50            # 50 tokens total < 1000 budget
    assert abs(got["web"] - 500) < 150  # rate 0.5 over 100 docs
    assert abs(got["books"] - 200) < 200  # rate 0.1 over 20 × 100-token docs
    dropped = token_budget_mix(df, "doc_id", "domain", "text", {"web": 500})
    assert dropped.where(F.col("domain") != "web").count() == 0


def test_token_budget_mix_deterministic_and_empty_domain(spark):
    """Kept set identical across partitionings; an all-empty-text
    domain with any positive budget is kept whole (0-token guard)."""
    from crfsuite_spark.operators.sampling import token_budget_mix

    df = _token_skewed_domains(spark)
    budgets = {"web": 500, "books": 200, "code": 1000}
    a = {r["doc_id"] for r in
         token_budget_mix(df, "doc_id", "domain", "text", budgets).collect()}
    b = {r["doc_id"] for r in
         token_budget_mix(df.repartition(11), "doc_id", "domain", "text",
                          budgets).collect()}
    assert a == b
    empty = spark.createDataFrame(
        [(900, "blank", ""), (901, "blank", None)],
        "doc_id int, domain string, text string",
    )
    kept = token_budget_mix(empty, "doc_id", "domain", "text", {"blank": 1})
    assert kept.count() == 2


def test_bigram_nll_matches_python_mirror(spark):
    """Interpolated conditional bigram NLL equals the literal Python
    computation; <2-token docs absent; lam validated."""
    import math
    from collections import Counter

    rows = [
        ("d1", "a b a b c"),
        ("d2", "a b"),
        ("d3", "c c c"),
        ("d4", "solo"),        # 1 token: absent
        ("d5", ""),            # empty: absent
        ("d6", None),          # NULL: absent
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    lam = 0.8
    out = {
        r["doc_id"]: (r["nll"], r["n_transitions"])
        for r in an.bigram_nll(df, lam=lam).collect()
    }

    docs = {d: (t.strip().lower().split() if t and t.strip() else [])
            for d, t in rows}
    uni = Counter(w for ws in docs.values() for w in ws)
    n_tok = sum(uni.values())
    pair = Counter()
    ctx = Counter()
    for ws in docs.values():
        for a, b in zip(ws, ws[1:]):
            pair[(a, b)] += 1
            ctx[a] += 1
    exp = {}
    for d, ws in docs.items():
        trans = list(zip(ws, ws[1:]))
        if not trans:
            continue
        nll = -sum(
            math.log(lam * pair[(a, b)] / ctx[a]
                     + (1 - lam) * uni[b] / n_tok)
            for a, b in trans
        ) / len(trans)
        exp[d] = (nll, len(trans))
    assert set(out) == set(exp) == {"d1", "d2", "d3"}
    for d in exp:
        assert out[d][1] == exp[d][1]
        assert out[d][0] == pytest.approx(exp[d][0])
    # templated text scores LOWER (more predictable) than mixed text
    assert out["d3"][0] < out["d1"][0]
    with pytest.raises(ValueError, match="lam"):
        an.bigram_nll(df, lam=1.0)


def test_token_budget_mix_null_domain_gets_default(spark):
    """NULL domain is a domain: with a positive default budget its rows
    survive (an == join would silently drop them all)."""
    from crfsuite_spark.operators.sampling import token_budget_mix

    df = spark.createDataFrame(
        [(0, None, "a b c"), (1, None, "d e"), (2, "web", "x y")],
        "doc_id int, domain string, text string",
    )
    out = token_budget_mix(df, "doc_id", "domain", "text",
                           {"web": 100}, default_budget=100)
    assert out.count() == 3
    dropped = token_budget_mix(df, "doc_id", "domain", "text",
                               {"web": 100}, default_budget=0)
    assert {r["doc_id"] for r in dropped.collect()} == {2}


def test_token_budget_mix_plan_shape(spark):
    """Scale contract: the corpus side of token_budget_mix never
    shuffles — the ONLY hash Exchange is the domain-counts aggregation
    (token-mass groupBy), and the rate table joins back broadcast."""
    import re

    from crfsuite_spark.operators.sampling import token_budget_mix

    df = _token_skewed_domains(spark)
    out = token_budget_mix(df, "doc_id", "domain", "text", {"web": 500})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_mixture_order_interleaves_proportionally(spark):
    """WFQ virtual-finish-time ordering: every prefix of the mix_key
    order carries ≈ the target domain rates; ranks are a deterministic
    per-domain permutation; zero/absent weights drop domains; stable
    under repartitioning."""
    from crfsuite_spark.operators.sampling import mixture_order

    df = _skewed_domains(spark)  # 1600 web / 400 books / 100 code
    out = mixture_order(df, "doc_id", "domain",
                        {"web": 0.6, "books": 0.3, "code": 0.1})
    rows = out.orderBy("mix_key", "doc_id").collect()
    # the first 200 emitted rows ≈ 120 web / 60 books / 20 code
    head = [r["domain"] for r in rows[:200]]
    assert abs(head.count("web") - 120) <= 2
    assert abs(head.count("books") - 60) <= 2
    assert abs(head.count("code") - 20) <= 2
    # per-domain ranks are 0..n-1 exactly once
    web_ranks = sorted(r["mix_rank"] for r in rows if r["domain"] == "web")
    assert web_ranks == list(range(1600))
    # code exhausts early (100 rows at rate .1 → all emitted by key 1000)
    assert max(r["mix_key"] for r in rows if r["domain"] == "code") == 1000.0
    # dropped domain
    only = mixture_order(df, "doc_id", "domain", {"web": 1.0})
    assert only.where(F.col("domain") != "web").count() == 0
    # determinism across partitionings
    a = [(r["doc_id"], r["mix_key"]) for r in rows]
    b = [(r["doc_id"], r["mix_key"]) for r in
         mixture_order(df.repartition(13), "doc_id", "domain",
                       {"web": 0.6, "books": 0.3, "code": 0.1})
         .orderBy("mix_key", "doc_id").collect()]
    assert a == b


def test_assign_splits(spark):
    """Split assignment: full partition (every row exactly one split),
    realized sizes within hash noise, deterministic under
    repartitioning, disjointness by construction, bad fractions raise."""
    from crfsuite_spark.operators.sampling import assign_splits

    df = spark.range(0, 3000).withColumnRenamed("id", "doc_id")
    out = assign_splits(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    got = {r["split"]: r["count"]
           for r in out.groupBy("split").count().collect()}
    assert sum(got.values()) == 3000
    assert abs(got["train"] - 2400) < 90
    assert abs(got["val"] - 300) < 60
    assert abs(got["test"] - 300) < 60
    a = sorted((r["doc_id"], r["split"]) for r in out.collect())
    b = sorted((r["doc_id"], r["split"]) for r in
               assign_splits(df.repartition(11), "doc_id",
                             {"train": 0.8, "val": 0.1, "test": 0.1}).collect())
    assert a == b
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    import pytest as _pytest
    with _pytest.raises(ValueError):
        assign_splits(df, "doc_id", {"train": 0.8, "val": 0.1})


def test_assign_splits_rejects_out_of_range_fractions(spark):
    """Fractions summing to 1 but individually out of (0,1] must raise
    (negative values silently corrupt cumulative bucket boundaries)."""
    import pytest as _pytest

    from crfsuite_spark.operators.sampling import assign_splits

    df = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    with _pytest.raises(ValueError, match=r"\(0, 1\]"):
        assign_splits(df, "doc_id", {"a": 1.1, "b": -0.1})
