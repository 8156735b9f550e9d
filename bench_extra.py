"""Extra benchmarks for the optimization rounds (bench.py is FROZEN —
this file holds the guide-§1.4 noop-sink isolation runs, per-query
repeats, and the .explain("formatted") capture that feeds
plans/r06/<query>_{before,after}.txt).

Usage:
  python bench_extra.py --plans r06 before         # dump plans
  python bench_extra.py --time ds_dsir_select [-n 3]
  python bench_extra.py --time all -n 3

Respects $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def get_session(cores: int):
    from crfsuite_spark.session import get_spark

    return get_spark("bench_extra", cores=cores,
                     shuffle_partitions=max(cores, 8))


def _bench_frames(spark, sf_dir: str, cores: int):
    """DataFrame builders mirroring every bench.py query (same inputs,
    same arguments) so plans/timings match what the frozen bench runs.
    Each returns a DataFrame whose evaluation is the timed computation;
    queries that are driver-side loops (kg_transe_train) or
    collect-based return a callable instead."""
    from pyspark.sql import functions as F

    import __spark_entry__ as em
    import bench as bb

    tsf = float(os.environ.get("SPARK_GRAFT_TRANSCRIPT_SF")
                or bb._sf_from_dir(sf_dir))
    tpath, _ = bb.ensure_transcripts(spark, tsf)

    def transcripts():
        return spark.read.parquet(tpath)

    def triples():
        return spark.read.parquet(
            os.path.join(bb.CACHE, f"sf{tsf}", "triples.parquet"))

    frames = {}

    def q(name):
        def reg(fn):
            frames[name] = fn
            return fn
        return reg

    @q("kg_pipeline")
    def kg_pipeline():
        from crfsuite_spark.datagen.transcripts import build_alias_dict
        from crfsuite_spark.kg.pipeline import PipelineConfig, run_pipeline

        cfg = PipelineConfig()
        alias = spark.createDataFrame(build_alias_dict())
        return run_pipeline(transcripts(), bb.lexicon_model(), alias, cfg,
                            predicate_map=None)

    frames["w1_window_templates"] = lambda: em.q_w1_window_lag_lead(spark, sf_dir)

    @q("dedup_minhash")
    def dedup_minhash():
        from crfsuite_spark.operators.minhash import minhash_self_pairs

        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return minhash_self_pairs(d, "doc_id", "text", 32, 8, 5, 0.8,
                                  num_partitions=cores)

    frames["sim_cosine_topk"] = lambda: em.q_sim_cosine_topk(spark, sf_dir)
    frames["ta_text_stats"] = lambda: em.q_ta_text_stats(spark, sf_dir)

    @q("tpch_q1_agg")
    def tpch_q1():
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        return (li.groupBy("l_returnflag", "l_linestatus")
                .agg(F.sum("l_quantity").alias("sum_qty"),
                     F.avg("l_extendedprice").alias("avg_price"),
                     F.count(F.lit(1)).alias("n")))

    frames["ds_pack_documents"] = lambda: em.q_ds_pack_documents(spark, sf_dir)
    frames["ds_hash_sample"] = lambda: em.q_ds_hash_sample(spark, sf_dir)
    frames["ds_decontaminate"] = lambda: em.q_ds_decontaminate(spark, sf_dir)
    frames["ds_span_dedup"] = lambda: em.q_ds_span_dedup(spark, sf_dir)
    frames["ds_intra_doc_dedup"] = lambda: em.q_ds_intra_doc_dedup(spark, sf_dir)
    frames["ds_substr_dedup"] = lambda: em.q_ds_substr_dedup(spark, sf_dir)
    frames["ds_dsir_select"] = lambda: em.q_ds_dsir_select(spark, sf_dir)
    frames["ta_unigram_nll"] = lambda: em.q_ta_unigram_nll(spark, sf_dir)
    frames["sim_cluster_assign"] = lambda: em.q_sim_cluster_assign(spark, sf_dir)

    @q("kg_bgp_query")
    def bgp():
        from crfsuite_spark.kg.query import match_patterns

        return match_patterns(
            triples(),
            [("?p", "works_at", "?org"), ("?buyer", "acquired", "?org"),
             ("?org", "located_in", "?city")],
            filters=["p <> buyer"],
        )

    @q("kg_transe_train")
    def transe():
        from crfsuite_spark.kg.embeddings import train_transe

        def run():
            train_transe(triples(), dim=16, epochs=3, lr=0.5, seed=7,
                         num_partitions=cores)
        return run

    @q("kg_pagerank3")
    def pagerank():
        from crfsuite_spark.kg.graph import pagerank as pr

        def run():
            out = pr(triples(), n_iters=3)
            out.write.format("noop").mode("overwrite").save()
            for df in out.pinned_caches:
                df.unpersist()
        return run

    @q("kg_dict_spans")
    def dict_spans():
        from crfsuite_spark.datagen.transcripts import build_alias_dict
        from crfsuite_spark.functions.tokenize import tokenize
        from crfsuite_spark.kg.mining import dictionary_spans

        alias = spark.createDataFrame(build_alias_dict())
        return dictionary_spans(tokenize(transcripts()), alias)

    @q("tr_conv_stats")
    def conv_stats():
        from crfsuite_spark.operators.transcripts import conv_stats as cs

        return cs(transcripts())

    @q("tr_chat_examples")
    def chat_examples():
        from crfsuite_spark.operators.transcripts import chat_examples as ce

        return ce(transcripts()).agg(F.sum("n_chars"))

    return frames


def evaluate(spark, obj):
    """noop-sink a DataFrame, or call a callable."""
    if callable(obj):
        obj()
        return
    obj.write.format("noop").mode("overwrite").save()
    caches = getattr(obj, "pinned_caches", None)
    if caches:
        for c in caches:
            c.unpersist()


def explain_text(df) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return jdf.queryExecution().explainString(mode.fromString("formatted"))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session(cores)
    frames = _bench_frames(spark, sf_dir, cores)

    if "--plans" in sys.argv:
        tag = sys.argv[sys.argv.index("--plans") + 1]
        suffix = sys.argv[sys.argv.index("--plans") + 2]
        out_dir = os.path.join(REPO, "plans", tag)
        os.makedirs(out_dir, exist_ok=True)
        names = sys.argv[sys.argv.index("--plans") + 3:] or list(frames)
        for name in names:
            obj = frames[name]()
            if callable(obj):
                continue  # driver-side loops have no single plan
            with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(explain_text(obj))
            caches = getattr(obj, "pinned_caches", None)
            if caches:
                for c in caches:
                    c.unpersist()
            print("wrote", name)
        spark.stop()
        return

    if "--time" in sys.argv:
        which = sys.argv[sys.argv.index("--time") + 1]
        n = int(sys.argv[sys.argv.index("--time") + 2]) if "-n" not in sys.argv else 1
        if "-n" in sys.argv:
            n = int(sys.argv[sys.argv.index("-n") + 1])
        names = list(frames) if which == "all" else which.split(",")
        results = {}
        for name in names:
            draws = []
            for _ in range(max(n, 1)):
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.perf_counter()
                evaluate(spark, frames[name]())
                draws.append(round(time.perf_counter() - t0, 3))
                spark.sparkContext.setJobDescription(None)
            results[name] = {"median": sorted(draws)[len(draws) // 2],
                             "min": min(draws), "draws": draws}
            print(json.dumps({name: results[name]}))
        print(json.dumps({"sf_dir": sf_dir, "results": results}))
        spark.stop()
        return


if __name__ == "__main__":
    main()
