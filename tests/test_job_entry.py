"""spark-submit job entry point: end-to-end run + idempotent resume."""

import json
import os

from crfsuite_spark.datagen.transcripts import build_alias_dict, generate, to_spark


def test_run_kg_pipeline_job(spark, tmp_path, capsys):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
    import run_kg_pipeline

    data = generate(n_convs=12, seed=5)
    dfs = to_spark(spark, data)
    tpath = str(tmp_path / "transcripts")
    dfs["transcripts"].write.parquet(tpath)
    apath = str(tmp_path / "alias")
    spark.createDataFrame(build_alias_dict()).write.parquet(apath)

    # train a tiny model and save it
    from crfsuite_spark.functions.templates import cbind_attributes
    from crfsuite_spark.functions.tokenize import tokenize
    from crfsuite_spark.train.trainer import train_crf

    toks = tokenize(dfs["transcripts"]).join(
        dfs["tokens"].select("conv_id", "turn_idx", "token_idx", "label"),
        ["conv_id", "turn_idx", "token_idx"],
    )
    feat = cbind_attributes(toks, ["token", "pos"], ["conv_id", "turn_idx"], "token_idx")
    model = train_crf(feat, ["conv_id", "turn_idx"], "token_idx",
                      max_iterations=25, num_partitions=4)
    mpath = str(tmp_path / "model")
    model.save(mpath)

    out = str(tmp_path / "graph")
    rc = run_kg_pipeline.main([
        "--transcripts", tpath, "--model", mpath,
        "--alias-dict", apath, "--output", out, "--buckets", "4",
    ])
    assert rc == 0
    rep1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep1["rows_written"] > 0
    assert sorted(rep1["written_buckets"]) == [0, 1, 2, 3]

    # second run: everything already committed → nothing rewritten
    rc = run_kg_pipeline.main([
        "--transcripts", tpath, "--model", mpath,
        "--alias-dict", apath, "--output", out, "--buckets", "4",
    ])
    assert rc == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["rows_written"] == 0
    assert rep2["skipped_buckets"] == [0, 1, 2, 3]
