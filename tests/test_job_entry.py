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
    edges = str(tmp_path / "edges")
    rc = run_kg_pipeline.main([
        "--transcripts", tpath, "--model", mpath,
        "--alias-dict", apath, "--output", out, "--buckets", "4",
        "--edge-table", edges, "--epoch", "0",
    ])
    assert rc == 0
    rep1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep1["rows_written"] > 0
    assert sorted(rep1["written_buckets"]) == [0, 1, 2, 3]
    assert rep1["edge_commit"]["skipped"] is False
    assert rep1["edge_commit"]["n_edges"] > 0

    # second run: everything already committed → nothing rewritten, and
    # the edge fold for epoch 0 is a no-op (no double counting)
    rc = run_kg_pipeline.main([
        "--transcripts", tpath, "--model", mpath,
        "--alias-dict", apath, "--output", out, "--buckets", "4",
        "--edge-table", edges, "--epoch", "0",
    ])
    assert rc == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["rows_written"] == 0
    assert rep2["skipped_buckets"] == [0, 1, 2, 3]
    assert rep2["edge_commit"]["skipped"] is True

    # a second transcript batch folds in as epoch 1; the standing edge
    # table must equal the one-pass aggregate over BOTH batches' triples
    from pyspark.sql import functions as F

    from crfsuite_spark.kg.lifecycle import edge_deltas, read_edges
    from crfsuite_spark.kg.triples import read_triples

    data2 = generate(n_convs=6, seed=9)
    dfs2 = to_spark(spark, data2)
    tpath2 = str(tmp_path / "transcripts2")
    dfs2["transcripts"].withColumn(
        "conv_id", F.concat(F.lit("b2_"), F.col("conv_id"))
    ).write.parquet(tpath2)
    out2 = str(tmp_path / "graph2")
    rc = run_kg_pipeline.main([
        "--transcripts", tpath2, "--model", mpath,
        "--alias-dict", apath, "--output", out2, "--buckets", "4",
        "--edge-table", edges, "--epoch", "1",
    ])
    assert rc == 0
    capsys.readouterr()
    both = read_triples(spark, out).join(
        spark.read.parquet(tpath).select("conv_id", "turn_idx", "ts"),
        ["conv_id", "turn_idx"],
    ).unionByName(
        read_triples(spark, out2).join(
            spark.read.parquet(tpath2).select("conv_id", "turn_idx", "ts"),
            ["conv_id", "turn_idx"],
        )
    )
    cols = ["subj", "pred", "obj", "n_mentions", "first_seen", "last_seen"]
    got = (read_edges(spark, edges).select(cols).toPandas()
           .sort_values(["subj", "pred", "obj"]).reset_index(drop=True))
    exp = (edge_deltas(both.select("conv_id", "turn_idx", "subj", "pred", "obj", "ts"))
           .select(cols).toPandas()
           .sort_values(["subj", "pred", "obj"]).reset_index(drop=True))
    import pandas as pd

    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_spark_submit_py_files_deployment(spark, synth, lexicon_model, tmp_path):
    """The north rule's deployment contract, LITERALLY: package the
    library as a zip, run the job via ``spark-submit --py-files`` from
    a cwd outside the repo with PYTHONPATH scrubbed — driver and
    executors must resolve ``crfsuite_spark`` from the zip alone, and
    the job must write triples and report them on stdout."""
    import shutil
    import subprocess
    import zipfile

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    dfs = None
    from crfsuite_spark.datagen.transcripts import to_spark

    dfs = to_spark(spark, synth)
    tpath = str(tmp_path / "transcripts")
    dfs["transcripts"].limit(200).write.parquet(tpath)
    apath = str(tmp_path / "alias")
    spark.createDataFrame(build_alias_dict()).write.parquet(apath)
    mpath = str(tmp_path / "model")
    lexicon_model.save(mpath)

    zpath = str(tmp_path / "crfsuite_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(os.path.join(repo, "crfsuite_spark")):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, repo))

    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out_dir = str(tmp_path / "graph")
    p = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", zpath,
         os.path.join(repo, "jobs", "run_kg_pipeline.py"),
         "--transcripts", tpath, "--model", mpath,
         "--alias-dict", apath, "--output", out_dir, "--buckets", "2"],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=420,
    )
    assert p.returncode == 0, p.stderr[-3000:]
    rep = json.loads(
        [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert rep["rows_written"] > 0
    assert sorted(rep["written_buckets"]) == [0, 1]
