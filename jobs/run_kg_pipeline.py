"""spark-submit entry point for the KG-construction pipeline.

Deployment shape mandated by the north rule: the job ships as

    spark-submit --py-files crfsuite_spark.zip jobs/run_kg_pipeline.py \
        --transcripts <path-or-table> --model <model-dir> \
        --alias-dict <path> --output <graph-dir> \
        [--epoch N] [--buckets 256] [--partitions 4096]

on a multi-executor cluster. Build the zip with:

    cd /root/repo && python -m zipfile -c crfsuite_spark.zip crfsuite_spark

The job is idempotent: triple buckets already committed in the output
manifest are skipped, so a crashed/killed run resumes where it stopped
(kg/triples.py). Reads are plain ``spark.read.parquet``; point
``--transcripts`` at an Iceberg table name (``catalog.db.table``) and
the same plan runs against Iceberg snapshots when the runtime has the
Iceberg catalog configured — nothing in the pipeline is
format-specific.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--transcripts", required=True,
                    help="parquet path or Iceberg table of (conv_id, turn_idx, role, text, tool, ts)")
    ap.add_argument("--model", required=True, help="CRFModel directory (states/transitions parquet)")
    ap.add_argument("--alias-dict", required=True,
                    help="parquet path of (alias, canonical_id, canonical_name, entity_type, weight)")
    ap.add_argument("--output", required=True, help="output graph table directory")
    ap.add_argument("--epoch", type=int, default=0, help="lineage epoch recorded in manifests")
    ap.add_argument("--buckets", type=int, default=256, help="output hash buckets (conv_id)")
    ap.add_argument("--partitions", type=int, default=None,
                    help="decode parallelism (default: spark.default.parallelism)")
    ap.add_argument("--no-fuzzy", action="store_true", help="disable MinHash-LSH fuzzy linking")
    ap.add_argument("--coref", action="store_true",
                    help="resolve pronouns to prior in-conversation "
                         "mentions before relation assembly (kg/coref.py)")
    ap.add_argument("--edge-table", default=None,
                    help="optional standing edge-table directory: this run's "
                         "triples are folded in as one crash-atomic epoch "
                         "commit (kg/lifecycle.py commit_edge_batch; "
                         "replaying a committed epoch is a no-op)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    existing = SparkSession.getActiveSession()
    spark = existing or SparkSession.builder.appName("kg-pipeline").getOrCreate()

    from pyspark.sql import functions as F

    from crfsuite_spark.kg.pipeline import PipelineConfig, run_pipeline
    from crfsuite_spark.kg.triples import completed_buckets, materialize
    from crfsuite_spark.train.model import CRFModel

    def read(path):
        return (spark.read.table(path) if "." in path and "/" not in path
                else spark.read.parquet(path))

    t0 = time.time()
    done = completed_buckets(args.output)
    todo = [b for b in range(args.buckets) if b not in done]
    if not todo:
        # fully resumed: don't even build the pipeline (decode is the
        # expensive stage; a no-op resume must be O(manifest))
        report = {"skipped_buckets": sorted(done), "written_buckets": [],
                  "rows_written": 0}
    else:
        transcripts = read(args.transcripts)
        if done:
            # partial resume: drop completed conversations BEFORE decode —
            # same bucket hash as materialize, so the filter reaches the
            # scan and the CRF/linking stages never see committed buckets
            transcripts = transcripts.where(
                F.pmod(F.xxhash64(F.col("conv_id")), F.lit(args.buckets))
                .cast("int").isin(todo)
            )
        alias = read(args.alias_dict)
        model = CRFModel.load(args.model)
        cfg = PipelineConfig(num_partitions=args.partitions,
                             fuzzy_linking=not args.no_fuzzy,
                             coref=args.coref)
        triples = run_pipeline(transcripts, model, alias, cfg)
        report = materialize(triples, args.output, n_buckets=args.buckets,
                             epoch=args.epoch)
    if args.edge_table:
        # fold this batch's committed triples into the standing edge
        # table as ONE epoch commit. Reading the COMMITTED table (not
        # the in-flight pipeline) keeps the two manifests consistent:
        # the edge fold sees exactly what the triple manifest committed,
        # and commit_edge_batch's epoch no-op makes the whole job safely
        # re-runnable end-to-end. ts comes from a column-pruned
        # transcript scan joined on the (conv_id, turn_idx) provenance.
        from crfsuite_spark.kg.lifecycle import commit_edge_batch
        from crfsuite_spark.kg.triples import read_triples

        mentions = read_triples(spark, args.output).join(
            read(args.transcripts).select("conv_id", "turn_idx", "ts"),
            ["conv_id", "turn_idx"],
        )
        report["edge_commit"] = commit_edge_batch(
            mentions, args.edge_table, epoch=args.epoch
        )
    report["seconds"] = round(time.time() - t0, 1)
    print(json.dumps(report))
    if existing is None:  # owned session (real spark-submit run)
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
