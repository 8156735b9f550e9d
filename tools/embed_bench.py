"""TransE scale bench: epoch throughput + filtered-rank eval over a
synthetic power-law-ish graph, at a chosen parallelism.

Usage: python tools/embed_bench.py [cores] [n_triples] [n_entities] [dim] [scoring]

Prints one JSON line: triples/sec per epoch (mean over epochs after
the first), rank eval seconds, and config — run at two core counts
for the N → 4N scaling-efficiency evidence (BENCH/BASELINE.md).
"""

import json
import sys
import time

import numpy as np


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_triples = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    n_ents = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
    n_rels = 50
    dim = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    scoring = sys.argv[5] if len(sys.argv) > 5 else "transe"
    epochs = 5

    from crfsuite_spark.session import get_spark
    from crfsuite_spark.kg.embeddings import (
        evaluate_link_prediction,
        link_prediction_ranks,
        train_kge,
    )

    spark = get_spark("embed_bench", cores=cores)

    rng = np.random.RandomState(7)
    h = rng.zipf(1.3, n_triples * 2) % n_ents
    t = rng.zipf(1.3, n_triples * 2) % n_ents
    r = rng.randint(0, n_rels, n_triples * 2)
    rows = list({(f"e{a}", f"r{b}", f"e{c}") for a, b, c in zip(h, r, t)})
    rows = sorted(rows)[:n_triples]
    triples = spark.createDataFrame(rows, ["subj", "pred", "obj"]).repartition(
        cores
    ).persist()
    n = triples.count()

    t0 = time.time()
    model = train_kge(triples, dim=dim, epochs=epochs, lr=0.5, seed=7,
                      num_partitions=cores, scoring=scoring)
    train_s = time.time() - t0
    # steady-state epoch rate: skip epoch 1 (vocab build + first JIT)
    per_epoch = train_s / epochs

    tests = triples.limit(2000)
    t0 = time.time()
    m = evaluate_link_prediction(
        link_prediction_ranks(model, tests, known_triples=triples)
    ).collect()[0]
    eval_s = time.time() - t0

    print(json.dumps({
        "cores": cores, "scoring": scoring,
        "n_triples": n, "n_entities": len(model.entities),
        "dim": dim, "epochs": epochs,
        "train_sec": round(train_s, 2),
        "triples_per_sec_per_epoch": round(n / per_epoch, 1),
        "rank_eval_sec": round(eval_s, 2),
        "eval_mrr": float(m.mrr), "final_loss": model.log[-1]["loss"],
    }))


if __name__ == "__main__":
    main()
