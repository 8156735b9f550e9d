"""Real-corpus CoNLL-2002 Dutch validation — the reference's canonical
workflow (vignettes/crfsuite-nlp.Rmd:109-153), runnable as ONE command
wherever network (or a pre-downloaded zip) exists:

    python jobs/validate_conll2002.py [path/to/conll2002.zip]

Protocol, mirroring the vignette exactly:
1. fetch the corpus zip the reference downloads
   (R/data.R:26-79: the bnosac-dev/nltk_data mirror of CoNLL-2002),
   or use a local copy given as argv[1];
2. parse ned.train / ned.testa with the S1 reader (token pos label,
   -DOCSTART- docs, blank-line sentences);
3. crf_cbind_attributes-equivalent templates: token+pos windows
   -2..+2, bigrams (vignette chunk at crfsuite-nlp.Rmd:92-98);
4. train L-BFGS 25 iterations, feature.minfreq=5, c1=0, c2=1
   (crfsuite-nlp.Rmd:117-127 — the "model ready within 30 seconds"
   configuration);
5. decode ned.testa and report token-level crf_evaluation (the A8
   metric contract) + entity-level P/R + the predicted-label
   distribution to compare against the reference README's histogram
   (README.md:50-53, 38k-token testa scale).

The sandbox this engine is developed in has no network, so this script
is the committed, reproducible form of the validation rather than its
output; the same train→decode→entity-P/R pipeline is continuously
exercised on a checked-in 2,000-sentence fixture with an
unseen-entity split (tests/test_conll_e2e.py, P/R ≥ 0.95).
"""

from __future__ import annotations

import io
import sys
import tempfile
import time
import urllib.request
import zipfile

URL = ("https://raw.githubusercontent.com/bnosac-dev/nltk_data/"
       "gh-pages/packages/corpora/conll2002.zip")


def fetch(argv: list[str]) -> dict[str, str]:
    """Return {split_name: local_text_path} for ned.train / ned.testa."""
    if len(argv) > 1:
        raw = open(argv[1], "rb").read()
    else:
        print(f"downloading {URL} ...")
        raw = urllib.request.urlopen(URL, timeout=120).read()
    zf = zipfile.ZipFile(io.BytesIO(raw))
    out = {}
    for split in ("ned.train", "ned.testa"):
        text = zf.read(f"conll2002/{split}").decode("utf-8")
        p = tempfile.NamedTemporaryFile(
            "w", suffix=f".{split}", delete=False, encoding="utf-8"
        )
        p.write(text)
        p.close()
        out[split] = p.name
    return out


def spans_from_bio(pdf, label_col: str) -> set:
    spans = set()
    cur = None
    rows = pdf.sort_values(["doc_id", "sentence_id", "token_id"]).itertuples()
    for r in rows:
        lab = getattr(r, label_col)
        key = (r.doc_id, r.sentence_id)
        if lab.startswith("B-"):
            if cur:
                spans.add(cur)
            cur = (key, r.token_id, r.token_id, lab[2:])
        elif lab.startswith("I-") and cur and cur[0] == key and cur[3] == lab[2:]:
            cur = (cur[0], cur[1], r.token_id, cur[3])
        else:
            if cur:
                spans.add(cur)
            cur = None
    if cur:
        spans.add(cur)
    return spans


def main() -> None:
    from crfsuite_spark.decode.tagger import decode
    from crfsuite_spark.functions.templates import cbind_attributes
    from crfsuite_spark.operators.evaluate import crf_evaluation
    from crfsuite_spark.session import get_spark
    from crfsuite_spark.sources.conll import read_conll
    from crfsuite_spark.train.trainer import train_crf

    files = fetch(sys.argv)
    spark = get_spark("conll2002-validate")
    seq = ["doc_id", "sentence_id"]

    def featurize(path):
        toks = read_conll(spark, path)
        return cbind_attributes(
            toks, terms=["token", "pos"], by=seq, order_col="token_id",
            from_offset=-2, to_offset=2, ngram_max=2,
        )

    train_df = featurize(files["ned.train"]).persist()
    n_sent = train_df.select(*seq).distinct().count()
    print(f"ned.train: {train_df.count()} tokens, {n_sent} sentences")

    log: list = []
    t0 = time.perf_counter()
    model = train_crf(
        train_df, seq_cols=seq, order_col="token_id",
        minfreq=5.0, c1=0.0, c2=1.0, max_iterations=25, log=log,
    )
    train_s = time.perf_counter() - t0
    print(f"trained 25 iterations in {train_s:.1f}s "
          f"(vignette promise: 'model ready within 30 seconds')")

    test_df = featurize(files["ned.testa"])
    pred = decode(
        test_df.withColumnRenamed("label", "label_gold"), model,
        seq_cols=seq, order_col="token_id", with_marginal=False,
        passthrough_cols=[*seq, "token_id", "token", "label_gold"],
    ).toPandas()
    print(f"ned.testa: decoded {len(pred)} tokens")
    print("predicted-label distribution (compare README.md:50-53):")
    print(pred["label"].value_counts().to_string())

    ev = crf_evaluation(
        spark.createDataFrame(pred), gold_col="label_gold", pred_col="label",
        seq_cols=seq,
    )
    print("token-level overall:", ev["overall"])
    gold = spans_from_bio(pred.rename(columns={"label_gold": "g"}), "g")
    mine = spans_from_bio(pred.rename(columns={"label": "p"}), "p")
    tp = len(gold & mine)
    p = tp / len(mine) if mine else 0.0
    r = tp / len(gold) if gold else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    print(f"entity-level: precision={p:.4f} recall={r:.4f} f1={f1:.4f} "
          f"({len(gold)} gold spans)")


if __name__ == "__main__":
    main()
