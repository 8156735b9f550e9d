"""CoNLL-2002-style token-per-line readers (reference S1/S2,
R/data.R:26-154).

The reference downloads CoNLL-2002 zips and parses them in R: split
each line on a separator into (token, pos, label); a ``-DOCSTART-``
line starts a new document, a blank line starts a new sentence, ids are
running cumulative sums (R/data.R:49-79). The Spark version expresses
the same thing declaratively:

- ``spark.read.text(..., wholetext=True)`` reads one row per FILE, and
  a JVM-side split+posexplode assigns exact per-file line numbers — no
  reliance on split ordering, no ``monotonically_increasing_id``;
- doc/sentence ids = ``sum(is_boundary) OVER (PARTITION BY file ORDER
  BY line_no)`` — per-FILE windows, so a many-file corpus parallelizes
  across files instead of funneling through one global sort partition;
  per-file id offsets (a tiny one-row-per-file aggregate, cumulated on
  the driver in file-name order) make doc/sentence ids globally unique
  and deterministic. Parallelism is bounded below by the file count and
  above by the largest single file (wholetext holds one file per row —
  the right trade for token-per-line training corpora, which are many
  bounded files); files over 256 MB fall back to a line-mode scan whose
  per-file window sorts can spill (:func:`_lines_frame`);
- WikiNER's ``token|pos|label`` pipe format (R/data.R:140-145) is the
  same plan with a different separator and an explode of
  space-separated tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: files above this size skip the wholetext fast path (one file = one
#: row = one java String; a multi-GB file would hit the 2 GB string
#: limit and pins the whole file in one task's heap before the explode)
WHOLETEXT_MAX_BYTES = 256 * 1024 * 1024


def _lines_frame(spark, path: str, line_mode: bool | None) -> DataFrame:
    """(file, line_no, line) for every line of every file under ``path``.

    Two physical strategies with identical output ordering semantics
    (``line_no`` is only ever used as a per-file ORDER BY key, so its
    values need to be monotone within a file, not contiguous):

    - **wholetext** (default for bounded files): one row per file,
      JVM-side split+posexplode assigns exact line numbers. Memory is
      bounded by the largest file — fine for token-per-line training
      corpora, fatal for a multi-GB concatenated dump.
    - **line mode** (files over :data:`WHOLETEXT_MAX_BYTES`, or forced
      via ``line_mode=True``): ``spark.read.text`` splits big files
      into many tasks, and ``monotonically_increasing_id()`` taken
      DIRECTLY at scan time (before any shuffle) is monotone within a
      file: the text source generates splits per file in offset order
      and packs them into partitions in that order, so (partition idx
      << 33) + row idx increases along the file. Downstream per-file
      windows can then spill instead of holding a giant string —
      the memory bound drops from max-file-size to a spillable sort.

    ``line_mode=None`` probes file sizes via the binaryFile source
    (content column pruned — a metadata-only scan) and picks
    automatically.
    """
    if line_mode is None:
        mx = (
            spark.read.format("binaryFile").load(path)
            .agg(F.max("length")).first()[0]
        )
        line_mode = (mx or 0) > WHOLETEXT_MAX_BYTES
    if line_mode:
        return spark.read.text(path).select(
            F.input_file_name().alias("file"),
            F.monotonically_increasing_id().alias("line_no"),
            F.col("value").alias("line"),
        )
    return spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"),
        F.posexplode(F.split(F.col("value"), r"\r?\n")).alias(
            "line_no", "line"
        ),
    )


def read_conll(
    spark,
    path: str,
    sep: str = " ",
    columns: tuple[str, ...] = ("token", "pos", "label"),
    docstart: str = "-DOCSTART-",
    line_mode: bool | None = None,
) -> DataFrame:
    """Parse a CoNLL-2002-style file → one row per token with
    (doc_id, sentence_id, token_id, *columns).

    Blank line = sentence boundary; line starting with ``docstart`` =
    document boundary (R/data.R:49-79 semantics, cumulative-sum ids).

    Windows are PER FILE (partitioned by ``input_file_name``): a corpus
    of many files never funnels through a single sort partition. Ids
    stay globally unique via per-file offsets cumulated in file-name
    order (one tiny driver-side aggregation over the file list).

    Cost note: the offsets make the reader EAGER — constructing the
    frame runs one corpus pass (the per-file max/min aggregation), and
    consuming it runs another. Two bounded passes is the deliberate
    trade for deterministic global ids without a single-partition sort;
    training corpora are bounded (train/trainer.py scale note).

    Files larger than :data:`WHOLETEXT_MAX_BYTES` automatically switch
    to a line-mode scan (see :func:`_lines_frame`): same per-file
    windows and offsets, but the file streams through many tasks and
    the window sort can spill instead of one row pinning the whole
    file. ``line_mode`` forces either strategy.
    """
    lines = _lines_frame(spark, path, line_mode)
    w = Window.partitionBy("file").orderBy("line_no")
    df = (
        lines
        .withColumn("is_doc", F.col("line").startswith(docstart).cast("int"))
        .withColumn(
            "is_blank", (F.trim(F.col("line")) == "").cast("int")
        )
        .withColumn("doc_seq", F.sum("is_doc").over(w))
        .withColumn(
            "sent_seq",
            F.sum(F.greatest("is_doc", "is_blank")).over(w),
        )
    )
    toks = df.where((F.col("is_doc") == 0) & (F.col("is_blank") == 0))
    # per-file id offsets: one row per file, cumulated in deterministic
    # file-name order on the driver (file count is bounded; the token
    # stream itself never leaves its per-file partitions). Ranges are
    # computed over TOKEN rows: a file whose content precedes its first
    # boundary line has ids starting at 0, one starting with a boundary
    # at 1 — so each file's offset aligns ITS min id just past the
    # previous file's max id (offsetting by the previous max alone
    # collides whenever a file does not open with a boundary line).
    per_file = sorted(
        (r["file"], int(r["nd"] or 0), int(r["mnd"] or 0),
         int(r["ns"] or 0), int(r["mns"] or 0))
        for r in toks.groupBy("file")
        .agg(
            F.max("doc_seq").alias("nd"), F.min("doc_seq").alias("mnd"),
            F.max("sent_seq").alias("ns"), F.min("sent_seq").alias("mns"),
        )
        .collect()
    )
    if len(per_file) > 1:
        offs = []
        next_d = next_s = None
        for fname, nd, mnd, ns, mns in per_file:
            if next_d is None:
                d_off, s_off = 0, 0  # first file keeps its native ids
            else:
                d_off, s_off = next_d - mnd, next_s - mns
            offs.append((fname, d_off, s_off))
            next_d = d_off + nd + 1
            next_s = s_off + ns + 1
        off_df = F.broadcast(
            spark.createDataFrame(
                offs, "file string, doc_off long, sent_off long"
            )
        )
        toks = toks.join(off_df, "file")
    else:
        toks = toks.withColumn("doc_off", F.lit(0)).withColumn(
            "sent_off", F.lit(0)
        )
    parts = F.split(F.col("line"), F.lit(sep) if sep != "|" else r"\|")
    sel = [
        (F.col("doc_seq") + F.col("doc_off")).alias("doc_id"),
        (F.col("sent_seq") + F.col("sent_off")).alias("sentence_id"),
        F.row_number().over(
            Window.partitionBy("file", "sent_seq").orderBy("line_no")
        ).alias("token_id"),
    ] + [parts.getItem(i).alias(c) for i, c in enumerate(columns)]
    return toks.select(*sel)


def read_wikiner(spark, path: str, line_mode: bool | None = None) -> DataFrame:
    """WikiNER format: one sentence per line, tokens separated by
    spaces, each token ``word|pos|label`` (R/data.R:140-145).

    Same per-file id scheme as :func:`read_conll`: sentence_id = exact
    per-file line number + a per-file offset cumulated in file-name
    order — deterministic, no reliance on split ordering, parallel
    across files. Same large-file fallback too (:func:`_lines_frame`)."""
    lines = _lines_frame(spark, path, line_mode).where(F.trim("line") != "")
    per_file = sorted(
        (r["file"], int(r["n"]))
        for r in lines.groupBy("file")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    offs, acc = [], 0
    for fname, n_lines in per_file:
        offs.append((fname, acc))
        acc += n_lines
    w = Window.partitionBy("file").orderBy("line_no")
    df = lines.withColumn("sent_seq", F.row_number().over(w) - 1)
    if len(per_file) > 1:
        off_df = F.broadcast(
            spark.createDataFrame(offs, "file string, sent_off long")
        )
        df = df.join(off_df, "file")
    else:
        df = df.withColumn("sent_off", F.lit(0))
    tok = df.select(
        (F.col("sent_seq") + F.col("sent_off")).alias("sentence_id"),
        F.posexplode(F.split("line", " ")).alias("pos_idx", "tok"),
    )
    parts = F.split(F.col("tok"), r"\|")
    return tok.select(
        "sentence_id",
        (F.col("pos_idx") + 1).alias("token_id"),
        parts.getItem(0).alias("token"),
        parts.getItem(1).alias("pos"),
        parts.getItem(2).alias("label"),
    )
