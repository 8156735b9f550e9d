"""SparkSession builder with scale-appropriate defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "crfsuite_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    # Python workers inherit this env (set before the JVM spawns them).
    # The decode/train UDFs allocate multi-MB numpy tensors per Arrow
    # batch; with glibc's default mmap threshold every batch becomes an
    # mmap/munmap pair, and with many workers on one host the concurrent
    # first-touch page faults serialize in the kernel (measured: 4x
    # slowdown at 32 workers). Keeping large allocations on the heap
    # (high mmap threshold, lazy trim) lets workers reuse pages.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "268435456")
    # one BLAS thread per worker: Spark already runs one worker per core,
    # so threaded numpy matmuls would oversubscribe the host
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        # 10 MB default is calibrated for small executors; at 4+ GB per
        # core a 64 MB dictionary/shingle table is still a cheap
        # broadcast and saves a sort-merge shuffle of the big side
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # InferFiltersFromGenerate adds a size(arr) > 0 filter under
        # every explode; predicate pushdown then substitutes the alias
        # chain into that filter, re-inlining the array-builder with the
        # tokenizer INSIDE the per-element lambda — O(elements × subtree)
        # per row (measured: explode of staged word 8-grams 34.9 s → 6.7 s
        # at sf1.0 with the rule off). The filter is purely an early-skip
        # (explode drops empty/null arrays regardless), so results are
        # identical; scale-independent, not a local[32] tune.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # collect_list/min_by groupBys (span/substr dedup canonical-
        # occurrence cut, turn packing) aggregate over millions of
        # uniform hash keys; the default 128-key fallback turns every
        # such ObjectHashAggregate into a full SortAggregate (sorting
        # the corpus token stream by 32-char digests). 1M keys/task keeps
        # the hash path up to ~sf30 partition sizes while bounding
        # worst-case per-task buffer memory (~100 MB at our key widths);
        # past it the sort-based fallback still spills gracefully.
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
                "1048576")
        # scan parallelism floor: maxSplitBytes = min(maxPartitionBytes,
        # max(openCostInBytes, bytes/minPartitionNum)) — the 4 MB default
        # openCost models spinning-disk seek+open and FLOORS every split
        # at 4 MB, so a compact table (one 5.7 MB zstd file at sf1.0)
        # scans as 2 splits and the whole per-document pipeline runs on
        # 2 of 32 cores (measured: the substr_dedup window build sat at
        # 2-way parallelism). 128 KB matches NVMe/page-cache open cost;
        # large files still split at bytes/minPartitionNum, so cluster-
        # scale scans keep their 128 MB-1 GB splits. Env-overridable for
        # deployments on high-latency object stores.
        .config("spark.sql.files.openCostInBytes",
                os.environ.get("SPARK_GRAFT_OPEN_COST", "131072"))
        # propagate the allocator tuning to executor-spawned workers on
        # real clusters too (local mode inherits via os.environ above)
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", "1073741824")
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", "268435456")
    )
    # single-host only: back shuffle files with tmpfs so the one local
    # disk doesn't serialize what a cluster spreads over N machines'
    # disks+network (a real deployment leaves spark.local.dir alone).
    # Guarded: only when tmpfs has real headroom (shuffle spill on a
    # nearly-full /dev/shm would OOM the host instead of spilling to
    # disk), and SPARK_GRAFT_SHM=0 / SPARK_LOCAL_DIRS opt out entirely.
    if (
        os.environ.get("SPARK_GRAFT_SHM", "1") != "0"
        and "SPARK_LOCAL_DIRS" not in os.environ
        and os.path.isdir("/dev/shm")
    ):
        try:
            st = os.statvfs("/dev/shm")
            free_bytes = st.f_bavail * st.f_frsize
        except OSError:
            free_bytes = 0
        if free_bytes >= 8 * 1024**3:  # ≥ 8 GiB headroom
            shm = "/dev/shm/spark-local"
            os.makedirs(shm, exist_ok=True)
            builder = builder.config("spark.local.dir", shm)
            # Measured, NOT applied: disabling lz4 shuffle compression
            # on this tmpfs dir helps small shuffles (substr_dedup warm
            # 4.7-5.3 s → 3.8-3.9 s at sf1.0 — framing is pure CPU when
            # bytes never touch disk/NIC) but HURTS GB-scale shuffles
            # (sf10 minhash 29.8 s → 35.9 s: uncompressed blocks cost
            # 3-4× the memory bandwidth and tmpfs residency). Compression
            # stays on because the win must hold at both scales.
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
