"""SparkSession helpers tuned for this engine.

Local-mode defaults mirror what we'd set on a real cluster: AQE on (skew-join
splitting + partition coalescing), Arrow enabled for the pandas-UDF hot path,
shuffle partitions sized to cores (the build job re-partitions explicitly
where it matters).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cgroup_limit_bytes() -> float:
    """Container memory limit (cgroup v2 then v1), inf if unlimited.
    /proc/meminfo is NOT cgroup-aware — sizing from it alone would hand a
    --memory=8g container a 24g heap that gets OOM-killed mid-job."""
    for p in ("/sys/fs/cgroup/memory.max",
              "/sys/fs/cgroup/memory/memory.limit_in_bytes"):
        try:
            with open(p) as f:
                v = f.read().strip()
            if v != "max" and int(v) < (1 << 50):  # v1 reports ~2^63 for inf
                return float(v)
        except (OSError, ValueError):
            continue
    return float("inf")


def _default_driver_mem() -> str:
    """min(24g, ~70% of min(host MemAvailable, cgroup limit)), floor 4g:
    32 task slots reading list columns need GBs of columnar-reader vectors
    (8g OOMed a 9.6M-doc build), but a fixed 24g would fail on smaller or
    cgroup-limited hosts where 8g previously worked. SPARK_GRAFT_DRIVER_MEM
    overrides."""
    try:
        with open("/proc/meminfo") as f:
            kib = {l.split(":")[0]: int(l.split()[1]) for l in f
                   if l.split(":")[0] in ("MemTotal", "MemAvailable")}
        avail = kib.get("MemAvailable", kib.get("MemTotal", 0)) * 1024.0
        avail_g = min(avail, _cgroup_limit_bytes()) / (1 << 30)
        return f"{max(4, min(24, int(avail_g * 0.7)))}g"
    except Exception:
        return "8g"


def get_spark(app: str = "pysearchlite_spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or \
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1:master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(8, int(n))
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 2048-row Arrow batches: pandas-UDF stages allocate O(batch) Python
        # objects; small batches keep each worker inside its warm pymalloc
        # arenas instead of growing the heap per batch. On this
        # memory-overcommitted VM first-touch pages cost ~1000x a warm
        # allocation (measured: the SAME tokenize stage ran 24s with 10k-row
        # batches vs 3.4s with 2048-row batches at local[8]); on real
        # hardware small batches still win by bounding UDF peak memory.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("SPARK_GRAFT_ARROW_BATCH", "2048"))
        # smaller input splits so single-digit-GB intermediate tables still
        # produce >= 2 tasks/core (default 128m capped a 400MB staged table
        # at 8 map tasks, starving the big exchange at high parallelism);
        # on a real cluster with TB inputs the default is fine — override
        # via SPARK_GRAFT_MAX_PARTITION_BYTES
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "33554432"))
        # local mode: the driver JVM IS the executor — size the heap for the
        # task-slot count (32 threads reading list columns need GBs of
        # columnar-reader vectors alone; 8g measurably OOMed a 9.6M-doc
        # build). On a real cluster this maps to executor memory instead.
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM")
                or _default_driver_mem())
        # whole-index preload (the reference's mmap-residency analogue)
        # collects the packed postings table; the 1g default rejects
        # multi-GB indexes the heap can easily hold
        .config("spark.driver.maxResultSize",
                os.environ.get("SPARK_GRAFT_MAX_RESULT", "8g"))
        .config("spark.ui.enabled", "false")
        # batch harnesses (bench.py) disable the console progress bar so
        # their machine-parsed output tail can't be interleaved with \r bars
        .config("spark.ui.showConsoleProgress",
                os.environ.get("SPARK_GRAFT_CONSOLE_PROGRESS", "true"))
        .config("spark.sql.session.timeZone", "UTC")
    )
    # shuffle/spill scratch space. On a real cluster each executor has its
    # own local disks, so aggregate shuffle bandwidth scales with the node
    # count; this single-VM sandbox has ONE virtual disk shared by all 32
    # task slots, which caps the write phase's parallel speedup. Pointing
    # local.dir at a RAM-backed path (e.g. /dev/shm/spark-local) restores
    # the per-core-balanced I/O assumption for scaling measurements.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        b = b.config("spark.local.dir", local_dir)
    return b.getOrCreate()
