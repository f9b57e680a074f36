"""Object-store I/O layer (reference S3_interact.py:34-109: list
objects with prefix/suffix filter, CSV/parquet put/get).

Spark-first: there is no "S3 client" in a Spark pipeline — object
stores are just Hadoop filesystems behind a path scheme, and every
reader/sink in this package already takes a path.  What a real
deployment needs on top, and what this module provides:

* **Path-scheme normalization** — `s3://` → `s3a://` (S3A is the
  maintained Hadoop connector; `s3`/`s3n` are legacy) so code written
  against reference-style URLs runs unchanged.
* **Session configuration** — the S3A committer settings.  A plain
  `FileOutputCommitter` on S3 relies on directory rename, which an
  object store fakes as copy+delete: slow and non-atomic (the classic
  task-commit data-loss window).  The "magic" committer (or
  "directory" staging committer) writes task output as uncommitted
  multipart uploads and completes them at job commit — atomic and
  rename-free.  These keys are plain public Hadoop/Spark settings.
* **Listing** — prefix/suffix-filtered object listing via the Hadoop
  FS API (reference S3_interact.py:34-47), which works identically on
  `file://`, `hdfs://`, and `s3a://`, so it is testable locally.

No AWS SDK jars ship in this container; the conf helpers are pure
dictionaries (verifiable in tests), and `list_objects` runs against
any configured filesystem.
"""

from __future__ import annotations

from urllib.parse import urlparse

from pyspark.sql import SparkSession

# Schemes with object-store (no-atomic-rename) semantics.
OBJECT_STORE_SCHEMES = frozenset(
    {"s3", "s3a", "s3n", "gs", "abfs", "abfss", "oss", "wasb", "wasbs"}
)

_LEGACY_S3 = {"s3": "s3a", "s3n": "s3a"}


def is_object_store_path(path: str) -> bool:
    """True when `path` lives on a store where rename is copy+delete —
    the signal to route writes through a committer / table format
    instead of operators/compaction.atomic_replace (which documents
    the same caveat)."""
    return urlparse(path).scheme.lower() in OBJECT_STORE_SCHEMES


def normalize_path(path: str) -> str:
    """Rewrite legacy `s3://`/`s3n://` URLs to `s3a://` so
    reference-style paths (S3_interact.py used boto3 `s3://` URLs)
    address the maintained Hadoop connector."""
    scheme = urlparse(path).scheme.lower()
    if scheme in _LEGACY_S3:
        return _LEGACY_S3[scheme] + path[len(scheme):]
    return path


def s3a_session_confs(
    committer: str = "magic",
    endpoint: str | None = None,
    path_style_access: bool = False,
    max_connections: int = 96,
) -> dict[str, str]:
    """Spark conf map for correct + fast S3A I/O.  Apply at session
    build time (`for k, v in s3a_session_confs().items():
    builder.config(k, v)`); committer settings are read at write time
    by the cloud commit protocol classes (bundled with Spark's
    hadoop-cloud profile).
    """
    confs = {
        # -- committer: atomic job commit without renames ------------------
        "spark.hadoop.fs.s3a.committer.name": committer,
        "spark.hadoop.mapreduce.outputcommitter.factory.scheme.s3a": (
            "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory"
        ),
        "spark.sql.sources.commitProtocolClass": (
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
        ),
        "spark.sql.parquet.output.committer.class": (
            "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
        ),
        # -- throughput ----------------------------------------------------
        "spark.hadoop.fs.s3a.connection.maximum": str(max_connections),
        "spark.hadoop.fs.s3a.threads.max": str(max_connections),
        "spark.hadoop.fs.s3a.fast.upload": "true",
        # Random-access read policy: parquet/ORC footer+column reads seek
        # heavily; 'normal' adapts from sequential to random on first seek.
        "spark.hadoop.fs.s3a.experimental.input.fadvise": "normal",
        # Listing scale: incremental (paged) listings keep driver memory
        # bounded on multi-million-object prefixes.
        "spark.hadoop.fs.s3a.paging.maximum": "5000",
    }
    if committer == "magic":
        confs["spark.hadoop.fs.s3a.committer.magic.enabled"] = "true"
    if endpoint:
        # Non-AWS endpoints (MinIO, Ceph RGW) usually need both.
        confs["spark.hadoop.fs.s3a.endpoint"] = endpoint
        confs["spark.hadoop.fs.s3a.path.style.access"] = "true"
    elif path_style_access:
        confs["spark.hadoop.fs.s3a.path.style.access"] = "true"
    return confs


def list_objects(
    spark: SparkSession,
    path: str,
    suffix: str | None = None,
    recursive: bool = True,
) -> list[dict]:
    """S10: object listing + filter (reference S3_interact.py:34-47's
    list_objects_v2 + suffix filter), via the Hadoop FS API so one code
    path serves file://, hdfs://, and s3a://.

    Returns [{path, size, mtime}] sorted by path.  Driver-side by
    design: listings feed ledgers and globs (small); bulk data never
    moves through this function.
    """
    path = normalize_path(path)
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    out: list[dict] = []
    it = fs.listFiles(hpath, recursive)
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue  # commit markers / hidden files
        if suffix is not None and not p.endswith(suffix):
            continue
        out.append({"path": p, "size": st.getLen(), "mtime": st.getModificationTime()})
    return sorted(out, key=lambda d: d["path"])
