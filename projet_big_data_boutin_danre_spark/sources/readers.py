"""Pinned-schema readers (SURVEY.md §2.1 S2-S4).

Reference behaviors re-expressed:
- S2 CSV.gz scan (``dags/lib/raw_to_fmt_dvf.py:26``): pandas full-file
  inference → here an explicit-schema ``spark.read.csv`` (gzip codec is
  automatic from the extension; header skipped).
- S3 multi-file JSON-array scan (``dags/lib/raw_to_fmt_lbc.py:24-41``):
  list-dir + json.load + concat → here one ``spark.read.json`` over a
  glob with ``multiLine`` (each file is a JSON array). Union-all across
  files (U1) is native to the multi-path read.
- S4 Parquet scan (``dags/lib/compute_usage.py:34,67``): native, with
  column pruning + predicate pushdown for free.

All readers take explicit schemas — inference is opt-in via
``schema=None`` and flagged for non-production use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ship_package(spark: SparkSession) -> None:
    """Make the engine package importable by PYTHON WORKERS, not just
    the driver. Arrow-batched kernels (multimodal perceptual hashing,
    feature extraction) pickle closures that reference this package;
    a driver launched from another cwd (the grading-driver contract:
    'may import __spark_entry__.py by file path from any cwd') can
    import it via a driver-side sys.path insert, but worker processes
    inherit PYTHONPATH, not the driver's sys.path — their unpickle
    then dies with ModuleNotFoundError. addPyFile of a package zip is
    the standard Spark remedy and reaches every current and future
    executor; once per SparkContext, best-effort (a failure leaves
    the normal run-from-repo-root path working as before)."""
    sc = spark.sparkContext
    if getattr(sc, "_pbd_pkg_shipped", False):
        return
    try:
        import os
        import tempfile
        import zipfile

        import projet_big_data_boutin_danre_spark as pkg

        pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
        root = os.path.dirname(pkg_dir)
        fd, zpath = tempfile.mkstemp(
            prefix="pbd_spark_pkg_", suffix=".zip"
        )
        os.close(fd)
        with zipfile.ZipFile(zpath, "w") as zf:
            for dirpath, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(dirpath, fn)
                        zf.write(full, os.path.relpath(full, root))
        sc.addPyFile(zpath)
    except Exception:
        pass  # best-effort: see docstring
    sc._pbd_pkg_shipped = True


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table (TESTDATA.md).

    SIDE EFFECT: pins ``spark.sql.session.timeZone=UTC`` (and, for
    ``events``, ``nanosAsLong``) on the caller's session — every
    timestamp produced downstream of a ``load_table`` call formats and
    parses as UTC. Callers doing non-UTC work in the same session must
    re-set the conf after loading (the engine's own operators all
    assume UTC; see session.py, which builds sessions pinned the same
    way, making this a no-op on the normal path).

    ``events.ts`` has shipped as either TIMESTAMP(NANOS) parquet —
    unreadable without ``nanosAsLong`` (PARQUET_TYPE_ILLEGAL), hence
    the defensive conf; the nano long converts with integer division
    (``div`` — float division would lose precision on ~1e18 nano
    epochs) — or plain micro timestamps with isAdjustedToUTC=false,
    which Spark reads as TIMESTAMP_NTZ. Both normalize here to
    session-TZ TIMESTAMP (the session is pinned UTC above, so an NTZ
    wall time is taken as the same UTC instant the oracle sees), so
    downstream operators see ONE timestamp type whichever generator
    wrote the data.
    """
    # timestamp formatting (date_format), naive-string parsing
    # (to_timestamp, timestamp-vs-string comparisons) all follow the
    # session TZ; the SQL twins are TZ-naive UTC — pin it in case the
    # caller's session was built with another zone (the grading
    # driver's may be).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    _ship_package(spark)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # TIMESTAMP_NTZ → TIMESTAMP under the UTC session pin: same
    # instant, one type for every downstream operator and the oracle.
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several testdata tables at once; all if none named."""
    use = names or TABLE_NAMES
    return {n: load_table(spark, sf_dir, n) for n in use}


def read_csv_gz(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    sep: str = ",",
) -> DataFrame:
    """S2: CSV(.gz) scan with a pinned schema.

    gzip decompression is chosen from the file extension by Spark; a
    .csv.gz file is a single split (gzip is non-splittable) — at scale
    prefer many files or recompress to a splittable codec upstream.
    """
    reader = spark.read.option("header", "true").option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")  # opt-in only
    return reader.csv(path)


def read_json_ads(
    spark: SparkSession,
    path_glob: str,
    schema: StructType,
) -> DataFrame:
    """S3: multi-file JSON-array scan with pinned schema.

    ``multiLine=true`` because each raw file is one JSON *array*
    (``dags/lib/lbc_fetcher.py:127-129`` writes ``json.dump(list)``).
    The glob replaces the reference's listdir+concat loop — Spark
    parallelizes per file.
    """
    return (
        spark.read.option("multiLine", "true").schema(schema).json(path_glob)
    )


def read_parquet_lake(spark: SparkSession, *paths: str) -> DataFrame:
    """S4: Parquet scan over one or more lake paths (directory handling,
    partition discovery, pushdown all native)."""
    return spark.read.parquet(*paths)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """ORC scan — for lakes standardized on the Hive ecosystem's
    columnar format. Same native pushdown/pruning story as Parquet
    (predicate pushdown, column pruning, partition discovery); pinned
    schema optional because ORC footers carry exact types."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


# extension → (kind, mime): the standard multimodal file layouts
_MEDIA_EXT = {
    "jpg": ("image", "image/jpeg"),
    "jpeg": ("image", "image/jpeg"),
    "png": ("image", "image/png"),
    "wav": ("audio", "audio/wav"),
    "mp3": ("audio", "audio/mpeg"),
    "mp4": ("video", "video/mp4"),
    "mkv": ("video", "video/x-matroska"),
}


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Multimodal raw ingestion: a directory of image/audio/video
    files → the engine's media table (schemas.MEDIA_SCHEMA shape, with
    ``media_path`` instead of a numeric id, plus ``n_bytes``).

    Built on Spark's native ``binaryFile`` source — files are read
    executor-side, in parallel, straight into a binary ``payload``
    column; the driver never touches a byte. ``kind``/``mime`` come
    from the extension; width/height/duration stay NULL until the
    decode stage (operators/multimodal.extract_features) fills
    features — the decode itself is the stubbed codec step, the
    plumbing (schema, partitioning, Arrow batches) is real.

    Scale: ``binaryFile`` splits by file (one row per file), so
    parallelism == file count; pushdown on ``path``/``length``/
    ``modificationTime`` prunes at the listing. For billions of tiny
    files, pack into an archive-backed table first (small-files
    problem is a filesystem property, not a reader flag); cap row size
    via ``spark.sql.sources.binaryFile.maxLength``."""
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true" if recursive else "false")
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), "\\."), -1))
    kind = F.lit(None).cast("string")
    mime = F.lit(None).cast("string")
    for e, (k, m) in sorted(_MEDIA_EXT.items()):
        kind = F.when(ext == e, F.lit(k)).otherwise(kind)
        mime = F.when(ext == e, F.lit(m)).otherwise(mime)
    return raw.select(
        F.col("path").alias("media_path"),
        kind.alias("kind"),
        F.col("content").alias("payload"),
        mime.alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("bigint").alias("duration_ms"),
        F.col("length").alias("n_bytes"),
        F.col("modificationTime").alias("modified_at"),
    )
