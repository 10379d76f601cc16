"""Table catalog: Iceberg when a catalog is configured and the runtime
is on the classpath, parquet directories otherwise — one flag, same
call sites.

The north rule targets Iceberg tables (`pages`, `chunks`, the resume
manifest).  This sandbox has no iceberg-spark-runtime jar, so the
catalog probes for it at session time and transparently falls back to
plain parquet paths; every reader/writer in the engine goes through
these helpers, so flipping to Iceberg on a real cluster is
configuration, not code:

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<v> \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=hadoop \
      --conf spark.sql.catalog.lake.warehouse=<path> ...

Iceberg-mode upgrades the engine gets for free once active:
* MERGE INTO for idempotent chunk upserts (instead of dynamic
  partition overwrite per bucket);
* snapshot isolation for the manifest (instead of append + read);
* hidden partitioning (`bucket(N, url)`) replacing our explicit
  bucket column;
* partition/file pruning from table metadata.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame, SparkSession

_IDENT_OK = re.compile(r"[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*$")
_IDENT_BAD = re.compile(r"[^A-Za-z0-9_]")


def iceberg_available(spark: SparkSession, catalog_name: str = "lake") -> bool:
    """True only when Iceberg writes through ``<catalog_name>.<table>``
    identifiers can actually work: the catalog must be CONFIGURED on
    the session (``spark.sql.catalog.<name>``) and the runtime class
    loadable.  The class probe goes through Spark's own Utils
    (context/Spark classloader) because ``--packages``/``--jars`` jars
    land in Spark's MutableURLClassLoader, which the py4j gateway's
    ``java.lang.Class.forName`` (system classloader) cannot see — the
    naive probe silently reported Iceberg absent on clusters launched
    exactly as the module docstring prescribes."""
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog_name}", None)
    except Exception:  # noqa: BLE001
        impl = None
    if not impl:
        return False
    for probe in (
        lambda: spark._jvm.org.apache.spark.util.Utils.classForName(
            "org.apache.iceberg.spark.SparkCatalog", False, False
        ),
        lambda: spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        ),
    ):
        try:
            probe()
            return True
        except Exception:  # noqa: BLE001 - try the next loader
            continue
    return False


class Catalog:
    """format='auto' resolves to iceberg when the runtime is present."""

    def __init__(self, spark: SparkSession, fmt: str = "auto", catalog_name: str = "lake"):
        if fmt == "auto":
            fmt = "iceberg" if iceberg_available(spark, catalog_name) else "parquet"
        self.spark = spark
        self.fmt = fmt
        self.catalog_name = catalog_name

    def _ident(self, table: str) -> str:
        """Valid Iceberg identifier for either a plain table name or a
        filesystem path.  PipelineConfig hands us paths like
        ``/tmp/out/chunks``; the readable part maps every path
        component (non-identifier chars -> ``_``) and a short content
        hash of the ORIGINAL string keeps distinct directories mapped
        to distinct tables — '_'-folding alone is not injective
        ('/tmp/out-2/x' and '/tmp/out_2/x' would share a table and
        silently mix two pipelines' data)."""
        if _IDENT_OK.fullmatch(table):
            return f"{self.catalog_name}.{table}"
        parts = [p for p in table.replace("\\", "/").split("/") if p]
        name = "_".join(_IDENT_BAD.sub("_", p) for p in parts) or "t"
        if name[0].isdigit():
            name = "t_" + name
        tag = hashlib.md5(table.encode("utf-8")).hexdigest()[:8]
        return f"{self.catalog_name}.{name}_{tag}"

    def _table_exists(self, ident: str) -> bool:
        try:
            return self.spark.catalog.tableExists(ident)
        except Exception:  # noqa: BLE001 - treat catalog errors as absent
            return False

    def read(self, table_or_path: str) -> DataFrame:
        if self.fmt == "iceberg":
            return self.spark.read.format("iceberg").load(self._ident(table_or_path))
        return self.spark.read.parquet(table_or_path)

    def append(self, df: DataFrame, table_or_path: str, codec: str | None = None) -> None:
        if self.fmt == "iceberg":
            ident = self._ident(table_or_path)
            # DataFrameWriterV2.append() requires an existing table —
            # nothing else ever CREATEs it, so the first write on a
            # fresh warehouse must (NoSuchTableException otherwise)
            if not self._table_exists(ident):
                w = df.writeTo(ident).using("iceberg")
                if codec:
                    w = w.tableProperty("write.parquet.compression-codec", codec)
                w.create()
            else:
                df.writeTo(ident).append()
        else:
            w = df.write.mode("append")
            if codec:
                w = w.option("compression", codec)
            w.parquet(table_or_path)

    def overwrite_partitions(
        self,
        df: DataFrame,
        table_or_path: str,
        partition_col: str,
        codec: str | None = None,
    ) -> None:
        """Idempotent per-partition commit: Iceberg overwritePartitions,
        parquet dynamic partition overwrite.

        ``codec`` sets the parquet compression per write (A/B at 100k
        pages: zstd chunks are 27% smaller than snappy at equal wall —
        BENCH.md r4; at corpus scale output bytes ARE the write cost on
        network-attached storage).  On the Iceberg path compression is
        a table property (``write.parquet.compression-codec``) set at
        table creation, not per write."""
        if self.fmt == "iceberg":
            from pyspark.sql import functions as F

            ident = self._ident(table_or_path)
            if not self._table_exists(ident):
                # first commit creates the table partitioned by the
                # commit column, so later overwritePartitions calls
                # replace exactly one bucket's files
                w = df.writeTo(ident).using("iceberg").partitionedBy(
                    F.col(partition_col)
                )
                if codec:
                    w = w.tableProperty("write.parquet.compression-codec", codec)
                w.create()
            else:
                df.writeTo(ident).overwritePartitions()
        else:
            conf = self.spark.conf
            key = "spark.sql.sources.partitionOverwriteMode"
            prev = conf.get(key, None)
            conf.set(key, "dynamic")
            try:
                w = df.write.mode("overwrite")
                if codec:
                    w = w.option("compression", codec)
                w.partitionBy(partition_col).parquet(table_or_path)
            finally:
                # never leak dynamic-overwrite into the caller's
                # session: a later plain partitioned overwrite would
                # silently keep stale partitions instead of truncating
                if prev is None:
                    conf.unset(key)
                else:
                    conf.set(key, prev)
