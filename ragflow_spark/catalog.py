"""Table catalog: Iceberg when the runtime is on the classpath,
parquet directories otherwise — one flag, same call sites.

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

import re

from pyspark.sql import DataFrame, SparkSession

_IDENT_OK = re.compile(r"[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*$")
_IDENT_BAD = re.compile(r"[^A-Za-z0-9_]")


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:  # noqa: BLE001 - any classloading failure -> absent
        return False


class Catalog:
    """format='auto' resolves to iceberg when the runtime is present."""

    def __init__(self, spark: SparkSession, fmt: str = "auto", catalog_name: str = "lake"):
        if fmt == "auto":
            fmt = "iceberg" if iceberg_available(spark) else "parquet"
        self.spark = spark
        self.fmt = fmt
        self.catalog_name = catalog_name

    def _ident(self, table: str) -> str:
        """Valid Iceberg identifier for either a plain table name or a
        filesystem path.  PipelineConfig hands us paths like
        ``/tmp/out/chunks``; mapping the FULL path (every component,
        non-identifier chars -> ``_``) keeps distinct directories
        mapped to distinct tables deterministically."""
        if _IDENT_OK.fullmatch(table):
            return f"{self.catalog_name}.{table}"
        parts = [p for p in table.replace("\\", "/").split("/") if p]
        name = "_".join(_IDENT_BAD.sub("_", p) for p in parts) or "t"
        if name[0].isdigit():
            name = "t_" + name
        return f"{self.catalog_name}.{name}"

    def read(self, table_or_path: str) -> DataFrame:
        if self.fmt == "iceberg":
            return self.spark.read.format("iceberg").load(self._ident(table_or_path))
        return self.spark.read.parquet(table_or_path)

    def append(self, df: DataFrame, table_or_path: str, codec: str | None = None) -> None:
        if self.fmt == "iceberg":
            df.writeTo(self._ident(table_or_path)).append()
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
        table creation, not per write — the parameter is parquet-only."""
        if self.fmt == "iceberg":
            df.writeTo(self._ident(table_or_path)).overwritePartitions()
        else:
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            w = df.write.mode("overwrite")
            if codec:
                w = w.option("compression", codec)
            w.partitionBy(partition_col).parquet(table_or_path)
