"""The extraction job: pages -> extracted + chunks, resumable.

Restates the reference's ingest pipeline (SURVEY.md §3.1) as one Spark
job.  Scale design (100 TB / 10^12 rows):

* **Partitioning** — work is split into ``n_buckets`` url-hash buckets
  (``pmod(xxhash64(url), B)``), the Spark analogue of the reference's
  doc->task split (api/db/services/task_service.py:337-366).  Hashing
  full urls spreads even a viral host's pages uniformly, and AQE handles
  residual size skew; giant single documents are bounded by an html
  byte cap (reference caps at 128 MB, rag/settings.py:58).
* **Checkpoint / lineage** — each bucket commits independently: output
  is written with dynamic partition overwrite keyed by ``bucket``, then
  a manifest row (bucket, counts, bytes, wall time, status) is appended.
  On restart, committed buckets are anti-joined away (the reference's
  digest/reuse logic, task_service.py:370-455); a bucket interrupted
  mid-write is simply overwritten — idempotent, no dupes, no holes.
* **No driver-side loops over rows** — the driver iterates over bucket
  *ids* only (B is O(thousands) at full scale, same order as the
  manifest itself).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.accumulators import AccumulatorParam
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .udfs import CHUNKS_SCHEMA, EXTRACTED_SCHEMA, extract_batches, make_chunk_batches

MAX_HTML_BYTES = 128 * 1024 * 1024  # parity: rag/settings.py:58


class _ModeStatsParam(AccumulatorParam):
    """Merges ``{bucket: [n_pdf, n_pdf_fallback, n_extract_err]}``
    dicts from the chunker UDF (udfs.make_chunk_batches) so the
    manifest can record the PDF interpreter-fallback rate per bucket
    (VERDICT r3 #3: a corpus-scale interpreter regression must not
    silently degrade extraction to the legacy scanner / ``text``
    column).  n_extract_err counts extraction crashes of ANY document
    type separately — folding them into n_pdf_fallback made the ratio
    exceed 100% on buckets where HTML rows degraded, masquerading an
    HTML regression as a PDF one.  At-least-once under task retries —
    a monitoring signal, not an exact count."""

    def zero(self, value):
        return {}

    def addInPlace(self, a, b):
        for k, v in b.items():
            cur = a.get(k)
            if cur is None:
                a[k] = list(v)
            else:
                for i in range(len(v)):
                    cur[i] += v[i]
        return a


@dataclass
class PipelineConfig:
    out_dir: str
    template: str = "naive"
    budget: int = 128
    delimiters: str = "\n!?。；！？"
    n_buckets: int = 8
    tokenize: bool = True
    buckets_per_commit: int = 4  # group buckets per write to bound job count
    # bound the number of commit groups per run: each group is one full
    # pass over the (staged) input, so unbounded group counts turn a
    # 4096-bucket corpus into thousands of jobs.  0 disables the bound.
    max_commit_groups: int = 8
    # stage the input once, partitioned by url-hash bucket, so every
    # group's read partition-prunes to exactly its buckets instead of
    # re-scanning the whole table (the bucket column is computed, so an
    # unpartitioned source can never prune it)
    stage_input: bool = True
    # parquet codec for the chunk output (and the staged input): zstd
    # writes 27% fewer bytes than snappy at equal wall time on this
    # corpus (A/B at 100k pages, BENCH.md r4) — at 10^12 rows output
    # bytes are the write cost.  None = session default.
    codec: str | None = "zstd"
    extra: dict = field(default_factory=dict)

    @property
    def chunks_dir(self) -> str:
        return os.path.join(self.out_dir, "chunks")

    @property
    def extracted_dir(self) -> str:
        return os.path.join(self.out_dir, "extracted")

    @property
    def manifest_dir(self) -> str:
        return os.path.join(self.out_dir, "manifest")


def with_bucket(pages: DataFrame, n_buckets: int) -> DataFrame:
    """Url-hash bucketing (the north-rule partitioning).

    Hashing the FULL url — not the host — is itself the skew defence:
    a crawl's heaviest host (e.g. millions of wikipedia.org pages)
    spreads uniformly across all buckets instead of concentrating in
    one, so no explicit salting column is needed at this layer.  The
    stage write additionally sub-splits every bucket by a second url
    hash (see run_pipeline), which is the salting knob if a deployment
    ever buckets by host for locality."""
    return pages.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int")
    )


def committed_buckets(
    spark: SparkSession,
    cfg: PipelineConfig,
    catalog=None,
    input_fp: str | None = None,
) -> set[int]:
    """Buckets safely skippable on resume.

    Two lineage guards (both recorded per manifest row):

    * a manifest written under a DIFFERENT ``n_buckets`` raises —
      bucket 3 of 64 holds different urls than bucket 3 of 32, so
      silently intersecting the two numberings loses pages (holes)
      and leaves stale chunk partitions (dupes).  The caller must
      rerun with the same --buckets or a fresh --out.
    * a row whose ``input_fp`` differs from the current input's is NOT
      counted done: the bucket's committed chunks came from another
      file set, so it re-runs and its partition is overwritten —
      correct output instead of silent cross-input mixing.  Rows with
      an empty fp (non-file-backed inputs) keep the legacy behavior.
    """
    try:
        manifest = (
            catalog.read(cfg.manifest_dir)
            if catalog is not None
            else spark.read.parquet(cfg.manifest_dir)
        )
        rows = manifest.where(F.col("status") == "done").collect()
    except Exception:
        return set()
    for r in rows:
        nb = r["n_buckets"] if "n_buckets" in manifest.columns else None
        if nb is not None and int(nb) != cfg.n_buckets:
            raise ValueError(
                f"resume mismatch: manifest at {cfg.manifest_dir} was "
                f"written with n_buckets={nb}, this run uses "
                f"{cfg.n_buckets}; rerun with --buckets {nb} or a fresh "
                "--out"
            )
    done = set()
    for r in rows:
        row_fp = r["input_fp"] or ""
        if input_fp and row_fp and row_fp != input_fp:
            continue  # committed from a different input: re-run it
        done.add(r["bucket"])
    return done


def _append_manifest(
    spark: SparkSession, cfg: PipelineConfig, rows: list[dict], catalog=None
) -> None:
    schema = (
        "bucket int, status string, n_pages long, n_chunks long, "
        "bytes_in long, n_pdf long, n_pdf_fallback long, "
        "n_extract_err long, "
        "wall_sec double, ts double, input_fp string, n_buckets int"
    )
    df = spark.createDataFrame(rows, schema=schema).coalesce(1)
    if catalog is not None:
        catalog.append(df, cfg.manifest_dir, codec=cfg.codec)
    else:
        w = df.write.mode("append")
        if cfg.codec:
            w = w.option("compression", cfg.codec)
        w.parquet(cfg.manifest_dir)


def _prune_for_udf(pages: DataFrame, keep_cols: tuple = ()) -> DataFrame:
    """JVM-side projection in front of the Python stage.

    The ``text`` column is only ever consulted when ``html`` is absent
    or is a PDF whose text extraction may fail (spark/udfs.py,
    ``extract_document``), so for ordinary HTML rows it is nulled out
    before crossing Arrow — roughly halving UDF input bytes at corpus
    scale.  The html byte cap mirrors the reference's 128 MB doc limit.
    ``keep_cols`` carries extra columns (e.g. ``bucket``) through.
    """
    # conservative: keeping text is always safe (nulling is purely an
    # IPC optimization), so match any %PDF- in the head — this covers
    # whitespace-prefixed PDFs, which sniff_doc_type lstrips for
    keep_text = (
        F.col("html").isNull()
        | (F.length("html") == 0)
        | (F.instr(F.substring(F.col("html").cast("string"), 1, 64), "%PDF-") > 0)
    )
    return pages.select(
        *keep_cols,
        "url",
        "html",
        F.when(keep_text, F.col("text")).alias("text"),
        "lang",
    ).where(F.coalesce(F.length("html"), F.lit(0)) <= MAX_HTML_BYTES)


STAGE_MARKER = "_RAGFLOW_STAGED"


def _input_fingerprint(pages: DataFrame, spark: SparkSession | None = None) -> str | None:
    """Fingerprint of the input's backing file set (None if not
    file-backed).  Cheap — driver-side metadata only, no job.  Used to
    gate stage reuse on resume: same files => same staged buckets.

    Beyond the sorted path list, the fingerprint folds in each unique
    parent directory's content summary (total bytes + file count) and
    its modification time, so an input rewritten *in place* with
    identical file names (e.g. a deterministic part-00000 naming
    scheme) still changes the fingerprint.  One FS call per parent
    directory, not per file — O(1) for the common single-dir input."""
    import hashlib

    try:
        files = sorted(pages.inputFiles())
    except Exception:
        return None
    if not files:
        return None
    h = hashlib.md5("\n".join(files).encode())
    if spark is not None:
        try:
            parents = sorted({f.rsplit("/", 1)[0] for f in files})
            for p in parents:
                jpath, fs = _hadoop_path(spark, p)
                summ = fs.getContentSummary(jpath)
                st = fs.getFileStatus(jpath)
                h.update(
                    f"|{p}:{summ.getLength()}:{summ.getFileCount()}:"
                    f"{st.getModificationTime()}".encode()
                )
        except Exception:
            return None  # can't verify contents -> never trust a stale stage
    # fold in a normalized logical-plan hash: the file set alone
    # cannot distinguish `read.parquet(p)` from `read.parquet(p)
    # .where(bucket == 0)` — a partial-input run would then mark its
    # pageless buckets done and a later full-input resume would trust
    # them (silent holes).  The ANALYZED plan string with expression
    # ids (#123) stripped is stable across sessions (verified: two
    # fresh JVMs hash identical plans identically), unlike
    # semanticHash(), whose value embeds the session's FileIndex and
    # changes on every restart — using it silently disabled
    # cross-invocation resume (caught by a back-to-back spark-submit
    # pair re-processing all 16 buckets).
    try:
        import re as _re

        plan = pages._jdf.queryExecution().analyzed().toString()
        h.update(_re.sub(r"#\d+L?", "#", plan).encode())
    except Exception:
        return None  # can't verify lineage -> never trust a stale stage
    return h.hexdigest()


def _hadoop_path(spark: SparkSession, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath, jpath.getFileSystem(spark._jsc.hadoopConfiguration())


def _read_stage_marker(spark: SparkSession, stage_dir: str) -> str | None:
    try:
        jpath, fs = _hadoop_path(spark, f"{stage_dir}/{STAGE_MARKER}")
        if not fs.exists(jpath):
            return None
        stream = fs.open(jpath)
        try:
            data = bytearray()
            while True:
                b = stream.read()
                if b < 0:
                    break
                data.append(b)
            return bytes(data).decode("utf-8", "replace").strip()
        finally:
            stream.close()
    except Exception:
        return None


def _write_stage_marker(spark: SparkSession, stage_dir: str, fp: str) -> None:
    try:
        jpath, fs = _hadoop_path(spark, f"{stage_dir}/{STAGE_MARKER}")
        out = fs.create(jpath, True)
        try:
            out.write(fp.encode("utf-8"))
        finally:
            out.close()
    except Exception:
        pass


def _delete_path(spark: SparkSession, path: str) -> None:
    try:
        jpath, fs = _hadoop_path(spark, path)
        fs.delete(jpath, True)
    except Exception:
        pass


def transform_chunks(pages: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """The logical plan: pages -> chunk rows (+ deterministic chunk id,
    computed JVM-side: parity with id = xxhash64(content + doc_id),
    rag/svr/task_executor.py:287)."""
    fn = make_chunk_batches(cfg.template, cfg.budget, cfg.delimiters, cfg.tokenize)
    chunks = _prune_for_udf(pages).mapInPandas(fn, schema=CHUNKS_SCHEMA)
    return chunks.withColumn("chunk_id", F.xxhash64("content", "url"))


def transform_extracted(pages: DataFrame) -> DataFrame:
    return _prune_for_udf(pages).mapInPandas(extract_batches, schema=EXTRACTED_SCHEMA)


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    cfg: PipelineConfig,
    resume: bool = True,
    catalog=None,
) -> dict:
    """Process all url-hash buckets not yet committed; returns metrics.

    Writes go through the table catalog (ragflow_spark/catalog.py):
    Iceberg `overwritePartitions`/`append` when the runtime is on the
    classpath, parquet dynamic-overwrite/append otherwise.
    """
    state: dict = {}
    try:
        return _run_pipeline_impl(spark, pages, cfg, resume, catalog, state)
    finally:
        # restore session-global split-size confs mutated for the
        # staged group reads — never leak a 1 MiB split target into
        # the caller's session (or into a later run that skips the
        # staging branch)
        for k, v in state.get("saved_confs", {}).items():
            try:
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
            except Exception:
                pass


def _run_pipeline_impl(
    spark: SparkSession,
    pages: DataFrame,
    cfg: PipelineConfig,
    resume: bool,
    catalog,
    state: dict,
) -> dict:
    if catalog is None:
        from ..catalog import Catalog

        catalog = Catalog(spark)
    # input lineage: which file set produced each committed bucket —
    # recorded per manifest row, checked on resume, and reused as the
    # stage-reuse gate.  (Dynamic partition overwrite is scoped inside
    # Catalog.overwrite_partitions now — no session-global conf set.)
    fp = _input_fingerprint(pages, spark)
    done = committed_buckets(spark, cfg, catalog, input_fp=fp) if resume else set()
    todo = [b for b in range(cfg.n_buckets) if b not in done]
    # effective group size: at least buckets_per_commit, and no more
    # than max_commit_groups passes over the input per run
    bpc = cfg.buckets_per_commit
    if cfg.max_commit_groups and todo:
        bpc = max(bpc, -(-len(todo) // cfg.max_commit_groups))
    source = with_bucket(pages, cfg.n_buckets)
    used_stage_dir: str | None = None
    if cfg.stage_input and len(todo) > bpc:
        # one bucketed exchange + partitioned write (the north-rule
        # url-hash partitioning made physical); every group below then
        # scans ONLY its bucket partitions.  Marker-gated: a kill
        # mid-stage leaves no marker and the dir is rewritten; a
        # resume with the same out_dir AND the same input file set
        # reuses.  (The partitioned write emits no top-level _SUCCESS,
        # so the gate is our own marker, stamped with a fingerprint of
        # the input file list — a non-file-backed input fingerprints
        # as None and is always restaged, never trusted stale.)
        stage_dir = f"{cfg.out_dir}/stage_nb{cfg.n_buckets}"
        staged_ok = fp is not None and _read_stage_marker(spark, stage_dir) == fp
        if not (resume and staged_ok):
            # restage from scratch: DELETE the old dir first rather
            # than trust overwrite semantics — under dynamic partition
            # overwrite (ambient session conf a caller may have set) a
            # plain overwrite only replaces partitions present in the
            # new data, so a shrunken input would silently leave the
            # previous input's buckets (and old marker) in place and
            # leak its pages into this run's output
            _delete_path(spark, stage_dir)
            # spread every bucket over ~one file per core of a group's
            # read, so the pruned group scan below already has enough
            # splits for the CPU-bound extraction stage — measured at
            # 200k pages/32 buckets this removes a 2-8s AQE shuffle
            # stage per group that a runtime repartition() costs
            par = spark.sparkContext.defaultParallelism
            spread = max(1, -(-par // max(bpc, 1)))
            # stage the PRUNED projection (text nulled for plain
            # HTML rows, >cap rows dropped, warc_ts pruned): the
            # same row set the chunker sees, at roughly half the
            # staged bytes of the raw input
            stage_writer = (
                _prune_for_udf(source, keep_cols=("bucket",))
                .repartition(
                    cfg.n_buckets * spread,
                    F.col("bucket"),
                    F.pmod(F.xxhash64(F.col("url"), F.lit(1)), F.lit(spread)),
                )
                .write.mode("overwrite")
            )
            if cfg.codec:  # None = session default, same as the catalog
                stage_writer = stage_writer.option("compression", cfg.codec)
            stage_writer.partitionBy("bucket").parquet(stage_dir)
            if fp is not None:
                _write_stage_marker(spark, stage_dir, fp)
        source = spark.read.parquet(stage_dir)
        used_stage_dir = stage_dir
        # size read splits so a pruned group scan yields >= one split
        # per core: at small corpus scale the staged files are ~1 MiB
        # and the default 128 MiB target + 4 MiB per-file open-cost
        # packs them back into one or two splits, starving the
        # CPU-bound extraction stage (at corpus scale the computed
        # target saturates at the 128 MiB default, so this is a no-op).
        # Originals are restored after the group loop (see finally).
        try:
            _, fs = _hadoop_path(spark, stage_dir)
            jp = spark._jvm.org.apache.hadoop.fs.Path(stage_dir)
            total_len = int(fs.getContentSummary(jp).getLength())
            n_groups = -(-len(todo) // bpc)
            par = spark.sparkContext.defaultParallelism
            tgt = total_len // max(n_groups * par, 1)
            tgt = min(max(tgt, 1 << 20), 128 << 20)
            state["saved_confs"] = {
                k: spark.conf.get(k, None)
                for k in (
                    "spark.sql.files.maxPartitionBytes",
                    "spark.sql.files.openCostInBytes",
                )
            }
            spark.conf.set("spark.sql.files.maxPartitionBytes", str(tgt))
            spark.conf.set(
                "spark.sql.files.openCostInBytes", str(min(tgt // 4, 4 << 20))
            )
        except Exception:
            pass
    # prune ONCE over the bucketed table so the manifest stats below
    # aggregate the exact row set the chunker sees (the byte-cap filter
    # would otherwise silently desync n_pages/bytes_in from the output)
    bucketed = _prune_for_udf(source, keep_cols=("bucket",))
    totals = {
        "n_pages": 0,
        "n_chunks": 0,
        "buckets": len(todo),
        "skipped": len(done),
        "n_pdf": 0,
        "n_pdf_fallback": 0,
        "n_extract_err": 0,
    }
    # per-bucket PDF/fallback counts flow back through an accumulator:
    # counted at extraction time inside the UDF, so even a document
    # that emits zero chunks (failed extraction, empty text) is seen
    mode_acc = spark.sparkContext.accumulator({}, _ModeStatsParam())

    from pyspark.sql import Observation

    for lo in range(0, len(todo), bpc):
        group = todo[lo : lo + bpc]
        t0 = time.time()
        # ONE pass per group: page/byte stats and chunk counts ride the
        # write job as CollectMetrics observations (exact aggregates on
        # the successful execution), instead of a second full input
        # scan + a read-back of the written partitions per group —
        # measured at 200k pages / 32 buckets / local[32]: 41 Spark
        # jobs -> 19, wall 115-140s -> 85-106s (BENCH.md round 4); the
        # gap widens with bucket count, since every pre-r4 group paid
        # two extra unpruned passes over the full input.
        def _per_bucket(col: str, prefix: str):
            if col == "*":
                return [
                    F.sum(F.when(F.col("bucket") == b, 1).otherwise(0)).alias(
                        f"{prefix}{b}"
                    )
                    for b in group
                ]
            return [
                F.sum(
                    F.when(F.col("bucket") == b, F.col(col)).otherwise(0)
                ).alias(f"{prefix}{b}")
                for b in group
            ]

        page_obs = Observation(f"pages_{lo}")
        subset = bucketed.where(F.col("bucket").isin(group))
        # partition-pruned group slices can read as a handful of splits
        # (one-ish file per bucket), starving the CPU-bound extraction
        # stage — spread them to the executor parallelism (no-op at
        # corpus scale, where a group spans thousands of splits)
        par = spark.sparkContext.defaultParallelism
        if subset.rdd.getNumPartitions() < par:
            subset = subset.repartition(par)
        subset = (
            subset.withColumn("_nb", F.coalesce(F.length("html"), F.lit(0)))
            .observe(page_obs, *_per_bucket("*", "n_"), *_per_bucket("_nb", "b_"))
            .drop("_nb")
        )
        fn = make_chunk_batches(
            cfg.template, cfg.budget, cfg.delimiters, cfg.tokenize, mode_acc=mode_acc
        )
        chunk_obs = Observation(f"chunks_{lo}")
        chunks = (
            subset.mapInPandas(fn, schema=CHUNKS_SCHEMA)
            .withColumn("chunk_id", F.xxhash64("content", "url"))
            .withColumn(
                "bucket",
                F.pmod(F.xxhash64(F.col("url")), F.lit(cfg.n_buckets)).cast("int"),
            )
            .observe(chunk_obs, *_per_bucket("*", "c_"))
        )
        catalog.overwrite_partitions(chunks, cfg.chunks_dir, "bucket", codec=cfg.codec)
        pstats = page_obs.get
        cstats = chunk_obs.get
        wall = time.time() - t0
        mode_stats = dict(mode_acc.value)  # cumulative; buckets disjoint per group
        rows = []
        live = [b for b in group if int(pstats.get(f"n_{b}") or 0)]
        for b in group:
            # EVERY processed bucket gets a manifest row, including
            # pageless ones (n_pages=0, wall 0): leaving them out of
            # the manifest left them in `todo` forever, so every later
            # run on a finished dataset re-staged the whole input and
            # re-ran full passes that produced nothing — resume never
            # converged on corpora smaller than the bucket count.
            # EXCEPT with unverifiable lineage (fp None, non-file-backed
            # input): "this bucket is empty" is only trustworthy for
            # the exact input that produced it, and without a
            # fingerprint a later resume cannot tell — same never-trust
            # rule the stage-reuse marker applies.
            n_pages = int(pstats.get(f"n_{b}") or 0)
            if n_pages == 0 and fp is None:
                continue
            n_pdf, n_fb, n_err = mode_stats.get(int(b), (0, 0, 0))
            n_chunks = int(cstats.get(f"c_{b}") or 0)
            rows.append(
                {
                    "bucket": int(b),
                    "status": "done",
                    "n_pages": n_pages,
                    "n_chunks": n_chunks,
                    "bytes_in": int(pstats.get(f"b_{b}") or 0),
                    "n_pdf": int(n_pdf),
                    "n_pdf_fallback": int(n_fb),
                    "n_extract_err": int(n_err),
                    # attribute the group's wall to the buckets that
                    # actually carried pages, so summing manifest
                    # wall_sec reproduces true runtime even when a
                    # group is mostly pageless
                    "wall_sec": (wall / len(live)) if (live and n_pages) else 0.0,
                    "ts": time.time(),
                    "input_fp": fp or "",
                    "n_buckets": cfg.n_buckets,
                }
            )
            totals["n_pages"] += n_pages
            totals["n_chunks"] += n_chunks
            totals["n_pdf"] += int(n_pdf)
            totals["n_pdf_fallback"] += int(n_fb)
            totals["n_extract_err"] += int(n_err)
        if rows:
            _append_manifest(spark, cfg, rows, catalog)
    # every group committed: the staged scratch copy has served its
    # purpose — drop it rather than double the corpus's storage
    # footprint forever (a later resume that still has work restages)
    if used_stage_dir is not None:
        _delete_path(spark, used_stage_dir)
    return totals


def cli(argv=None, spark: SparkSession | None = None) -> None:
    """Shared CLI for the extraction job — used both by
    ``python -m``/entry-point launches (builds a local session) and by
    ``scripts/spark_job.py`` under spark-submit (session passed in).
    One argparse, one launch path; pragma: exercised by spark-submit."""
    # pragma: no cover - exercised by spark-submit e2e, not pytest
    import argparse

    ap = argparse.ArgumentParser(description="ragflow_spark extraction job")
    ap.add_argument("--pages", required=True, help="input pages parquet dir")
    ap.add_argument("--out", required=True, help="output dir")
    ap.add_argument("--template", default="naive")
    ap.add_argument("--budget", type=int, default=128)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument(
        "--buckets-per-commit",
        type=int,
        default=None,
        help="resume-point granularity floor (default: PipelineConfig's; "
        "larger = coarser resume points).  NOTE: the effective group "
        "size is also floored by --max-commit-groups so one run never "
        "degrades into thousands of passes; pass a large "
        "--max-commit-groups to honor a small --buckets-per-commit "
        "exactly.",
    )
    ap.add_argument(
        "--max-commit-groups",
        type=int,
        default=None,
        help="cap on commit groups (= passes over the staged input) per "
        "run; 0 disables the cap and honors --buckets-per-commit exactly",
    )
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument(
        "--count-only",
        action="store_true",
        help="run the extract+chunk transform and count it, no writes: "
        "the compute-scaling measurement shape (the e2e write stage is "
        "bounded by this VM's single shared disk — see BENCH.md — "
        "which a real cluster's per-node disks don't share).  Runs "
        "twice and reports both walls so the warm one excludes "
        "codegen-compile/python-worker-startup fixed costs.",
    )
    args = ap.parse_args(argv)
    if spark is None:
        from ..session import get_spark

        spark = get_spark("ragflow_spark.pipeline")
    pages = spark.read.parquet(args.pages)
    kw = {}
    if args.buckets_per_commit is not None:
        kw["buckets_per_commit"] = args.buckets_per_commit
    if args.max_commit_groups is not None:
        kw["max_commit_groups"] = args.max_commit_groups
    cfg = PipelineConfig(
        out_dir=args.out,
        template=args.template,
        budget=args.budget,
        n_buckets=args.buckets,
        **kw,
    )
    if args.count_only:
        n_pages = pages.count()
        t0 = time.time()
        transform_chunks(pages, cfg).count()  # cold: codegen + workers
        cold = time.time() - t0
        t0 = time.time()
        n_chunks = transform_chunks(pages, cfg).count()
        warm = time.time() - t0
        print(
            json.dumps(
                {
                    "n_pages": n_pages,
                    "n_chunks": n_chunks,
                    "wall_sec": round(warm, 2),
                    "wall_cold_sec": round(cold, 2),
                    "docs_per_sec": round(n_pages / warm, 1),
                }
            )
        )
        return
    t0 = time.time()
    totals = run_pipeline(spark, pages, cfg, resume=not args.no_resume)
    # job-internal wall (excludes spark-submit/JVM startup): the
    # throughput figure that scales with executors
    totals["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(totals))


if __name__ == "__main__":  # pragma: no cover
    cli()
