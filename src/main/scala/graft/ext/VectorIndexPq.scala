package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.engine.{Num, Sources}
import Num._
import Similarity._

/** The persisted ANN index with PQ-ENCODED inverted lists — [[VectorIndex]]
  * with [[Pq]]'s 32× list-payload cut finally reaching the durable store.
  * The plain index's lists carry the full vector (`vb ARRAY<DOUBLE>` ≈
  * 520 B/row): at 10¹⁰ vectors that is ~5 TB of list payload through every
  * probe join — exactly what PQ exists to eliminate. Here a list row is
  * (cl, neighbor_id, [[Pq.PqSub]] small-alphabet codes, ‖recon‖) ≈ 40 B
  * logical, and the full vectors move to a SEPARATE exact-rerank table that
  * only ever serves point fetches of the ADC top-[[Pq.PqRerank]] ids per
  * query — the hot path never touches them.
  *
  * Store layout under `storePath`:
  *   - `l1/`, `subs/`, `meta/` — the hier quantizer artifacts, identical to
  *     [[VectorIndex]] (shared writer: `VectorIndex.writeModelArtifacts`)
  *   - `books/` — the PQ codebooks as (s, code, cw) rows; bounded at
  *     [[Pq.PqSub]]·[[Pq.PqCodes]] rows, loaded back to the driver-resident
  *     [[Pq.Books]] (parquet round-trips doubles exactly, so the loaded
  *     books encode and ADC-score bit-identically to the in-memory ones)
  *   - `lists/` — (cl, neighbor_id, codes, rnorm), PARTITIONED BY (batch)
  *     and CLUSTERED BY (cl) INTO [[VectorIndex.IndexBuckets]] BUCKETS: the
  *     probe join reads the store side already hash-distributed on the cell
  *     id — NO exchange on the (huge) list side at any index size
  *   - `vectors/` — (vec_id, v, norm), PARTITIONED BY (batch) and CLUSTERED
  *     BY (vec_id): the exact-rerank fetch join reads THIS side already
  *     hash-distributed on the id — only the per-query top-[[Pq.PqRerank]]
  *     candidate frame shuffles, never the vector store
  *
  * Both tables share ONE compaction floor (`VectorIndex.compactCore` swaps
  * a single pointer for the whole store): a half-compacted store — lists
  * folded, vectors not — is never readable. Ingest writes both tables'
  * `batch=<id>` partitions with dynamic overwrite, so a crash-replayed
  * batch rewrites rather than duplicates, same as every incremental sink
  * here.
  *
  * Search = [[Pq.annIvfPqFrom]] against the durable store: probes from the
  * frozen quantizer (map-only over the QUERIES), ADC scoring through the
  * native kernel on the bucketed lists, bounded ADC top-[[Pq.PqRerank]],
  * exact rerank fetching vectors by id from the bucketed vector table.
  * Bit-identical to `sim_ann_ivf_pq` when the store was built from the same
  * corpus — the registered `sim_ann_index_pq` twin shares that DuckDB
  * oracle (VectorIndexSpec pins the parity and both plan shapes).
  */
object VectorIndexPq {

  import VectorIndex.{IndexBuckets, sha12, fsOf, compactState, livePred}

  /** Catalog names — 96-bit path hash, same reasoning as
    * [[VectorIndex.listsTable]]. */
  private[graft] def listsTable(storePath: String): String =
    "graft_vecpq_lists_" + sha12(storePath)
  private[graft] def vecsTable(storePath: String): String =
    "graft_vecpq_vecs_" + sha12(storePath)

  private def ensureTables(spark: SparkSession, storePath: String): (String, String) = {
    val lt = listsTable(storePath)
    val vt = vecsTable(storePath)
    // geometry binds at creation (recorded in _GEOMETRY), conf seeds new
    // stores — see [[VectorIndex.geometryBuckets]]
    def buckets = VectorIndex.geometryBuckets(spark, storePath,
      "spark.graft.vecindex.buckets", IndexBuckets)
    if (!spark.catalog.tableExists(lt)) {
      fsOf(spark, storePath)
        .mkdirs(new org.apache.hadoop.fs.Path(s"$storePath/lists"))
      spark.sql(
        s"""CREATE TABLE $lt (cl BIGINT, neighbor_id BIGINT,
           |codes ARRAY<INT>, rnorm DOUBLE, batch BIGINT)
           |USING PARQUET
           |PARTITIONED BY (batch)
           |CLUSTERED BY (cl) INTO $buckets BUCKETS
           |LOCATION '$storePath/lists'""".stripMargin)
      spark.catalog.recoverPartitions(lt)
    }
    if (!spark.catalog.tableExists(vt)) {
      fsOf(spark, storePath)
        .mkdirs(new org.apache.hadoop.fs.Path(s"$storePath/vectors"))
      spark.sql(
        s"""CREATE TABLE $vt (vec_id BIGINT, v ARRAY<DOUBLE>,
           |norm DOUBLE, batch BIGINT)
           |USING PARQUET
           |PARTITIONED BY (batch)
           |CLUSTERED BY (vec_id) INTO $buckets BUCKETS
           |LOCATION '$storePath/vectors'""".stripMargin)
      spark.catalog.recoverPartitions(vt)
    }
    (lt, vt)
  }

  /** Persist the PQ codebooks as (s, code, cw) rows — the durable half of
    * the ADC kernel's state. */
  private def writeBooks(spark: SparkSession, storePath: String,
                         books: Pq.Books): Unit = {
    import spark.implicits._
    books.zipWithIndex.flatMap { case (cws, s) =>
      cws.zipWithIndex.map { case (cw, k) => (s, k + 1, cw.toSeq) }
    }.toSeq.toDF("s", "code", "cw").coalesce(1).write.parquet(s"$storePath/books")
  }

  /** Load the codebooks back — bounded control-plane collect
    * (≤ PqSub·PqCodes rows); codes are dense 1-based per subspace exactly
    * as [[Pq.pqCodebooksLocal]] emits them. */
  private[graft] def loadBooks(spark: SparkSession, storePath: String): Pq.Books = {
    val rows = spark.read.parquet(s"$storePath/books")
      .select("s", "code", "cw").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    Array.tabulate(Pq.PqSub) { s =>
      rows.filter(_._1 == s).sortBy(_._2).map(_._3)
    }
  }

  /** The live rows of either table under the shared compaction floor. */
  private[graft] def liveLists(spark: SparkSession, storePath: String): DataFrame = {
    val (lt, _) = ensureTables(spark, storePath)
    spark.table(lt).where(livePred(compactState(spark, storePath)))
  }
  private[graft] def liveVecs(spark: SparkSession, storePath: String): DataFrame = {
    val (_, vt) = ensureTables(spark, storePath)
    spark.table(vt).where(livePred(compactState(spark, storePath)))
  }

  /** Build from scratch over a (vec_id, v, norm) corpus: ONE hier-quantizer
    * + calibration + PQ-codebook training pass, every artifact persisted,
    * corpus loaded as batch 0. Idempotent clean replace, like
    * [[VectorIndex.build]]. */
  def build(spark: SparkSession, storePath: String, vecs: DataFrame,
            corpusKey: Option[String] = None): Unit = {
    val pinned = vecs.storageLevel != StorageLevel.NONE
    if (!pinned) vecs.persist()
    // corpusKey: same contract as [[VectorIndex.build]] (OPTIMIZATION r15)
    // — the deterministic model artifacts (hier structure, probe depth, PQ
    // codebooks) ride the session-shared chains under the corpus's keys;
    // store write + assignment + encode + ingest still run per call.
    val m = hierModel(vecs, cacheKey = corpusKey.map(d => s"$d#base"))
    val books = corpusKey
      .map(d => SessionVal(s"pqbooks#$d#base")(Pq.pqCodebooksLocal(vecs)))
      .getOrElse(Pq.pqCodebooksLocal(vecs))
    spark.sql(s"DROP TABLE IF EXISTS ${listsTable(storePath)}")
    spark.sql(s"DROP TABLE IF EXISTS ${vecsTable(storePath)}")
    fsOf(spark, storePath).delete(new org.apache.hadoop.fs.Path(storePath), true)
    VectorIndex.writeModelArtifacts(spark, storePath, m)
    writeBooks(spark, storePath, books)
    ensureTables(spark, storePath)
    ingest(spark, storePath, vecs, 0L)
    m.subs.unpersist()
    if (!pinned) vecs.unpersist()
    ()
  }

  /** Fold a delta batch in WITHOUT touching quantizer or codebooks:
    * map-only assignment + map-only PQ encoding, one bucketed write per
    * table into this batch's own partitions (dynamic overwrite — replays
    * rewrite, never duplicate). O(delta) work; the 520 B/row full vector
    * goes to the rerank table only, the list row carries ~40 B. */
  def ingest(spark: SparkSession, storePath: String, delta: DataFrame,
             batchId: Long): Unit = {
    val (lt, vt) = ensureTables(spark, storePath)
    val books = loadBooks(spark, storePath)
    val assigned = VectorIndex.assignment(spark, storePath, delta)
    val listRows = assigned
      .select(col("cl"), col("neighbor_id"),
        Pq.pqCodesCol(col("vb"), books).as("codes"))
      .withColumn("rnorm", Pq.rnormCol(col("codes"), books))
      .withColumn("batch", lit(batchId))
    val vecRows = assigned
      .select(col("neighbor_id").as("vec_id"), col("vb").as("v"),
        col("nb").as("norm"))
      .withColumn("batch", lit(batchId))
    graft.sources.DynamicOverwrite(spark) {
      listRows.select("cl", "neighbor_id", "codes", "rnorm", "batch")
        .write.mode("overwrite").insertInto(lt) // insertInto is positional
      vecRows.select("vec_id", "v", "norm", "batch")
        .write.mode("overwrite").insertInto(vt)
    }
  }

  /** Compact both tables' live batches ≤ `upTo` behind the store's ONE
    * atomic floor — see [[VectorIndex.compactCore]] for the protocol and
    * crash story; the caller contract on `upTo` is unchanged. */
  def compact(spark: SparkSession, storePath: String, upTo: Long): Unit = {
    val (lt, vt) = ensureTables(spark, storePath)
    VectorIndex.compactCore(spark, storePath, upTo, Seq(
      (lt, "lists", Seq("cl", "neighbor_id", "codes", "rnorm")),
      (vt, "vectors", Seq("vec_id", "v", "norm"))))
  }

  /** ANN search for a (vec_id, v, norm) query batch: probe generation over
    * the QUERIES only (frozen model, map-only), ADC against the bucketed
    * PQ lists (store side pre-distributed on `cl` — no exchange), bounded
    * ADC top-[[Pq.PqRerank]] per query, then the exact rerank fetching full
    * vectors BY ID from the bucketed vector table (store side
    * pre-distributed on `vec_id` — no exchange there either; only the
    * bounded candidate frame shuffles). Output bit-identical to
    * [[Pq.annIvfPq]] when the store was built from the same corpus. */
  def search(spark: SparkSession, storePath: String, queries: DataFrame): DataFrame = {
    val (l1, subs, nProbe) = VectorIndex.loadModel(spark, storePath)
    val books = loadBooks(spark, storePath)
    val probes = hierScored(queries, l1, subs, nProbe)
      .select(col("cl"), col("vec_id").as("query_id"),
        col("v").as("va"), col("norm").as("na"))
    val cand = probes.join(liveLists(spark, storePath).drop("batch"), "cl")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc",
        r(Pq.adcDotCol(col("va"), col("codes"), books) / (col("na") * col("rnorm")), 6))
    val topr = cand.groupBy("query_id")
      .agg(first(col("va")).as("va"), first(col("na")).as("na"),
        graft.functions.TopKByScore.topK(col("adc"), col("neighbor_id"),
          Pq.PqRerank).as("_top"))
      .select(col("query_id"), col("va"), col("na"), explode(col("_top")).as("_t"))
      .select(col("query_id"), col("va"), col("na"),
        col("_t").getField("id").as("neighbor_id"))
    val pairs = topr.join(
        liveVecs(spark, storePath)
          .select(col("vec_id").as("neighbor_id"), col("v").as("vb"),
            col("norm").as("nb")),
        "neighbor_id")
      .withColumn("cosine",
        r(Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
    Similarity.topK(pairs, TopK)
  }

  private[graft] def storeFor(spark: SparkSession, dir: String): String =
    s"${spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/")}" +
      s"/graft_vecindexpq_${sha12(dir)}"

  /** Registered end-to-end twin: build in a warehouse-scoped scratch store,
    * self-search — bit-identical to `sim_ann_ivf_pq`, sharing its DuckDB
    * oracle. Rebuild-each-run is the verification harness's idempotence,
    * not the deployment shape — [[annIndexedPqSearch]] is the
    * deployment-shaped (build once, search many) twin. */
  def annIndexedPq(spark: SparkSession, dir: String): DataFrame = {
    val store = storeFor(spark, dir)
    build(spark, store, withNorm(Sources.embeddings(spark, dir)), Some(dir))
    SessionOnce.markBuilt(store)
    search(spark, store, withNorm(Sources.embeddings(spark, dir)))
  }

  /** Registered SEARCH-ONLY twin (VERDICT r9 #3): the store is built at
    * most once per (session, corpus) — by this arm's first call or by a
    * prior [[annIndexedPq]] run against the same corpus — and every call
    * is a pure search against the durable tables. Same DuckDB oracle as
    * `sim_ann_index_pq` (search output is independent of who built the
    * store), so the bench median/min of THIS arm is the per-query search
    * cost the deployment table quotes, with no one-time build conflated
    * in. */
  def annIndexedPqSearch(spark: SparkSession, dir: String): DataFrame = {
    val store = storeFor(spark, dir)
    SessionOnce(store)(
      build(spark, store, withNorm(Sources.embeddings(spark, dir)), Some(dir)))
    search(spark, store, withNorm(Sources.embeddings(spark, dir)))
  }
}
