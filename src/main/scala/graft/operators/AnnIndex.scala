package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.gf

/** Persisted IVF index as a lake layout: the search structure IS the
  * physical layout, nothing more.
  *
  * - `<path>/centroids` — nlist (cell, centroid) rows; broadcast-
  *   sized model state, loaded to the driver at probe time exactly
  *   like the in-memory variant trains it.
  * - `<path>/vectors` — the corpus partitioned BY CELL. Probing
  *   `nprobe` of `nlist` cells is then a partition-PRUNED scan: the
  *   nprobe/nlist read fraction that [[Similarity.ivfPqTopK]] gets
  *   logically becomes physical — unprobed cells' files are never
  *   opened (spec-asserted via scan metrics).
  *
  * Build once, probe many: amortizes centroid training and cell
  * assignment across every subsequent query batch, which is how an
  * ANN service over a 100 TB embedding corpus actually runs.
  */
object AnnIndex {

  /** Train (or pick, iters=0) centroids, assign each corpus vector
    * to its nearest cell, and write the layout. */
  def buildIvf(corpus: DataFrame, path: String,
               nlist: Int = 16, iters: Int = 0): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids =
      if (iters == 0) Similarity.pickCentroids(corpus, nlist)
      else Similarity.trainCentroids(corpus, nlist, iters)
    centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq
      .toDF("cell", "centroid")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    corpus
      .select(col("vec_id"), col("embedding"),
        gf.nearestCentroids(col("embedding"), centroids, 1)(0).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/vectors")
  }

  /** The broadcastable model state back from disk. */
  def loadCentroids(spark: SparkSession, path: String): Array[Array[Float]] =
    spark.read.parquet(s"$path/centroids")
      .orderBy("cell")
      .collect()
      .map(_.getSeq[Float](1).toArray)

  /** INCREMENTAL maintenance — the daily-ingest shape for a serving
    * index: assign a new vector batch to the index's STORED
    * centroids (never retrained here — retraining would re-cell the
    * existing corpus, i.e. a rebuild) and append its cell partitions.
    * Cost is one scan of the delta; history is never rewritten, and
    * a probe after append ≡ a probe over an index built with the
    * same centroids on the union corpus (spec-held). Cell balance
    * drifts as the data does — watch [[Similarity.ivfCellStats]]
    * (`balance` of the hot cell) to decide when a re-train/rebuild
    * pays; that is the same compact-vs-rebuild economics as
    * [[DedupStore]]'s fingerprint log.
    */
  def appendIvf(newVectors: DataFrame, path: String): Unit = {
    val centroids = loadCentroids(newVectors.sparkSession, path)
    newVectors
      .select(col("vec_id"), col("embedding"),
        gf.nearestCentroids(col("embedding"), centroids, 1)(0).as("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/vectors")
  }

  /** Top-k cosine search against the persisted index. The probed
    * cell set (≤ |queries|·nprobe distinct values, typically ≪
    * nlist) becomes a static `IN` partition filter, so the scan
    * opens only probed cells' files. */
  def probeIvf(spark: SparkSession, path: String, queries: DataFrame,
               k: Int = 10, nprobe: Int = 4): DataFrame = {
    val centroids = loadCentroids(spark, path)
    val probed = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"),
      explode(gf.nearestCentroids(col("embedding"), centroids, nprobe)).as("cell"))
    val cells = probed.select("cell").distinct().collect().map(_.getInt(0))
    val vectors = spark.read.parquet(s"$path/vectors")
      .filter(col("cell").isin(cells.map(Integer.valueOf): _*))
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"),
        col("cell"))
    Similarity.topKPerQuery(
      probed.join(vectors, Seq("cell"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          gf.cosineSim(col("q_emb"), col("n_emb")).as("cosine")), k)
  }

  /** The IVF-PQ SERVING layout: [[buildIvf]]'s cell partitioning
    * plus a PQ code column stored NEXT TO the raw vector. The probe
    * then gets both prunings physically: partition pruning skips
    * unprobed cells' files, and column pruning makes the candidate
    * scan read ONLY (vec_id, codes) — m·4 bytes a vector, never the
    * dim·4-byte embedding (spec-asserted on the scan's ReadSchema).
    * The exact rerank re-reads embeddings for candidate ids alone.
    * Same deterministic single-sample training as
    * [[Similarity.ivfPqTopK]], so probe results match the in-memory
    * operator row-for-row (spec-held).
    */
  def buildIvfPq(corpus: DataFrame, path: String, nlist: Int = 16,
                 m: Int = 8, nCodes: Int = 16, dim: Int = 64): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sample = Similarity.pickCentroids(corpus, math.max(nlist, nCodes))
    val cents = sample.take(nlist)
    val cbs = Similarity.codebooksFromSample(sample.take(nCodes), m, dim)
    cents.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq
      .toDF("cell", "centroid")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    cbs.zipWithIndex.flatMap { case (cb, j) =>
      cb.zipWithIndex.map { case (cent, c) => (j, c, cent.toSeq) }
    }.toSeq
      .toDF("subspace", "code", "centroid")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$path/codebooks")
    corpus
      .select(col("vec_id"), col("embedding"),
        gf.pqEncode(col("embedding"), cbs).as("codes"),
        gf.nearestCentroids(col("embedding"), cents, 1)(0).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/vectors")
  }

  /** [[appendIvf]] for the IVF-PQ layout: the delta batch is encoded
    * with the index's STORED codebooks and assigned to its STORED
    * centroids, then appended as cell partitions — one delta scan, no
    * retrain, no history rewrite. Quantization drift compounds the
    * cell-balance drift here: codebooks trained on yesterday's
    * distribution encode tomorrow's vectors with growing
    * reconstruction error, so the rebuild trigger is recall (the
    * [[graft.RecallFloors]] gate) as much as cell balance. */
  def appendIvfPq(newVectors: DataFrame, path: String): Unit = {
    val spark = newVectors.sparkSession
    val cents = loadCentroids(spark, path)
    val cbs = loadCodebooks(spark, path)
    newVectors
      .select(col("vec_id"), col("embedding"),
        gf.pqEncode(col("embedding"), cbs).as("codes"),
        gf.nearestCentroids(col("embedding"), cents, 1)(0).as("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/vectors")
  }

  /** The persisted codebooks back in [[graft.functions.gf.pqCosine]]
    * shape — m·nCodes·subDim floats, driver/broadcast-sized. */
  def loadCodebooks(spark: SparkSession, path: String): Array[Array[Array[Float]]] =
    spark.read.parquet(s"$path/codebooks")
      .orderBy("subspace", "code")
      .collect()
      .groupBy(_.getInt(0)).toArray.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1)).map(_.getSeq[Float](2).toArray))

  /** IVF-PQ probe against the persisted layout: candidate scoring
    * reads codes only (pruned to probed cells), the top k·rerank
    * re-score exactly from a second candidates-only read. */
  def probeIvfPq(spark: SparkSession, path: String, queries: DataFrame,
                 k: Int = 10, nprobe: Int = 4, rerank: Int = 4): DataFrame = {
    val centroids = loadCentroids(spark, path)
    val cbs = loadCodebooks(spark, path)
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val probed = broadcast(q.select(col("query_id"), col("q_emb"),
      explode(gf.nearestCentroids(col("q_emb"), centroids, nprobe)).as("cell")))
    val cells = probed.select("cell").distinct().collect().map(_.getInt(0))
    def prunedScan(cols: Seq[String]) = spark.read.parquet(s"$path/vectors")
      .filter(col("cell").isin(cells.map(Integer.valueOf): _*))
      .select(col("vec_id").as("neighbor_id") +: cols.map(col): _*)
    val approx = Similarity.topKPerQuery(
      probed.join(prunedScan(Seq("codes", "cell")), Seq("cell"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          gf.pqCosine(col("q_emb"), col("codes"), cbs).as("cosine")), k * rerank)
    val exact = broadcast(approx.select("query_id", "neighbor_id"))
      .join(prunedScan(Seq("embedding")), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        gf.cosineSim(col("q_emb"), col("embedding")).as("cosine"))
    Similarity.topKPerQuery(exact, k)
  }
}
