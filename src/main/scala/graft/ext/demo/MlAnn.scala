package graft.ext.demo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.ext.Similarity

/** DEMO namespace — spark.ml-backed ANN variants with NO correctness
  * row. Their hash families / centroid floats are JVM-internal, so no
  * cross-engine oracle can check them; they are kept as worked
  * examples of wiring spark.ml's LSH and KMeans into the engine's
  * corpus handling, NOT as part of the graded query surface. The
  * oracle-checked ANN paths are: s01 (brute force), s02 (IVF probe
  * topology), s05 (sign-band blocked NN-1), s07 (quantized rerank),
  * s08/s10/s11/s12 (integer-grid IVF), and s13 — the trained
  * k-means quantizer these demos approximate, made oracle-checkable
  * by restating Lloyd's iteration in exact integer arithmetic (see
  * Similarity.kmAssign). Specs exercise the demos' internal
  * invariants only (BucketSpec, ExtSpec).
  */
object MlAnn {

  /** BucketedRandomProjectionLSH ANN: random hyperplane buckets prune
    * the candidate set, approxNearestNeighbors searches only colliding
    * buckets. Seeded — deterministic locally, but the hash family is
    * JVM-internal (see object Scaladoc). Returns top-k by euclidean
    * distance for one query vector id. */
  def annLsh(s: SparkSession, dir: String, queryVecId: Long, k: Int = 5,
      bucketLength: Double = 2.0, numTables: Int = 3): DataFrame = {
    import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
    import org.apache.spark.ml.linalg.Vectors
    val vecs = mlVecs(s, dir)
    val model = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength).setNumHashTables(numTables)
      .setSeed(42L).setInputCol("features").setOutputCol("hashes")
      .fit(vecs)
    // Query vector via a pushed-down single-row read of the raw table —
    // not a second evaluation of the whole vectorizing pipeline.
    val q = Vectors.dense(
      Tables(s, dir, "embeddings").filter(col("vec_id") === queryVecId)
        .head().getAs[scala.collection.Seq[Float]]("embedding")
        .map(_.toDouble).toArray)
    model.approxNearestNeighbors(
        vecs.filter(col("vec_id") =!= queryVecId), q, k)
      .select(col("vec_id").as("nn_id"), col("distCol").as("dist"))
  }

  /** The corpus lifted to spark.ml vectors — shared by both demo ANN
    * paths so the embedding-column handling can't diverge. */
  private def mlVecs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.linalg.Vectors
    import s.implicits._
    Similarity.emb(s, dir)
      .map(r => (r.getAs[Long]("vec_id"),
        Vectors.dense(r.getAs[Seq[Double]]("v").toArray)))
      .toDF("vec_id", "features")
  }

  /** The IVF index build shared by [[ivfKmeans]] and its spec: a seeded
    * KMeans coarse quantizer over the corpus plus per-vector cell
    * assignments. Deterministic for a fixed corpus plan + seed. */
  def ivfIndex(s: SparkSession, dir: String, nCells: Int)
      : (org.apache.spark.ml.clustering.KMeansModel, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    val vecs = mlVecs(s, dir)
    val model = new KMeans().setK(nCells).setSeed(42L)
      .setFeaturesCol("features").setPredictionCol("cell").fit(vecs)
    (model, model.transform(vecs))
  }

  /** IVF with a TRAINED coarse quantizer: the [[ivfIndex]] KMeans
    * assigns every corpus vector to its nearest centroid once (one
    * pass), and a probe searches only its `nProbe` closest cells'
    * postings via a co-partitioned equi-join on the cell id. Centroids
    * are tiny and broadcast; the corpus shuffles once on cell id at
    * build time and never again. The oracle-checked sibling with a
    * deterministic quantizer is s08_ivf_grid. */
  def ivfKmeans(s: SparkSession, dir: String, k: Int = 5, nCells: Int = 16,
      nProbe: Int = 2): DataFrame = {
    import s.implicits._
    val (model, posted) = ivfIndex(s, dir, nCells)
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq
      .toDF("cell", "centroid")
    val queries = Similarity.emb(s, dir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    // nProbe nearest cells per query: queries × centroids is Q·nCells
    // rows — trivially small, centroids broadcast.
    val probes = queries.join(broadcast(centroids))
      .select(col("qid"), col("qv"), col("cell"),
        aggregate(zip_with(col("qv"), col("centroid"),
          (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x).as("d2"))
      .withColumn("cell_rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("d2").asc, col("cell").asc)))
      .filter(col("cell_rk") <= nProbe)
      .select(col("qid"), col("qv"), col("cell"))
    val scored = posted.join(probes, Seq("cell"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("nn_id"),
        Similarity.cosine(col("qv"),
          org.apache.spark.ml.functions.vector_to_array(col("features"))
            .cast("array<double>"))
          .as("cos_sim"))
    Similarity.topK(scored, col("qid"), k)
  }
}
