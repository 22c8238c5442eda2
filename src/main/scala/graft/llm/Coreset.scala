package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Greedy k-center coreset selection (Gonzalez's 2-approximation) over an
  * embedding column — the classic "pick k maximally spread exemplars"
  * step of data-curation pipelines (coreset selection, active-learning
  * seeding, eval-set diversity).
  *
  * The algorithm is inherently round-sequential (center t+1 is the point
  * farthest from centers 1..t), so the distributed shape is k scans:
  * each round broadcasts the selected centers as literal vectors, one
  * codegen pass computes every point's distance to the NEWEST center,
  * `least(...)` folds it into the running min-distance, and the argmax
  * travels as a TakeOrdered(1) — the only driver-side state is the k
  * selected rows themselves (a bounded artifact, same contract as the
  * IVF centroid collects). Distances are cosine via the native kernel,
  * so every comparison is the same IEEE sequence the DuckDB oracle runs;
  * ties break on the smaller id.
  *
  * At 100 TB: k fully parallel scans with nothing shuffled — the
  * min-distance column would be carried in a stored table between
  * incremental rounds rather than recomputed (same artifact discipline
  * as [[graft.store.AnnStore]]).
  *
  * Reference context: no counterpart in the reference; extends the
  * training-pipeline layer (tp8 semdedup picks REPRESENTATIVE points,
  * this picks SPREAD ones).
  */
object Coreset {

  /** Returns (round, id) for the k selected centers; round 1 is the
    * seed (the row with id = seedId).
    */
  def kCenterGreedy(spark: SparkSession, df: DataFrame, idCol: String,
      vecCol: String, k: Int, seedId: Long): DataFrame = {
    require(k >= 1 && k <= 4096,
      s"k must be in [1, 4096], got $k — each greedy round is one scan " +
        "plus a 1-row collect, so large k means k sequential jobs; " +
        "cluster-sample first if you need more exemplars")
    val pts = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))

    def vecLit(v: Seq[Double]) = array(v.map(lit): _*)
    def distTo(center: Seq[Double]) =
      lit(1.0) - Similarity.cosine(col("v"), vecLit(center))

    val seed = pts.filter(col("id") === seedId).take(1).headOption.getOrElse(
      sys.error(s"kCenterGreedy: seed id $seedId not found in '$idCol'"))
    var centers = Vector((seedId, seed.getSeq[Double](1)))
    // running min distance to the selected set, folded one center per round
    var scored = pts.withColumn("md", distTo(centers.head._2))
    var exhausted = false
    for (_ <- 2 to k if !exhausted) {
      val next = scored.filter(col("md") > 0)
        .orderBy(col("md").desc, col("id")).limit(1).take(1).headOption
      next match {
        case Some(row) =>
          val nid = row.getLong(0)
          val nv = row.getSeq[Double](1)
          centers :+= ((nid, nv))
          scored = scored.withColumn("md", least(col("md"), distTo(nv)))
        case None =>
          // every remaining point coincides with a selected center (k >
          // distinct points, or duplicate vectors): stop rather than
          // re-emit an already-covered point as a duplicate center
          exhausted = true
      }
    }
    val rows = centers.zipWithIndex.map { case ((id, _), i) =>
      Row(i + 1L, id)
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("round", LongType, nullable = false),
      StructField("id", LongType, nullable = false))))
  }
}
