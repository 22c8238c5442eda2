package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftExtensions

/** The SQL surface: native expressions via SparkSessionExtensions and
  * scalar functions via registerAll, callable from plain spark.sql.
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("native expressions are callable from SQL after registration") {
    // registerAll uses the same expression builders the config-based
    // GraftExtensions (spark.sql.extensions) injects at session build
    GraftExtensions.registerAll(spark)

    val dot = spark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.5D)) AS d")
      .head.getDouble(0)
    assert(dot == 12.0)

    val pop = spark.sql("SELECT bit_and_count(array(3L), array(6L)) AS n")
      .head.getLong(0)
    assert(pop == 1L) // 0b011 & 0b110 = 0b010

    val hav = spark.sql("SELECT haversine_m(0D, 0D, 1D, 0D) AS m").head.getDouble(0)
    assert(math.abs(hav - 111194.9) < 1.0)

    val nid = spark.sql("SELECT node_id(-122.3132940D, 47.6598762D, 7) AS n")
      .head.getString(0)
    assert(nid == Fixture.TestNode1)

    val lang = spark.sql(
      "SELECT lang_id('the cat and the dog went to the park') AS l").head.getString(0)
    assert(lang == "en")
  }

  test("SQL expressions coerce non-canonical input types (float embeddings, int masks)") {
    GraftExtensions.registerAll(spark)
    // the embeddings table stores array<float>; analysis must insert the
    // element cast instead of reading float-packed data as doubles
    val dotF = spark.sql(
      """SELECT dot_product(cast(array(1.0, 2.0) AS array<float>),
        |                   cast(array(3.0, 4.5) AS array<float>)) AS d""".stripMargin)
      .head.getDouble(0)
    assert(dotF == 12.0)
    val popI = spark.sql(
      "SELECT bit_and_count(cast(array(3) AS array<int>), cast(array(6) AS array<int>)) AS n")
      .head.getLong(0)
    assert(popI == 1L)
  }
}
