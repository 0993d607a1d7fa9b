package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SQL front-end surface: the native codegen vector expressions are
  * reachable by name from pure SQL via GraftExtensions.
  */
class ExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("SQL front-end exposes the native vector functions") {
    GraftExtensions.register(spark)
    Seq((Array(1f, 0f), Array(0f, 1f)), (Array(1f, 2f), Array(1f, 2f)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val r = spark.sql(
      """SELECT round(float_cosine(a, b), 6) AS c,
                round(float_dot(a, b), 6) AS d,
                round(float_norm(a), 6) AS n
         FROM vecs ORDER BY d""").collect()
    assert(r(0).getDouble(0) === 0.0) // orthogonal
    assert(r(1).getDouble(0) === 1.0) // identical
    assert(r(1).getDouble(1) === 5.0) // 1*1 + 2*2
    assert(r(0).getDouble(2) === 1.0) // |(1,0)|
    // the spark-submit path (--conf spark.sql.extensions) wires the same
    // builders; applying to a fresh extensions object must not throw
    new GraftExtensions().apply(new SparkSessionExtensions)
  }
}
