package graft

import graft.cluster.ConnectedComponents
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkTestBase {
  import spark.implicits._

  test("components are min-id and partitioning-independent") {
    val vertices = (1 to 10).map(_.toString).toDF("id")
    // components: {1,2,3,4} (chain), {5,6}, {7}, {8,9,10} (star on 9)
    val edges = Seq(("1","2"),("2","3"),("3","4"),("5","6"),("9","8"),("9","10"))
      .toDF("src", "dst")
    val got = ConnectedComponents.run(spark, vertices, edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("1") == "1" && got("4") == "1" && got("2") == "1")
    assert(got("5") == "5" && got("6") == "5")
    assert(got("7") == "7")
    assert(got("8") == "10" || got("8") == "8") // min of {8,9,10} as strings = "10"
    assert(got("8") == got("9") && got("9") == got("10"))

    // repartitioned input yields identical labels (determinism)
    val got2 = ConnectedComponents.run(spark,
      vertices.repartition(7), edges.repartition(5))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == got2)
  }

  test("long chain converges within iteration cap (pointer jumping)") {
    val n = 64
    val ids = (1 to n).map(i => f"v$i%03d")
    val vertices = ids.toDF("id")
    val edges = ids.sliding(2).map(p => (p(0), p(1))).toSeq.toDF("src", "dst")
    val got = ConnectedComponents.run(spark, vertices, edges)
      .select("comp").distinct().collect()
    assert(got.length == 1 && got(0).getString(0) == "v001")
  }
}
