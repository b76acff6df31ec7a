package graft

import graft.sim.Similarity
import org.apache.spark.sql.functions._

class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  test("native dot is bit-identical to the higher-order-function fold") {
    val pairs = emb.limit(30).select($"vec_id".as("id_a"), $"embedding".as("va"))
      .crossJoin(emb.limit(30).select($"vec_id".as("id_b"), $"embedding".as("vb")))
    val r = pairs.select(
      Similarity.dot($"va", $"vb").as("native"),
      Similarity.dotHof($"va", $"vb").as("hof")).collect()
    assert(r.length === 900)
    r.foreach { row =>
      // bit-identical, not approximately equal
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(row.getDouble(1)))
    }
  }

  test("mixed float/double arrays (embedding × literal hyperplane)") {
    val plane = array((0 until 64).map(i => lit(math.sin(i + 1))): _*)
    val r = emb.limit(10).select(
      Similarity.dot($"embedding", plane).as("native"),
      Similarity.dotHof($"embedding", plane).as("hof")).collect()
    r.foreach { row =>
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(row.getDouble(1)))
    }
  }

  test("hyperplane buckets: wrong-dimension or null-element vectors bucket to null") {
    // Silent truncation would assign arbitrary buckets to malformed
    // embeddings (invisible recall loss); null drops them from the index.
    val planes = Array.tabulate(2 * 3 * 4)(i => math.sin(i + 1))
    val df = Seq(
      (1L, Seq(1f, 2f, 3f, 4f)), // correct dim
      (2L, Seq(1f, 2f)), // short
      (3L, Seq(1f, 2f, 3f, 4f, 5f)) // long
    ).toDF("id", "v")
    val r = df.select($"id",
        graft.functions.VectorExprs.hyperplaneBuckets($"v", planes, 2, 3, 4).as("b"))
      .collect().map(x => x.getLong(0) -> x.isNullAt(1)).toMap
    assert(r === Map(1L -> false, 2L -> true, 3L -> true))
    // and a malformed vector contributes NO rows to the LSH index
    val idx = Similarity.lshIndex(df, "id", "v", dim = 4, nPlanes = 3, nTables = 2)
    assert(idx.select($"id").distinct().as[Long].collect().toSet === Set(1L))
  }

  test("null propagation and empty arrays") {
    val df = Seq(
      (1L, Seq(1f, 2f), Seq(3f, 4f)),
      (2L, Seq.empty[Float], Seq.empty[Float])
    ).toDF("id", "a", "b")
      .union(Seq((3L, null.asInstanceOf[Seq[Float]], Seq(1f))).toDF("id", "a", "b"))
    val r = df.select($"id", Similarity.dot($"a", $"b").as("d")).collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
    assert(r(1L) === Some(11.0))
    assert(r(2L) === Some(0.0))
    assert(r(3L) === None)
  }
}
