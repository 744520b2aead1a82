package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** Salted-join contract: row-identical to the plain equi-join, spreads
  * a hot key over the salt space, deterministic across layouts. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // 90% of left rows hit key 1; right has a few rows per key
  private def fixture = {
    val left = (0 until 5000).map { i =>
      (i.toLong, if (i % 10 == 0) (i / 10 % 50).toLong else 1L)
    }.toDF("row_id", "k")
    val right = (0 until 50).flatMap { k =>
      Seq((k.toLong, s"a$k"), (k.toLong, s"b$k"))
    }.toDF("rk", "payload")
    (left, right)
  }

  test("saltedInner equals the plain inner join, any salt count") {
    val (left, right) = fixture
    val plain = left.join(right, col("k") === col("rk"))
      .select("row_id", "k", "rk", "payload")
      .as[(Long, Long, Long, String)].collect().sorted
    for (salts <- Seq(1, 4, 16)) {
      val salted = SkewJoin.saltedInner(left, right, "k", "rk",
          saltBy = "row_id", salts = salts)
        .select("row_id", "k", "rk", "payload")
        .as[(Long, Long, Long, String)].collect().sorted
      assert(salted === plain, s"salts=$salts")
    }
  }

  test("the hot key's rows spread across the full salt space") {
    val (left, _) = fixture
    val used = left.withColumn("__s", pmod(xxhash64(col("row_id")), lit(8L)))
      .filter(col("k") === 1L)
      .select(countDistinct(col("__s"))).head.getLong(0)
    assert(used == 8L) // 4500 hot rows over 8 salts: all salts hit
  }

  test("salting is layout-independent") {
    val (left, right) = fixture
    val a = SkewJoin.saltedInner(left, right, "k", "rk", "row_id", 8)
      .select("row_id", "payload").as[(Long, String)].collect().sorted
    val b = SkewJoin.saltedInner(left.repartition(13), right, "k", "rk",
        "row_id", 8)
      .select("row_id", "payload").as[(Long, String)].collect().sorted
    assert(a === b)
  }
}
