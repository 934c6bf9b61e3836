package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

class VectorDotSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  test("VectorDot matches the HOF fold bit-for-bit (codegen + interpreted)") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2), Seq(0.3, 0.7)),
      (Seq.empty[Double], Seq.empty[Double])
    ).toDF("a", "b")
    val hof = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, x) => acc + x))
      .as[Double].collect().toSeq
    val native = df.select(GraftFunctions.vec_dot($"a", $"b")).as[Double].collect().toSeq
    assert(native == hof)
    // SQL-text form works after registration
    df.createOrReplaceTempView("vecs")
    val viaSql = spark.sql("SELECT vec_dot(a, b) FROM vecs").as[Double].collect().toSeq
    assert(viaSql == hof)
  }

  test("custom expressions compile under CODEGEN_ONLY and match interpreted eval") {
    GraftFunctions.register(spark)
    graft.functions.TextSignatureFunctions.register(spark)
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0), Seq("alpha", "beta", "gamma")))
      .toDF("a", "b", "toks")
    def results() = df.select(
      GraftFunctions.vec_dot($"a", $"b"),
      graft.functions.TextSignatureFunctions.minhash_signature($"toks", 8),
      graft.functions.TextSignatureFunctions.simhash($"toks"),
      graft.functions.TextSignatureFunctions.sorted_intersect_count($"toks", $"toks"))
      .collect().map(_.toString).toSeq
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val gen = results()
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = results()
      assert(gen == interp)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("ZOrderLong: interleave properties + codegen parity") {
    import graft.functions.ZOrderLong
    ZOrderLong.register(spark)
    // bit-level golden values
    assert(ZOrderLong.interleave(0L, 0L) == 0L)
    assert(ZOrderLong.interleave(1L, 0L) == 1L)   // a -> even bits
    assert(ZOrderLong.interleave(0L, 1L) == 2L)   // b -> odd bits
    assert(ZOrderLong.interleave(3L, 3L) == 15L)  // 0b1111
    // locality: close points interleave to close z-values more often than
    // far points — check monotone prefix property on a quadrant
    assert(ZOrderLong.interleave(2L, 2L) < ZOrderLong.interleave(4L, 4L))
    val df = Seq((5L, 9L), (0L, 0L), (0xFFFFFFFFL, 0L)).toDF("a", "b")
    val viaExpr = df.select(ZOrderLong.z_order($"a", $"b")).as[Long].collect().toSeq
    assert(viaExpr == Seq(ZOrderLong.interleave(5L, 9L), 0L,
      ZOrderLong.interleave(0xFFFFFFFFL, 0L)))
  }

  test("SortedIntersectCount == size(array_intersect) on sorted-distinct arrays") {
    graft.functions.TextSignatureFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    def randSet() = (0 until rnd.nextInt(40)).map(_ => s"w${rnd.nextInt(30)}").distinct.sorted
    val rows = (0 until 200).map(_ => (randSet(), randSet()))
    val df = rows.toDF("a", "b")
    val got = df.select(
      graft.functions.TextSignatureFunctions.sorted_intersect_count($"a", $"b"),
      size(array_intersect($"a", $"b"))).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    // jaccard identity: inter/(|a|+|b|-inter) == intersect/union
    val jac = df.filter(size($"a") > 0 || size($"b") > 0).select(
      graft.functions.TextSignatureFunctions.sorted_intersect_count($"a", $"b")
        .cast("double") / (size($"a") + size($"b") -
          graft.functions.TextSignatureFunctions.sorted_intersect_count($"a", $"b")),
      size(array_intersect($"a", $"b")).cast("double") / size(array_union($"a", $"b")))
      .collect()
    jac.foreach { r =>
      val (x, y) = (r.getDouble(0), r.getDouble(1))
      assert((x.isNaN && y.isNaN) || x == y, r.toString)
    }
  }

  test("long-array inputs: intersect/jaccard match the string form; codegen parity") {
    graft.functions.TextSignatureFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    def randSet() = (0 until (5 + rnd.nextInt(40))).map(_ => s"w${rnd.nextInt(60)}").distinct.sorted
    val rows = (0 until 200).map(_ => (randSet(), randSet()))
    val df = rows.toDF("a", "b")
      // the dedup pipeline's representation: sorted distinct xxhash64 per token
      .withColumn("ha", array_sort(array_distinct(transform($"a", t => xxhash64(t)))))
      .withColumn("hb", array_sort(array_distinct(transform($"b", t => xxhash64(t)))))
    // intersection over hashed longs == intersection over the strings
    // (no 64-bit collisions at this scale), so hashed-set Jaccard is exact
    val cmp = df.select(
      graft.functions.TextSignatureFunctions.sorted_intersect_count($"a", $"b"),
      graft.functions.TextSignatureFunctions.sorted_intersect_count($"ha", $"hb"))
      .collect()
    cmp.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    // signatures over longs estimate the same Jaccard the string form does:
    // mean |sig agreement - exact jaccard| stays within MinHash stderr
    val k = 64
    val est = df.select(
      (graft.functions.TextSignatureFunctions.sorted_intersect_count($"a", $"b")
        .cast("double") / size(array_union($"a", $"b"))).as("jac"),
      (aggregate(zip_with(
        graft.functions.TextSignatureFunctions.minhash_signature($"ha", k),
        graft.functions.TextSignatureFunctions.minhash_signature($"hb", k),
        (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v)
        .cast("double") / k).as("est"))
      .collect()
    val meanErr = est.map(r => math.abs(r.getDouble(0) - r.getDouble(1))).sum / est.length
    assert(meanErr < 0.09, s"mean |est - jac| = $meanErr")
    // codegen/interpreted parity for every long-input expression
    def results() = df.select(
      graft.functions.TextSignatureFunctions.minhash_signature($"ha", 8),
      graft.functions.TextSignatureFunctions.simhash($"ha"),
      graft.functions.TextSignatureFunctions.sorted_intersect_count($"ha", $"hb"))
      .collect().map(_.toString).toSeq
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val gen = results()
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = results()
      assert(gen == interp)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("VectorDot nulls: null array or null element -> null") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(2.0)))),
      (None, Some(Seq(Some(1.0))))
    ).toDF("a", "b")
    val out = df.select(GraftFunctions.vec_dot($"a", $"b")).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("cosine via VectorDot is identical to HOF cosine on real embeddings") {
    val dir = "/root/testdata/sf0.001"
    GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("e"))
      .limit(50)
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val both = e.select(
      GraftFunctions.vec_dot($"e", $"e").as("native"),
      hofDot($"e", $"e").as("hof"))
    assert(both.filter($"native" =!= $"hof").count() == 0)
  }
}
