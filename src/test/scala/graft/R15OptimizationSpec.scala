package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.table.GraftTable
import graft.ext.TextOps
import graft.streaming.StreamOps

/** Focused spec for the round-15 optimization changes:
  *
  *  - `viewSqlOf` renders ONE parquet relation per homogeneous dir group
  *    (brace glob + CASE on input_file_name) instead of one per dir —
  *    results must be identical to the per-dir rendering (≡ dfAt), the
  *    relation count must collapse, schema-evolution NULL projection must
  *    survive grouping, and glob metacharacters in the table root must
  *    read literally;
  *  - the one-md5-pass ingest prep (`md5DocHashPairs` +
  *    `md5BandedSignatureFromPairs`) must be BIT-IDENTICAL to the
  *    two-pass `md5DocSets` + `md5BandedSignature` construction;
  *  - `ingestDedupBatch` sweeps its per-batch scratch dir on success AND
  *    on failure (ADVICE r13 / VERDICT r14 item 8);
  *  - `RetriesExhaustedException` chains the last losing race as its
  *    cause and stays a `ConcurrentOverwriteException` to type-keyed
  *    outer retriers (VERDICT r14 item 8).
  */
class R15OptimizationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private def relationCount(sql: String): Int =
    "FROM parquet\\.".r.findAllIn(sql).size

  private def collectSorted(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("viewSql collapses same-shape dirs to one relation and matches dfAt") {
    import spark.implicits._
    val df = (1 to 300).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val t = GraftTable.create(spark, TestSpark.tmpDir("vsql-group"), df.schema,
      key = Seq("id"), formatVersion = 2)
    // 4 appends + 2 rowDeltas (each adds a data dir AND a delete file)
    t.append(df.filter($"id" <= 100))
    t.append(df.filter($"id" > 100 && $"id" <= 200))
    t.append(df.filter($"id" > 200))
    t.rowDelta(Seq(5L, 7L).toDF("id"),
      Seq(5L, 7L).map(i => (i, s"upd$i")).toDF("id", "v"), Seq("id"))
    t.rowDelta(Seq(7L, 9L).toDF("id"),
      Seq(7L, 9L).map(i => (i, s"upd2_$i")).toDF("id", "v"), Seq("id"))
    val snap = t.snapshot
    assert(snap.dataDirs.size >= 5 && snap.deletes.size >= 2,
      s"fixture shape drifted: ${snap.dataDirs.size} dirs / ${snap.deletes.size} deletes")
    val sql = t.viewSql
    // one data relation (all dirs same shape) + one delete relation
    assert(relationCount(sql) == 2,
      s"expected 2 parquet relations, got ${relationCount(sql)} in:\n$sql")
    assert(collectSorted(spark.sql(sql)) == collectSorted(t.toDF),
      "grouped view SQL disagrees with dfAt")
    // the delete-version guard must still apply: upd2_7 wins over upd7
    val v7 = spark.sql(sql).filter($"id" === 7L).collect().map(_.getString(1)).toSeq
    assert(v7 == Seq("upd2_7"), s"MoR guard broken: id=7 -> $v7")
  }

  test("viewSql keeps schema-evolution NULL projection across grouping") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, s"a$i")).toDF("id", "a")
    val t = GraftTable.create(spark, TestSpark.tmpDir("vsql-evolve"), df.schema)
    t.append(df.filter($"id" <= 25))
    t.append(df.filter($"id" > 25))
    t.addColumn("b", org.apache.spark.sql.types.StringType)
    val withB = (51 to 60).map(i => (i.toLong, s"a$i", s"b$i")).toDF("id", "a", "b")
    t.append(withB)
    val sql = t.viewSql
    // pre-`since` dirs group together (NULL-projected b), the post-add
    // dir is its own group: exactly 2 relations
    assert(relationCount(sql) == 2,
      s"expected 2 parquet relations (old group + new), got:\n$sql")
    val got = collectSorted(spark.sql(sql))
    assert(got == collectSorted(t.toDF), "evolved view SQL disagrees with dfAt")
    val nullB = spark.sql(sql).filter(col("b").isNull).count()
    assert(nullB == 50L, s"pre-add rows must project NULL b (got $nullB)")
  }

  test("viewSql reads literally from a table root containing glob metacharacters") {
    import spark.implicits._
    // a root with every Hadoop glob special the escaper handles; the
    // sibling decoy dir would be matched by an UNescaped `t{x}` pattern
    val base = java.nio.file.Files.createTempDirectory("graft_vsql_glob").toString
    val root = s"$base/t{x}[1]"
    val df = (1 to 40).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val t = GraftTable.create(spark, root, df.schema, key = Seq("id"),
      formatVersion = 2)
    t.append(df.filter($"id" <= 20))
    t.append(df.filter($"id" > 20))
    t.rowDelta(Seq(3L).toDF("id"),
      Seq((3L, "upd3")).toDF("id", "v"), Seq("id"))
    val sql = t.viewSql
    val got = spark.sql(sql)
    assert(got.count() == 40L, s"glob-metachar root misread:\n$sql")
    assert(got.filter($"id" === 3L).collect().map(_.getString(1)).toSeq
      == Seq("upd3"), "MoR guard lost under glob-escaped root")
  }

  test("one-pass hash pairs reproduce md5DocSets/md5BandedSignature bit-for-bit") {
    val docs = graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val twoPass = TextOps.md5DocSets(docs)
    val onePass = TextOps.md5DocHashPairs(docs)
    // htoks identical
    val htA = collectSorted(twoPass.select(col("doc_id"), col("htoks")))
    val htB = collectSorted(onePass.select(col("doc_id"), col("htoks")))
    assert(htA == htB, "htoks drifted between the one- and two-pass preps")
    // banded signatures identical
    val sigA = collectSorted(TextOps.md5BandedSignature(twoPass, 64, 8))
    val sigB = collectSorted(TextOps.md5BandedSignatureFromPairs(
      onePass.select(col("doc_id"), col("pairs")), 64, 8))
    assert(sigA == sigB, "banded signature drifted between constructions")
  }

  private def scratchDirsFor(batchId: Long): Seq[java.io.File] = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(s"graft_ingest_scratch_$batchId"))
      .toSeq
  }

  test("ingestDedupBatch sweeps its scratch dir on success and on failure") {
    val docs = graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val idx = TextOps.createDedupIndex(spark)
    val corpus = GraftTable.create(spark,
      TestSpark.tmpDir("ingest-sweep-corpus"), docs.schema)
    // unique batch ids so this test only sees ITS scratch dirs
    val okId = 771001L
    StreamOps.ingestDedupBatch(docs.filter(col("doc_id") % 3 === 0),
      corpus.dir, idx, "sweep-cid", okId, 0.9)
    assert(scratchDirsFor(okId).isEmpty,
      s"successful batch left scratch: ${scratchDirsFor(okId)}")
    // failure path: a batch missing `text` fails in the prep; the
    // finally-sweep must still remove the scratch parent
    val badId = 771002L
    val bad = docs.select(col("doc_id")) // no text column
    intercept[Exception] {
      StreamOps.ingestDedupBatch(bad, corpus.dir, idx, "sweep-cid", badId, 0.9)
    }
    assert(scratchDirsFor(badId).isEmpty,
      s"failed batch left scratch: ${scratchDirsFor(badId)}")
  }

  test("pathVersionCol fails loudly when input_file_name is empty (interposed cache)") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "v")
    val t = GraftTable.create(spark, TestSpark.tmpDir("pvc-guard"), df.schema)
    val m = t.getClass.getDeclaredMethods
      .find(_.getName == "pathVersionCol").getOrElse(fail("pathVersionCol not found"))
    m.setAccessible(true)
    val vcol = m.invoke(t, Seq(("data/no-such-dir", 7)))
      .asInstanceOf[org.apache.spark.sql.Column]
    // a cached (non-file) relation evaluates input_file_name() to "" —
    // exactly the refactor hazard VERDICT r14 item 3 names. The guard
    // must THROW, never yield a NULL version that un-guards the delete
    // anti-join.
    val cached = spark.range(3).toDF("id").cache()
    cached.count()
    val e = intercept[Exception] { cached.withColumn("cv", vcol).collect() }
    assert(e.getMessage != null &&
      (e.getMessage.contains("cannot derive commit version") ||
        Option(e.getCause).exists(_.getMessage.contains("cannot derive commit version"))),
      s"expected the loud version-derivation error, got: $e")
    cached.unpersist()
  }

  test("retryCow exhaustion chains the last race and stays a ConcurrentOverwriteException") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "v")
    val t = GraftTable.create(spark, TestSpark.tmpDir("retry-chain"), df.schema)
    // drive the private statement-retry loop directly with a body that
    // always loses its race — the loop must exhaust, chain the LAST
    // race as the cause, and remain collision-typed
    val m = t.getClass.getDeclaredMethods
      .find(_.getName == "retryCow").getOrElse(fail("retryCow not found"))
    m.setAccessible(true)
    var n = 0
    val body: Function0[Any] = () => {
      n += 1
      throw new GraftTable.ConcurrentOverwriteException(s"race $n")
    }
    val thrown = intercept[java.lang.reflect.InvocationTargetException] {
      m.invoke(t, "spec-op", body)
    }.getCause
    assert(thrown.isInstanceOf[GraftTable.RetriesExhaustedException],
      s"expected RetriesExhaustedException, got $thrown")
    assert(thrown.isInstanceOf[GraftTable.ConcurrentOverwriteException],
      "exhaustion must stay collision-typed for outer retriers")
    val cause = thrown.getCause
    assert(cause != null && cause.getMessage == s"race $n",
      s"cause must chain the LAST race (got $cause after $n attempts)")
  }
}
