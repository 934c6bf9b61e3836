package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.table.GraftTable

/** Model-based fuzz of the table layer: a seeded random DML sequence
  * (append / rowDelta upsert / CoW delete / positional delete / update /
  * compact / expire / small-dir rewrite) runs against BOTH a GraftTable
  * and a driver-side Map model; logical state must agree at every
  * checkpoint, and `asOf` must reproduce sampled HISTORICAL model states
  * even after compaction rewrote the physical layout. Sequences a
  * hand-written spec would never enumerate are exactly where snapshot
  * isolation, delete-file application, and OCC rebase interact. */
class TableModelFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private type Model = Map[Long, (String, Double)]

  private def toDf(m: Seq[(Long, (String, Double))]) =
    m.map { case (id, (nm, v)) => (id, nm, v) }.toDF("id", "nm", "v")

  private def readBack(t: GraftTable): Model =
    t.toDF.select("id", "nm", "v").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap

  private def readAsOf(dir: String, v: Int): Model =
    GraftTable.load(spark, dir).asOf(v).select("id", "nm", "v").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap

  private def runSeed(seed: Long, nOps: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val dir = TestSpark.tmpDir(s"fuzz_$seed")
    val t = GraftTable.create(spark, dir,
      toDf(Seq.empty).schema, key = Seq("id"))
    t.upgradeFormat(2)
    var model: Model = Map.empty
    var nextId = 0L
    // version -> model state after that commit (for asOf probes)
    val history = scala.collection.mutable.ArrayBuffer.empty[(Int, Model)]
    def snap(): Unit = history += ((GraftTable.load(spark, dir).snapshot.version, model))

    (1 to nOps).foreach { i =>
      rnd.nextInt(8) match {
        case 0 | 1 => // append new keys (occasionally an empty batch)
          val n = rnd.nextInt(30)
          val rows = (0 until n).map { _ =>
            nextId += 1
            nextId -> (s"n${rnd.nextInt(5)}", rnd.nextInt(1000) / 10.0)
          }
          t.append(toDf(rows))
          model ++= rows
          snap()
        case 2 | 3 => // rowDelta upsert: mix of existing and new keys
          val existing = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(8))
          val fresh = (0 until rnd.nextInt(4)).map { _ => nextId += 1; nextId }
          val keys = existing ++ fresh
          if (keys.nonEmpty) {
            val rows = keys.map(k => k -> (s"u${rnd.nextInt(5)}", rnd.nextInt(1000) / 10.0))
            t.rowDelta(keys.toDF("id"), toDf(rows), Seq("id"))
            model ++= rows
            snap()
          }
        case 4 => // CoW delete by value predicate
          val cut = rnd.nextInt(100) / 1.0
          t.delete(col("v") < cut)
          model = model.filter { case (_, (_, v)) => !(v < cut) }
          snap()
        case 5 => // positional (MoR) delete by name predicate
          val nm = s"n${rnd.nextInt(5)}"
          t.deleteWherePositional(col("nm") === nm)
          model = model.filter { case (_, (n2, _)) => n2 != nm }
          snap()
        case 6 => // update: bump v for one name group
          val nm = s"u${rnd.nextInt(5)}"
          t.update(Map("v" -> (col("v") + 1.0)), col("nm") === nm)
          model = model.map { case (k, (n2, v)) =>
            k -> (n2, if (n2 == nm) v + 1.0 else v) }
          snap()
        case 7 => // maintenance: logical no-ops
          rnd.nextInt(3) match {
            case 0 => t.compact()
            case 1 =>
              // documented precondition: no pending deletes
              if (GraftTable.load(spark, dir).snapshot.deletes.nonEmpty) t.compact()
              t.rewriteSmallDirs()
            case 2 => t.expireSnapshots(keepLast = 3)
          }
          // no snap(): maintenance must not change logical state
      }
      if (i % 5 == 0 || i == nOps)
        assert(readBack(GraftTable.load(spark, dir)) === model,
          s"seed=$seed op=$i: table diverged from model")
    }
    // time travel: sampled historical states must reproduce exactly —
    // only for versions still materializable (expireSnapshots(keepLast=3)
    // may have erased older ones; those must THROW, not lie)
    val live = GraftTable.load(spark, dir)
    val expired = live.allSnapshots.filter(_.op == "expired").map(_.version).toSet
    val probes = rnd.shuffle(history.toSeq).take(6)
    probes.foreach { case (v, m) =>
      if (expired(v))
        assertThrows[Exception](readAsOf(dir, v))
      else
        assert(readAsOf(dir, v) === m, s"seed=$seed asOf($v) diverged from history")
    }
  }

  test("random DML sequences agree with the driver-side model (seed 1)") {
    runSeed(0xA11CE, 22)
  }
  test("random DML sequences agree with the driver-side model (seed 2)") {
    runSeed(0xB0B5EED, 22)
  }

  /** Same idea with SCHEMA EVOLUTION in the op mix: add / drop / re-add
    * (tombstone: no value resurrection) / rename race against appends and
    * MoR upserts. The model carries a dynamic extra-column set; a dropped
    * column's values must never come back under a re-added name. */
  private def runSchemaSeed(seed: Long, nOps: Int): Unit = {
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(seed)
    val dir = TestSpark.tmpDir(s"fuzzsc_$seed")
    val baseSchema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType)))
    val t = GraftTable.create(spark, dir, baseSchema, key = Seq("id"))
    t.upgradeFormat(2)
    var cols: Vector[String] = Vector.empty // live extra columns, in order
    var model: Map[Long, (Double, Map[String, Option[Long]])] = Map.empty
    var nextId = 0L
    var colSeq = 0

    def mkDf(rows: Seq[(Long, Double, Map[String, Option[Long]])]) = {
      val schema = StructType(baseSchema.fields.toSeq ++
        cols.map(c => StructField(c, LongType)))
      val data = rows.map { case (id, v, ex) =>
        org.apache.spark.sql.Row.fromSeq(
          // Seq(id, v) alone would numerically WIDEN the Long id to
          // Double (Scala unifies Seq(1L, 2.5) to Seq[Double])
          Seq[Any](id, v) ++ cols.map(c => ex.getOrElse(c, None).orNull))
      }
      spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
    }
    def check(tag: String): Unit = {
      val live = GraftTable.load(spark, dir)
      val got = live.toDF.collect().map { r =>
        val ex = cols.map(c =>
          c -> (if (r.isNullAt(r.fieldIndex(c))) None
                else Some(r.getLong(r.fieldIndex(c))))).toMap
        r.getLong(r.fieldIndex("id")) -> (r.getDouble(r.fieldIndex("v")), ex)
      }.toMap
      val want = model.map { case (id, (v, ex)) =>
        id -> (v, cols.map(c => c -> ex.getOrElse(c, None)).toMap) }
      assert(got === want, s"seed=$seed $tag: table diverged from model")
    }

    (1 to nOps).foreach { i =>
      rnd.nextInt(7) match {
        case 0 | 1 => // append with the CURRENT schema
          val rows = (0 until 1 + rnd.nextInt(10)).map { _ =>
            nextId += 1
            (nextId, rnd.nextInt(100) / 4.0,
              cols.map(c => c -> (if (rnd.nextBoolean()) Some(rnd.nextLong(50)) else None)).toMap)
          }
          t.append(mkDf(rows))
          model ++= rows.map(r => r._1 -> (r._2, r._3))
        case 2 => // MoR upsert under the current schema
          val keys = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(6))
          if (keys.nonEmpty) {
            val rows = keys.map(k => (k, rnd.nextInt(100) / 4.0,
              cols.map(c => c -> (if (rnd.nextBoolean()) Some(rnd.nextLong(50)) else None)).toMap))
            t.rowDelta(keys.toDF("id"), mkDf(rows), Seq("id"))
            model ++= rows.map(r => r._1 -> (r._2, r._3))
          }
        case 3 => // add a fresh OR previously-dropped column name
          val name = if (rnd.nextBoolean() || colSeq == 0) {
            colSeq += 1; s"c$colSeq"
          } else s"c${1 + rnd.nextInt(colSeq)}"
          if (!cols.contains(name)) {
            t.addColumn(name, LongType)
            cols :+= name
            // tombstone law: re-added name starts all-NULL everywhere
            model = model.map { case (k, (v, ex)) => k -> (v, ex - name) }
          }
        case 4 => // drop a live extra column
          if (cols.nonEmpty) {
            val c = cols(rnd.nextInt(cols.size))
            t.dropColumn(c)
            cols = cols.filterNot(_ == c)
          }
        case 5 => // rename a live extra column (values follow the rename)
          if (cols.nonEmpty) {
            colSeq += 1
            val from = cols(rnd.nextInt(cols.size)); val to = s"r$colSeq"
            t.renameColumn(from, to)
            cols = cols.map(c => if (c == from) to else c)
            model = model.map { case (k, (v, ex)) =>
              k -> (v, ex.get(from).fold(ex - from)(x => ex - from + (to -> x))) }
          }
        case 6 => // CoW delete
          val cut = rnd.nextInt(25) / 4.0
          t.delete(col("v") < cut)
          model = model.filter { case (_, (v, _)) => !(v < cut) }
      }
      if (i % 6 == 0 || i == nOps) check(s"op=$i")
    }
  }

  test("schema evolution races DML: table agrees with the model (seed 3)") {
    runSchemaSeed(0xCAFE7, 26)
  }
  test("schema evolution races DML: table agrees with the model (seed 4)") {
    runSchemaSeed(0xD00DAD, 26)
  }
}
