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
    // CDC-algebra anchor: the last (version, model) the changelog fold
    // was checked from (advances past inexpressible windows)
    var anchorV = GraftTable.load(spark, dir).snapshot.version
    var anchorModel: Model = model
    var foldChecks = 0

    (1 to nOps).foreach { i =>
      rnd.nextInt(9) match {
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
        case 8 => // streaming epoch upsert with TOMBSTONES (v < 0 retires
          // the key — the MV group-drain path) + ledger replay rejection
          val existing = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(6))
          val fresh = (0 until rnd.nextInt(3)).map { _ => nextId += 1; nextId }
          val keys = existing ++ fresh
          if (keys.nonEmpty) {
            val rows = keys.map(k =>
              k -> (s"e${rnd.nextInt(5)}", rnd.nextInt(1000) / 10.0 - 20.0))
            val applied = GraftTable.load(spark, dir).streamEpochUpsert(
              toDf(rows), Seq("id"), "fuzz", i.toLong,
              tombstoneWhen = Some(col("v") < 0))
            assert(applied, s"seed=$seed op=$i: fresh epoch $i rejected")
            model = model -- rows.filter(_._2._2 < 0).map(_._1) ++
              rows.filter(_._2._2 >= 0)
            snap()
            // exactly-once: replaying the SAME epoch (stale fold) no-ops
            val replayed = GraftTable.load(spark, dir).streamEpochUpsert(
              toDf(rows.map { case (k, (nm, _)) => k -> (nm, 9999.0) }),
              Seq("id"), "fuzz", i.toLong,
              tombstoneWhen = Some(col("v") < 0))
            assert(!replayed, s"seed=$seed op=$i: epoch $i re-applied")
          }
      }
      if (i % 5 == 0 || i == nOps) {
        assert(readBack(GraftTable.load(spark, dir)) === model,
          s"seed=$seed op=$i: table diverged from model")
        // CDC-ALGEBRA LAW: folding the changelog of (anchorV, curV] over
        // the anchor's model state must land exactly on today's model —
        // per version, delete pre-images retire keys, then inserts apply
        // (the upsert order). Windows crossing overwrite/rewrite/expired
        // commits are inexpressible by contract and skip (anchor still
        // advances, so every expressible window is eventually checked).
        val curV = GraftTable.load(spark, dir).snapshot.version
        val chOpt =
          try Some(GraftTable.load(spark, dir).changesBetween(anchorV, curV)
            .select("id", "nm", "v", "_change_type", "_commit_version").collect())
          catch { case _: Exception => None }
        chOpt.foreach { ch =>
          var st = anchorModel
          ch.groupBy(_.getInt(4)).toSeq.sortBy(_._1).foreach { case (_, rows) =>
            val (dels, ins) = rows.partition(_.getString(3) == "delete")
            st = st -- dels.map(_.getLong(0))
            st ++= ins.map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
          }
          assert(st === model,
            s"seed=$seed op=$i: changelog fold ($anchorV,$curV] diverged from model")
          foldChecks += 1
        }
        anchorV = curV
        anchorModel = model
      }
    }
    assert(foldChecks > 0,
      s"seed=$seed: CDC-algebra law never checked an expressible window (vacuous)")
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

  /** Same idea with the TIME-TRAVEL / GOVERNANCE surface in the op mix:
    * tags, branches (create / fast-forward / drop), WAP stage→audit→
    * publish-or-abort, rollback, rollback+cherry-pick, partition-spec
    * evolution, compaction and snapshot expiry race ordinary DML against
    * the driver-side model. Invariants a hand-written spec never
    * composes: a ref must keep replaying the EXACT historical state it
    * pins (even after compaction rewrote the layout and expiry erased
    * its neighbors), rollback must restore a past model verbatim,
    * cherry-pick must graft exactly one append's rows onto the rolled-
    * back state, and aborted WAP stages must leave no trace. */
  private def runRefSeed(seed: Long, nOps: Int): Unit = {
    import graft.table.PartitionField
    val rnd = new scala.util.Random(seed)
    val dir = TestSpark.tmpDir(s"fuzzref_$seed")
    val t = GraftTable.create(spark, dir, toDf(Seq.empty).schema, key = Seq("id"))
    t.upgradeFormat(2)
    var model: Model = Map.empty
    var nextId = 0L
    var refSeq = 0
    // version -> (model, spec in force) after that commit
    val history = scala.collection.mutable.LinkedHashMap.empty[Int, (Model, Seq[PartitionField])]
    // append-op rows by commit version (cherry-pick replays these)
    val appends = scala.collection.mutable.Map.empty[Int, Seq[(Long, (String, Double))]]
    val refs = scala.collection.mutable.Map.empty[String, (String, Int)] // name -> (type, version)
    def live = GraftTable.load(spark, dir)
    def snap(): Int = {
      val l = live; history(l.snapshot.version) = (model, l.spec)
      l.snapshot.version
    }
    def expired: Set[Int] =
      live.allSnapshots.filter(_.op == "expired").map(_.version).toSet
    def freshRows(n: Int): Seq[(Long, (String, Double))] =
      (0 until n).map { _ =>
        nextId += 1
        nextId -> (s"n${rnd.nextInt(5)}", rnd.nextInt(1000) / 10.0)
      }
    // coverage counters: a seed that never reaches an op class is a
    // hollow fuzz — assert the mix actually exercised the surface
    val hit = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    snap() // v0: empty table

    (1 to nOps).foreach { i =>
      rnd.nextInt(12) match {
        case 0 | 1 => // append new keys
          val rows = freshRows(1 + rnd.nextInt(20))
          t.append(toDf(rows))
          model ++= rows
          appends(snap()) = rows
        case 2 => // rowDelta upsert
          val existing = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(6))
          val fresh = freshRows(rnd.nextInt(3))
          val keys = existing ++ fresh.map(_._1)
          if (keys.nonEmpty) {
            val rows = existing.map(k =>
              k -> (s"u${rnd.nextInt(5)}", rnd.nextInt(1000) / 10.0)) ++ fresh
            t.rowDelta(keys.toDF("id"), toDf(rows), Seq("id"))
            model ++= rows
            snap()
          }
        case 3 => // CoW delete by value predicate
          val cut = rnd.nextInt(100) / 1.0
          t.delete(col("v") < cut)
          model = model.filter { case (_, (_, v)) => !(v < cut) }
          snap()
        case 4 => // WAP: stage -> audit -> publish or abort
          val rows = freshRows(1 + rnd.nextInt(10))
          val id = t.stageAppend(toDf(rows))
          // AUDIT: staged rows visible through stagedDF, invisible to reads
          assert(t.stagedDF(id).count() === rows.size.toLong,
            s"seed=$seed op=$i: staged row count diverged")
          assert(readBack(live) === model,
            s"seed=$seed op=$i: staged rows leaked into reads before publish")
          if (rnd.nextBoolean()) {
            t.publishStaged(id)
            hit("publish") += 1
            model ++= rows
            appends(snap()) = rows // published WAP commits as an append
          } else {
            hit("abort") += 1
            t.abortStaged(id)
            assert(!t.stagedIds.contains(id),
              s"seed=$seed op=$i: aborted stage still listed")
          }
        case 5 => // create a tag or branch at a random live version
          val candidates = history.keys.filterNot(expired).toSeq
          if (candidates.nonEmpty) {
            val v = candidates(rnd.nextInt(candidates.size))
            refSeq += 1
            val (name, tpe) =
              if (rnd.nextBoolean()) (s"tag$refSeq", "tag") else (s"br$refSeq", "branch")
            if (tpe == "tag") t.createTag(name, v) else t.createBranch(name, v)
            refs(name) = (tpe, v); hit(tpe) += 1
          }
        case 6 => // move a branch (fast-forward) or drop a ref
          val branches = refs.collect { case (n, ("branch", _)) => n }.toSeq
          if (branches.nonEmpty && rnd.nextBoolean()) {
            val n = branches(rnd.nextInt(branches.size))
            t.fastForward(n)
            refs(n) = ("branch", live.snapshot.version); hit("ff") += 1
          } else if (refs.nonEmpty) {
            val n = refs.keys.toSeq(rnd.nextInt(refs.size))
            t.dropRef(n)
            refs -= n
          }
        case 7 => // rollback to a random live historical version
          val candidates = history.keys.filterNot(expired).toSeq
          if (candidates.nonEmpty) {
            val v = candidates(rnd.nextInt(candidates.size))
            t.rollbackTo(v)
            model = history(v)._1
            snap(); hit("rollback") += 1
          }
        case 8 => // rollback + cherry-pick: graft one past append back on
          val ex = expired
          val picks = appends.keys.filterNot(ex).toSeq.sorted
          val compatible = for {
            va <- picks
            v0 <- history.keys.filterNot(ex)
            if v0 < va && history(v0)._2 == history(va)._2 // same spec epoch
          } yield (va, v0)
          if (compatible.nonEmpty) {
            val (va, v0) = compatible(rnd.nextInt(compatible.size))
            t.rollbackTo(v0)
            model = history(v0)._1
            snap()
            t.cherryPick(va)
            model ++= appends(va) // append keys were fresh at va: disjoint from model(v0)
            snap(); hit("cherry") += 1
          }
        case 9 => // maintenance: compaction (logical no-op, but a commit)
          t.compact(); snap(); hit("compact") += 1
        case 10 => // maintenance: snapshot expiry (in-place markers)
          t.expireSnapshots(keepLast = 5); hit("expire") += 1
        case 11 => // partition-spec evolution (metadata-only commit)
          t.updateSpec(rnd.nextInt(3) match {
            case 0 => Seq(PartitionField("nm", "identity"))
            case 1 => Seq(PartitionField("id", "bucket", 4))
            case _ => Seq.empty
          })
          snap(); hit("spec") += 1
      }
      if (i % 5 == 0 || i == nOps) {
        assert(readBack(live) === model, s"seed=$seed op=$i: table diverged from model")
        assert(live.refs.map(r => r.name -> ((r.refType, r.version))).toMap === refs.toMap,
          s"seed=$seed op=$i: refs metadata diverged")
      }
    }
    // ref probes: every live ref must replay the exact model state it
    // pins — expiry must have spared every pinned version
    refs.foreach { case (name, (_, v)) =>
      assert(!expired(v), s"seed=$seed: expiry erased ref-pinned v$v")
      val got = live.asOfRef(name).select("id", "nm", "v").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
      assert(got === history(v)._1, s"seed=$seed: ref $name diverged from history(v$v)")
    }
    val needed = Seq("publish", "abort", "tag", "branch", "ff", "rollback",
      "cherry", "compact", "expire", "spec")
    val missed = needed.filterNot(hit(_) > 0)
    assert(missed.isEmpty,
      s"seed=$seed never exercised: ${missed.mkString(", ")} (hits: $hit) — reroll the seed or raise nOps")
    // sampled time travel, as in the DML fuzz: expired must THROW, live must match
    val ex = expired
    rnd.shuffle(history.toSeq).take(6).foreach { case (v, (m, _)) =>
      if (ex(v)) assertThrows[Exception](readAsOf(dir, v))
      else assert(readAsOf(dir, v) === m, s"seed=$seed asOf($v) diverged from history")
    }
  }

  test("refs/WAP/rollback/cherry-pick/spec-evolution race DML: table agrees with the model (seed 5)") {
    runRefSeed(0x5EED5, 70)
  }
  test("refs/WAP/rollback/cherry-pick/spec-evolution race DML: table agrees with the model (seed 6)") {
    runRefSeed(0xFACADE, 70)
  }
}
