package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-10 ANN/multimodal surface: the governed-table IVF index, the
  * ANN-candidate margin-mining path, and the perceptual frame signature.
  * The oracle hashes the values; these specs pin the LAWS the oracles
  * cannot see (lifecycle equivalence, candidate-set shape, collision
  * invariance). */
class AnnIndexMarginSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  test("ann_index_probe: governed write→append→reload→probe ≡ the direct in-memory IVF serve") {
    // the lifecycle law: persisting assignments + frozen centroids
    // through the table layer and probing the reloaded tables must be
    // BIT-exact vs annIvf under the same published quantizer (doubles
    // roundtrip parquet exactly; ranks carry deterministic tiebreaks)
    val viaTable = ext.Similarity.queries("ann_index_probe")(spark, dir).collect()
    // the graded ann_ivf query IS the direct serve under the same
    // published quantizer (its recall gate returns the probe unchanged)
    val direct = ext.Similarity.queries("ann_ivf")(spark, dir).collect()
    assert(viaTable.length == direct.length && viaTable.nonEmpty)
    viaTable.zip(direct).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
  }

  test("ann_index_churn: MoR delete/upsert + compaction ≡ direct serve over the churned corpus") {
    import graft.functions.GraftFunctions.vec_dot
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    val viaTable = ext.Similarity.queries("ann_index_churn")(spark, dir).collect()
    val (numQueries, k, nClusters, nProbe, dim) = (8, 5, 16, 4, 64)
    // the lifecycle law: build → MoR equality-delete → MoR upsert →
    // compact → reload → probe must equal the probe over a corpus with
    // the churn applied as plain arithmetic (no table layer anywhere)
    val raw = graft.ops.Tables.embeddings(spark, dir)
      .select(col("vec_id").cast("long").as("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e0"))
    val churned = raw
      .filter(!(col("vec_id") >= numQueries && col("vec_id") % 7 === 3))
      .select(col("vec_id"),
        when(col("vec_id") >= numQueries && col("vec_id") % 11 === 5,
          reverse(col("e0"))).otherwise(col("e0")).as("e"))
    val centLit = array(ext.Similarity.fixedCentroids(nClusters, dim)
      .map(c => array(c.map(lit): _*)): _*)
    val assigned = churned
      .withColumn("__dots", transform(centLit, c => vec_dot(col("e"), c)))
      .withColumn("cluster",
        (array_position(col("__dots"), array_max(col("__dots"))) - 1).cast("int"))
    val qProbes = assigned.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("e").as("qe"),
        posexplode(col("__dots")).as(Seq("pcluster", "cdot")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cdot").desc, col("pcluster"))))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("qe"), col("pcluster").as("cluster"))
    val direct = qProbes
      .join(assigned.select(col("vec_id"), col("e"), col("cluster")), Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        ext.Similarity.cosine(col("qe"), col("e")).as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
      .orderBy("query_id", "rank").collect()
    assert(viaTable.length == direct.length && viaTable.nonEmpty)
    viaTable.zip(direct).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
    // the churn is non-vacuous at this SF: deleted ids never surface and
    // the answer actually moved vs the un-churned index's probe
    assert(viaTable.forall(r =>
      !(r.getLong(1) >= numQueries && r.getLong(1) % 7 == 3)),
      "a deleted vector surfaced as a neighbor")
    val preChurn = ext.Similarity.queries("ann_index_probe")(spark, dir).collect()
    assert(viaTable.toSeq != preChurn.toSeq,
      "churn changed nothing — vacuous fixture")
  }

  test("ann_index_refresh: post-swap serve ≡ direct IVF under the new model; refresh moved the answer") {
    // the internal requires pin serving continuity (time-travel probe ==
    // pre-refresh serve); here: the graded post-refresh answer equals the
    // no-table-layer direct serve under the 24-centroid model, and the
    // refresh is non-vacuous (some query's neighbors changed)
    val refreshed = ext.Similarity.queries("ann_index_refresh")(spark, dir).collect()
    val directNew = ext.Similarity.annIvf(spark, dir, nClusters = 24,
      quantizer = Some(ext.Similarity.fixedCentroids(24, 64))).collect()
    assert(refreshed.length == directNew.length && refreshed.nonEmpty)
    refreshed.zip(directNew).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
    val underOld = ext.Similarity.queries("ann_index_probe")(spark, dir).collect()
    assert(refreshed.toSeq != underOld.toSeq,
      "quantizer refresh changed nothing — vacuous model swap")
  }

  test("margin_mining_ann: candidate rule respected and gate passes") {
    val out = ext.Similarity.queries("margin_mining_ann")(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 50)
    // forward mining from the even half into the odd half — every
    // proposal must respect the collection split
    assert(out.forall(r => r.getLong(1) % 2 == 0), "x_id must be even-half")
    assert(out.forall(r => r.getLong(2) % 2 == 1), "y_id must be odd-half")
    // ranks are a 1..N prefix (global top-N, no gaps)
    assert(out.map(_.getInt(0)).toSeq == (1 to out.length))
  }

  test("margin_mining_ann pairs are a subset of the exact pair matrix scores") {
    // the ANN path must never invent a (x, y, cos) the exact matrix
    // doesn't contain — candidates are a SUBSET, selection is identical
    val ann = ext.Similarity.marginMiningAnn(spark, dir)
      .select(col("x_id"), col("y_id"), col("cos"))
    val exactPairs = {
      import graft.functions.GraftFunctions.vec_dot
      graft.functions.GraftFunctions.register(spark)
      val emb = graft.ops.Tables.embeddings(spark, dir)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
        .withColumn("nrm", sqrt(vec_dot(col("e"), col("e"))))
      val a = emb.filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("x_id"), col("e").as("x_e"), col("nrm").as("x_nrm"))
      val b = emb.filter(col("vec_id") % 2 === 1)
        .select(col("vec_id").as("y_id"), col("e").as("y_e"), col("nrm").as("y_nrm"))
      a.join(b, col("x_id") =!= col("y_id"))
        .select(col("x_id"), col("y_id"),
          round(vec_dot(col("x_e"), col("y_e")) / (col("x_nrm") * col("y_nrm")), 6)
            .as("cos"))
    }
    assert(ann.join(exactPairs, Seq("x_id", "y_id", "cos"), "left_anti").count() == 0,
      "ANN candidate scored a pair differently from the exact matrix")
  }

  test("aHash32: uniform brightness shift leaves the code unchanged; md5 would differ") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val n = 32
      val bytes = Array.fill(n)((rnd.nextInt(128)).toByte) // ASCII-range lumas
      val h0 = ext.Multimodal.aHash32(bytes, 0)
      val shifted = bytes.map(b => (b + 1).toByte)
      assert(ext.Multimodal.aHash32(shifted, 0) == h0,
        "+1 uniform shift must not change the average-hash")
      assert(ext.Multimodal.aHash32(bytes, 1) == h0,
        "the shift parameter models the same re-encode")
      // a NON-uniform perturbation (set one below-mean byte to max) flips
      // at least that bit — the hash is not a constant function
      val tampered = bytes.clone()
      val sum = bytes.map(_ & 0xFF).sum
      val i = bytes.indexWhere(b => (b & 0xFF) * n <= sum)
      if (i >= 0) {
        tampered(i) = 127
        val sum2 = tampered.map(_ & 0xFF).sum
        if (127 * n > sum2)
          assert(ext.Multimodal.aHash32(tampered, 0) != h0)
      }
    }
  }

  test("multimodal_frame_dedup_phash: every planted re-encode survives in its original's group") {
    val out = ext.Multimodal.queries("multimodal_frame_dedup_phash")(spark, dir)
    val groups = out.collect()
    assert(groups.nonEmpty)
    val reencoded = groups.filter(_.getInt(4) == 1)
    assert(reencoded.nonEmpty, "no group carries a planted re-encode — the collision law broke")
    // every group with a re-encode must also contain a real (< offset)
    // document: rep_doc is the min doc_id, so it is below the offset
    assert(reencoded.forall(_.getLong(3) < 10000000L),
      "a re-encode group lost its original document")
  }
}
