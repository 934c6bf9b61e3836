package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The executor-side merged-delete cache must stay correct across its
  * eviction boundary: ConcurrentHashMap forbids mutating the map from
  * inside computeIfAbsent's mapping function, so eviction happens BEFORE
  * the compute — loading more tags than the bound must never corrupt or
  * throw, and re-loading an evicted tag must rebuild the same map. */
class ScratchDeletesCacheSpec extends AnyFunSuite {

  private def readerFor(version: Int): (String, Long) => Iterator[InternalRow] =
    (path, _) => Iterator(
      new GenericInternalRow(Array[Any](path.length.toLong, version)))

  test("loading past the eviction bound rebuilds evicted tags correctly") {
    val kt = Array[DataType](LongType)
    // 8 distinct tags: crosses the size-3 eviction bound at least twice
    val maps = (0 until 8).map { i =>
      GraftScratchDeletes.load(s"cache-spec-tag-$i",
        Seq((s"file-$i", 0L)), readerFor(i), kt)
    }
    maps.zipWithIndex.foreach { case (m, i) =>
      assert(m == Map(Seq[Any](s"file-$i".length.toLong) -> i),
        s"tag $i built a wrong map after eviction churn")
    }
    // an evicted early tag rebuilds (not stale, not corrupt)
    val again = GraftScratchDeletes.load("cache-spec-tag-0",
      Seq(("file-0", 0L)), readerFor(0), kt)
    assert(again == Map(Seq[Any]("file-0".length.toLong) -> 0))
  }
}
