package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.sources._

import graft.pol.PoolJsonSink.{ColStat, LongStat, TableManifest}

/** Randomized parity for the whole-file delete/filter classifier —
  * the one component where a wrong answer silently DELETES data or
  * serves a filtered scan extra/missing rows. Oracle: brute-force
  * row evaluation of the same conjunction over synthetic files whose
  * stats are derived exactly the way the writer derives them
  * (min/max over non-nulls, null count, row count).
  *
  * Properties (both directions):
  *  - SOUNDNESS: whenever classify answers Some(drop), `drop` is
  *    EXACTLY the files where every row matches, and every other
  *    file has NO matching row.
  *  - FIRING FLOOR: the fast path must actually fire across the
  *    10k cases (conservatism is allowed per case, but a generator
  *    that never exercises Some() would prove nothing).
  */
class MetadataDeleteRandomSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260815L)

  /** A synthetic file: rows are Option[Long] values of column "c". */
  private case class F(rel: String, rows: Seq[Option[Long]])

  private def statsOf(f: F): Map[String, ColStat] = {
    val present = f.rows.flatten
    val base = Map(
      graft.pol.PoolJsonSink.RowsStatCol ->
        (LongStat(f.rows.size, f.rows.size): ColStat),
      s"${graft.pol.PoolJsonSink.NullsStatColPrefix}c" ->
        (LongStat(f.rows.count(_.isEmpty), f.rows.count(_.isEmpty))
          : ColStat))
    if (present.isEmpty) base
    else base + ("c" -> (LongStat(present.min, present.max): ColStat))
  }

  private def manifestOf(fs: Seq[F]): TableManifest =
    TableManifest(1L,
      fs.zipWithIndex.map { case (f, i) => i.toLong -> Seq(f.rel) }.toMap,
      fs.map(f => f.rel -> statsOf(f)).toMap)

  /** Row-level truth of one conjunct (NULL row matches nothing but
    * IS NULL).
    */
  private def rowMatches(fl: Filter, v: Option[Long]): Boolean =
    fl match {
      case EqualTo("c", x: Long) => v.contains(x)
      case LessThan("c", x: Long) => v.exists(_ < x)
      case LessThanOrEqual("c", x: Long) => v.exists(_ <= x)
      case GreaterThan("c", x: Long) => v.exists(_ > x)
      case GreaterThanOrEqual("c", x: Long) => v.exists(_ >= x)
      case In("c", xs) => v.exists(l => xs.contains(l))
      case IsNull("c") => v.isEmpty
      case IsNotNull("c") => v.isDefined
      case And(l, r) => rowMatches(l, v) && rowMatches(r, v)
      case other => sys.error(s"unexpected $other")
    }

  private def genFilter(): Filter = rnd.nextInt(8) match {
    case 0 => EqualTo("c", rnd.between(-3L, 4L))
    case 1 => LessThan("c", rnd.between(-3L, 4L))
    case 2 => LessThanOrEqual("c", rnd.between(-3L, 4L))
    case 3 => GreaterThan("c", rnd.between(-3L, 4L))
    case 4 => GreaterThanOrEqual("c", rnd.between(-3L, 4L))
    case 5 => In("c", Array.fill(rnd.between(1, 4))(
      rnd.between(-3L, 4L).asInstanceOf[Any]))
    case 6 => IsNull("c")
    case 7 => IsNotNull("c")
  }

  test("10k random (files, conjunction) cases: every fast-path " +
      "answer is exact") {
    var fired = 0
    (1 to 10000).foreach { i =>
      val files = Seq.tabulate(rnd.between(1, 5)) { j =>
        F(s"data/f$j.parquet", Seq.fill(rnd.between(1, 6))(
          if (rnd.nextInt(5) == 0) None
          else Some(rnd.between(-3L, 4L))))
      }
      val m = manifestOf(files)
      val conj = Seq.fill(rnd.between(1, 3))(genFilter())
      val truth = files.map(f =>
        f.rel -> f.rows.count(v => conj.forall(rowMatches(_, v))))
      val allIn = truth.collect {
        case (rel, n) if n == files.find(_.rel == rel).get.rows.size =>
          rel
      }.toSet
      // SOUNDNESS is the property that matters (a wrong Some deletes
      // data / mis-serves a filtered scan); completeness cannot be
      // oracle-checked without re-implementing interval reasoning
      // (zone maps legitimately cannot see a value ABSENT inside
      // [min,max], contradictory conjunct pairs, or IN unions that
      // only jointly cover a file — all verified conservative by the
      // directed specs). The firing floor below keeps the generator
      // honest about actually exercising the fast path.
      MetadataDelete.allInFilesV1(m, conj).foreach { drop =>
        fired += 1
        assert(drop == allIn,
          s"case $i: classify said $drop, truth $allIn " +
            s"(files=$files conj=$conj)")
      }
    }
    assert(fired > 1000, s"fast path fired only $fired/10000 times — " +
      "the generator stopped exercising it")
  }
}
