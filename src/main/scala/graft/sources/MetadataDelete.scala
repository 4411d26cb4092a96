package graft.sources

import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.{AlwaysTrue, And, Predicate}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.pol.PoolJsonSink
import graft.pol.PoolJsonSink.{BinStat, ColStat, LongStat, TableManifest}

/** Whole-file classification for metadata-only DELETE (Iceberg's
  * metadata delete): given the pushed predicate conjunction, each
  * live file is proven — from manifest zone maps plus the recorded
  * per-column null counts — to be either
  *
  *  - DROP: EVERY row matches (each conjunct's [min,max] sits inside
  *    the predicate's accepting interval AND the column has zero
  *    recorded nulls — min/max alone cannot speak for NULL rows), or
  *  - KEEP: NO row matches (some conjunct excludes the whole range —
  *    the same test the scan's zone-map pruning runs; NULL rows match
  *    no comparison, so no null-count evidence is needed), or
  *  - UNKNOWN: the file straddles the predicate, a stat is missing,
  *    or the conjunct shape is unsupported.
  *
  * Any UNKNOWN file fails the whole classification and Spark falls
  * back to the copy-on-write row-level plan — correctness never rides
  * on the proof, only the O(manifest) fast path does. At 100 TB this
  * is "drop last quarter's partition" as one manifest commit instead
  * of a full rewrite of every touched bucket.
  *
  * Supported conjuncts: =, <, <=, >, >= and IN over LONG-family and
  * STRING columns with recorded stats (strings compare in parquet's
  * unsigned-lexicographic byte order via the same comparator the
  * writer used), plus ALWAYS_TRUE (an unqualified DELETE = drop every
  * file). Everything else is UNKNOWN by construction.
  */
private[sources] object MetadataDelete {

  private sealed trait Verdict
  private case object Drop extends Verdict
  private case object Keep extends Verdict
  private case object Unknown extends Verdict

  /** A parsed `col op literal` conjunct (op normalized so the column
    * is on the left).
    */
  private case class Cmp(col: String, op: String, value: Any,
      dt: DataType)

  private def flip(op: String): String = op match {
    case "<" => ">"
    case "<=" => ">="
    case ">" => "<"
    case ">=" => "<="
    case other => other
  }

  /** Flatten the predicate array (implicitly ANDed) into conjuncts;
    * None when any sub-predicate is not a supported comparison.
    */
  private def conjuncts(ps: Seq[Predicate]): Option[Seq[Cmp]] = {
    val out = Seq.newBuilder[Cmp]
    var inId = 0
    def walk(p: Predicate): Boolean = p match {
      case _: AlwaysTrue => true
      case a: And => walk(a.left()) && walk(a.right())
      case p if p.name() == "IN" =>
        p.children().toSeq match {
          case (f: NamedReference) +: lits
              if f.fieldNames().length == 1 && lits.nonEmpty &&
                lits.forall(_.isInstanceOf[Literal[_]]) =>
            // IN re-enters as per-value conjuncts tagged with a
            // per-predicate id (NOT just the column — two INs on the
            // same column are an intersection, never one big set);
            // classify() reassembles each group through inPass.
            inId += 1
            val cmps = lits.map { l =>
              val lv = l.asInstanceOf[Literal[_]]
              Cmp(f.fieldNames().head, s"IN#$inId", lv.value(), lv.dataType())
            }
            cmps.forall(supported) && { out ++= cmps; true }
          case _ => false
        }
      case p if Seq("=", "<", "<=", ">", ">=").contains(p.name()) =>
        p.children().toSeq match {
          case Seq(f: NamedReference, l: Literal[_])
              if f.fieldNames().length == 1 =>
            val c = Cmp(f.fieldNames().head, p.name(), l.value(), l.dataType())
            supported(c) && { out += c; true }
          case Seq(l: Literal[_], f: NamedReference)
              if f.fieldNames().length == 1 =>
            val c = Cmp(f.fieldNames().head, flip(p.name()), l.value(),
              l.dataType())
            supported(c) && { out += c; true }
          case _ => false
        }
      case _ => false
    }
    if (ps.forall(walk)) Some(out.result()) else None
  }

  private def supported(c: Cmp): Boolean = c.dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case StringType => true
    case _ => false
  }

  private def asLong(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.toLong
    case s: java.lang.Short => s.toLong
    case b: java.lang.Byte => b.toLong
    case other => sys.error(s"unexpected literal $other")
  }

  /** One conjunct against one file's stats: does it hold for ALL rows
    * / NO rows? Null-count evidence gates only the all-rows proof.
    */
  private def verdict(c: Cmp, stats: Map[String, ColStat]): Verdict = {
    val nulls = stats.get(
      s"${PoolJsonSink.NullsStatColPrefix}${c.col}").collect {
      case LongStat(n, _) => n
    }
    val zeroNulls = nulls.contains(0L)
    // an ALL-null file (no min/max recorded, nulls == rows) matches
    // no comparison or IN conjunct at all — provably Keep without
    // range evidence
    val allNull = (nulls, stats.get(PoolJsonSink.RowsStatCol)) match {
      case (Some(n), Some(LongStat(r, _))) => r > 0 && n == r
      case _ => false
    }
    c.op match {
      // null predicates need no range stats at all
      case "NOTNULL" =>
        return if (allNull) Keep
          else if (zeroNulls) Drop
          else Unknown
      case "ISNULL" =>
        return if (allNull) Drop
          else if (zeroNulls) Keep
          else Unknown
      case _ => ()
    }
    if (allNull) return Keep
    def tri(allTrue: Boolean, noneTrue: Boolean): Verdict =
      if (noneTrue) Keep
      else if (allTrue && zeroNulls) Drop
      else Unknown
    (stats.get(c.col), c.dt) match {
      case (Some(LongStat(mn, mx)), LongType | IntegerType | ShortType |
          ByteType) =>
        val v = asLong(c.value)
        c.op match {
          case "=" => tri(mn == v && mx == v, v < mn || v > mx)
          case "<" => tri(mx < v, mn >= v)
          case "<=" => tri(mx <= v, mn > v)
          case ">" => tri(mn > v, mx <= v)
          case ">=" => tri(mn >= v, mx < v)
          case op if op.startsWith("IN") =>
            // handled via inPass; a single IN value behaves like "="
            tri(mn == v && mx == v, v < mn || v > mx)
          case _ => Unknown
        }
      case (Some(BinStat(mn, mx)), StringType) =>
        val v = c.value.asInstanceOf[UTF8String].getBytes
        def cmpLo = PoolJsonSink.unsignedCompare(mn, v)
        def cmpHi = PoolJsonSink.unsignedCompare(mx, v)
        c.op match {
          case "=" => tri(cmpLo == 0 && cmpHi == 0, cmpLo > 0 || cmpHi < 0)
          case "<" => tri(cmpHi < 0, cmpLo >= 0)
          case "<=" => tri(cmpHi <= 0, cmpLo > 0)
          case ">" => tri(cmpLo > 0, cmpHi <= 0)
          case ">=" => tri(cmpLo >= 0, cmpHi < 0)
          case op if op.startsWith("IN") =>
            tri(cmpLo == 0 && cmpHi == 0, cmpLo > 0 || cmpHi < 0)
          case _ => Unknown
        }
      case _ => Unknown
    }
  }

  /** An IN set holds for ALL rows iff SOME member does (values are
    * disjoint points against one [min,max]); it holds for NO rows iff
    * EVERY member misses. Per-value verdicts combine accordingly.
    */
  private def inPass(vs: Seq[Verdict]): Verdict =
    if (vs.contains(Drop)) Drop
    else if (vs.forall(_ == Keep)) Keep
    else Unknown

  /** The shared core: every live file must classify; returns the
    * all-in ("Drop" for a delete, "rows all match" for a filter)
    * file set, None when any file is Unknown.
    */
  private def classifyCmps(m: TableManifest, cs: Seq[Cmp])
      : Option[Set[String]] = {
    val (inCs, plain) = cs.partition(_.op.startsWith("IN"))
    val inGroups = inCs.groupBy(_.op).values.toSeq
    val files = m.files
    val verdicts = files.map { f =>
      val stats = m.stats.getOrElse(f, Map.empty)
      val per = plain.map(verdict(_, stats)) ++
        inGroups.map(g => inPass(g.map(verdict(_, stats))))
      f -> (if (per.contains(Keep)) Keep
            else if (per.forall(_ == Drop)) Drop
            else if (per.isEmpty) Drop // unqualified DELETE
            else Unknown)
    }
    if (verdicts.exists(_._2 == Unknown)) None
    else Some(verdicts.collect { case (f, Drop) => f }.toSet)
  }

  /** Classify every live file of `m`; Some(files to drop) when each
    * is provably Drop or Keep, None otherwise.
    */
  def classify(m: TableManifest, ps: Seq[Predicate])
      : Option[Set[String]] =
    conjuncts(ps).flatMap(classifyCmps(m, _))

  /** The V1 `sources.Filter` face of the same proof — what the scan
    * builder's pushed filters arrive as. When the whole conjunction
    * classifies, the returned set is EXACTLY the predicate's matching
    * rows expressed as files: a scan serving those files whole needs
    * no residual filter, and a metadata aggregate may restrict to
    * them. None = at least one file straddles (or an unsupported
    * shape) — everything stays a conservative residual-filtered scan.
    */
  def allInFilesV1(
      m: TableManifest,
      fs: Seq[org.apache.spark.sql.sources.Filter])
      : Option[Set[String]] = {
    import org.apache.spark.sql.sources
    val out = Seq.newBuilder[Cmp]
    var inId = 0
    def lit(c: String, op: String, v: Any): Boolean = (v match {
      case l: Long => Some(Cmp(c, op, java.lang.Long.valueOf(l), LongType))
      case i: Int => Some(Cmp(c, op, java.lang.Long.valueOf(i.toLong),
        LongType))
      case sh: Short => Some(Cmp(c, op, java.lang.Long.valueOf(sh.toLong),
        LongType))
      case b: Byte => Some(Cmp(c, op, java.lang.Long.valueOf(b.toLong),
        LongType))
      case str: String => Some(Cmp(c, op, UTF8String.fromString(str),
        StringType))
      case _ => None
    }) match {
      case Some(cmp) => out += cmp; true
      case None => false
    }
    def walk(f: sources.Filter): Boolean = f match {
      case sources.And(l, r) => walk(l) && walk(r)
      case sources.EqualTo(c, v) => lit(c, "=", v)
      case sources.LessThan(c, v) => lit(c, "<", v)
      case sources.LessThanOrEqual(c, v) => lit(c, "<=", v)
      case sources.GreaterThan(c, v) => lit(c, ">", v)
      case sources.GreaterThanOrEqual(c, v) => lit(c, ">=", v)
      case sources.In(c, vs) if vs.nonEmpty =>
        inId += 1
        vs.forall(v => lit(c, s"IN#$inId", v))
      case sources.IsNotNull(c) =>
        out += Cmp(c, "NOTNULL", null, LongType); true
      case sources.IsNull(c) =>
        out += Cmp(c, "ISNULL", null, LongType); true
      case _ => false
    }
    if (fs.forall(walk)) classifyCmps(m, out.result()) else None
  }
}
