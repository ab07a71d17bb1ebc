package graft.plans

import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo,
  Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual,
  Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

/** One z-layout file with its exact zone-map bounds. `None` bounds on
  * a dimension mean the column is ALL NULL in the file (no comparison
  * on it can hold); the keep-all encoding (Long.MinValue,
  * Long.MaxValue) marks bounds that were unavailable at map-build
  * time — trivially satisfied, so the file is always listed. */
case class ZoneEntry(status: FileStatus,
    pmin: Option[Long], pmax: Option[Long],
    omin: Option[Long], omax: Option[Long])

/** The zone map joined to Spark's OWN scan planning: a [[FileIndex]]
  * whose `listFiles` refutes pushed data filters against each file's
  * exact bounds, so ANY query over the relation — ordinary
  * `.filter(...)`s, SQL, joins — gets file-level skipping from the
  * planner with no special query method in the loop
  * ([[graft.operators.ZIndex.q172ZorderPrune]]'s driver-side consult,
  * generalized the way Delta's log-backed index integrates skipping).
  *
  * Conservative by construction: a file is dropped ONLY when some
  * pushed conjunct is provably unsatisfiable on its bounds — binary
  * comparisons (both orientations) between a mapped column and an
  * integral literal; every other expression shape keeps the file, so
  * unsupported predicates degrade to a full listing, never a wrong
  * answer (ZoneMapFileIndexSpec pins both directions and the
  * planner-counted kept set against the q172 consult). */
class ZoneMapFileIndex(root: Path,
    resolve: () => IndexedSeq[ZoneEntry]) extends FileIndex {

  /** Snapshot of the layout's committed state. `refresh()` re-resolves
    * through the maintenance path (stamp-checked, so a no-op feed is a
    * listStatus), which makes a LONG-LIVED relation handle durable
    * across appends: the next action after a refresh plans against the
    * new committed generation — the catalog-table behavior, without a
    * catalog table. */
  @volatile private var entries: IndexedSeq[ZoneEntry] = resolve()
  private[graft] def currentEntries: IndexedSeq[ZoneEntry] = entries

  override def rootPaths: Seq[Path] = Seq(root)
  override def partitionSchema: StructType = new StructType()
  override def sizeInBytes: Long = entries.map(_.status.getLen).sum
  override def inputFiles: Array[String] =
    entries.map(_.status.getPath.toString).toArray
  override def refresh(): Unit = { entries = resolve(); () }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val es = entries
    val kept = es.filter(e => dataFilters.forall(f => mayMatch(f, e)))
    ZoneMapFileIndex.lastTotal.set(es.size)
    ZoneMapFileIndex.lastKept.set(kept.size)
    Seq(PartitionDirectory(InternalRow.empty, kept.map(_.status).toArray))
  }

  private def bounds(e: ZoneEntry, name: String)
      : Option[(Option[Long], Option[Long])] = name.toLowerCase match {
    case "l_partkey" => Some((e.pmin, e.pmax))
    case "l_orderkey" => Some((e.omin, e.omax))
    case _ => None // unmapped column: no bounds, never refute
  }

  /** TRUE unless `expr`'s truth is refuted by the file's bounds. */
  private def mayMatch(expr: Expression, e: ZoneEntry): Boolean = {
    def lit(x: Expression): Option[Long] = x match {
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case _ => None
    }
    def attr(x: Expression): Option[String] = x match {
      case a: Attribute => Some(a.name)
      case _ => None
    }
    // may the file hold a row with column ⊗ v? lo/hi are the file's
    // exact non-null bounds; an all-null column (None) refutes every
    // comparison on it
    def may(name: String, v: Long, op: String): Boolean =
      bounds(e, name) match {
        case None => true
        case Some((Some(lo), Some(hi))) => op match {
          case ">=" => hi >= v
          case ">"  => hi > v
          case "<=" => lo <= v
          case "<"  => lo < v
          case "="  => lo <= v && v <= hi
        }
        case Some((None, None)) => false // all-null column
        case Some(_) => true // half-set bounds: malformed row, keep
      }
    def cmp(l: Expression, r: Expression, op: String,
        flipped: String): Option[Boolean] =
      (attr(l), lit(r), lit(l), attr(r)) match {
        case (Some(a), Some(v), _, _) => Some(may(a, v, op))
        case (_, _, Some(v), Some(a)) => Some(may(a, v, flipped))
        case _ => None
      }
    (expr match {
      case GreaterThanOrEqual(l, r) => cmp(l, r, ">=", "<=")
      case GreaterThan(l, r)        => cmp(l, r, ">", "<")
      case LessThanOrEqual(l, r)    => cmp(l, r, "<=", ">=")
      case LessThan(l, r)           => cmp(l, r, "<", ">")
      case EqualTo(l, r)            => cmp(l, r, "=", "=")
      case _ => None
    }).getOrElse(true) // unsupported shape: keep the file
  }
}

object ZoneMapFileIndex {
  /** Planner-side observables: zone-map size and kept set at the last
    * `listFiles` (the q175 spec surface). */
  val lastTotal = new AtomicLong
  val lastKept = new AtomicLong
}
