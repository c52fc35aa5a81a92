package graft.relations

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-column min/max/null-count for one data file (VERDICT r3 #1 — the
  * Delta/Iceberg move: stats in the manifest turn the MERGE/snapshot
  * planning scan from O(table) into O(candidate-files)).
  *
  * Values are stored in a canonical string encoding (see [[Stats.canonical]])
  * so the manifest stays plain JSON; comparisons are re-typed from the
  * table schema at prune time. `min`/`max` are None when every value in
  * the file is null (or the type is not stats-comparable). */
final case class ColStats(min: Option[String], max: Option[String], nulls: Long, rows: Long)

object Stats {

  /** Canonical string encoding of a stats value. Total order within a
    * type matches the column's SQL order: strings lexicographic (Spark's
    * binary collation), numerics numeric, timestamps as epoch micros,
    * dates as epoch days. Types outside this set are not stats-comparable
    * and record no min/max (their files are always merge candidates). */
  def canonical(v: Any): Option[String] = v match {
    case null                     => None
    case s: String                => Some(s)
    case t: java.sql.Timestamp    => Some((t.getTime * 1000L + (t.getNanos % 1000000) / 1000).toString)
    case i: java.time.Instant     => Some((i.getEpochSecond * 1000000L + i.getNano / 1000).toString)
    case d: java.sql.Date         => Some(d.toLocalDate.toEpochDay.toString)
    case d: java.time.LocalDate   => Some(d.toEpochDay.toString)
    case b: java.lang.Boolean     => Some(if (b) "1" else "0")
    case d: java.math.BigDecimal  => Some(d.toPlainString)
    case d: scala.math.BigDecimal => Some(d.bigDecimal.toPlainString)
    case n: java.lang.Number      => Some(n.toString)
    case _                        => None
  }

  /** Spark compares strings as UTF-8 BYTES (UTF8String/binary collation),
    * which disagrees with Java's UTF-16 char order exactly where
    * supplementary characters meet U+E000..U+FFFF: UTF-8 puts U+FFFF
    * before U+1F600, UTF-16 ordering puts it after. Stats min/max come
    * from Spark's min()/max(), so pruning MUST compare the same way or a
    * file whose keys straddle that boundary can be wrongly pruned —
    * silent row loss in MERGE. */
  private val utf8Binary: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int =
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))
  }

  /** Ordering over canonical encodings for a column type; None = type not
    * stats-comparable (its files never prune). */
  def ordering(dt: DataType): Option[Ordering[String]] = dt match {
    case StringType => Some(utf8Binary)
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | BooleanType =>
      Some(Ordering.by(_.toLong))
    case FloatType | DoubleType => Some(Ordering.by(_.toDouble))
    case _: DecimalType         => Some(Ordering.by(BigDecimal(_)))
    case _                      => None
  }

  /** Min/max bounds of a key frame's columns, canonically encoded — the
    * one small aggregation job that prices the pruning. Returns None when
    * the frame is empty (no keys → no candidate files at all); a column
    * whose bound can't be encoded (all-null or unsupported type) is
    * simply absent from the map (no pruning on it). */
  def keyBounds(keys: DataFrame, cols: Seq[String]): Option[Map[String, (String, String)]] = {
    val aggs = count(lit(1)).as("__n") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c")))
    val row = keys.agg(aggs.head, aggs.tail: _*).collect().head
    if (row.getLong(row.fieldIndex("__n")) == 0L) None
    else Some(cols.flatMap { c =>
      for {
        lo <- canonical(row.get(row.fieldIndex(s"__min_$c")))
        hi <- canonical(row.get(row.fieldIndex(s"__max_$c")))
      } yield c -> (lo, hi)
    }.toMap)
  }

  /** Files of `v` that can contain a row matching `bounds`: every bounded
    * column's [min,max] must overlap the bound's [lo,hi]. Files without
    * stats (legacy, unsupported type) always survive — pruning is an
    * optimization, never a correctness gate. An all-null column can't
    * equal a non-null key, so (None, None) stats prune. */
  def candidateFiles(v: TableVersion, bounds: Map[String, (String, String)]): Seq[String] = {
    val orderings: Map[String, Option[Ordering[String]]] = bounds.map { case (c, _) =>
      c -> v.schema.fields.find(_.name == c).map(_.dataType).flatMap(ordering)
    }
    v.files.filter { f =>
      v.stats.get(f) match {
        case None => true
        case Some(cs) => bounds.forall { case (c, (lo, hi)) =>
          (orderings(c), cs.get(c)) match {
            case (Some(ord), Some(st)) =>
              if (st.rows == 0L) false
              else (st.min, st.max) match {
                case (Some(mn), Some(mx)) => ord.lteq(mn, hi) && ord.gteq(mx, lo)
                case _                    => false // all-null column
              }
            case _ => true // no ordering for the type, or no stats for the column
          }
        }
      }
    }
  }

  /** Files of `v` that may hold a NULL in `col` — the SCD-2 current-row
    * prune: current rows have dbt_valid_to IS NULL, so history-only files
    * (null count 0) never enter the snapshot's change-detection join. */
  def filesWithNulls(v: TableVersion, col: String): Seq[String] =
    v.files.filter { f =>
      v.stats.get(f).flatMap(_.get(col)) match {
        case None     => true
        case Some(st) => st.nulls > 0
      }
    }

  /** Per-file stats of a staged write: ONE aggregation job over only the
    * stat columns of the delta (parquet column pruning keeps it cheap),
    * grouped by file. `basePath`-style partition columns resolve from
    * directory names, so partition values cost no data read. */
  def collect(df: DataFrame, statsCols: Seq[String]): Map[String, Map[String, ColStats]] = {
    val cols = statsCols.filter(df.columns.contains)
    if (cols.isEmpty) return Map.empty
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      Seq(min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"))
    }
    df.groupBy(input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map { r =>
        val rows = r.getLong(r.fieldIndex("__rows"))
        r.getString(r.fieldIndex("__file")) -> cols.map { c =>
          c -> ColStats(
            canonical(r.get(r.fieldIndex(s"__min_$c"))),
            canonical(r.get(r.fieldIndex(s"__max_$c"))),
            r.getLong(r.fieldIndex(s"__nulls_$c")),
            rows)
        }.toMap
      }.toMap
  }
}
