package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the Delta-constraint /
  * dbt-test surface: declare per-column expectations, get violation
  * counts back in ONE aggregation pass over the table (every row-level
  * predicate becomes a conditional count in the same scan — no
  * per-constraint jobs). Two constraint classes need their own shape
  * and are costed separately:
  *
  *   - `Unique`: a groupBy on the key counting groups with >1 row —
  *     one shuffle, map-side-combined.
  *   - `ForeignKey`: a left-anti join against the referenced key set —
  *     broadcast when the dimension is small, shuffled otherwise
  *     (Spark's stats decide; at 100 TB fact scale the FK check is THE
  *     dominant cost and rides one equi-join like any other).
  *
  * Returns (check_name, n_violations) — one row per declared
  * constraint, always present even at zero violations, so a silent
  * scan-drop can't read as "all valid".
  */
object Validate {

  sealed trait Constraint { def name: String }

  /** Row-level predicate that must hold (violations = rows where it is
    * false OR null — SQL's CHECK semantics count unknown as pass, but
    * a curation gate wants nulls surfaced; pass an explicit isNull
    * disjunct if SQL CHECK semantics are needed).
    */
  final case class Check(name: String, predicate: Column) extends Constraint

  final case class NotNull(colName: String) extends Constraint {
    val name = s"not_null($colName)"
  }

  /** NULL-KEY CONTRACT (deliberate divergence from SQL UNIQUE): null
    * keys GROUP TOGETHER — two rows with a null key count as a
    * duplicate violation, because the underlying groupBy uses
    * grouping-null semantics. The SQL-standard UNIQUE rule (nulls never
    * conflict, so any number of null-keyed rows passes) was considered
    * and DECLINED: this is a data-QUALITY gate, and a table where the
    * "unique" business key is null on many rows is precisely what the
    * gate exists to surface — under SQL semantics those rows would be
    * invisible to both the Unique check and (by its isNotNull scope)
    * the ForeignKey check. Declare a separate NotNull(col) to split the
    * null population out of the duplicate count. Pinned by
    * DegenerateInputSpec ("Validate.Unique null-key contract").
    */
  final case class Unique(colNames: Seq[String]) extends Constraint {
    val name = s"unique(${colNames.mkString(",")})"
  }

  /** Every non-null value of `colName` must exist in `refCol` of
    * `ref`.
    */
  final case class ForeignKey(colName: String, ref: DataFrame,
      refCol: String) extends Constraint {
    val name = s"fk($colName)"
  }

  def validate(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "declare at least one constraint")
    val spark = df.sparkSession
    import spark.implicits._

    val rowLevel: Seq[(String, Column)] = constraints.collect {
      case Check(n, p) => n -> (!coalesce(p, lit(false))).cast("long")
      case nn: NotNull => nn.name -> col(nn.colName).isNull.cast("long")
    }
    val scanCounts: Seq[DataFrame] =
      if (rowLevel.isEmpty) Seq.empty
      else {
        val agg = df.agg(
          sum(rowLevel.head._2).as(rowLevel.head._1),
          rowLevel.tail.map { case (n, c) => sum(c).as(n) }: _*)
        // unpivot the single result row into (constraint, n_violations)
        Seq(agg.selectExpr(
          s"stack(${rowLevel.size}, " +
            rowLevel.map { case (n, _) => s"'${n.replace("'", "")}', coalesce(`$n`, 0L)" }
              .mkString(", ") + ") AS (check_name, n_violations)"))
      }

    val uniques = constraints.collect { case u: Unique =>
      df.groupBy(u.colNames.map(col): _*)
        .agg(count(lit(1)).as("__n"))
        .where(col("__n") > 1)
        .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("n_violations"))
        .select(lit(u.name).as("check_name"), col("n_violations"))
    }

    val fks = constraints.collect { case f: ForeignKey =>
      df.where(col(f.colName).isNotNull)
        .join(f.ref.select(col(f.refCol).as(f.colName)).distinct(),
          Seq(f.colName), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(f.name).as("check_name"), col("n_violations"))
    }

    (scanCounts ++ uniques ++ fks).reduce(_ unionByName _)
  }

  /** Exact per-column table profile — the dataset-card / dbt-docs
    * statistics block: (column, n_null, n_distinct) for every column,
    * derived FROM THE SCHEMA (works on any table). Null counts fold
    * into one scan aggregation; the exact distinct counts share the
    * same aggregate via Spark's expand (one pass over the data,
    * #columns-way row expansion). For wide tables or when approximate
    * is acceptable, swap countDistinct for approx_count_distinct and
    * the expand disappears — the q96 sketch trade-off, caller's
    * choice. Output is #columns rows.
    */
  def profile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__ndv_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      // backtick-quoted: a source column named "a.b" makes the alias
      // "__null_a.b", and an unquoted col() would parse the dot as
      // struct-field access and fail resolution — breaking the
      // works-on-any-table contract
      struct(lit(c).as("column_name"), col(s"`__null_$c`").as("n_null"),
        col(s"`__ndv_$c`").as("n_distinct"))
    }
    wide.select(explode(array(rows: _*)).as("p"))
      .select(col("p.column_name"), col("p.n_null"), col("p.n_distinct"))
  }
}
