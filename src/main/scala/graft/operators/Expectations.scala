package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality EXPECTATIONS — the validation gate a pipeline runs
  * before training data (or a warehouse load) is allowed through: a
  * rule set evaluated as conditional counts, producing one
  * (rule, n_checked, n_violations) row per rule.
  *
  * Scale contract: ALL predicate rules evaluate in ONE aggregate pass
  * over ONE scan — a rule is a Column predicate compiled into a
  * `sum(when(violated, 1))` beside its siblings, never a per-rule
  * query (N rules over 100 TB must not mean N scans). The wide
  * one-row aggregate melts to long form in a projection. Referential
  * rules ([[fkCheck]]) need the parent relation, so they are their
  * own (single) pass — a left-anti count — unioned into the same
  * report shape.
  */
object Expectations {

  /** A named violation predicate: `violated` is true on BAD rows.
    * Nulls: a null predicate result counts as a violation (a rule
    * that cannot prove a row good flags it — the conservative gate),
    * EXCEPT where the rule itself is about nullability (write
    * `col.isNull` explicitly). */
  final case class Rule(name: String, violated: Column)

  def notNull(c: String): Rule = Rule(s"not_null($c)", col(c).isNull)

  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"in_range($c,$lo,$hi)",
      coalesce(col(c) < lo || col(c) > hi, lit(true)))

  def matches(c: String, regex: String): Rule =
    Rule(s"matches($c)", coalesce(!col(c).rlike(regex), lit(true)))

  def positive(c: String): Rule =
    Rule(s"positive($c)", coalesce(col(c) <= 0, lit(true)))

  /** All predicate rules in ONE aggregate over one scan. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "check: at least one rule")
    val aggs = count(lit(1)).as("__n") +: rules.zipWithIndex.map {
      case (r, i) =>
        sum(when(r.violated, 1L).otherwise(0L)).as(s"__v$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // melt the one-row wide aggregate to (rule, n_checked, n_violations)
    val pairs = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col("__n").as("n_checked"),
        col(s"__v$i").as("n_violations"))
    }
    wide.select(explode(array(pairs: _*)).as("__r"))
      .select(col("__r.rule"), col("__r.n_checked"),
        col("__r.n_violations"))
  }

  /** Referential-integrity rule: child keys with no parent. One
    * left-anti join (broadcast when the parent is dim-sized; hash at
    * scale — Spark picks), counted. Null child keys are orphans
    * (they reference nothing) — the NOT EXISTS / anti-join
    * convention, NOT SQL `NOT IN` (whose three-valued logic treats a
    * null child as a non-violation and any null parent key as
    * matching everything). An oracle for this rule must be written
    * as NOT EXISTS to agree on nullable keys. */
  def fkCheck(
      name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val n = child.count()
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey).as("__pk")),
        col(childKey) === col("__pk"), "left_anti")
      .count()
    child.sparkSession.range(1).select(
      lit(name).as("rule"), lit(n).as("n_checked"),
      lit(orphans).as("n_violations"))
  }

  /** Uniqueness rule: n_violations = rows in over-represented keys
    * minus the one legitimate row each (sum over keys of `count - 1`
    * where count > 1). One map-side-combined count + a tiny
    * arithmetic aggregate; an empty relation reports (0, 0). */
  def uniqueCheck(name: String, df: DataFrame, keys: Seq[String]): DataFrame = {
    val kc = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
    kc.agg(
      coalesce(sum(col("__c")), lit(0L)).as("__n"),
      coalesce(sum(when(col("__c") > 1, col("__c") - 1).otherwise(0L)),
        lit(0L)).as("__v"))
      .select(lit(name).as("rule"),
        col("__n").cast("long").as("n_checked"),
        col("__v").cast("long").as("n_violations"))
  }
}
