package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational MERGE (the warehouse upsert statement) as a single
  * full-outer join — no per-row lookups, no driver loop:
  *
  *   MERGE INTO target USING source ON target.key = source.key
  *     WHEN MATCHED AND <deleteWhen>      THEN DELETE
  *     WHEN MATCHED [AND updateSet found] THEN UPDATE SET ...
  *     WHEN NOT MATCHED                   THEN INSERT ...
  *
  * One shuffle on the merge key (or zero with co-bucketed inputs — the
  * `s11` layout contract applies to MERGE unchanged), then a row-local
  * projection; this is the plan shape every lakehouse engine lowers
  * MERGE to, and it scales as a plain join. The caller guarantees
  * source keys are unique (standard MERGE precondition — duplicate
  * source matches are nondeterministic in SQL engines too).
  */
object MergeInto {

  /** Apply the merge; returns rows with the target's schema.
    *
    * `target` and `source` must have disjoint column names (the key
    * columns included) so every expression in `deleteWhen`, `updateSet`
    * and `insertValues` can reference both sides unambiguously by name.
    */
  def apply(target: DataFrame, source: DataFrame,
      targetKey: String, sourceKey: String,
      deleteWhen: Option[Column] = None,
      updateSet: Map[String, Column] = Map.empty,
      insertValues: Map[String, Column] = Map.empty): DataFrame = {
    val overlap = target.columns.toSet.intersect(source.columns.toSet)
    require(overlap.isEmpty,
      s"target/source column names must be disjoint, both have: $overlap")
    require(insertValues.isEmpty || insertValues.contains(targetKey),
      s"insertValues must set the target key '$targetKey'")
    val joined = target.join(source,
      col(targetKey) === col(sourceKey), "full_outer")
    val matched = col(targetKey).isNotNull && col(sourceKey).isNotNull
    val srcOnly = col(targetKey).isNull
    // coalesce: a NULL delete predicate must read as "not deleted", not
    // as a NULL filter verdict (which would silently drop the row)
    val afterDelete = deleteWhen match {
      case Some(cond) => joined.filter(!(matched && coalesce(cond, lit(false))))
      case None => joined
    }
    // source-only rows only survive when an INSERT clause exists
    val kept =
      if (insertValues.isEmpty) afterDelete.filter(!srcOnly) else afterDelete
    val outCols = target.columns.map { c =>
      val updated = updateSet.get(c) match {
        case Some(u) => when(matched, u).otherwise(col(c))
        case None => col(c)
      }
      (insertValues.get(c) match {
        case Some(i) => when(srcOnly, i).otherwise(updated)
        case None => updated
      }).as(c)
    }
    kept.select(outCols.toIndexedSeq: _*)
  }
}
