package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-stage unordered-pair generator for the group-then-expand family
  * (q_part_cooccur, assoc_basket_lift, the co-occurrence graph builds,
  * PubGraph COAUTHOR): each k-element array must become its
  * k(k-1)/2 value pairs (a < b).
  *
  * The explode×explode + `a < b` form generates k² rows per array and
  * filters more than half of them away AFTER the second Generate. This
  * form sorts the array once, anchors the first element with
  * posexplode, and explodes only the strict suffix — the second
  * Generate emits exactly the k(k-1)/2 surviving rows, so the
  * expansion stage produces (and the pair filter inspects) half the
  * row stream for identical output. Everything stays
  * whole-stage-codegen (sort_array / posexplode / slice / explode are
  * all codegen expressions — no higher-order functions, which would
  * drop the stage to interpreted eval).
  *
  * Output is provably the old form's output on ANY input array, not
  * just distinct sets: ordered pairs with v_i < v_j over a multiset
  * are in bijection with index pairs i < j of the SORTED array having
  * v_i < v_j, which is exactly suffix pairs minus the equal-value
  * pairs the kept `a < b` filter drops (for collect_set inputs it
  * drops nothing). Null/empty arrays emit no rows in both forms.
  */
object PairGen {

  /** Project `df` to the k(k-1)/2 value pairs (aName < bName) of array
    * column `arr` — drop-in for
    * {{{ df.select(explode(arr).as(a), arr).select(col(a), explode(arr).as(b)).where(col(a) < col(b)) }}}
    *
    * NOTE (r17 ADVICE): the output carries ONLY the two pair columns —
    * every other column of `df` is silently projected away (all four
    * call sites want exactly that). A caller that needs other columns
    * alongside the pairs must carry them explicitly, e.g. by passing
    * `df.select(arr, keep...)` through a variant — or call with
    * `df.select(arr)` to make the contract visible at the call site.
    */
  def suffixPairs(df: DataFrame, arr: Column, aName: String, bName: String): DataFrame =
    df.select(sort_array(arr).as("__pg_ps"))
      .select(col("__pg_ps"), posexplode(col("__pg_ps")).as(Seq("__pg_i", aName)))
      .select(col(aName),
        explode(slice(col("__pg_ps"), col("__pg_i") + lit(2),
          size(col("__pg_ps")) - col("__pg_i") - lit(1))).as(bName))
      .where(col(aName) < col(bName))
}
