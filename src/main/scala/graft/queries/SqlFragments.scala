package graft.queries

/** Shared DuckDB oracle fragments that must stay in exact sync with an
  * engine-side Column helper (same arithmetic, same rounding), so a fix
  * lands in every consumer at once.
  */
object SqlFragments {

  /** DuckDB rendering of [[graft.ops.Ops.discountedRevenueUnits]]:
    * Σ price·(1−disc) in exact integer 1e-4 currency units.
    */
  def revenueUnitsSql(price: String = "l_extendedprice",
                      disc: String = "l_discount"): String =
    s"sum(CAST(round($price*100) AS BIGINT) * (100 - CAST(round($disc*100) AS BIGINT)))"

  /** DuckDB rendering of [[graft.ops.Ops.centsHalfUpFromUnits]]. */
  def centsSql(units: String): String =
    s"CAST(($units + 50) // 100 AS DOUBLE) / 100"

  /** DuckDB rendering of [[graft.ops.Ops.discountedRevenue]] — the
    * tie-free `round(sum(price*(1.0-disc)), 2)`.
    */
  def discountedRevenueSql(price: String = "l_extendedprice",
                           disc: String = "l_discount"): String =
    centsSql(revenueUnitsSql(price, disc))
}
