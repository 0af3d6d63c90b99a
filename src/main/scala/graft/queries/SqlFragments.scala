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

  /** DuckDB rendering of [[graft.ops.Ops.ratioHalfUp]]: exact
    * half_up(num/den)/10^outScale via the integer identity
    * half_up(a/b) = (2a+b) div (2b). `num`/`den` must render as
    * integer-valued SQL expressions, pre-scaled exactly as the engine side.
    */
  def ratioHalfUpSql(num: String, den: String, outScale: Int): String =
    s"CAST((2*($num) + ($den)) // (2*($den)) AS DOUBLE) / ${math.pow(10, outScale.toDouble).toLong}"

  /** DuckDB rendering of [[graft.ops.Ops.avgFixedHalfUp]] — tie-free
    * `round(avg(x), outScale)` for an `inScale`-decimal fixed input.
    */
  def avgFixedSql(c: String, inScale: Int, outScale: Int): String = {
    require(outScale >= inScale)
    val units =
      if (inScale == 0) s"sum(CAST($c AS BIGINT))"
      else s"sum(CAST(round($c*${math.pow(10, inScale.toDouble).toLong}) AS BIGINT))"
    val mult = math.pow(10, (outScale - inScale).toDouble).toLong
    ratioHalfUpSql(if (mult == 1L) units else s"$units * $mult", "count(*)", outScale)
  }

  /** The tie-free `round(avg(x), 4)` for a 2-decimal fixed input column:
    * [[avgFixedSql]] at (2, 4).
    */
  def avg2To4Sql(col2dec: String): String = avgFixedSql(col2dec, 2, 4)

  /** Spark-SQL-dialect rendering of [[graft.ops.Ops.avgFixedHalfUp]]
    * (`DIV` instead of `//`) for `spark.sql(...)` lanes.
    */
  def avgFixedSparkSql(c: String, inScale: Int, outScale: Int): String = {
    require(outScale >= inScale)
    val units =
      if (inScale == 0) s"sum(CAST($c AS BIGINT))"
      else s"sum(CAST(round($c*${math.pow(10, inScale.toDouble).toLong}) AS BIGINT))"
    val mult = math.pow(10, (outScale - inScale).toDouble).toLong
    val num = if (mult == 1L) units else s"$units * $mult"
    s"CAST((2*($num) + (count(*))) DIV (2*(count(*))) AS DOUBLE) / ${math.pow(10, outScale.toDouble).toLong}"
  }

  /** Spark-SQL-dialect rendering of [[graft.ops.Ops.discountedRevenue]]
    * (`DIV` instead of DuckDB's `//`) for lanes that exercise the
    * `spark.sql(...)` surface with the same tie-free arithmetic.
    */
  def discountedRevenueSparkSql(price: String = "l_extendedprice",
                                disc: String = "l_discount"): String =
    s"CAST((sum(CAST(round($price*100) AS BIGINT) * (100 - CAST(round($disc*100) AS BIGINT))) + 50) DIV 100 AS DOUBLE) / 100"
}
