package graft.queries

/** The deterministic train/val/test split draw shared by the export and
  * audit lanes (q262 manifest, q268 leakage, q275 contamination): bucket =
  * md5(doc_id) hex-6 mod [[Mod]]; bucket < [[TrainLt]] → train,
  * < [[ValLt]] → val, else test. One definition for the engine lanes, the
  * DuckDB oracles (interpolated), and — via tools/shared_constants.json,
  * asserted by SharedConstantsSpec — the independent Python checkers.
  */
object SplitDraw {
  val Mod = 100
  val TrainLt = 80
  val ValLt = 90
}
