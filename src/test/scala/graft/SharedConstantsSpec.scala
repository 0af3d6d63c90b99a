package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Lockstep guard for tools/shared_constants.json (ADVICE r9): the
  * independent Python checkers CONSUME the manifest at import, so these
  * assertions are what keeps an engine-constant change from silently
  * desynchronizing the checker that validates it — change a Scala value
  * and this spec fails until the manifest (and with it the Python side)
  * moves too.
  */
class SharedConstantsSpec extends AnyFunSuite {

  private val root = new ObjectMapper().readTree(
    new java.io.File("tools/shared_constants.json"))

  private def strings(field: String): Seq[String] =
    root.get(field).elements().asScala.map(_.asText()).toSeq

  test("gram widths match the manifest") {
    assert(root.get("span_n").asInt() === graft.queries.ReleaseQueries.SpanN)
    assert(root.get("overlap_n").asInt() === graft.queries.ReleaseQueries.OverlapN)
  }

  test("PII patterns, tags, and augmentation strata match the manifest") {
    val rq = graft.queries.ReleaseQueries
    val pats = root.get("pii_patterns")
    assert(pats.get("email").asText() === rq.EmailPat)
    assert(pats.get("phone").asText() === rq.PhonePat)
    assert(pats.get("ip").asText() === rq.IpPat)
    val tags = root.get("pii_tags")
    assert(tags.get("email").asText() === rq.EmailTag)
    assert(tags.get("phone").asText() === rq.PhoneTag)
    assert(tags.get("ip").asText() === rq.IpTag)
    val strata = root.get("pii_strata")
    assert(strata.get("email_mod").asInt() === rq.EmailMod)
    assert(strata.get("phone_mod").asInt() === rq.PhoneMod)
    assert(strata.get("ip_mod").asInt() === rq.IpMod)
  }

  test("stopword lists match the manifest (order-sensitive)") {
    assert(strings("quality_stopwords") === graft.queries.TextQueries.stopwords)
    assert(strings("signal_stopwords") ===
      graft.queries.SemanticQueries.SignalStopwords)
  }

  test("split draw thresholds match the manifest") {
    val sd = root.get("split_draw")
    assert(sd.get("mod").asInt() === graft.queries.SplitDraw.Mod)
    assert(sd.get("train_lt").asInt() === graft.queries.SplitDraw.TrainLt)
    assert(sd.get("val_lt").asInt() === graft.queries.SplitDraw.ValLt)
  }

  test("the Python checker actually loads this manifest (no drift by path)") {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/verify_independent.py")), "UTF-8")
    assert(src.contains("shared_constants.json"),
      "verify_independent.py no longer reads the shared manifest")
    Seq("span_n", "overlap_n", "pii_patterns", "pii_tags", "pii_strata",
      "quality_stopwords", "signal_stopwords", "split_draw").foreach { k =>
      assert(src.contains(s"\"$k\""),
        s"verify_independent.py no longer consumes manifest key '$k'")
    }
  }
}
