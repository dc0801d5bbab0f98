package graft.pipeline

import graft.SparkSuite

/** Pins the micro-ratio overflow guard (ADVICE r12, low): 1e6-scaled
  * integer ratios must fail LOUDLY on Long overflow, never wrap — the
  * same discipline hitsDF enforces with try_sum. */
class MicroGuardSpec extends SparkSuite {
  import spark.implicits._

  test("microRatio: exact in range, raises loudly past Long range") {
    val ok = Seq((7L, 3L)).toDF("num", "den")
      .select(TextAnalysis.microRatio("num", "den", "spec").as("r"))
      .collect()(0).getLong(0)
    assert(ok == 7000000L / 3L) // exact integer DIV, 2333333
    // 1e6 * 9.3e12 > Long.MaxValue (9.22e18): must raise, not wrap
    val bad = Seq((9300000000000L, 5L)).toDF("num", "den")
      .select(TextAnalysis.microRatio("num", "den", "specReport").as("r"))
    val e = intercept[Exception](bad.collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause).map(identity))
    assert(messages(e).exists(m => m != null && m.contains("specReport") &&
      m.contains("overflowed BIGINT")), s"wrong error: ${e.getMessage}")
  }
}
