package graft.cdc

import graft.SparkSpec
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => SCTest}
import org.apache.spark.sql.functions._

/** Generator-grammar properties (generate.py:120-174) + end-to-end replay:
  * fold-left "last non-delete write wins" must equal the engine's
  * distributed compaction for any seeded op sequence.
  */
class WorkloadGenSpec extends SparkSpec {

  test("grammar: no two consecutive deletes (generate.py:132-134)") {
    val prop = forAll(Gen.choose(0L, 10000L), Gen.choose(1, 300)) { (seed, n) =>
      val ops = WorkloadGen.opSequence(n, seed)
      !ops.sliding(2).exists {
        case Seq(a, b) => a.op == "d" && b.op == "d"
        case _ => false
      }
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop).passed)
  }

  test("grammar: updates/deletes only target live keys") {
    val prop = forAll(Gen.choose(0L, 10000L), Gen.choose(1, 300)) { (seed, n) =>
      val ops = WorkloadGen.opSequence(n, seed)
      var live = Set.empty[Long]
      ops.forall { o =>
        o.op match {
          case "c" => live += o.id; true
          case "u" => live.contains(o.id)
          case "d" => val ok = live.contains(o.id); live -= o.id; ok
        }
      }
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop).passed)
  }

  test("replay property: distributed compaction == sequential fold") {
    Seq(7L, 42L, 1234L).foreach { seed =>
      val ops = WorkloadGen.opSequence(200, seed)
      val events = WorkloadGen.changeEvents(spark, ops)
      val decoded = Envelope.decode(events, row = Envelope.referenceRowSchema)
      val survivors = Compaction.latestState(decoded)
        .select(col("id"))
        .collect().map(_.getLong(0)).toSet
      assert(survivors == WorkloadGen.expectedLiveKeys(ops), s"seed=$seed")
    }
  }
}
