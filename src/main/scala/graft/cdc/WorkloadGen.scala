package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Faithful port of the reference's workload generator semantics
  * (generate.py:120-174), deterministic instead of Faker/RNG-driven:
  *
  *  - G1 synthetic records: seeded lookup arrays instead of Faker(ru_RU)
  *    (generate.py:19-34); no quote-stripping needed — values are data,
  *    never SQL text.
  *  - G2/G4/G5 insert/update/delete ops (generate.py:37-117) as change
  *    rows, not SQL strings.
  *  - G3 random-row pick (`ORDER BY RANDOM() LIMIT 1`, generate.py:68-70)
  *    → seeded pick over live keys.
  *  - G6 uniform op ∈ {insert,update,delete} (generate.py:130).
  *  - G7 no two consecutive deletes (generate.py:132-134).
  *  - G8 per-op error isolation → a bad op can't occur by construction.
  *
  * The op stream is computed with a java.util.Random(seed) — the JDK LCG
  * is specified, so sequences are reproducible everywhere. Driver-side
  * sequence generation is O(number of ops) tiny metadata; the heavy part
  * (row materialization) happens distributed via spark.range.
  */
object WorkloadGen {

  private val firstNames = Vector("ivan", "anna", "pyotr", "maria", "olga",
    "dmitri", "elena", "sergei", "nina", "viktor")
  private val lastNames = Vector("ivanov", "petrova", "sidorov", "kuznetsova",
    "smirnov", "popova", "volkov", "orlova", "fyodorov", "morozova")

  final case class Op(seq: Long, op: String, id: Long)

  /** The op sequence per the reference's grammar: uniform {c,u,d}, updates/
    * deletes target a live key, delete never follows delete, updates/deletes
    * with no live keys degrade to insert (generate.py has a live table by
    * construction; we start empty so the first ops insert).
    */
  def opSequence(n: Int, seed: Long = 42L): Seq[Op] = {
    val rnd = new java.util.Random(seed)
    var live = Vector.empty[Long]
    var nextId = 1L
    var prevDelete = false
    (0 until n).map { i =>
      var choice = rnd.nextInt(3) // 0=c 1=u 2=d, uniform like randint(1,3)
      if (choice == 2 && prevDelete) choice = 0 // G7 anti-double-delete
      if (choice != 0 && live.isEmpty) choice = 0
      val op = choice match {
        case 0 =>
          val id = nextId; nextId += 1; live :+= id
          prevDelete = false; Op(i.toLong, "c", id)
        case 1 =>
          val id = live(rnd.nextInt(live.size))
          prevDelete = false; Op(i.toLong, "u", id)
        case _ =>
          val idx = rnd.nextInt(live.size)
          val id = live(idx); live = live.patch(idx, Nil, 1)
          prevDelete = true; Op(i.toLong, "d", id)
      }
      op
    }
  }

  /** Deterministic G1 record values for (id, version). */
  private def nameCols(idCol: org.apache.spark.sql.Column, ver: org.apache.spark.sql.Column) = {
    val fi = (idCol + ver) % firstNames.size
    val la = (idCol * 3 + ver) % lastNames.size
    val first = element_at(array(firstNames.map(lit): _*), fi.cast("int") + 1)
    val last = element_at(array(lastNames.map(lit): _*), la.cast("int") + 1)
    (first, last, concat(first, lit("."), last, lit("@example.com")))
  }

  /** Materialize an op sequence as Debezium-envelope JSON values (the
    * 4-column reference schema id/first_name/last_name/email,
    * postgres.py:100-107). ts_ms = base + seq keeps replay order total.
    */
  def changeEvents(spark: SparkSession, ops: Seq[Op], tsBase: Long = 1700000000000L): DataFrame = {
    import spark.implicits._
    val df = ops.toDF("seq", "op", "id")
      .repartition(spark.sparkContext.defaultParallelism)
    // version = seq so updated rows get fresh deterministic values
    val (fn, ln, em) = nameCols(col("id"), col("seq"))
    val image = struct(col("id"), fn.as("first_name"), ln.as("last_name"), em.as("email"))
    val nullImage = lit(null).cast(
      "struct<id:bigint,first_name:string,last_name:string,email:string>")
    // Debezium fidelity: the BEFORE image is the row's previous version —
    // the key's most recent earlier op's values (lag over the per-key op
    // order), carried by 'u' AND 'd'. Building it from the current seq
    // would fabricate values the replica row never held.
    val wPrev = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("seq"))
    val withPrev = df.withColumn("_prev_seq", lag(col("seq"), 1).over(wPrev))
    val (pf, pl, pe) = nameCols(col("id"), col("_prev_seq"))
    val prevImage = struct(col("id"), pf.as("first_name"), pl.as("last_name"),
      pe.as("email"))
    withPrev
      .select(col("id").as("key"),
      to_json(struct(
        lit(null).cast("string").as("schema"),
        struct(
          when(col("op").isin("u", "d") && col("_prev_seq").isNotNull,
            prevImage).otherwise(nullImage).as("before"),
          when(col("op") =!= "d", image).otherwise(nullImage).as("after"),
          struct(lit("customers").as("table"), (lit(tsBase) + col("seq")).as("lsn")).as("source"),
          col("op").as("op"),
          (lit(tsBase) + col("seq")).as("ts_ms")).as("payload"))).as("value"))
  }

  /** Reference-shaped expected final state of an op sequence: last write
    * wins, deleted keys absent — the oracle the property tests fold by hand.
    */
  def expectedLiveKeys(ops: Seq[Op]): Set[Long] =
    ops.foldLeft(Set.empty[Long]) { (live, o) =>
      o.op match {
        case "c" | "r" | "u" => live + o.id
        case "d" => live - o.id
      }
    }

  /** G6 streaming variant: a rate-source stream emitting one change every
    * `intervalSec` seconds (the reference's 5 s cadence, generate.py:16),
    * mapping rate ticks onto a precomputed op sequence. */
  def rateStream(spark: SparkSession, ops: Seq[Op], intervalSec: Int = 5): DataFrame = {
    import spark.implicits._
    require(intervalSec >= 1, "intervalSec must be >= 1")
    val lookup = broadcast(ops.toDF("seq", "op", "id"))
    // rowsPerSecond only accepts an INTEGER (Spark parses it with
    // Long.parseLong — a fractional string like "0.2" crashes the source
    // at start). Sub-1/s cadence = tick at 1/s, keep every
    // intervalSec-th tick, map tick/intervalSec onto the op sequence.
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "1")
      .load()
    val ticks = rate.filter(col("value") % intervalSec === 0)
      .withColumn("_seq", expr(s"value div $intervalSec"))
    ticks.join(lookup, ticks("_seq") === lookup("seq"))
  }
}
