package graft.sources

import java.io.{BufferedWriter, File, FileWriter}

/** Deterministic tiny dbgen-format dataset generator (pipe-delimited
  * `.tbl` with trailing separator, exactly the reference's input format
  * — `/root/reference/benchmark/tpch/loaddata.py`). Used to exercise
  * the ORIGINAL full-column TPC-H queries ([[graft.queries.TpchFull]])
  * locally: the driver fixtures are column-trimmed, dbgen is not.
  * Value domains follow the TPC-H spec vocabulary so the original
  * predicates select non-trivial subsets. Seeded splitmix64 → identical
  * files on every run/machine.
  */
object DbgenGen {

  private final class Rng(seed0: Long) {
    private var s = seed0
    def nextLong(): Long = {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def nextInt(n: Int): Int = ((nextLong() >>> 1) % n).toInt
    def nextDouble2(lo: Double, hi: Double): Double =
      math.round((lo + (hi - lo) * ((nextLong() >>> 11).toDouble /
        (1L << 53).toDouble)) * 100.0) / 100.0
    def pick[A](xs: Seq[A]): A = xs(nextInt(xs.size))
  }

  val nations: Seq[(Int, String, Int)] = Seq(
    (0, "ALGERIA", 0), (1, "ARGENTINA", 1), (2, "BRAZIL", 1),
    (3, "CANADA", 1), (4, "EGYPT", 4), (5, "ETHIOPIA", 0),
    (6, "FRANCE", 3), (7, "GERMANY", 3), (8, "INDIA", 2),
    (9, "INDONESIA", 2), (10, "IRAN", 4), (11, "IRAQ", 4),
    (12, "JAPAN", 2), (13, "JORDAN", 4), (14, "KENYA", 0),
    (15, "MOROCCO", 0), (16, "MOZAMBIQUE", 0), (17, "PERU", 1),
    (18, "CHINA", 2), (19, "ROMANIA", 3), (20, "SAUDI ARABIA", 4),
    (21, "VIETNAM", 2), (22, "RUSSIA", 3), (23, "UNITED KINGDOM", 3),
    (24, "UNITED STATES", 1))
  val regions: Seq[(Int, String)] = Seq((0, "AFRICA"), (1, "AMERICA"),
    (2, "ASIA"), (3, "EUROPE"), (4, "MIDDLE EAST"))

  private val types = for {
    a <- Seq("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO")
    b <- Seq("ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED")
    c <- Seq("TIN", "NICKEL", "BRASS", "STEEL", "COPPER")
  } yield s"$a $b $c"
  private val containers = for {
    a <- Seq("SM", "MED", "LG", "JUMBO", "WRAP")
    b <- Seq("CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN", "DRUM")
  } yield s"$a $b"
  private val colors = Seq("green", "blue", "red", "forest", "metallic",
    "antique", "burnished", "misty", "frosted", "lavender")
  private val nouns = Seq("widget", "bolt", "gear", "spring", "washer")
  private val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
    "MACHINERY", "HOUSEHOLD")
  private val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW")
  private val shipModes = Seq("REG AIR", "AIR", "RAIL", "SHIP", "TRUCK",
    "MAIL", "FOB")
  private val shipInstructs = Seq("DELIVER IN PERSON", "COLLECT COD",
    "NONE", "TAKE BACK RETURN")

  private def date(rng: Rng, loYear: Int = 1992, hiYear: Int = 1998): String = {
    val y = loYear + rng.nextInt(hiYear - loYear + 1)
    val m = 1 + rng.nextInt(12)
    val d = 1 + rng.nextInt(28)
    f"$y%04d-$m%02d-$d%02d"
  }

  /** Write all 8 tables; sizes scale with `scale` (≈ rows at scale=1:
    * part 200, supplier 50, partsupp 400, customer 150, orders 1500,
    * lineitem ≈ 6000).
    */
  def write(dir: String, scale: Int = 1): Unit = {
    new File(dir).mkdirs()
    val rng = new Rng(42L)
    def out(name: String)(body: BufferedWriter => Unit): Unit = {
      val w = new BufferedWriter(new FileWriter(s"$dir/$name.tbl"))
      try body(w) finally w.close()
    }

    out("region") { w =>
      regions.foreach { case (k, n) => w.write(s"$k|$n|$n region comment|\n") }
    }
    out("nation") { w =>
      nations.foreach { case (k, n, r) =>
        w.write(s"$k|$n|$r|about $n|\n")
      }
    }
    val nPart = 200 * scale
    val nSupp = 50 * scale
    val nCust = 150 * scale
    val nOrd = 1500 * scale
    out("part") { w =>
      for (p <- 1 to nPart) {
        val name = s"${rng.pick(colors)} ${rng.pick(colors)} ${rng.pick(nouns)}"
        val brand = s"Brand#${1 + rng.nextInt(5)}${1 + rng.nextInt(5)}"
        w.write(s"$p|$name|Manufacturer#${1 + rng.nextInt(5)}|$brand|" +
          s"${rng.pick(types)}|${1 + rng.nextInt(50)}|${rng.pick(containers)}|" +
          s"${rng.nextDouble2(900, 2000)}|part comment $p|\n")
      }
    }
    out("supplier") { w =>
      for (s <- 1 to nSupp) {
        val nk = rng.nextInt(25)
        val comment =
          if (rng.nextInt(20) == 0) s"wary Customer some Complaints $s"
          else s"supplier comment $s"
        w.write(s"$s|Supplier#$s|addr s$s|$nk|${10 + nk}-555-000$s|" +
          s"${rng.nextDouble2(-999, 9999)}|$comment|\n")
      }
    }
    out("partsupp") { w =>
      for (p <- 1 to nPart; i <- 0 until 2) {
        val s = 1 + ((p + i * 7) % nSupp)
        w.write(s"$p|$s|${1 + rng.nextInt(9999)}|" +
          s"${rng.nextDouble2(1, 1000)}|partsupp comment|\n")
      }
    }
    out("customer") { w =>
      for (c <- 1 to nCust) {
        val nk = rng.nextInt(25)
        val comment =
          if (rng.nextInt(25) == 0) s"has special packages requests $c"
          else s"customer comment $c"
        w.write(s"$c|Customer#$c|addr c$c|$nk|${10 + nk}-555-100$c|" +
          s"${rng.nextDouble2(-999, 9999)}|${rng.pick(segments)}|$comment|\n")
      }
    }
    val orderDates = new scala.collection.mutable.HashMap[Int, String]
    out("orders") { w =>
      for (o <- 1 to nOrd) {
        val od = date(rng, 1992, 1998)
        orderDates(o) = od
        val status = rng.pick(Seq("F", "O", "P"))
        val comment =
          if (rng.nextInt(25) == 0) s"special handling requests order $o"
          else s"order comment $o"
        w.write(s"$o|${1 + rng.nextInt(nCust)}|$status|" +
          s"${rng.nextDouble2(1000, 400000)}|$od|${rng.pick(priorities)}|" +
          s"Clerk#${1 + rng.nextInt(100)}|0|$comment|\n")
      }
    }
    out("lineitem") { w =>
      for (o <- 1 to nOrd) {
        val nLines = 1 + rng.nextInt(7)
        for (ln <- 1 to nLines) {
          val p = 1 + rng.nextInt(nPart)
          val s = 1 + ((p + rng.nextInt(2) * 7) % nSupp)
          val qty = 1 + rng.nextInt(50)
          val price = rng.nextDouble2(900, 100000)
          val od = orderDates(o)
          // ship 1-120d after order; commit/receipt around ship
          val ship = plusDays(od, 1 + rng.nextInt(120))
          val commit = plusDays(od, 15 + rng.nextInt(90))
          val receipt = plusDays(ship, 1 + rng.nextInt(30))
          w.write(s"$o|$p|$s|$ln|$qty.0|$price|" +
            s"${rng.nextDouble2(0, 0.1)}|${rng.nextDouble2(0, 0.08)}|" +
            s"${rng.pick(Seq("A", "N", "R"))}|${rng.pick(Seq("F", "O"))}|" +
            s"$ship|$commit|$receipt|${rng.pick(shipInstructs)}|" +
            s"${rng.pick(shipModes)}|line comment|\n")
        }
      }
    }
  }

  private def plusDays(iso: String, days: Int): String =
    java.time.LocalDate.parse(iso).plusDays(days.toLong).toString

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_dbgen")
    val scale = if (args.length > 1) args(1).toInt else 1
    write(dir, scale)
    println(s"dbgen fixture written to $dir (scale $scale)")
  }
}
