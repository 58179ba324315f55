package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Geo

/** Shared local session for operator suites. */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
}

class OperatorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  // deterministic point cloud with a hot cluster
  def seededPoints(n: Int): Seq[(Long, Double, Double)] = {
    val rnd = new scala.util.Random(42)
    (0 until n).map { i =>
      if (i % 5 == 0) (i.toLong, 10.0 + rnd.nextDouble() * 0.01,
        20.0 + rnd.nextDouble() * 0.01)
      else (i.toLong, rnd.nextDouble() * 360.0 - 180.0,
        rnd.nextDouble() * 170.0 - 85.0)
    }
  }

  test("knnJoin equals brute force (incl. hot cluster + ties)") {
    val probes = seededPoints(60)
    val builds = seededPoints(150).map { case (i, x, y) =>
      (i + 1000, x + 0.37, y - 0.21)
    }
    val p = probes.toDF("pid", "px", "py")
    val b = builds.toDF("bid", "bx", "by")
    val got = SpatialJoins.knnJoin(p, b, 4, res0 = 6,
        probeId = "pid", buildId = "bid",
        px = "px", py = "py", bx = "bx", by = "by")
      .select("pid", "bid", "rnk")
      .as[(Long, Long, Long)].collect().toSet
    // brute force oracle on the driver
    val expect = probes.flatMap { case (pid, px, py) =>
      builds.map { case (bid, bx, by) =>
        (pid, bid, (px - bx) * (px - bx) + (py - by) * (py - by))
      }.sortBy { case (_, bid, d2) => (d2, bid) }
        .take(4).zipWithIndex
        .map { case ((_, bid, _), i) => (pid, bid, (i + 1).toLong) }
    }.toSet
    assert(got === expect)
  }

  test("pipJoin equals brute-force ray cast on concave zones") {
    val pts = seededPoints(400).toDF("id", "x", "y")
    val zones = Derived.zones(spark)
    val got = SpatialJoins.pipJoin(pts, zones, res = 7)
      .select("zone_id", "id").as[(Int, Long)].collect().toSet
    val zoneList = zones
      .select("zone_id", "xs", "ys", "parts").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray,
        r.getSeq[Double](2).toArray, r.getSeq[Int](3).toArray))
    val expect = seededPoints(400).flatMap { case (id, x, y) =>
      zoneList.collect {
        case (z, xs, ys, parts) if Geo.pipContains(x, y, xs, ys, parts) =>
          (z, id)
      }
    }.toSet
    assert(got === expect)
  }

  test("distanceJoin equals brute force") {
    val l = seededPoints(120).toDF("id", "x", "y")
    val r = seededPoints(40).map { case (i, x, y) =>
      (i + 500, x + 1.1, y + 0.6)
    }.toDF("rid", "rx", "ry")
    val got = SpatialJoins.distanceJoin(l, r, 3.0)
      .select("id", "rid").as[(Long, Long)].collect().toSet
    val expect = for {
      (id, x, y) <- seededPoints(120)
      (rid, rx, ry) <- seededPoints(40).map { case (i, a, b) =>
        (i + 500, a + 1.1, b + 0.6)
      }
      if (x - rx) * (x - rx) + (y - ry) * (y - ry) <= 9.0
    } yield (id, rid)
    assert(got === expect.toSet)
  }

  test("IDW exact-hit short-circuit takes the min-id point value") {
    val targets = Seq((0L, 0L, 5.0, 5.0), (0L, 1L, 7.5, 5.0))
      .toDF("r", "c", "x", "y")
    val points = Seq(
      (1L, 5.0, 5.0, 111.0),  // exact hit on target (0,0)
      (2L, 5.0, 5.0, 222.0),  // second exact hit -> min pid wins
      (3L, 6.0, 5.0, 10.0),
      (4L, 8.0, 5.0, 20.0)).toDF("pid", "px", "py", "pval")
    val got = Raster.idw(targets, points, radius = 3.0)
      .as[(Long, Long, Double)].collect()
      .map { case (r, c, v) => ((r, c), v) }.toMap
    assert(got((0L, 0L)) === 111.0) // exact hit, min pid = 1
    // non-hit cell (7.5, 5.0): weights 1/d2 over points 1..4
    val hits = Seq((5.0, 111.0), (5.0, 222.0), (6.0, 10.0), (8.0, 20.0))
      .map { case (px, v) => (7.5 - px) * (7.5 - px) -> v }
      .filter(_._1 <= 9.0)
    val expect = hits.map { case (d2, v) => v / d2 }.sum /
      hits.map { case (d2, _) => 1.0 / d2 }.sum
    assert(math.abs(got((0L, 1L)) -
      math.rint(expect * 1e6) / 1e6) < 1e-9)
  }

  test("clump matches BFS connected components (8-conn)") {
    val rnd = new scala.util.Random(7)
    val cells = for {
      r <- 0 until 20; c <- 0 until 20
      if rnd.nextBoolean()
    } yield (r.toLong, c.toLong, 1.0)
    val mask = cells.toDF("r", "c", "v")
    val got = Raster.clump(mask, width = 20)
      .select("r", "c", "comp_id").as[(Long, Long, Long)]
      .collect().map { case (r, c, id) => ((r, c), id) }.toMap
    // BFS oracle
    val set = cells.map { case (r, c, _) => (r, c) }.toSet
    var labels = Map.empty[(Long, Long), Long]
    for (start <- set.toSeq.sorted if !labels.contains(start)) {
      var comp = List(start)
      var frontier = List(start)
      var seen = Set(start)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap { case (r, c) =>
          for {
            dr <- -1 to 1; dc <- -1 to 1
            n = (r + dr, c + dc)
            if set.contains(n) && !seen.contains(n)
          } yield { seen += n; n }
        }
        comp ++= frontier
      }
      val lbl = comp.map { case (r, c) => r * 20 + c }.min
      labels ++= comp.map(_ -> lbl)
    }
    assert(got === labels)
  }

  test("jaccardPairs: deletion-neighborhood arm equals the PPJoin arm") {
    // high threshold + small sets -> the adaptive dispatch takes the
    // deletion-neighborhood arm; forcePrefix pins the PPJoin arm on
    // the same corpus. Both are exact, so outputs must be identical.
    // 20 distinct tokens per doc; dropping one -> jacc 19/20 = 0.95,
    // exactly at the threshold, and d = floor((1/.95-1)*20) = 1
    val docs = (0 until 60).map { i =>
      val rnd = new scala.util.Random(i + 5)
      val toks = (0 until 20).map(j => s"w${rnd.nextInt(900)}_$j")
      (i.toLong, toks.mkString(" "))
    }
    val corpus = (docs ++ docs.map { case (i, t) =>
      (i + 1000, t.split(" ").dropRight(1).mkString(" "))
    }).toDF("doc_id", "text")
    def pairsOf(force: Boolean) =
      TextOps.jaccardPairs(corpus, 0.95, forcePrefix = force)
        .select("a", "b").as[(Long, Long)].collect().toSet
    val fast = pairsOf(false)
    val slow = pairsOf(true)
    assert(fast.nonEmpty, "planted near-dups must be found")
    assert(fast === slow)
  }

  test("minhash LSH pairs are a subset of true jaccard pairs and find the planted dups") {
    val docs = (0 until 80).map { i =>
      val rnd = new scala.util.Random(i)
      val toks = (0 until 30).map(_ => s"w${rnd.nextInt(400)}")
      (i.toLong, toks.mkString(" "))
    }
    // plant near-dups: doc i+1000 = doc i minus last 2 tokens
    val corpus = (docs ++ docs.map { case (i, t) =>
      (i + 1000, t.split(" ").dropRight(2).mkString(" "))
    }).toDF("doc_id", "text")
    val truth = TextOps.jaccardPairs(corpus, 0.8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val lsh = TextOps.minhashLshPairs(corpus, perms = 32, bands = 8,
        threshold = 0.8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(truth), "LSH output must be verified-exact")
    // planted pairs have jaccard ~0.93; 8 bands of 4 rows catch them
    val planted = docs.map { case (i, _) => (i, i + 1000) }.toSet
    val plantedInTruth = planted.intersect(truth)
    val recall = plantedInTruth.count(lsh.contains).toDouble /
      plantedInTruth.size
    assert(recall >= 0.9, s"LSH recall $recall too low")
  }

  test("simhash pairs: hamming<=3 blocking is exact for planted dups") {
    val docs = (0 until 50).map { i =>
      val rnd = new scala.util.Random(i + 99)
      val toks = (0 until 40).map(_ => s"w${rnd.nextInt(300)}")
      (i.toLong, toks.mkString(" "))
    }
    val corpus = (docs ++ docs.map { case (i, t) =>
      (i + 1000, t.split(" ").dropRight(1).mkString(" "))
    }).toDF("doc_id", "text")
    val got = TextOps.simhashPairs(corpus, maxHamming = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // oracle: all pairs with hamming(simhash) <= 3, brute force
    val sigs = (docs ++ docs.map { case (i, t) =>
      (i + 1000, t.split(" ").dropRight(1).mkString(" "))
    }).map { case (i, t) => (i, TextOps.simhash64(t.split(" "))) }
    val expect = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    assert(got === expect)
  }

  test("cosine near-dup: verified-exact precision, planted-pair recall") {
    // 60 random unit-ish vectors (dim 32) + planted near-dups (first
    // coordinate zeroed) in the 1-based exploded form the operator takes
    val base = (0 until 60).map { i =>
      val rnd = new scala.util.Random(i + 7)
      (i.toLong, Array.fill(32)(rnd.nextGaussian()))
    }
    val expl = (base.flatMap { case (id, v) =>
      v.zipWithIndex.map { case (x, p) => (id, p + 1, x) }
    } ++ base.flatMap { case (id, v) =>
      v.zipWithIndex.drop(1).map { case (x, p) => (id + 1000, p + 1, x) }
    }).toDF("vec_id", "p1", "ev")
    val got = Similarity.cosineNearDupPairs(expl, threshold = 0.9)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // brute-force truth over the same corpus
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    val all = base ++ base.map { case (id, v) =>
      (id + 1000, 0.0 +: v.drop(1)) }
    val truth = (for {
      (a, va) <- all; (b, vb) <- all if a < b
      if cos(va, vb) >= 0.9
    } yield (a, b)).toSet
    assert(got.subsetOf(truth), "candidates must be verified-exact")
    val planted = base.map { case (i, _) => (i, i + 1000) }.toSet
      .intersect(truth)
    val recall = planted.count(got.contains).toDouble / planted.size
    assert(recall >= 0.9, s"hyperplane-LSH recall $recall too low")
  }

  test("tokenCounts: whitespace + ceil(len/4) subword rule") {
    val docs = Seq((1L, "alpha bc defghij k"),
      (2L, "x")).toDF("doc_id", "text")
    val got = TextOps.tokenCounts(docs)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(got(1L) === (18L, 4L, 2L + 1L + 2L + 1L))
    assert(got(2L) === (1L, 1L, 1L))
  }

  test("exactDedup groups identical texts") {
    val corpus = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y"),
      (7L, "a b c")).toDF("doc_id", "text")
    val got = TextOps.exactDedup(corpus)
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 3L), (3L, 1L)))
  }
}
