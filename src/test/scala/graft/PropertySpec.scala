package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.mr.MapReduce

/** Property-based invariants (SURVEY §5): tokenizer/count laws that
  * must hold for any input, not just the fixtures. Runs the map
  * function locally (same closure the cluster runs) — the distributed
  * paths are covered by the golden + partitioning suites. */
class PropertySpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val wcMap = MapReduce.builtins.map("wordcount")
  private val text: Gen[String] =
    Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf(" ", "\n", "\t", ".", ",", "—", "…", "'")))
      .map(_.mkString)

  test("WordNGrams kernel equals the reference sliding-window definition") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val toks: Gen[List[String]] =
      Gen.listOf(Gen.oneOf("a", "b", "cc", "dd", "word", "x1"))
    val widths = Gen.choose(1, 4)
    check(Prop.forAll(toks, widths, Gen.oneOf(true, false)) { (ts, n, dist) =>
      val arr = new GenericArrayData(
        ts.map(UTF8String.fromString).toArray[Any])
      val got = org.apache.spark.sql.graft.WordNGramsExpr
        .compute(arr, n, dist).toArray[AnyRef](
          org.apache.spark.sql.types.StringType).map(_.toString).toList
      val slid = ts.sliding(n).filter(_.size == n).map(_.mkString(" ")).toList
      val want = if (dist) slid.distinct else slid
      got == want
    })
  }

  test("containment dominates Jaccard and detects subset embedding exactly") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    // the algebra dedup_containment relies on: for any two trigram
    // sets, |∩|/min ≥ |∩|/∪ (both in [0,1]), and containment hits 1
    // exactly when one doc's gram set embeds in the other's — the
    // asymmetric relation a Jaccard threshold cannot express
    val toks: Gen[List[String]] =
      Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))
    def grams(ts: List[String]): Set[String] = {
      val arr = new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any])
      org.apache.spark.sql.graft.WordNGramsExpr.compute(arr, 3, true)
        .toArray[AnyRef](org.apache.spark.sql.types.StringType)
        .map(_.toString).toSet
    }
    check(Prop.forAll(toks, toks) { (a, b) =>
      val (ga, gb) = (grams(a), grams(b))
      val inter = (ga & gb).size.toDouble
      val cont = inter / math.max(math.min(ga.size, gb.size), 1)
      val jac = inter / math.max(ga.size + gb.size - inter, 1)
      cont >= jac && cont <= 1.0 && jac <= 1.0 &&
        ((cont == 1.0 && ga.nonEmpty && gb.nonEmpty) ==
          (ga.nonEmpty && gb.nonEmpty && (ga.subsetOf(gb) || gb.subsetOf(ga))))
    })
  }

  test("laplace inverse-CDF: symmetric, zero at the median, monotone in the tails") {
    // the dp_release_counts mechanism in scalar form: u ∈ (0,1) →
    // −b·sgn(u−½)·ln(1−2|u−½|). The properties a release depends on:
    // median draws add nothing, the map is antisymmetric around ½
    // (no directional bias), and noise magnitude grows monotonically
    // toward the tails (heavier u-extremes = larger |noise|).
    def lap(u: Double): Double =
      -math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
    assert(lap(0.5) == 0.0)
    // noShrink: scalacheck shrinking ignores the generator's map and
    // walks u toward 0.0, outside the (h+0.5)/2³² domain the query
    // guarantees (where ln(0) = −∞ is unreachable by construction)
    // h = 0 (the extreme-tail draw, u = 0.5/2³²) is reachable by the
    // query's 8-hex-char hash and must be covered
    val us: Gen[Double] =
      Gen.choose(0L, 4294967295L).map(h => (h + 0.5) / 4294967296.0)
    check(Prop.forAllNoShrink(us) { u =>
      val x = lap(u)
      java.lang.Double.isFinite(x) &&
        math.abs(lap(1.0 - u) + x) < 1e-12 && // antisymmetry
        // upper-half draws add, lower-half draws subtract
        (math.signum(x) == math.signum(u - 0.5) || x == 0.0)
    })
    check(Prop.forAllNoShrink(us, us) { (a, b) =>
      // monotone magnitude in distance from the median
      val (near, far) = if (math.abs(a - 0.5) <= math.abs(b - 0.5)) (a, b)
        else (b, a)
      math.abs(lap(near)) <= math.abs(lap(far)) + 1e-12
    })
  }

  test("wordcount map: token count is preserved by counting") {
    check(Prop.forAll(text) { s =>
      val kvs = wcMap("f", s)
      kvs.groupBy(_._1).values.map(_.size).sum == kvs.length
    })
  }

  test("wordcount map: tokens are lowercase, non-empty, letter/digit only") {
    check(Prop.forAll(text) { s =>
      wcMap("f", s).forall { case (tok, one) =>
        one == "1" && tok.nonEmpty && tok == tok.toLowerCase &&
          tok.forall(c => Character.isLetter(c) || Character.isDigit(c))
      }
    })
  }

  test("wordcount map: concatenation with a separator is additive") {
    check(Prop.forAll(text, text) { (a, b) =>
      val joined = wcMap("f", a + " " + b)
        .groupBy(_._1).view.mapValues(_.size).toMap
      val parts = (wcMap("f", a) ++ wcMap("f", b))
        .groupBy(_._1).view.mapValues(_.size).toMap
      joined == parts
    })
  }

  test("LSH bucket kernel equals an independent reference on any vector") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val vec: Gen[List[Double]] = Gen.choose(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-10.0, 10.0)))
    // independent re-statement of the hyperplane math (not shared code)
    def reference(v: List[Double], planes: Int): Long = {
      (0 until planes).foldLeft(0L) { (bucket, p) =>
        val proj = v.zipWithIndex.foldLeft(0.0) { case (acc, (x, j)) =>
          val sign =
            if ((j.toLong * 2654435761L + p.toLong * 40503L) % 97 % 2 == 0) 1.0
            else -1.0
          acc + x * sign
        }
        if (proj > 0) bucket | (1L << p) else bucket
      }
    }
    check(Prop.forAll(vec) { v =>
      val expr = org.apache.spark.sql.graft.LshBucketExpr(
        org.apache.spark.sql.catalyst.expressions.Literal(1), 8)
      val got = expr.nullSafeEval(
        new GenericArrayData(v.toArray[Any])).asInstanceOf[Long]
      got == reference(v, 8) && got >= 0 && got < 256
    })
  }

  test("morton code equals the bit-by-bit interleave reference") {
    def ref(a: Int, b: Int): Long =
      (0 until 31).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1).toLong << (2 * i)) |
          (((b >> i) & 1).toLong << (2 * i + 1))
      }
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(42) // seeded: reproducible failures
    val pairs = Seq((0, 0), (65535, 65535), (65535, 0), (0, 65535), (1, 2),
      (Int.MaxValue, Int.MaxValue), (Int.MaxValue, 0), (0, Int.MaxValue),
      (1 << 20, 1 << 20), (123456789, 987654321)) ++
      Seq.fill(200)((rnd.nextInt(Int.MaxValue), rnd.nextInt(Int.MaxValue)))
    // one batched plan, not one job per pair
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.operators.Layout.mortonCode(col("a"), col("b")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == ref(r.getInt(0), r.getInt(1)),
        s"morton(${r.getInt(0)}, ${r.getInt(1)})")
    }
  }

  test("sum reducer equals numeric sum regardless of value order") {
    val rf = MapReduce.builtins.reduce("sum")
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0L, 1000000L))) { vals =>
      val asStrings = vals.map(_.toString)
      rf("k", asStrings).toLong == vals.sum &&
        rf("k", scala.util.Random.shuffle(asStrings)) == rf("k", asStrings)
    })
  }
}
