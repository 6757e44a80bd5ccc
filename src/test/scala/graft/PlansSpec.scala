package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Base58
import graft.plans.GraftExtensions

/** Native Catalyst expressions: codegen path matches the pure-Scala
  * implementation and survives whole-stage codegen; the extension installs
  * SQL-callable names. */
class PlansSpec extends SparkSpec {

  import spark.implicits._

  test("Base58Encode expression matches the library implementation") {
    val df = Seq("hello", "Waves test vector 123", "").toDF("s")
      .withColumn("b", col("s").cast("binary"))
    val out = df.select(col("s"), GraftExtensions.base58Encode(col("b")).as("b58"))
      .as[(String, String)].collect().toMap
    assert(out("hello") == "Cn8eVZg")
    assert(out("Waves test vector 123") == "6NeN8CgExwoAH5ZqG2KGoWZWNw7zJ")
    assert(out("") == "")
  }

  test("Base58Decode round-trips and yields NULL on invalid input") {
    val df = Seq("Cn8eVZg", "not-valid-0OIl").toDF("s")
    val out = df.select(col("s"), GraftExtensions.base58Decode(col("s")).as("raw")).collect()
      .map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Array[Byte]])).toMap
    assert(out("Cn8eVZg").map(b => new String(b, "UTF-8")).contains("hello"))
    assert(out("not-valid-0OIl").isEmpty)
  }

  test("expression runs inside whole-stage codegen (no UDF fallback)") {
    val df = spark.range(100).withColumn("b", col("id").cast("string").cast("binary"))
      .select(GraftExtensions.base58Encode(col("b")).as("b58"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), s"plan lost codegen:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
    assert(df.count() == 100)
  }

  test("GraftExtensions registers SQL-callable functions") {
    GraftExtensions.install(spark)
    val r = spark.sql("SELECT base58_encode(cast('hello' as binary)) AS e, " +
      "cast(base58_decode('Cn8eVZg') as string) AS d").collect().head
    assert(r.getString(0) == "Cn8eVZg")
    assert(r.getString(1) == "hello")
  }

  test("VectorDot matches the builtin fold bit-for-bit and stays in codegen") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextDouble() * 2 - 1), Array.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    // the builtin composition VectorDot replaces — must be BIT-identical
    // (same left-to-right fold order), or oracle hashes would shift
    val builtin = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0d), (acc, x) => acc + x)
    val diverged = df.select(
      GraftExtensions.vectorDot(col("a"), col("b")).as("native"), builtin.as("ref"))
      .filter(col("native") =!= col("ref")).count()
    assert(diverged == 0, "native dot diverged from the builtin fold")
    // a local relation constant-folds away; range keeps a real codegen stage
    val ranged = spark.range(100)
      .withColumn("a", transform(sequence(lit(0), lit(63)), i => (col("id") + i).cast("double")))
    val plan = ranged.select(GraftExtensions.vectorDot(col("a"), col("a")).as("d"))
      .queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[vector_dot""".r.findFirstIn(plan).isDefined,
      s"VectorDot fell out of codegen:\n$plan")
  }

  test("VectorDot: float widening, null arrays, mismatched lengths, SQL registration") {
    val f = Seq(
      (1L, Some(Array(1.0f, 2.0f, 3.0f)), Some(Array(4.0f, 5.0f, 6.0f))),
      (2L, None, Some(Array(1.0f))),
      (3L, Some(Array(2.0f, 2.0f)), Some(Array(3.0f)))).toDF("id", "a", "b")
    val out = f.select(col("id"), GraftExtensions.vectorDot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).contains(32.0)) // 4 + 10 + 18, widened before multiply
    assert(out(2L).isEmpty) // null array → null
    assert(out(3L).contains(6.0)) // zips to the shorter length
    GraftExtensions.install(spark)
    val sql = spark.sql("SELECT vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(sql == 11.0)
  }

  test("native expression agrees with the UDF on random inputs") {
    val rnd = new scala.util.Random(7)
    val inputs = Seq.fill(50)(rnd.nextString(rnd.nextInt(40)))
    val df = inputs.toDF("s").withColumn("b", col("s").cast("binary"))
    val both = df.select(
      GraftExtensions.base58Encode(col("b")).as("native"),
      graft.functions.GraftFunctions.base58Encode(col("b")).as("viaUdf"))
    assert(both.filter(col("native") =!= col("viaUdf")).count() == 0)
  }

  test("native Waves address expressions match the library and stay in codegen") {
    val pk = Array.tabulate[Byte](32)(_.toByte)
    val pkh = Array.tabulate[Byte](20)(i => (i + 3).toByte)
    val df = Seq((pk, pkh)).toDF("pk", "pkh")
      .select(
        GraftExtensions.wavesAddress(col("pk"), lit('W'.toInt)).as("addr"),
        GraftExtensions.wavesAddressFromPkh(col("pkh"), lit('W'.toInt)).as("addr_pkh"))
    val r = df.collect().head
    assert(r.getString(0) == graft.functions.Waves.addressFromPublicKey(pk, 'W'.toByte))
    assert(r.getString(1) == graft.functions.Waves.addressFromPublicKeyHash(pkh, 'W'.toByte))
    // codegen check needs a non-foldable input (literals constant-fold away)
    val ranged = spark.range(100).withColumn("pk", col("id").cast("string").cast("binary"))
      .select(GraftExtensions.wavesAddress(col("pk"), lit(87)).as("addr"))
    val plan = ranged.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)") && !plan.contains("ScalaUDF"), s"address fell out of codegen:\n$plan")
    assert(ranged.count() == 100)
    // UDF parity on random keys
    val rnd = new scala.util.Random(11)
    val keys = Seq.fill(40)(Array.fill[Byte](32)(rnd.nextInt().toByte))
    val kdf = keys.map(Tuple1(_)).toDF("pk")
    val both = kdf.select(
      GraftExtensions.wavesAddress(col("pk"), lit(87)).as("native"),
      graft.functions.GraftFunctions.wavesAddress(col("pk"), lit(87)).as("viaUdf"))
    assert(both.filter(col("native") =!= col("viaUdf")).count() == 0)
  }

  test("nearest_cells replicates the windowed argmax ordering it replaced (property)") {
    import org.apache.spark.sql.expressions.Window
    import graft.llm.Similarity
    // the kernel's contract: for every vector, its cell assignment (and
    // top-n probe list) must equal the old crossJoin(broadcast) +
    // Window.partitionBy(id) row_number plan — cosine desc under Spark's
    // SQL double ordering, ties to the lower cell id. Random vectors plus
    // the degenerate shapes: exact duplicate centroids (ties), an
    // all-zeros vector (NaN cosines), a zero centroid
    val rnd = new scala.util.Random(7)
    val dim = 8
    val base: IndexedSeq[Seq[Double]] =
      (0 until 4).map(_ => Array.fill(dim)(rnd.nextGaussian()).toSeq)
    val cents: IndexedSeq[(Int, Seq[Double])] = (0 until 5).map { j =>
      // cell 4 duplicates cell 3: exact cosine tie → lower cell id wins.
      // (Zero vectors/centroids are OUT of the comparison contract: the
      // replaced plan's SQL division THROWS under ANSI on a zero norm,
      // while the kernel's Java division yields NaN — asserted separately
      // below as the kernel's strictly-more-tolerant documented behavior.)
      (j, if (j == 4) base(3) else base(j))
    }
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian()).toSeq)
    }
    import spark.implicits._
    val vdf = vecs.toDF("vec_id", "embedding")
    val cdf = cents.toDF("cell_id", "centroid")
    // old plan, reconstructed: expand x k, windowed row_number argmax
    def oldTopN(n: Int): Set[(Long, Int, Int)] = {
      val joined = vdf.crossJoin(broadcast(cdf))
        .withColumn("__sim", Similarity.cosine(col("embedding"), col("centroid")))
      val w = Window.partitionBy(col("vec_id")).orderBy(col("__sim").desc, col("cell_id"))
      joined.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= n)
        .select(col("vec_id"), col("__rn"), col("cell_id"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    }
    for (n <- Seq(1, 3, 5)) {
      val kernel = vdf.select(col("vec_id"),
          posexplode(graft.plans.GraftExtensions.nearestCells(
            col("embedding"),
            cents.map(_._1),
            cents.map(_._2.toIndexedSeq), n)).as(Seq("__p", "cell_id")))
        .select(col("vec_id"), (col("__p") + 1).cast("int").as("rn"), col("cell_id"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      val expected = oldTopN(n)
      assert(kernel == expected, s"n=$n kernel/window divergence:\n" +
        s"kernel-only: ${kernel.diff(expected)}\nwindow-only: ${expected.diff(kernel)}")
    }
    // degenerate shapes, kernel-only: NaN cosines rank greatest (the SQL
    // double ordering), ties resolve to the lowest cell id — a zero vector
    // assigns to cell 0, and a zero CENTROID (NaN against every vector)
    // outranks finite cosines
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def top(v: Array[Double], cs: Seq[Seq[Double]], n: Int): Seq[Int] = {
      val arr = graft.plans.NearestCells.topCells(
        new GenericArrayData(v), isFloat = false,
        cs.map(_.toArray).toArray,
        cs.map(c => math.sqrt(c.map(x => x * x).sum)).toArray,
        cs.indices.toArray, n)
      arr.toIntArray().toSeq
    }
    val finite = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    assert(top(Array(0.0, 0.0), finite, 2) == Seq(0, 1), "zero vector: all-NaN ties → cell order")
    assert(top(Array(1.0, 0.5), finite :+ Seq(0.0, 0.0), 1) == Seq(2), "zero centroid's NaN outranks finite cosines")
  }

  test("nearest_cells l2 mode: squared-Euclidean argmin — magnitude matters, ties to lower cell") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def topL2(v: Array[Double], cs: Seq[Seq[Double]], n: Int): Seq[Int] = {
      val arr = graft.plans.NearestCells.topCells(
        new GenericArrayData(v), isFloat = false,
        cs.map(_.toArray).toArray,
        cs.map(_.map(x => x * x).sum).toArray, // l2 passes ‖c‖², not ‖c‖
        cs.indices.toArray, n, l2 = true)
      arr.toIntArray().toSeq
    }
    // cosine would pick cell 0 (same direction); L2 must pick cell 1
    // (closer in space): v=(1,0), c0=(10,0) dist²=81, c1=(0,1) dist²=2
    assert(topL2(Array(1.0, 0.0), Seq(Seq(10.0, 0.0), Seq(0.0, 1.0)), 1) == Seq(1),
      "L2 must respect magnitude (cosine would pick the collinear far centroid)")
    // exact nearest wins; full ordering is by ascending distance
    assert(topL2(Array(2.0, 2.0), Seq(Seq(0.0, 0.0), Seq(2.0, 2.0), Seq(3.0, 3.0)), 3) == Seq(1, 2, 0))
    // equidistant centroids tie to the lower cell id
    assert(topL2(Array(0.0, 0.0), Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(-1.0, 0.0)), 3) == Seq(0, 1, 2),
      "ties must resolve to ascending cell id")
    // the DataFrame-level mode matches a literal argmin reconstruction
    val rnd = new scala.util.Random(7)
    val cents2 = (0 until 6).map(j => (j, IndexedSeq.fill(4)(rnd.nextGaussian())))
    val vecs2 = (0 until 40).map(i => (i.toLong, Seq.fill(4)(rnd.nextGaussian())))
    import spark.implicits._
    val vdf2 = vecs2.toDF("vec_id", "embedding")
    val kernel = vdf2.select(col("vec_id"),
        graft.plans.GraftExtensions.nearestCellsL2(col("embedding"),
          cents2.map(_._1), cents2.map(_._2), 1).getItem(0).as("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    vecs2.foreach { case (id, v) =>
      val expect = cents2.minBy { case (_, c) =>
        v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
      }._1
      assert(kernel(id) == expect, s"vec $id: kernel ${kernel(id)} != argmin $expect")
    }
  }

  test("ZOrder interleave round-trips, is monotone per-dimension, and bounds the key") {
    import graft.functions.ZOrder
    val rnd = new scala.util.Random(11)
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0x7fffffffL, 0x7fffffffL)) ++
      Seq.fill(500)((rnd.nextInt(Int.MaxValue).toLong, rnd.nextInt(Int.MaxValue).toLong))
    pts.foreach { case (a, b) =>
      val z = ZOrder.interleave(a, b)
      assert(z >= 0, s"key must stay non-negative: ($a,$b) -> $z")
      assert(ZOrder.dimA(z) == a && ZOrder.dimB(z) == b, s"round-trip failed for ($a,$b)")
    }
    // bit-reference check against a naive per-bit reconstruction
    pts.take(50).foreach { case (a, b) =>
      val naive = (0 until 31).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))
      }
      assert(ZOrder.interleave(a, b) == naive)
    }
    // fixing one dimension, the key is strictly monotone in the other
    (0L until 64L).sliding(2).foreach { w =>
      assert(ZOrder.interleave(w(0), 17L) < ZOrder.interleave(w(1), 17L))
      assert(ZOrder.interleave(17L, w(0)) < ZOrder.interleave(17L, w(1)))
    }
  }

  test("ZOrderKey expression matches the kernel, handles int/long/null, stays in codegen") {
    import graft.functions.ZOrder
    val df = Seq((10L, 473400, Option(3L)), (63L, 474071, None))
      .toDF("a", "b", "n")
    val rows = df.select(
        GraftExtensions.zorderKey(col("a"), col("b")).as("z"),
        GraftExtensions.zorderKey(col("a"), col("n")).as("zn"))
      .collect()
    assert(rows(0).getLong(0) == ZOrder.interleave(10L, 473400L))
    assert(rows(1).getLong(0) == ZOrder.interleave(63L, 474071L))
    assert(rows(0).getLong(1) == ZOrder.interleave(10L, 3L))
    assert(rows(1).isNullAt(1), "null dimension must yield null key")
    // codegen: fused project, no UDF fallback (spark.range keeps the
    // projection out of LocalTableScan constant folding)
    val plan = spark.range(100)
      .select(GraftExtensions.zorderKey(col("id"), col("id") + 1).as("z"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && !plan.contains("ScalaUDF"), s"plan:\n$plan")
    // SQL registration
    GraftExtensions.install(spark)
    df.createOrReplaceTempView("zin")
    val viaSql = spark.sql("SELECT zorder_key(a, b) FROM zin ORDER BY 1").as[Long].collect()
    assert(viaSql.toSeq == Seq(ZOrder.interleave(10L, 473400L), ZOrder.interleave(63L, 474071L)).sorted)
  }

  test("Hilbert index round-trips, is bijective, and steps one grid cell at a time") {
    import graft.functions.Hilbert
    val rnd = new scala.util.Random(13)
    // round-trip across the full 31-bit range
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0x7fffffffL, 0x7fffffffL)) ++
      Seq.fill(500)((rnd.nextInt(Int.MaxValue).toLong, rnd.nextInt(Int.MaxValue).toLong))
    pts.foreach { case (x, y) =>
      val d = Hilbert.index(x, y)
      assert(d >= 0, s"index must stay non-negative: ($x,$y) -> $d")
      assert(Hilbert.inverse(d) == ((x, y)), s"round-trip failed for ($x,$y)")
    }
    // injective on a 16x16 corner grid (order-31 indices of a small corner
    // are not dense in [0,256), so distinctness is the checkable form)
    val ds = (for (x <- 0L until 16L; y <- 0L until 16L)
      yield Hilbert.index(x, y)).sorted
    assert(ds.distinct.size == ds.size, "index must be injective")
    // unit-step locality (the property Z-order lacks): consecutive indices
    // are grid-adjacent — |dx| + |dy| == 1, no diagonal or long jumps
    (0L until 4095L).foreach { d =>
      val (x1, y1) = Hilbert.inverse(d)
      val (x2, y2) = Hilbert.inverse(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve must be continuous at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("HilbertKey expression matches the kernel and stays in codegen") {
    import graft.functions.Hilbert
    val df = Seq((10L, 473400), (63L, 474071)).toDF("a", "b")
    val rows = df.select(GraftExtensions.hilbertKey(col("a"), col("b")).as("h")).collect()
    assert(rows(0).getLong(0) == Hilbert.index(10L, 473400L))
    assert(rows(1).getLong(0) == Hilbert.index(63L, 474071L))
    val plan = spark.range(100)
      .select(GraftExtensions.hilbertKey(col("id"), col("id") + 1).as("h"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && !plan.contains("ScalaUDF"), s"plan:\n$plan")
    GraftExtensions.install(spark)
    df.createOrReplaceTempView("hin")
    val viaSql = spark.sql("SELECT hilbert_key(a, b) FROM hin ORDER BY 1").as[Long].collect()
    assert(viaSql.toSeq == Seq(Hilbert.index(10L, 473400L), Hilbert.index(63L, 474071L)).sorted)
  }

  test("bucketsForBox returns exactly the brute-force bucket set; inverted boxes fail fast") {
    import graft.functions.ZOrder
    val rnd = new scala.util.Random(12)
    // random boxes over a small grid: brute-force the exact set of
    // Z-buckets that contain at least one (a,b) point of the box and
    // assert the BIGMIN walk produces the same set (ADVICE r12: this
    // pruning path previously had no callers and no coverage)
    for (shift <- Seq(2, 4, 6); _ <- 1 to 40) {
      val dim = 64L
      val aLo = rnd.nextInt(dim.toInt).toLong
      val aHi = aLo + rnd.nextInt((dim - aLo).toInt).toLong
      val bLo = rnd.nextInt(dim.toInt).toLong
      val bHi = bLo + rnd.nextInt((dim - bLo).toInt).toLong
      val brute = (for (a <- aLo to aHi; b <- bLo to bHi)
        yield ZOrder.interleave(a, b) >>> shift).distinct.sorted
      val walked = ZOrder.bucketsForBox(shift, aLo, aHi, bLo, bHi)
      assert(walked == brute,
        s"shift=$shift box a=[$aLo,$aHi] b=[$bLo,$bHi]: walk $walked != brute $brute")
      // walk output must be sorted and duplicate-free (IN-list contract)
      assert(walked == walked.distinct.sorted)
    }
    // inverted box: loud require, not the BIGMIN internal IllegalStateException
    intercept[IllegalArgumentException](ZOrder.bucketsForBox(4, 10L, 5L, 0L, 3L))
    intercept[IllegalArgumentException](ZOrder.rangeIntersectsBox(0L, 100L, 0L, 3L, 10L, 5L))
  }

  test("writeZOrderedBuckets + readZBucketBox round-trip exactly and prune partitions") {
    import graft.sinks.TableStore
    import graft.functions.ZOrder
    val out = java.nio.file.Files.createTempDirectory("graft-zbuckets").toString
    val n = 20000L
    val df = spark.range(n).select(
      col("id"),
      ((col("id") * 7919) % 64).as("a"),
      ((col("id") * 104729) % 64).as("b"))
    TableStore.writeZOrderedBuckets(df, s"$out/zb", col("a"), col("b"), shift = 6)
    val (aLo, aHi, bLo, bHi) = (10L, 14L, 20L, 33L)
    val got = TableStore.readZBucketBox(spark, s"$out/zb", 6, aLo, aHi, bLo, bHi,
        col("a").between(aLo, aHi) && col("b").between(bLo, bHi))
      .select("id", "a", "b")
    val expect = df.filter(col("a").between(aLo, aHi) && col("b").between(bLo, bHi))
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      "bucket-pruned read must return exactly the box rows")
    // the IN-list actually pruned: fewer partition dirs listed than exist
    val allBuckets = new java.io.File(s"$out/zb").listFiles()
      .count(_.getName.startsWith("z_bucket="))
    val used = ZOrder.bucketsForBox(6, aLo, aHi, bLo, bHi).size
    assert(used < allBuckets, s"walk selected $used of $allBuckets buckets — no pruning")
  }
}
