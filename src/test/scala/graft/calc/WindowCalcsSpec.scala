package graft.calc

import java.sql.Timestamp

import graft.SparkSpec

class WindowCalcsSpec extends SparkSpec {
  import spark.implicits._

  private def candles(rows: (String, String, Double, Double, Double, Double)*) =
    rows.map { case (s, t, h, l, c, v) => (s, Timestamp.valueOf(t), h, l, c, v) }
      .toDF("symbol", "timestamp", "high", "low", "close", "volume")

  test("W12: day's first row sets state without flagging; strict exceedance flags") {
    val df = SessionLabels.withSessionLabels(candles(
      ("A", "2024-01-16 15:00:00", 10.0, 9.0, 9.5, 1.0), // first row of NY day
      ("A", "2024-01-16 15:00:01", 11.0, 9.5, 10.0, 1.0), // new high
      ("A", "2024-01-16 15:00:02", 10.5, 8.0, 9.0, 1.0), // new low
      ("A", "2024-01-16 15:00:03", 11.0, 8.5, 9.0, 1.0) // ties running high: no flag
    ))
    val out = WindowCalcs.withDailyRunningExtremes(df).orderBy("timestamp")
      .select("is_new_daily_high", "is_new_daily_low").as[(Int, Int)].collect()
    assert(out.toSeq == Seq((0, 0), (1, 0), (0, 1), (0, 0)))
  }

  test("W13: minute-exact trigger, first row per (symbol, day, trigger) only") {
    val df = SessionLabels.withSessionLabels(candles(
      ("A", "2024-01-16 09:00:10", 1, 1, 5.0, 1), // 04:00:10 NY → daily_4am
      ("A", "2024-01-16 09:00:40", 1, 1, 6.0, 1), // second 04:00 row ignored
      ("A", "2024-01-16 14:30:00", 1, 1, 7.0, 1), // 09:30 NY → daily_930
      ("A", "2024-01-16 14:31:00", 1, 1, 8.0, 1), // 09:31 — not a trigger
      ("A", "2024-01-17 14:30:00", 1, 1, 9.0, 1) // next day → its own daily_930
    ))
    val out = WindowCalcs.timeTriggerAnchors(df)
      .orderBy("anchor_timestamp")
      .select("anchor_type", "price_at_anchor").as[(String, Double)].collect()
    assert(out.toSeq == Seq(("daily_4am", 5.0), ("daily_930", 7.0), ("daily_930", 9.0)))
  }

  test("W1: rolling average uses partial frames (min_periods=1) and flags spikes") {
    val df = candles(
      ("A", "2024-01-16 00:00:00", 1, 1, 1, 10.0),
      ("A", "2024-01-16 00:00:01", 1, 1, 1, 10.0),
      ("A", "2024-01-16 00:00:02", 1, 1, 1, 100.0))
    val out = WindowCalcs.withVolumeSpikes(df).orderBy("timestamp")
      .select("rolling_avg_volume", "is_volume_spike").as[(Double, Int)].collect()
    assert(out(0) == ((10.0, 0)))
    assert(out(1) == ((10.0, 0)))
    assert(out(2)._2 == 1) // 100 > 40*1.5
  }

  test("W3: rolling mean is null until the frame fills (min_periods=window)") {
    val df = candles((1 to 5).map(i =>
      ("A", s"2024-01-16 00:00:0$i", 1.0, 1.0, i.toDouble, 1.0)): _*)
    val out = WindowCalcs.rollingMeanFull(df, "close", "ma3", 3).orderBy("timestamp")
      .select("ma3").as[Option[Double]].collect()
    assert(out(0).isEmpty && out(1).isEmpty)
    assert(out(2).contains(2.0) && out(4).contains(4.0))
  }

  test("W4: warm-up rows collapse to close; bb columns follow the reference shapes") {
    val df = candles((1 to 25).map(i =>
      (("A", f"2024-01-16 00:00:$i%02d", 1.0, 1.0, 10.0 + (i % 3), 1.0))): _*)
    val out = WindowCalcs.withBollinger(df).orderBy("timestamp").collect()
    val first = out.head
    assert(first.getAs[Double]("bb_mid") == first.getAs[Double]("close"))
    assert(first.getAs[Double]("bb_width") == 0.0)
    assert(first.isNullAt(first.fieldIndex("bb_pos"))) // pandas 0/0 → NaN
    val filled = out.last
    assert(filled.getAs[Double]("bb_width") > 0.0)
    assert(!filled.isNullAt(filled.fieldIndex("bb_pos")))
  }

  /** Random multi-symbol, gap-riddled layout: rows land in many buckets,
    * including buckets reached across gaps wider than the bucket and the
    * rolling window — the cases where a time-overlap approximation would
    * diverge and the prefix-sum form must not.
    */
  private def randomLayout(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    var t = 0L
    val rows = Seq.tabulate(n) { i =>
      // mostly 1-3 s steps, occasional gaps of minutes/hours
      t += (rnd.nextInt(10) match {
        case 0 => 3600L + rnd.nextInt(7200)
        case 1 => 60L + rnd.nextInt(600)
        case _ => 1L + rnd.nextInt(3)
      })
      val sym = if (rnd.nextInt(4) == 0) "B" else "A" // A is hot
      (sym, new Timestamp(1705363200000L + t * 1000L),
        10.0 + rnd.nextInt(500) / 100.0, 9.0, 10.0 + rnd.nextInt(300) / 100.0,
        (1 + rnd.nextInt(5000)).toDouble)
    }
    rows.toDF("symbol", "timestamp", "high", "low", "close", "volume")
  }

  test("W1 bucketed ≡ W1 exact global window, bit-for-bit, across gaps") {
    val df = randomLayout(7, 600)
    val key = Seq($"symbol", $"timestamp")
    val a = WindowCalcs.withVolumeSpikes(df, exact = true)
      .select(key :+ $"rolling_avg_volume" :+ $"is_volume_spike": _*)
      .orderBy(key: _*).collect()
    // small bucket (300 s) so the 60-row frame routinely spans many buckets
    val b = WindowCalcs.withVolumeSpikesBucketed(df, bucketSeconds = 300L)
      .select(key :+ $"rolling_avg_volume" :+ $"is_volume_spike": _*)
      .orderBy(key: _*).collect()
    assert(a.length == b.length && a.length == 600)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"diverged at ${x.get(1)}") }
  }

  test("W4 bucketed ≡ W4 exact global window, bit-for-bit, across gaps") {
    val df = randomLayout(11, 400)
    val cols = Seq("bb_mid", "bb_upper", "bb_lower", "bb_width", "bb_pos", "bb_breakout")
    val key = Seq($"symbol", $"timestamp")
    val a = WindowCalcs.withBollinger(df, exact = true)
      .select(key ++ cols.map(col => $"$col".alias(col)): _*).orderBy(key: _*).collect()
    val b = WindowCalcs.withBollingerBucketed(df, bucketSeconds = 300L)
      .select(key ++ cols.map(col => $"$col".alias(col)): _*).orderBy(key: _*).collect()
    assert(a.length == b.length && a.length == 400)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"diverged at ${x.get(1)}") }
  }

  test("W1/W4 bucketed ≡ global with NULL volume/close in the frames") {
    // nulls exercise the rolling non-null count: the global path divides by
    // count(col) over the frame, the bucketed path must divide by the same
    // thing (not the row index) — and an all-null frame must yield NULL
    val rnd = new scala.util.Random(5)
    val rows = (0 until 300).map { t =>
      val vol: java.lang.Double =
        if (t % 7 == 0 || t < 65) null else (1 + rnd.nextInt(100)).toDouble
      val close: java.lang.Double =
        if (t % 11 == 0) null else 10.0 + rnd.nextInt(300) / 100.0
      ("A", new Timestamp(1705363200000L + t * 1000L),
        11.0, 9.0, close, vol)
    }
    val df = rows.toDF("symbol", "timestamp", "high", "low", "close", "volume")
    val key = Seq($"symbol", $"timestamp")
    val a1 = WindowCalcs.withVolumeSpikes(df, exact = true)
      .select(key :+ $"rolling_avg_volume" :+ $"is_volume_spike": _*)
      .orderBy(key: _*).collect()
    val b1 = WindowCalcs.withVolumeSpikesBucketed(df, bucketSeconds = 60L)
      .select(key :+ $"rolling_avg_volume" :+ $"is_volume_spike": _*)
      .orderBy(key: _*).collect()
    a1.zip(b1).foreach { case (x, y) => assert(x == y, s"W1 diverged at ${x.get(1)}") }
    val cols = Seq("bb_mid", "bb_upper", "bb_lower", "bb_width", "bb_pos", "bb_breakout")
    val a2 = WindowCalcs.withBollinger(df, exact = true)
      .select(key ++ cols.map(c => $"$c".alias(c)): _*).orderBy(key: _*).collect()
    val b2 = WindowCalcs.withBollingerBucketed(df, bucketSeconds = 60L)
      .select(key ++ cols.map(c => $"$c".alias(c)): _*).orderBy(key: _*).collect()
    a2.zip(b2).foreach { case (x, y) => assert(x == y, s"W4 diverged at ${x.get(1)}") }
  }

  test("auto path: skew probe picks global for small symbols, bucketed for hot ones") {
    val df = randomLayout(17, 400) // 2 symbols, ~200 rows each
    val small = WindowCalcs.withVolumeSpikesAuto(df, threshold = 1000L)
    assert(!small.queryExecution.optimizedPlan.toString.contains("__bkt"),
      "small-cardinality input should keep the 1-exchange global plan")
    val hot = WindowCalcs.withVolumeSpikesAuto(df, threshold = 100L)
    assert(hot.queryExecution.optimizedPlan.toString.contains("__bkt"),
      "a hot symbol above threshold should flip to the bucketed plan")
    val hot4 = WindowCalcs.withBollingerAuto(df, threshold = 100L)
    assert(hot4.queryExecution.optimizedPlan.toString.contains("__bkt"))
  }

  test("bucketed W1 plan parallelism exceeds the symbol count") {
    val df = randomLayout(13, 500) // 2 symbols, ~40 day-buckets at 3600 s
    val out = WindowCalcs.withVolumeSpikesBucketed(df, bucketSeconds = 3600L)
    // every window exec in the plan partitions on (symbol, __bkt) or the
    // tiny grain table — never on symbol alone, so one hot symbol cannot
    // serialize the stage. A symbol-only window prints as
    // windowspecdefinition(symbol#N, timestamp#M ASC ...): partition list
    // = just symbol, then the order column.
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!"windowspecdefinition\\(symbol#\\d+, timestamp#".r.findFirstIn(plan).isDefined,
      "found a window keyed on symbol alone:\n" + plan)
    assert("windowspecdefinition\\(symbol#\\d+, __bkt#".r.findFirstIn(plan).isDefined,
      "expected a (symbol, __bkt)-keyed window:\n" + plan)
  }
}
