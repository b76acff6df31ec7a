package graft

import graft.temporal.Temporal

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asof join: at-or-before semantics — equality included, no future peeking") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")), // equal-ts right row visible
      (2L, "u1", ts("2024-01-01 10:05:00")), // latest prior wins
      (3L, "u1", ts("2024-01-01 09:00:00")), // before any right → null
      (4L, "u2", ts("2024-01-01 10:00:00")) // other key; right is future → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      ("u1", ts("2024-01-01 10:00:00"), 100.0),
      ("u1", ts("2024-01-01 10:03:00"), 200.0),
      ("u2", ts("2024-01-01 11:00:00"), 999.0)
    ).toDF("user_id", "ts", "v")
    val out = Temporal.asofJoin(left, right, Seq("user_id"), "ts", "ts", Seq("v"))
    assert(out.columns.toSeq === Seq("user_id", "event_id", "ts", "v"))
    val byId = out.select($"event_id", $"v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(byId === Map(
      1L -> Some(100.0), 2L -> Some(200.0), 3L -> None, 4L -> None))
  }

  test("asof join: null right timestamps never match (no value leak)") {
    val left = Seq((1L, "u1", ts("2024-01-01 09:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(("u1", null.asInstanceOf[java.sql.Timestamp], 100.0))
      .toDF("user_id", "ts", "v")
    val out = Temporal.asofJoin(left, right, Seq("user_id"), "ts", "ts", Seq("v"))
      .collect()
    assert(out.length === 1)
    assert(out.head.isNullAt(out.head.fieldIndex("v"))) // not 100.0
  }

  test("sessionize: inactivity gap splits sessions; summary is exact") {
    val ev = Seq(
      ("u1", ts("2024-01-01 10:00:00"), 1L),
      ("u1", ts("2024-01-01 10:30:00"), 2L), // ≤ 1h gap → same session
      ("u1", ts("2024-01-01 12:00:00"), 3L), // 1.5h gap → new session
      ("u2", ts("2024-01-01 10:00:00"), 4L)
    ).toDF("user_id", "ts", "event_id")
    val seqs = Temporal.sessionize(ev, "user_id", "ts", 3600L, Seq("event_id"))
      .select($"event_id", $"session_seq").as[(Long, Long)].collect().toMap
    assert(seqs === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))

    val s = Temporal.sessionSummary(ev, "user_id", "ts", 3600L, Seq("event_id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("duration_s"))))
      .toMap
    assert(s(("u1", 1L)) === ((2L, 1800L)))
    assert(s(("u1", 2L)) === ((1L, 0L)))
    assert(s(("u2", 1L)) === ((1L, 0L)))
  }

  test("asof join on real events matches a per-row brute-force scan") {
    val ev = spark.read.parquet(sf("sf0.001") + "/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    val clicks = ev.where($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts").limit(200)
    val purchases = ev.where($"event_type" === "purchase")
      .groupBy($"user_id", $"ts")
      .agg(org.apache.spark.sql.functions.max($"value").as("pv"))
    val got = Temporal.asofJoin(clicks, purchases, Seq("user_id"), "ts", "ts", Seq("pv"))
      .select($"event_id", $"pv").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    val p = purchases.select($"user_id", $"ts", $"pv")
      .as[(Long, java.sql.Timestamp, Double)].collect()
    val expected = clicks.as[(Long, Long, java.sql.Timestamp)].collect().map {
      case (id, u, t) =>
        val prior = p.filter(x => x._1 == u && !x._2.after(t))
        id -> (if (prior.isEmpty) None else Some(prior.maxBy(_._2.getTime)._3))
    }.toMap
    assert(got === expected)
  }
}
