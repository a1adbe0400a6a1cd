package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Ivf, Skew}
import graft.streaming.Sessionizer
import graft.streaming.Sessionizer.Event

class AdvancedOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("sessionize (batch) splits on gaps and counts events") {
    val events = spark.createDataset(Seq(
      Event(1L, ts(0), "a"), Event(1L, ts(10), "b"), Event(1L, ts(100), "c"),
      Event(2L, ts(5), "a")))
    val sessions = Sessionizer.sessionize(events, gapSeconds = 30 * 60, streaming = false)
      .collect().sortBy(s => (s.user_id, s.session_start.getTime))
    assert(sessions.map(s => (s.user_id, s.n_events)).toSeq ==
      Seq((1L, 2L), (1L, 1L), (2L, 1L)))
    assert(sessions.head.session_end == ts(10))
  }

  test("weighted PageRank (TextRank form) matches a driver-side reference iteration") {
    val edges = Seq((1L, 2L, 3L), (2L, 1L, 3L), (2L, 3L, 1L), (3L, 2L, 1L))
      .toDF("src", "dst", "cnt")
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val pr = graph.PageRank.runWeighted(edges, "src", "dst", "cnt",
        nodes, "id", damping = 0.85, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // Reference: same normalized weights, same damped update.
    val out = Map(
      1L -> Seq((2L, 1.0)),
      2L -> Seq((1L, 0.75), (3L, 0.25)),
      3L -> Seq((2L, 1.0)))
    var ref = Map(1L -> 1.0 / 3, 2L -> 1.0 / 3, 3L -> 1.0 / 3)
    for (_ <- 1 to 10) {
      val contrib = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0.0)
      for ((u, vs) <- out; (v, w) <- vs) contrib(v) += ref(u) * w
      ref = Seq(1L, 2L, 3L).map(v => v -> (0.15 / 3 + 0.85 * contrib(v))).toMap
    }
    for (v <- Seq(1L, 2L, 3L))
      assert(math.abs(pr(v) - ref(v)) < 1e-12, s"node $v: ${pr(v)} vs ${ref(v)}")
    // The heavier 1<->2 edge must dominate the rank order.
    assert(pr(2L) > pr(1L) && pr(1L) > pr(3L))
    // Non-positive caller weights are dropped, not divided by: a source
    // whose weights sum to 0 would otherwise emit NaN/Inf ranks silently.
    val guarded = graph.PageRank.runWeighted(
      Seq((1L, 2L, 0L), (1L, 3L, -2L), (2L, 1L, 3L)).toDF("src", "dst", "cnt"),
      "src", "dst", "cnt", nodes, "id", damping = 0.85, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(guarded.values.forall(v => !v.isNaN && !v.isInfinite))
    // Node 1's outgoing mass is gone entirely (both edges non-positive),
    // so node 2 holds only its teleport floor.
    assert(math.abs(guarded(2L) - 0.05) < 1e-12)
  }

  test("PageRank matches a driver-side reference iteration and floors isolated nodes") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val pr = graph.PageRank.run(edges, "src", "dst", nodes, "id",
        damping = 0.85, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val out = Map(1L -> Seq(2L, 3L), 2L -> Seq(3L), 3L -> Seq(1L))
    var ref = Map(1L -> 0.25, 2L -> 0.25, 3L -> 0.25, 4L -> 0.25)
    for (_ <- 1 to 10) {
      val contrib = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0.0)
      for ((u, vs) <- out; v <- vs) contrib(v) += ref(u) / vs.size
      ref = Seq(1L, 2L, 3L, 4L)
        .map(v => v -> (0.15 / 4 + 0.85 * contrib(v))).toMap
    }
    for (v <- Seq(1L, 2L, 3L, 4L))
      assert(math.abs(pr(v) - ref(v)) < 1e-12, s"node $v: ${pr(v)} vs ${ref(v)}")
    // An isolated node keeps exactly the damped floor (1-d)/N.
    assert(math.abs(pr(4L) - 0.15 / 4) < 1e-15)
  }

  test("LabelPropagation matches a driver-side reference sweep") {
    // Two triangles joined by one bridge: dense groups should absorb
    // their min label; the exact fixed-round outcome is checked against
    // a driver-side replay of the same synchronous min-tie-break sweep.
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val nodes = (1L to 6L).toDF("id")
    val got = graph.LabelPropagation.run(edges, "src", "dst", nodes, "id",
        rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inNbrs = (und ++ und.map(_.swap)).groupBy(_._2)
      .map { case (v, es) => v -> es.map(_._1) }
    var lab = (1L to 6L).map(v => v -> v).toMap
    for (_ <- 1 to 5) {
      lab = (1L to 6L).map { v =>
        val in = inNbrs.getOrElse(v, Nil).map(lab)
        if (in.isEmpty) v -> lab(v)
        else v -> in.groupBy(identity).toSeq
          .map { case (l, xs) => (-xs.size, l) }.min._2
      }.toMap
    }
    assert(got == lab)
    // The first triangle consolidates on its min label.
    assert(got(1L) == 1L && got(2L) == 1L)
  }

  test("Triangles counts K4 and path graphs correctly") {
    // K4: every node has degree 3, sits in 3 triangles, coefficient 1.0.
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    val nodes = (1L to 5L).toDF("id") // node 5 isolated
    val got = graph.Triangles.perNode(k4, "a", "b", nodes, "id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    for (v <- 1L to 4L) assert(got(v) == ((3L, 3L, 1.0)), s"node $v: ${got(v)}")
    assert(got(5L) == ((0L, 0L, 0.0)))
    // Path 1-2-3: no triangles, middle node coefficient 0.
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val gotP = graph.Triangles.perNode(path, "a", "b", (1L to 3L).toDF("id"),
        "id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(gotP.values.forall(_ == 0L))
  }

  test("graph invariants on testdata: rank mass, SSSP relaxation fixpoint, triangle triple-count") {
    import org.apache.spark.sql.DataFrame
    val li = Tables.load(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_suppkey").distinct()
    val a = li.select($"l_orderkey", $"l_suppkey".as("src"))
    val b = li.select($"l_orderkey", $"l_suppkey".as("dst"))
    val edges = a.join(b, Seq("l_orderkey")).filter($"src" =!= $"dst")
      .select($"src", $"dst").distinct().cache()
    val nodes = Tables.load(spark, sfDir, "supplier").select($"s_suppkey")
    // PageRank mass conservation: the co-purchase graph is symmetric, so
    // every non-isolated node has outdeg ≥ 1 (no dangling leak) and the
    // damped iteration preserves Σrank = 1 exactly (isolated nodes'
    // (1-d)/N floors are the mass they were seeded with).
    val mass = graph.PageRank.run(edges, "src", "dst", nodes, "s_suppkey",
      damping = 0.85, iters = 10).agg(sum($"rank")).head().getDouble(0)
    assert(math.abs(mass - 1.0) < 1e-9, s"rank mass $mass")
    // SSSP fixpoint: 6 rounds ≥ the sf0.001 graph diameter, so no edge
    // may still relax — dist(v) ≤ dist(u) + w for every edge.
    val w = edges.groupBy($"src", $"dst").count()
      .select($"src", $"dst", (lit(1.0) / $"count".cast("double")).as("w"))
    val dist = graph.ShortestPaths.boundedHops(w, "src", "dst", "w",
      nodes.filter($"s_suppkey" <= 3), "s_suppkey", rounds = 6).cache()
    val viol = w
      .join(dist.select($"node".as("src"), $"dist".as("du")), Seq("src"))
      .join(dist.select($"node".as("dst"), $"dist".as("dv")), Seq("dst"))
      .filter($"dv" > $"du" + $"w" + lit(1e-9)).count()
    assert(viol == 0, s"$viol relaxable edges after 6 rounds")
    // Triangles: Σ per-node counts = 3 × distinct triangles.
    val canon = edges.filter($"src" < $"dst")
      .select($"src".as("a"), $"dst".as("b"))
    val tri = graph.Triangles.perNode(canon, "a", "b", nodes, "s_suppkey")
    val perNodeSum = tri.agg(sum($"n_triangles")).head().getLong(0)
    assert(perNodeSum % 3 == 0 && perNodeSum > 0,
      s"per-node triangle sum $perNodeSum must be a positive multiple of 3")
  }

  test("waterFillBudget matches a greedy water-filling reference across budgets") {
    import graft.operators.Sampling
    val sizes = Seq(("a", 1200L), ("b", 300L), ("c", 5000L),
      ("d", 300L), ("e", 2500L), ("f", 900L)) // total 10200, one tie pair
    val df = sizes.toDF("key", "size")
    // Budgets spanning every branch: below the smallest even share,
    // mixed full/capped, exactly the total, and above the total.
    for (budget <- Seq(100L, 1000L, 5000L, 10200L, 50000L)) {
      val got = Sampling.waterFillBudget(df, "key", "size", budget)
        .as[(String, Long, Double, Boolean)].collect()
        .map(r => r._1 -> ((r._3, r._4))).toMap
      val sorted = sizes.sortBy { case (k, s) => (s, k) }
      var remaining = budget.toDouble
      var level = Double.NaN
      var capped = false
      val ref = scala.collection.mutable.Map.empty[String, (Double, Boolean)]
      for (((k, s), idx) <- sorted.zipWithIndex) {
        val slots = sorted.size - idx
        if (!capped && s.toDouble * slots <= remaining) {
          ref(k) = (s.toDouble, true); remaining -= s
        } else {
          if (!capped) { capped = true; level = remaining / slots }
          ref(k) = (level, false)
        }
      }
      for ((k, (ra, rf)) <- ref) {
        val (alloc, fu) = got(k)
        assert(math.abs(alloc - math.rint(ra * 1e4) / 1e4) < 1e-9 && fu == rf,
          s"budget=$budget key=$k got=($alloc,$fu) want=($ra,$rf)")
      }
      // The allocation always exhausts min(budget, total).
      val total = got.values.map(_._1).sum
      assert(math.abs(total - math.min(budget, 10200L).toDouble) < 1e-3)
    }
  }

  test("sessionize matches the window-based q42 session counts") {
    val raw = Tables.events(spark, sfDir)
    val events = Sessionizer.fromEventsTable(spark, raw)
    val stateful = Sessionizer.sessionize(events, gapSeconds = 1800, streaming = false)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
    val windowed = SparkEntry.queries("q42_sessionize")(spark, sfDir)
      .select("user_id", "n_sessions")
    assert(stateful.join(windowed, Seq("user_id"))
      .filter(stateful("n_sessions") =!= windowed("n_sessions")).count() == 0)
    assert(stateful.count() == windowed.count())
  }

  test("saltedJoin equals the plain join") {
    val fact = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val build = Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_orderpriority")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = fact.join(build, Seq("l_orderkey")).count()
    val salted = Skew.saltedJoin(fact, build, Seq("l_orderkey"), salts = 8).count()
    assert(plain == salted)
  }

  test("saltedCount equals groupBy count") {
    val df = Tables.load(spark, sfDir, "lineitem")
    val plain = df.groupBy("l_returnflag").count()
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(df, "l_returnflag", salts = 8)
      .as[(String, Long)].collect().toMap
    assert(plain == salted)
  }

  test("deterministic IVF: persisted cell-partitioned index prunes partitions") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val cents = e.filter($"vec_id" < 8).orderBy($"vec_id").select("embedding")
      .collect().map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    val model = Ivf.buildWithCentroids(e, "vec_id", "embedding", cents)
    // Persist the index partitioned by cell — the layout searches rely on.
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/idx"
    model.indexed.write.partitionBy("cell").parquet(dir)
    val persisted = spark.read.parquet(dir)
    val q = cents(3)
    val probed = Ivf.probeCells(model, q, nProbe = 2)
    assert(probed.head == 3L) // centroid 3 is its own nearest cell
    val pruned = persisted.filter($"cell".isin(probed: _*))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"expected cell partition pruning, got:\n${plan.take(600)}")
    // Persisted+pruned search returns the same rows as the in-memory model.
    val fromDisk = pruned
      .select($"vec_id", graft.functions.Vectors.cosineToConst($"embedding", q).as("cosine_sim"))
      .orderBy($"cosine_sim".desc, $"vec_id").limit(5)
      .select("vec_id").as[Long].collect().toSeq
    val fromModel = Ivf.searchDetailed(model, "vec_id", "embedding", q, nProbe = 2, topK = 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(fromDisk == fromModel && fromModel.head == 3L)
  }

  test("stratifiedSample is partition-layout invariant (retry-safe)") {
    import graft.operators.Sampling
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "lang")
    val a = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 0.5), 0.2).select("doc_id").as[Long].collect().toSet
    val b = Sampling.stratifiedSample(docs.repartition(7), "lang", "doc_id",
      Map("en" -> 0.5), 0.2).select("doc_id").as[Long].collect().toSet
    assert(a.nonEmpty && a == b)
  }

  test("profileApprox: exact below k, bounded error above, nulls/min/max identical") {
    import graft.operators.Profile
    val orders = Tables.load(spark, sfDir, "orders")
    val cols = Seq("o_orderstatus", "o_orderpriority", "o_custkey")
    def byCol(df: org.apache.spark.sql.DataFrame, distinctCol: String) =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Long](distinctCol),
          r.getString(4), r.getString(5))).toMap
    val exact = byCol(Profile.profile(orders, cols), "n_distinct")
    val approx = byCol(Profile.profileApprox(orders, cols, k = 256), "n_distinct_est")
    cols.foreach { c =>
      val (er, en, ed, emin, emax) = exact(c)
      val (ar, an, ad, amin, amax) = approx(c)
      assert((er, en, emin, emax) == (ar, an, amin, amax))
      if (ed < 256) assert(ad == ed, s"$c: $ad != $ed in the exact regime")
      else assert(math.abs(ad - ed).toDouble / ed < 0.2,
        s"$c: estimate $ad vs exact $ed")
    }
  }

  test("mixToTarget: binding stratum kept whole, mix near target, deterministic") {
    import graft.operators.Sampling
    val docs = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"lang",
        size(split(trim($"text"), "\\s+")).cast("long").as("n_tokens"))
      .filter($"lang".isin("en", "de", "fr"))
    val weights = Map("en" -> 0.5, "de" -> 0.3, "fr" -> 0.2)
    val avail = docs.groupBy($"lang").agg(sum($"n_tokens").as("t"))
      .as[(String, Long)].collect().toMap
    val binding = weights.keys.minBy(l => avail(l) / weights(l))
    val mixed = Sampling.mixToTarget(docs, "lang", "doc_id", "n_tokens", weights)
    val kept = mixed.groupBy($"lang")
      .agg(count(lit(1)).as("n"), sum($"n_tokens").as("t"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // The binding stratum's rate is 1.0: every doc survives.
    assert(kept(binding)._1 == docs.filter($"lang" === binding).count())
    // Achieved token shares track the target (hash sampling is per-doc,
    // so allow a loose tolerance at this corpus size).
    val total = kept.values.map(_._2).sum.toDouble
    weights.foreach { case (l, w) =>
      assert(math.abs(kept(l)._2 / total - w) < 0.1,
        s"$l share ${kept(l)._2 / total} vs target $w")
    }
    // Partition-layout invariant, like stratifiedSample.
    val again = Sampling.mixToTarget(
        docs.repartition(7), "lang", "doc_id", "n_tokens", weights)
      .select("doc_id").as[Long].collect().toSet
    assert(again == mixed.select("doc_id").as[Long].collect().toSet)
  }

  test("chunkAssignments matches a local replay of the token stream") {
    import graft.operators.Sampling
    val docs = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"lang",
        size(split(trim($"text"), "\\s+")).cast("long").as("n_tokens"))
    val packed = Sampling.chunkAssignments(docs, "lang", "doc_id", "n_tokens", 2048)
      .select("lang", "doc_id", "n_tokens", "pack_id")
      .as[(String, Long, Long, Long)].collect()
    packed.groupBy(_._1).foreach { case (_, rows) =>
      var prefix = 0L
      rows.sortBy(_._2).foreach { case (_, _, n, packId) =>
        assert(packId == prefix / 2048)
        prefix += n
      }
    }
    assert(packed.map(_._4).max > 0) // multiple chunks exist
  }

  test("IVF search finds the exact neighbor for an indexed vector") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val model = Ivf.build(e, "vec_id", "embedding", nCells = 8)
    assert(model.indexed.select("cell").distinct().count() <= 8)
    val q = e.filter($"vec_id" === 5).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toSeq
    val hit = Ivf.search(model, "vec_id", "embedding", q, nProbe = 2, topK = 1)
      .select("vec_id").as[Long].head()
    assert(hit == 5L)
  }

  test("PQ: 8-byte codes, self-query ranks itself first, recall vs brute force") {
    import graft.operators.Pq
    val e = Tables.load(spark, sfDir, "embeddings")
    val sample = e.filter($"vec_id" < 16).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    val model = Pq.encode(e, "embedding", Pq.codebooksFromSample(sample, 8))
    // 64 floats compress to 8 codes, each addressing one of 16 codewords.
    val codes = model.encoded.select("codes").head().getSeq[Long](0)
    assert(codes.length == 8 && codes.forall(c => c >= 0 && c < 16))
    // A sampled vector IS codeword k in every subspace: its ADC total is
    // the lattice minimum, so it must survive the shortlist and rerank
    // to cosine 1.0 at rank 1.
    val top = Pq.search(model, "vec_id", "embedding", sample.head,
      rerank = 50, topK = 10).collect()
    assert(top.head.getLong(0) == 0L)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
    // ADC + rerank approximates the brute-force top-10 (recall >= 0.6
    // with these untrained rank-order codebooks).
    val brute = e.select($"vec_id",
        graft.functions.Vectors.cosineToConst($"embedding", sample.head).as("c"))
      .orderBy($"c".desc, $"vec_id").limit(10)
      .select("vec_id").as[Long].collect().toSet
    val got = top.map(_.getLong(0)).toSet
    assert(brute.intersect(got).size >= 6,
      s"recall too low: ${brute.intersect(got).size}/10")
  }

  test("PQ trained codebooks: per-subspace k-means beats/meets sample recall") {
    import graft.operators.Pq
    val e = Tables.load(spark, sfDir, "embeddings")
    val q = e.filter($"vec_id" === 3).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toSeq
    val trained = Pq.trainCodebooks(e, "embedding", m = 8, k = 16)
    assert(trained.length == 8 &&
      trained.forall(cb => cb.length == 16 && cb.forall(_.length == q.size / 8)))
    val model = Pq.encode(e, "embedding", trained)
    val codes = model.encoded.select("codes").head().getSeq[Long](0)
    assert(codes.length == 8 && codes.forall(c => c >= 0 && c < 16))
    val top = Pq.search(model, "vec_id", "embedding", q, rerank = 50, topK = 10)
      .collect()
    // Exact rerank puts the self-match first with cosine 1.
    assert(top.head.getLong(0) == 3L)
    val brute = e.select($"vec_id",
        graft.functions.Vectors.cosineToConst($"embedding", q).as("c"))
      .orderBy($"c".desc, $"vec_id").limit(10)
      .select("vec_id").as[Long].collect().toSet
    val got = top.map(_.getLong(0)).toSet
    assert(brute.intersect(got).size >= 6,
      s"trained-codebook recall too low: ${brute.intersect(got).size}/10")
  }

  test("KCore: peel strips the tail, keeps the known 2-core, and is a fixpoint") {
    // Triangle {1,2,3} with a pendant path 3-4-5: the 2-core is exactly
    // the triangle, reached after two sweeps (5 falls first, then 4).
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val got = graph.KCore.peel(edges, "a", "b", k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"2-core wrong: $got")
    // Monotone convergence: once the peel reaches the core, extra sweeps
    // are no-ops — rounds=8 must equal rounds=3 exactly.
    val more = graph.KCore.peel(edges, "a", "b", k = 2, rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(more == got, "extra sweeps changed a converged core")
    // k above the max degree empties the graph entirely.
    assert(graph.KCore.peel(edges, "a", "b", k = 5, rounds = 3).count() == 0)
  }

  test("Hits: known star graph ranks the shared authority and busy hub on top, max-normalized to 1") {
    import spark.implicits._
    // c1→s1, c2→s1, c2→s2: s1 is the consensus authority, c2 the
    // stronger hub (it cites the strong authority AND another).
    val edges = Seq(("c1", "s1"), ("c2", "s1"), ("c2", "s2")).toDF("src", "dst")
    val got = graph.Hits.run(edges, "src", "dst", iters = 5)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val (h, a) = (got.view.mapValues(_._1).toMap, got.view.mapValues(_._2).toMap)
    assert(a("s1") == 1.0 && h("c2") == 1.0,
      s"max-normalization must pin the top scores at 1: $got")
    assert(a("s1") > a("s2") && h("c2") > h("c1"), s"ordering wrong: $got")
    assert(a("c1") == 0.0 && a("c2") == 0.0 && h("s1") == 0.0 && h("s2") == 0.0,
      s"sources have no authority, sinks no hub score: $got")
  }
}
