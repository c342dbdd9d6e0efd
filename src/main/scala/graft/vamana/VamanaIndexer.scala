package graft.vamana

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed Vamana index build + serving, Spark-first.
  *
  * Build (the expensive part) is distributed: points are assigned to
  * `numShards` overlapping shards (each point lands in 2 shards so
  * cross-shard neighborhoods exist), each shard runs the sequential
  * [[VamanaKernel.build]] inside one task, and the per-shard adjacency
  * lists are merged + re-pruned to R with a distributed join — the
  * published DiskANN sharded-build recipe, with no shared mutable state
  * (vs the reference's `omp critical` global graph, vamana.h:266-288).
  *
  * The finished model is a [[LocalIndex]]: serving assumes the graph +
  * vectors fit in one broadcast (n·(dim·4 + R·4) bytes — ~2.7 GB for 10M
  * points at dim=64/R=32). Beyond broadcast scale the design degrades to
  * shard-fanout search (query all shard models, merge top-k by union +
  * window) — same operators, one more stage; not needed at test scale.
  */
object VamanaIndexer {

  /** Fit a Vamana graph over (idCol: LONG, vecCol: array<float>). */
  def fit(
      df: DataFrame,
      params: VamanaParams,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      numShards: Int = 1): VamanaModel = {
    val spark = df.sparkSession
    import spark.implicits._
    val pts: Dataset[(Long, Array[Float])] =
      df.select(col(idCol).cast("long"), col(vecCol).cast("array<float>")).as[(Long, Array[Float])]

    // metric -> L2 reduction (cos: normalize; ip: MIPS augmentation); the
    // kernel below always runs squared-Euclidean
    val metric = params.metric
    val ptsT: Dataset[(Long, Array[Float])] = metric match {
      case "l2" => pts
      case "cos" => pts.map { case (id, v) => (id, MetricReduction.normalize(v)) }
      case "ip" =>
        val m = pts.map(p => MetricReduction.normOf(p._2)).reduce(math.max(_, _))
        pts.map { case (id, v) => (id, MetricReduction.augmentIndexVec(v, m)) }
    }
    val kParams = if (metric == "ip") params.copy(dim = params.dim + 1) else params

    if (numShards <= 1) {
      // single-shard: use the batch-synchronous parallel kernel — the
      // executor threads are otherwise idle during a driver-local build.
      // Output is identical for any parallelism >= 2 (kernel contract).
      val collected = ptsT.collect().sortBy(_._1)
      val par = math.max(2, math.min(Runtime.getRuntime.availableProcessors(), 16))
      val index = VamanaKernel.buildParallel(collected.map(_._1), collected.map(_._2), kParams, par)
      new VamanaModel(index)
    } else {
      val s = numShards
      val seed = params.seed
      // deterministic 2-of-s overlap assignment per point id
      val assigned = ptsT.flatMap { case (id, vec) =>
        val h1 = scala.util.hashing.MurmurHash3.productHash((id, seed))
        val h2 = scala.util.hashing.MurmurHash3.productHash((id, seed + 1))
        val s1 = math.floorMod(h1, s)
        val s2 = math.floorMod(s1 + 1 + math.floorMod(h2, s - 1), s)
        Seq((s1, id, vec), (s2, id, vec))
      }
      // one sequential kernel build per shard; emit adjacency in EXTERNAL ids
      val shardAdj: Dataset[(Long, Array[Long])] =
        assigned.groupByKey(_._1).flatMapGroups { (shard, it) =>
          val arr = it.toArray.sortBy(_._2)
          val ids = arr.map(_._2)
          val vecs = arr.map(_._3)
          val idx = VamanaKernel.build(ids, vecs, kParams.copy(seed = params.seed + shard))
          idx.graph.iterator.zipWithIndex.map { case (nbrs, i) => (ids(i), nbrs.map(ids(_))) }
        }
      // union shard edge lists, dedup, then re-prune each merged list to R
      val merged = shardAdj.groupByKey(_._1)
        .mapGroups { (id, it) => (id, it.flatMap(_._2).toArray.distinct) }
        .toDF("id", "nbrs")
      val ptsDF = ptsT.toDF("pid", "pvec")
      val pruned = merged
        .select($"id", explode($"nbrs").as("nbr"))
        .join(ptsDF, $"nbr" === $"pid")
        .select($"id", $"nbr", $"pvec".as("nvec"))
        .groupBy($"id")
        .agg(collect_list(struct($"nbr", $"nvec")).as("cands"))
        .join(ptsDF, $"id" === $"pid")
        .select($"id", $"pvec", $"cands")
        .as[(Long, Array[Float], Array[(Long, Array[Float])])]
        .map { case (id, pvec, cands) =>
          (id, VamanaKernel.robustPruneVecs(
            pvec, cands.map(_._1), cands.map(_._2),
            params.alpha, params.maxDegree, params.paperPrune))
        }
        .collect()
        .toMap
      val collected = ptsT.collect().sortBy(_._1)
      val ids = collected.map(_._1)
      val pos = ids.zipWithIndex.toMap
      val graph = ids.map(id => pruned.getOrElse(id, Array.empty[Long]).flatMap(pos.get(_)))
      val medoid = VamanaKernel.centroidMedoid(collected.map(_._2))
      new VamanaModel(new LocalIndex(ids, collected.map(_._2), graph, medoid, kParams))
    }
  }
}

/** Shard-fanout ANN search — the beyond-broadcast scale path. Each point
  * lives in exactly one shard; every shard builds its own Vamana graph in
  * one task and answers every query with a local top-k; the global answer is
  * the per-query merge (union + window) of shard answers. Nothing is ever
  * collected to the driver and no single index must fit in one broadcast —
  * the working set per task is one shard. Recall matches the single-model
  * path because a global top-k is contained in the union of per-shard
  * top-ks. */
object VamanaFanout {

  def search(
      points: DataFrame,
      queries: DataFrame,
      k: Int,
      params: VamanaParams,
      numShards: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val q = queries
      .select(col("query_id").cast("long"), col("query_vec").cast("array<float>"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    require(q.length <= 10000, "fanout broadcasts the query batch; keep it bounded")
    val bcQ = spark.sparkContext.broadcast(q)
    val seed = params.seed
    val pts = points
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
    val shardAnswers = pts
      .groupByKey { case (id, _) =>
        math.floorMod(scala.util.hashing.MurmurHash3.productHash((id, seed)), numShards)
      }
      .flatMapGroups { (shard, it) =>
        val arr = it.toArray.sortBy(_._1)
        val idx = VamanaKernel.build(arr.map(_._1), arr.map(_._2),
          params.copy(seed = params.seed + shard))
        bcQ.value.iterator.flatMap { case (qid, qvec) =>
          VamanaKernel.search(idx, qvec, k).iterator.map {
            case (id, dist) => (qid, id, math.rint(dist.toDouble * 1e4) / 1e4)
          }
        }
      }
      .toDF("query_id", "id", "dist")
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist").asc, col("id").asc)
    shardAnswers
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("dist"))
      .orderBy(col("query_id"), col("rank"))
  }
}

/** A fitted Vamana index: broadcast-served searches + parquet persistence.
  * Persists ALL params including efSearch — the reference forgets it on
  * save/load, leaving search width uninitialized (vamana.h:397-405, 62-68;
  * SURVEY.md Appendix A.1). */
final class VamanaModel(val index: LocalIndex) extends Serializable {

  /** Batch ANN top-k: broadcast the index, search per query partition-local —
    * no shuffle at all; output shape matches [[graft.operators.Knn.knnExact]]
    * so recall joins line up. */
  def search(
      queries: DataFrame,
      k: Int,
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec"): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(index)
    queries
      .select(col(queryIdCol).cast("long"), col(queryVecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .flatMap { case (qid, qvec) =>
        val q = MetricReduction.prepareQuery(qvec, bc.value.params.metric)
        VamanaKernel.search(bc.value, q, k).iterator.zipWithIndex.map {
          case ((id, dist), r) =>
            (qid, (r + 1).toLong, id, math.rint(dist.toDouble * 1e4) / 1e4)
        }
      }
      .toDF("query_id", "rank", "id", "dist")
  }

  /** Q2 semantics (vamana.h:426-489): search starting from the stored point
    * nearest to each query's `start_vec` column instead of the medoid. */
  def searchWithStartPoint(
      queries: DataFrame,
      k: Int,
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec",
      startVecCol: String = "start_vec"): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(index)
    queries
      .select(col(queryIdCol).cast("long"), col(queryVecCol).cast("array<float>"),
        col(startVecCol).cast("array<float>"))
      .as[(Long, Array[Float], Array[Float])]
      .flatMap { case (qid, qvec, svec) =>
        val m = bc.value.params.metric
        VamanaKernel.searchWithStartPoint(bc.value,
          MetricReduction.prepareQuery(svec, m), MetricReduction.prepareQuery(qvec, m), k
        ).iterator.zipWithIndex.map {
          case ((id, dist), r) =>
            (qid, (r + 1).toLong, id, math.rint(dist.toDouble * 1e4) / 1e4)
        }
      }
      .toDF("query_id", "rank", "id", "dist")
  }

  /** Point lookup by internal position — GetPoint (vamana.h:549-555). */
  def getPoint(pos: Int): Array[Float] = index.points(pos)

  /** Introspection (M1, vamana.h:41-53): one-row DataFrame of all params. */
  def describe(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val p = index.params
    Seq((p.dim, p.maxDegree, p.beamWidth, p.alpha.toDouble, p.efSearch, p.seed,
      p.paperPrune, p.metric, index.medoid, index.size.toLong))
      .toDF("dim", "max_degree", "beam_width", "alpha", "ef_search", "seed",
        "paper_prune", "metric", "medoid_pos", "data_size")
  }

  def pointsDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    index.ids.zipWithIndex.map { case (id, pos) => (pos, id, index.points(pos)) }.toSeq
      .toDF("pos", "id", "vec")
  }

  def graphDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    index.graph.zipWithIndex.map { case (nbrs, pos) =>
      (pos, index.ids(pos), nbrs.map(index.ids(_)))
    }.toSeq.toDF("pos", "id", "neighbors")
  }

  /** S3 (save, vamana.h:390-424): parquet points + graph + one-row params. */
  def save(spark: SparkSession, path: String): Unit = {
    pointsDF(spark).repartition(1).write.mode("overwrite").parquet(s"$path/points")
    graphDF(spark).repartition(1).write.mode("overwrite").parquet(s"$path/graph")
    describe(spark).repartition(1).write.mode("overwrite").parquet(s"$path/params")
  }
}

object VamanaModel {

  /** S2 (load, vamana.h:55-96): restore points/graph/params from parquet.
    * Internal positions are persisted explicitly, so the medoid and graph
    * indices survive the roundtrip exactly. */
  def load(spark: SparkSession, path: String): VamanaModel = {
    import spark.implicits._
    val p = spark.read.parquet(s"$path/params").head()
    val params = VamanaParams(
      dim = p.getAs[Int]("dim"),
      maxDegree = p.getAs[Int]("max_degree"),
      beamWidth = p.getAs[Int]("beam_width"),
      alpha = p.getAs[Double]("alpha").toFloat,
      efSearch = p.getAs[Int]("ef_search"),
      seed = p.getAs[Long]("seed"),
      paperPrune = p.getAs[Boolean]("paper_prune"),
      metric = p.getAs[String]("metric"))
    val pts = spark.read.parquet(s"$path/points")
      .select(col("pos"), col("id"), col("vec").cast("array<float>"))
      .as[(Int, Long, Array[Float])].collect().sortBy(_._1)
    val ids = pts.map(_._2)
    val pos = ids.zipWithIndex.toMap
    val graph = spark.read.parquet(s"$path/graph")
      .select(col("pos"), col("neighbors"))
      .as[(Int, Array[Long])].collect().sortBy(_._1)
      .map(_._2.flatMap(pos.get(_)))
    new VamanaModel(new LocalIndex(ids, pts.map(_._3), graph, p.getAs[Int]("medoid_pos"), params))
  }
}
