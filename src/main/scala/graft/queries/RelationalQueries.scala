package graft.queries

import graft.cc.{ConnectedComponents, GreedyGrouping}
import graft.functions.SearchQuery
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Operator-level queries over the driver's TPC-H-ish testdata, each with a
 * DuckDB-dialect oracle (SparkEntry.oracleSql) — the SURVEY.md §2 inventory
 * expressed over integer/string columns so the driver's DuckDB compare can
 * gate it. The image pipeline itself is exercised by ImageQueries (rows-only
 * checks) and the ScalaTest oracle gate.
 *
 * Determinism rules shared by both sides: integer-only pseudo-hashes (no
 * cross-engine float drift), md5 for string hashing, floor(x+0.5) instead of
 * round on floats, explicit BIGINT casts, ORDER BY on every output.
 */
object RelationalQueries {
  private def pq(dir: String, t: String) = s"$dir/$t.parquet"
  private def rd(spark: SparkSession, dir: String, t: String): DataFrame =
    spark.read.parquet(pq(dir, t))

  // --- shared pseudo-hash: 63-bit hash from 4 multiplicative 16-bit chunks,
  // overflow-free in engines with checked int64 arithmetic ---
  private def hcCol(x: Column, m: Long, a: Long, mod: Long): Column =
    ((x % 65521L) * m + a) % mod
  def h64Col(x: Column): Column =
    hcCol(x, 40503L, 17L, 65536L) +
      hcCol(x, 51721L, 73L, 65536L) * 65536L +
      hcCol(x, 11597L, 129L, 65536L) * 4294967296L +
      hcCol(x, 21841L, 211L, 32768L) * 281474976710656L
  private def hcSql(x: String, m: Long, a: Long, mod: Long): String =
    s"((($x % 65521) * $m + $a) % $mod)"
  def h64Sql(x: String): String =
    s"(${hcSql(x, 40503, 17, 65536)} + ${hcSql(x, 51721, 73, 65536)}*65536 + " +
      s"${hcSql(x, 11597, 129, 65536)}*4294967296 + ${hcSql(x, 21841, 211, 32768)}*281474976710656)"

  // planted near-duplicate clusters: 16 members per cluster, each member's
  // hash = cluster base XOR ≤2 bits in chunk 0 ⇒ pairwise Hamming ≤ 4
  /** Expects an `event_id` column in scope. */
  def plantedCol(id: Column): Column = {
    val base = h64Col(floor(id / 16).cast("long"))
    base.bitwiseXOR(expr(
      "CAST(shiftleft(1, CAST(event_id % 16 % 4 AS INT)) + " +
        "shiftleft(1, CAST(4 + CAST(event_id % 16 / 4 AS INT) AS INT)) AS BIGINT)"))
  }
  def plantedSql: String =
    s"xor(${h64Sql("(event_id // 16)")}, " +
      "(1::BIGINT << ((event_id % 16) % 4)::INT) + (1::BIGINT << (4 + (event_id % 16) // 4)::INT))"

  /** 4×16-bit chunk of a 64-bit column. */
  private def chunkCol(h: Column, k: Int): Column =
    shiftrightunsigned(h, k * 16).bitwiseAND(lit(0xffffL))

  private val MaxPlantedId = 4000
  private val BandThreshold = 6

  // =========================================================================
  // P13 — Hamming distance histogram (bit_count(xor)), scanner hot verify
  // =========================================================================
  def qHammingHist(spark: SparkSession, dir: String): DataFrame = {
    val e = rd(spark, dir, "events")
    e.select(bit_count(h64Col(col("event_id")).bitwiseXOR(h64Col(col("user_id"))))
        .cast("long").as("dist"))
      .groupBy("dist").agg(count(lit(1)).cast("long").as("n"))
      .orderBy("dist")
  }
  def sqlHammingHist(dir: String): String =
    s"""SELECT bit_count(xor(${h64Sql("event_id")}, ${h64Sql("user_id")}))::BIGINT AS dist,
       count(*)::BIGINT AS n
       FROM events GROUP BY 1 ORDER BY dist"""

  // =========================================================================
  // J1 — MIH index build: explode hash into (band_idx, band_val) keys
  // =========================================================================
  def qBandExtract(spark: SparkSession, dir: String): DataFrame = {
    val e = rd(spark, dir, "events").where(col("event_id") < 2000)
      .select(col("event_id").cast("long").as("id"), h64Col(col("event_id")).as("h"))
    e.select(col("id"), posexplode(array((0 until 4).map(k => chunkCol(col("h"), k)): _*))
        .as(Seq("band_idx", "band_val")))
      .select(col("id"), col("band_idx").cast("long").as("band_idx"),
        col("band_val").cast("long").as("band_val"))
      .orderBy("id", "band_idx")
  }
  def sqlBandExtract(dir: String): String =
    s"""SELECT event_id::BIGINT AS id, k::BIGINT AS band_idx,
       ((${h64Sql("event_id")} >> (k*16)) & 65535)::BIGINT AS band_val
       FROM events, (VALUES (0),(1),(2),(3)) t(k)
       WHERE event_id < 2000 ORDER BY id, band_idx"""

  // =========================================================================
  // J2/J3/J4 — LSH band self-join + canonical i<j + Hamming verify
  // =========================================================================
  private def plantedHashes(spark: SparkSession, dir: String): DataFrame =
    rd(spark, dir, "events").where(col("event_id") < MaxPlantedId)
      .select(col("event_id").cast("long").as("id"), plantedCol(col("event_id")).as("h"))

  def qBandJoinPairs(spark: SparkSession, dir: String): DataFrame = {
    val h = plantedHashes(spark, dir)
    val bands = h.select(col("id"), col("h"),
      posexplode(array((0 until 4).map(k => chunkCol(col("h"), k)): _*))
        .as(Seq("band_idx", "band_val")))
    val a = bands.select(col("id").as("a"), col("h").as("ha"),
      col("band_idx"), col("band_val"))
    val b = bands.select(col("id").as("b"), col("h").as("hb"),
      col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("dist"))
      .where(col("dist") <= BandThreshold)
      .distinct()
      .orderBy("a", "b")
  }
  private def sqlEdgesCte(dir: String): String =
    s"""hashes AS (SELECT event_id::BIGINT AS id, $plantedSql AS h
         FROM events WHERE event_id < $MaxPlantedId),
       bands AS (SELECT id, h, k, ((h >> (k*16)) & 65535) AS band
         FROM hashes, (VALUES (0),(1),(2),(3)) t(k)),
       edges AS (SELECT DISTINCT x.id AS a, y.id AS b,
           bit_count(xor(x.h, y.h))::BIGINT AS dist
         FROM bands x JOIN bands y ON x.k = y.k AND x.band = y.band AND x.id < y.id
         WHERE bit_count(xor(x.h, y.h)) <= $BandThreshold)"""
  def sqlBandJoinPairs(dir: String): String =
    s"WITH ${sqlEdgesCte(dir)} SELECT a, b, dist FROM edges ORDER BY a, b"

  // =========================================================================
  // A1 — connected components (large-star/small-star) vs recursive-CTE oracle
  // =========================================================================
  def qConnectedComponents(spark: SparkSession, dir: String): DataFrame = {
    val edges = qBandJoinPairs(spark, dir)
    ConnectedComponents.run(spark, edges)
      .select(col("id").cast("long").as("id"), col("comp").cast("long").as("comp"))
      .orderBy("id")
  }
  def sqlConnectedComponents(dir: String): String =
    s"""WITH RECURSIVE ${sqlEdgesCte(dir)},
       sym AS (SELECT a AS s, b AS d FROM edges UNION ALL SELECT b, a FROM edges),
       walk(n, c) AS (
         SELECT s, s FROM (SELECT DISTINCT s FROM sym) t
         UNION
         SELECT sym.d, walk.c FROM walk JOIN sym ON sym.s = walk.n)
       SELECT n::BIGINT AS id, min(c)::BIGINT AS comp FROM walk GROUP BY n ORDER BY id"""

  // =========================================================================
  // A2/F3 — groups from components, size > 1
  // =========================================================================
  def qDupGroups(spark: SparkSession, dir: String): DataFrame =
    qConnectedComponents(spark, dir)
      .groupBy("comp")
      .agg(count(lit(1)).cast("long").as("n"),
        min("id").cast("long").as("min_id"), max("id").cast("long").as("max_id"))
      .where(col("n") > 1)
      .orderBy("comp")
  def sqlDupGroups(dir: String): String =
    s"""WITH RECURSIVE ${sqlEdgesCte(dir)},
       sym AS (SELECT a AS s, b AS d FROM edges UNION ALL SELECT b, a FROM edges),
       walk(n, c) AS (
         SELECT s, s FROM (SELECT DISTINCT s FROM sym) t
         UNION
         SELECT sym.d, walk.c FROM walk JOIN sym ON sym.s = walk.n),
       comps AS (SELECT n AS id, min(c) AS comp FROM walk GROUP BY n)
       SELECT comp::BIGINT AS comp, count(*)::BIGINT AS n,
         min(id)::BIGINT AS min_id, max(id)::BIGINT AS max_id
       FROM comps GROUP BY comp HAVING count(*) > 1 ORDER BY comp"""

  // =========================================================================
  // J8 — stem merge: rows sharing a stem key force their groups merged
  // (scanner.rs:1905-1983: files sharing (parent dir, stem) join one group).
  // Extra star edges per stem (hub = min id) are unioned with the verified
  // band edges before CC — same shape as the reference's post-grouping merge.
  // =========================================================================
  def qStemMerge(spark: SparkSession, dir: String): DataFrame = {
    val edges = qBandJoinPairs(spark, dir).select("a", "b")
    val stems = plantedHashes(spark, dir)
      .select(col("id"), floor(col("id") / 32).as("stem"))
    val hubs = stems.groupBy("stem").agg(min("id").as("hub"))
    val stemEdges = stems.join(hubs, "stem")
      .where(col("id") =!= col("hub"))
      .select(col("hub").as("a"), col("id").as("b"))
    ConnectedComponents.run(spark, edges.unionByName(stemEdges))
      .select(col("id").cast("long").as("id"), col("comp").cast("long").as("comp"))
      .orderBy("id")
  }
  def sqlStemMerge(dir: String): String =
    s"""WITH RECURSIVE ${sqlEdgesCte(dir)},
       ids AS (SELECT event_id::BIGINT AS id FROM events WHERE event_id < $MaxPlantedId),
       stems AS (SELECT id, id // 32 AS stem FROM ids),
       hubs AS (SELECT stem, min(id) AS hub FROM stems GROUP BY stem),
       stem_edges AS (SELECT h.hub AS a, s.id AS b
         FROM stems s JOIN hubs h ON s.stem = h.stem WHERE s.id <> h.hub),
       all_edges AS (SELECT a, b FROM edges UNION SELECT a, b FROM stem_edges),
       sym AS (SELECT a AS s, b AS d FROM all_edges UNION ALL SELECT b, a FROM all_edges),
       walk(n, c) AS (
         SELECT s, s FROM (SELECT DISTINCT s FROM sym) t
         UNION
         SELECT sym.d, walk.c FROM walk JOIN sym ON sym.s = walk.n)
       SELECT n::BIGINT AS id, min(c)::BIGINT AS comp FROM walk GROUP BY n ORDER BY id"""

  // =========================================================================
  // Incremental index probe (BandIndex.probe shape): even ids form the
  // persisted corpus index, odd ids are the delta; candidate edges come
  // from band-key equality, verification applies PER-SIDE low-quality
  // limits (scanner.rs:1579-1594: either side low ⇒ exact only).
  // =========================================================================
  def qIndexProbe(spark: SparkSession, dir: String): DataFrame = {
    val rows = plantedHashes(spark, dir)
      .withColumn("quality", (col("id") * 7919L) % 101L)
      .withColumn("low", col("quality") < 50)
    val idx = rows.where(col("id") % 2 === 0)
    val prb = rows.where(col("id") % 2 === 1)
    def banded(df: DataFrame) = df.select(col("id"), col("h"), col("low"),
      posexplode(array((0 until 4).map(k => chunkCol(col("h"), k)): _*))
        .as(Seq("band_idx", "band_val")))
    val a = banded(prb).select(col("id").as("a"), col("h").as("ha"),
      col("low").as("la"), col("band_idx"), col("band_val"))
    val b = banded(idx).select(col("id").as("b"), col("h").as("hb"),
      col("low").as("lb"), col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val"))
      .select(col("a"), col("b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("dist"),
        when(col("la") || col("lb"), 0L).otherwise(lit(BandThreshold.toLong)).as("lim"))
      .where(col("dist") <= col("lim"))
      .select("a", "b", "dist").distinct()
      .orderBy("a", "b")
  }
  def sqlIndexProbe(dir: String): String =
    s"""WITH hashes AS (SELECT event_id::BIGINT AS id, $plantedSql AS h,
         ((event_id * 7919) % 101 < 50) AS low
         FROM events WHERE event_id < $MaxPlantedId),
       bands AS (SELECT id, h, low, k, ((h >> (k*16)) & 65535) AS band
         FROM hashes, (VALUES (0),(1),(2),(3)) t(k)),
       joined AS (SELECT x.id AS a, y.id AS b,
           bit_count(xor(x.h, y.h))::BIGINT AS dist,
           (CASE WHEN x.low OR y.low THEN 0 ELSE $BandThreshold END) AS lim
         FROM bands x JOIN bands y ON x.k = y.k AND x.band = y.band
         WHERE x.id % 2 = 1 AND y.id % 2 = 0)
       SELECT DISTINCT a, b, dist FROM joined WHERE dist <= lim ORDER BY a, b"""

  // =========================================================================
  // A3 — greedy seed+neighbors grouping (hamminghash.rs:191-271): the MIH
  // library's single-pass alternative to union-find. Run on structured
  // input (even clusters = 16-cliques, odd clusters = 16-paths) whose
  // greedy grouping has a closed form: cliques collapse onto the min
  // member; paths pair up (seed at even offset grabs its right neighbor).
  // =========================================================================
  private val MaxGreedyId = 2000
  def qGreedyGroups(spark: SparkSession, dir: String): DataFrame = {
    val ids = rd(spark, dir, "events").where(col("event_id") < MaxGreedyId)
      .select(col("event_id").cast("long").as("id"))
    val a = ids.select(col("id").as("a"), floor(col("id") / 16).as("cl"))
    val b = ids.select(col("id").as("b"), floor(col("id") / 16).as("cl"))
    val cliqueEdges = a.join(b, "cl")
      .where(col("a") < col("b") && col("cl") % 2 === 0)
      .select("a", "b")
    val pathEdges = ids
      .where(col("id") % 16 < 15 && floor(col("id") / 16) % 2 === 1)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    // Arithmetic edge-count bound from the construction (no count() job —
    // VERDICT r4 #8): 63 even clusters × C(16,2) + 62 odd clusters × 15
    // path edges; an upper bound when the events table is sparse, which
    // the hint contract allows.
    val clusters = MaxGreedyId / 16
    val edgeBound = ((clusters + 1) / 2).toLong * (16 * 15 / 2) +
      (clusters / 2).toLong * 15
    GreedyGrouping.run(spark, cliqueEdges.unionByName(pathEdges),
        nEdgesHint = edgeBound)
      .select(col("id").cast("long").as("id"), col("grp").cast("long").as("grp"))
      .orderBy("id")
  }
  def sqlGreedyGroups(dir: String): String =
    s"""SELECT event_id::BIGINT AS id,
       (CASE WHEN (event_id // 16) % 2 = 0 THEN (event_id // 16) * 16
             ELSE event_id - (event_id % 16) % 2 END)::BIGINT AS grp
       FROM events WHERE event_id < $MaxGreedyId ORDER BY id"""

  // =========================================================================
  // A4/A7 — group status: AllIdentical / SomeIdentical / None from
  // simulated content hashes (id%8<2 collapses onto one hash per component)
  // =========================================================================
  def qGroupStatus(spark: SparkSession, dir: String): DataFrame = {
    val perContent = qConnectedComponents(spark, dir)
      .withColumn("content",
        when(col("id") % 8 < 2, col("comp") * 100).otherwise(col("id")))
      .groupBy("comp", "content").agg(count(lit(1)).as("dup"))
    perContent.groupBy("comp")
      .agg(sum("dup").cast("long").as("n"),
        count(lit(1)).cast("long").as("n_distinct"),
        max("dup").as("max_dup"))
      .withColumn("status",
        when(col("n_distinct") === 1, lit("AllIdentical"))
          .when(col("max_dup") > 1, lit("SomeIdentical")).otherwise(lit("None")))
      .select("comp", "n", "n_distinct", "status")
      .orderBy("comp")
  }
  def sqlGroupStatus(dir: String): String =
    s"""WITH RECURSIVE ${sqlEdgesCte(dir)},
       sym AS (SELECT a AS s, b AS d FROM edges UNION ALL SELECT b, a FROM edges),
       walk(n, c) AS (
         SELECT s, s FROM (SELECT DISTINCT s FROM sym) t
         UNION
         SELECT sym.d, walk.c FROM walk JOIN sym ON sym.s = walk.n),
       comps AS (SELECT n AS id, min(c) AS comp FROM walk GROUP BY n),
       withc AS (SELECT id, comp,
           CASE WHEN id % 8 < 2 THEN comp * 100 ELSE id END AS content FROM comps),
       per_content AS (SELECT comp, content, count(*) AS dup FROM withc GROUP BY 1, 2)
       SELECT comp::BIGINT AS comp, sum(dup)::BIGINT AS n,
         count(*)::BIGINT AS n_distinct,
         CASE WHEN count(*) = 1 THEN 'AllIdentical'
              WHEN max(dup) > 1 THEN 'SomeIdentical' ELSE 'None' END AS status
       FROM per_content GROUP BY comp ORDER BY comp"""

  // =========================================================================
  // F2 — low-quality exact-only gate: per-row distance limit
  // =========================================================================
  def qLowConfGate(spark: SparkSession, dir: String): DataFrame =
    rd(spark, dir, "events")
      .select(col("event_id").cast("long").as("id"),
        ((col("event_id") * 7919L) % 101L).cast("long").as("quality"))
      .withColumn("lim",
        when(col("quality") < 50, 0L).otherwise(40L))
      .orderBy("id")
  def sqlLowConfGate(dir: String): String =
    s"""SELECT event_id::BIGINT AS id, ((event_id * 7919) % 101)::BIGINT AS quality,
       (CASE WHEN (event_id * 7919) % 101 < 50 THEN 0 ELSE 40 END)::BIGINT AS lim
       FROM events ORDER BY id"""

  // =========================================================================
  // S12/E4 — prune: anti-join (customers that never ordered)
  // =========================================================================
  def qPruneAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = rd(spark, dir, "customer")
    val o = rd(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey").cast("long").as("c_custkey"))
      .orderBy("c_custkey")
  }
  def sqlPruneAntiJoin(dir: String): String =
    s"""SELECT c_custkey::BIGINT AS c_custkey FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey)
       ORDER BY c_custkey"""

  // =========================================================================
  // J6/S9 — incremental cache join: left join vs checkpoint, compute misses
  // =========================================================================
  def qCacheJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = rd(spark, dir, "events").select(col("event_id").cast("long").as("id"))
    val cache = e.where(col("id") % 2 === 0)
      .select(col("id"), (col("id") * 31L).as("cached_sig"))
    e.join(cache, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("cached_sig"), lit(-1L)).cast("long").as("sig"),
        when(col("cached_sig").isNull, 1L).otherwise(0L).as("needs_compute"))
      .orderBy("id")
  }
  def sqlCacheJoin(dir: String): String =
    s"""WITH e AS (SELECT event_id::BIGINT AS id FROM events),
       cache AS (SELECT id, id * 31 AS cached_sig FROM e WHERE id % 2 = 0)
       SELECT e.id, coalesce(cache.cached_sig, -1)::BIGINT AS sig,
         (CASE WHEN cache.cached_sig IS NULL THEN 1 ELSE 0 END)::BIGINT AS needs_compute
       FROM e LEFT JOIN cache ON e.id = cache.id ORDER BY e.id"""

  // =========================================================================
  // J7 — group registry UUID reuse: left outer + coalesce
  // =========================================================================
  def qRegistryReuse(spark: SparkSession, dir: String): DataFrame = {
    val groups = qDupGroups(spark, dir)
    val registry = groups.where(col("comp") % 32 === 0)
      .select(col("comp"), concat(lit("reg-"), col("comp")).as("reg_uuid"))
    groups.join(registry, Seq("comp"), "left")
      .select(col("comp"),
        coalesce(col("reg_uuid"), concat(lit("new-"), col("comp"))).as("uuid"))
      .orderBy("comp")
  }
  def sqlRegistryReuse(dir: String): String =
    s"""WITH RECURSIVE ${sqlEdgesCte(dir)},
       sym AS (SELECT a AS s, b AS d FROM edges UNION ALL SELECT b, a FROM edges),
       walk(n, c) AS (
         SELECT s, s FROM (SELECT DISTINCT s FROM sym) t
         UNION
         SELECT sym.d, walk.c FROM walk JOIN sym ON sym.s = walk.n),
       comps AS (SELECT n AS id, min(c) AS comp FROM walk GROUP BY n),
       groups AS (SELECT comp FROM comps GROUP BY comp HAVING count(*) > 1),
       registry AS (SELECT comp, 'reg-' || comp::VARCHAR AS reg_uuid
         FROM groups WHERE comp % 32 = 0)
       SELECT g.comp::BIGINT AS comp,
         coalesce(r.reg_uuid, 'new-' || g.comp::VARCHAR) AS uuid
       FROM groups g LEFT JOIN registry r ON g.comp = r.comp ORDER BY comp"""

  // =========================================================================
  // S11 ignored-group suppression (IgnoredEntry db.rs:236-244 + lookup flow
  // db.rs:1277-1336): append-only (uuid, ignored, seq) marks, latest seq
  // wins per uuid, currently-ignored groups drop from assembled output.
  // Marks here: seq 0 ignores comp%3==0, seq 1 clears comp%6==0 — so
  // comp%6==0 re-surfaces and only comp%3==0 ∧ comp%6≠0 stays suppressed.
  // =========================================================================
  def qRegistryIgnored(spark: SparkSession, dir: String): DataFrame = {
    val groups = qDupGroups(spark, dir)
      .select(col("comp"), col("n"), concat(lit("uuid-"), col("comp")).as("uuid"))
    val marks = groups.where(col("comp") % 3 === 0)
      .select(col("uuid"), lit(true).as("ignored"), lit(0L).as("seq"))
      .unionByName(groups.where(col("comp") % 6 === 0)
        .select(col("uuid"), lit(false).as("ignored"), lit(1L).as("seq")))
    // the GroupRegistry.ignoredUuids shape: latest mark per uuid wins
    val ignoredNow = marks.groupBy("uuid")
      .agg(max(struct(col("seq"), col("ignored"))).as("m"))
      .where(col("m.ignored"))
      .select("uuid")
    groups.join(ignoredNow, Seq("uuid"), "left_anti")
      .select(col("comp"), col("n"), col("uuid"))
      .orderBy("comp")
  }
  def sqlRegistryIgnored(dir: String): String =
    s"""WITH RECURSIVE ${sqlEdgesCte(dir)},
       sym AS (SELECT a AS s, b AS d FROM edges UNION ALL SELECT b, a FROM edges),
       walk(n, c) AS (
         SELECT s, s FROM (SELECT DISTINCT s FROM sym) t
         UNION
         SELECT sym.d, walk.c FROM walk JOIN sym ON sym.s = walk.n),
       comps AS (SELECT n AS id, min(c) AS comp FROM walk GROUP BY n),
       groups AS (SELECT comp::BIGINT AS comp, count(*)::BIGINT AS n
         FROM comps GROUP BY comp HAVING count(*) > 1)
       SELECT comp, n, 'uuid-' || comp::VARCHAR AS uuid
       FROM groups WHERE NOT (comp % 3 = 0 AND comp % 6 <> 0)
       ORDER BY comp"""

  // =========================================================================
  // A9/J5 — hardlink subgroups (get_hardlink_groups, state.rs:1168-1179):
  // within each dup group, members sharing a simulated unique_file_id
  // (id % 3 within the comp — several paths to one inode) subgroup
  // together; count ≥ 2 = actual hardlinks (one storage copy).
  // =========================================================================
  def qHardlinkGroups(spark: SparkSession, dir: String): DataFrame = {
    val comps = qConnectedComponents(spark, dir)
      .withColumn("file_id", col("comp") * 100 + col("id") % 3)
    val counts = comps.groupBy("comp", "file_id")
      .agg(count(lit(1)).cast("long").as("hardlink_count"))
    comps.join(counts, Seq("comp", "file_id"))
      .select(col("id"), col("comp"), col("file_id").cast("long").as("file_id"),
        col("hardlink_count"),
        (col("hardlink_count") > 1).cast("long").as("is_hardlink"))
      .orderBy("id")
  }
  def sqlHardlinkGroups(dir: String): String =
    s"""WITH RECURSIVE ${sqlEdgesCte(dir)},
       sym AS (SELECT a AS s, b AS d FROM edges UNION ALL SELECT b, a FROM edges),
       walk(n, c) AS (
         SELECT s, s FROM (SELECT DISTINCT s FROM sym) t
         UNION
         SELECT sym.d, walk.c FROM walk JOIN sym ON sym.s = walk.n),
       comps AS (SELECT n AS id, min(c) AS comp FROM walk GROUP BY n),
       withf AS (SELECT id, comp, comp * 100 + id % 3 AS file_id FROM comps),
       counts AS (SELECT comp, file_id, count(*)::BIGINT AS hardlink_count
         FROM withf GROUP BY 1, 2)
       SELECT w.id::BIGINT AS id, w.comp::BIGINT AS comp,
         w.file_id::BIGINT AS file_id, c.hardlink_count,
         (CASE WHEN c.hardlink_count > 1 THEN 1 ELSE 0 END)::BIGINT AS is_hardlink
       FROM withf w JOIN counts c ON w.comp = c.comp AND w.file_id = c.file_id
       ORDER BY id"""

  // =========================================================================
  // S13 batch keep/drop manifest: per dup group keep the best member
  // (largest simulated size, then earliest mtime, then id) via the REAL
  // Groups.keepList operator (struct-min top-1, giant-safe); everything
  // else is the deletion manifest a 100 TB dedup run emits.
  // =========================================================================
  def qKeepList(spark: SparkSession, dir: String): DataFrame = {
    val m = qConnectedComponents(spark, dir)
      .withColumn("size", (col("id") * 7919L) % 10000L)
      .withColumn("mtime", (col("id") * 37L) % 100000L)
      .withColumn("image_id", format_string("img-%08d", col("id")))
    graft.groups.Groups.keepList(m, Seq(-col("size"), col("mtime")))
      .select(col("id"), col("comp"), col("size"),
        col("keep").cast("long").as("keep"))
      .orderBy("id")
  }
  def sqlKeepList(dir: String): String =
    s"""WITH RECURSIVE ${sqlEdgesCte(dir)},
       sym AS (SELECT a AS s, b AS d FROM edges UNION ALL SELECT b, a FROM edges),
       walk(n, c) AS (
         SELECT s, s FROM (SELECT DISTINCT s FROM sym) t
         UNION
         SELECT sym.d, walk.c FROM walk JOIN sym ON sym.s = walk.n),
       comps AS (SELECT n AS id, min(c) AS comp FROM walk GROUP BY n),
       m AS (SELECT id, comp, (id * 7919) % 10000 AS size,
               (id * 37) % 100000 AS mtime FROM comps),
       ranked AS (SELECT id, comp, size,
           row_number() OVER (PARTITION BY comp
             ORDER BY size DESC, mtime ASC, id ASC) AS rn FROM m)
       SELECT id::BIGINT AS id, comp::BIGINT AS comp, size::BIGINT AS size,
         (CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS keep
       FROM ranked ORDER BY id"""

  // =========================================================================
  // A4/A5/W2 — window duplicate counts + dense_rank subgroup ids
  // =========================================================================
  def qWindowDupCounts(spark: SparkSession, dir: String): DataFrame = {
    val li = rd(spark, dir, "lineitem").where(col("l_orderkey") < 1000)
    val wOrder = Window.partitionBy("l_orderkey")
    val wPart = Window.partitionBy("l_orderkey", "l_partkey")
    li.select(col("l_orderkey").cast("long").as("okey"),
        col("l_linenumber").cast("long").as("line"),
        count(lit(1)).over(wOrder).cast("long").as("cnt_order"),
        count(lit(1)).over(wPart).cast("long").as("cnt_part"),
        dense_rank().over(wOrder.orderBy("l_partkey")).cast("long").as("subgroup"))
      .orderBy("okey", "line")
  }
  def sqlWindowDupCounts(dir: String): String =
    s"""SELECT l_orderkey::BIGINT AS okey, l_linenumber::BIGINT AS line,
       count(*) OVER (PARTITION BY l_orderkey)::BIGINT AS cnt_order,
       count(*) OVER (PARTITION BY l_orderkey, l_partkey)::BIGINT AS cnt_part,
       dense_rank() OVER (PARTITION BY l_orderkey ORDER BY l_partkey)::BIGINT AS subgroup
       FROM lineitem WHERE l_orderkey < 1000 ORDER BY okey, line"""

  // =========================================================================
  // W4 — top-1 per key (largest-thumbnail analog)
  // =========================================================================
  def qTopPerKey(spark: SparkSession, dir: String): DataFrame = {
    val li = rd(spark, dir, "lineitem").where(col("l_orderkey") < 2000)
    val w = Window.partitionBy("l_orderkey")
      .orderBy(col("l_extendedprice").desc, col("l_linenumber").asc)
    li.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("l_orderkey").cast("long").as("okey"),
        col("l_linenumber").cast("long").as("line"),
        col("l_extendedprice").as("price"))
      .orderBy("okey")
  }
  def sqlTopPerKey(dir: String): String =
    s"""SELECT l_orderkey::BIGINT AS okey, l_linenumber::BIGINT AS line,
       l_extendedprice AS price
       FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
               ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
             FROM lineitem WHERE l_orderkey < 2000) t
       WHERE rn = 1 ORDER BY okey"""

  // =========================================================================
  // W1 — result ordering as a rank column (identical-first, dist asc, size desc)
  // =========================================================================
  def qGroupOrderRank(spark: SparkSession, dir: String): DataFrame = {
    val groups = qDupGroups(spark, dir)
    val edges = qBandJoinPairs(spark, dir)
    val comps = qConnectedComponents(spark, dir)
    val maxDist = edges.join(comps, edges("a") === comps("id"))
      .groupBy("comp").agg(max("dist").cast("long").as("max_dist"))
    // global total-order rank, scalably (no single-task WindowExec):
    // range-sort + zipWithIndex via Ranks; comp asc makes the order total
    graft.functions.Ranks.globalRowNumber(
        groups.join(maxDist, Seq("comp"), "left")
          .na.fill(0, Seq("max_dist")),
        Seq(col("max_dist").asc, col("n").desc, col("comp").asc), "rank")
      .select(col("comp"), col("max_dist"), col("rank"))
      .orderBy("comp")
  }
  def sqlGroupOrderRank(dir: String): String =
    s"""WITH RECURSIVE ${sqlEdgesCte(dir)},
       sym AS (SELECT a AS s, b AS d FROM edges UNION ALL SELECT b, a FROM edges),
       walk(n, c) AS (
         SELECT s, s FROM (SELECT DISTINCT s FROM sym) t
         UNION
         SELECT sym.d, walk.c FROM walk JOIN sym ON sym.s = walk.n),
       comps AS (SELECT n AS id, min(c) AS comp FROM walk GROUP BY n),
       groups AS (SELECT comp, count(*) AS n FROM comps GROUP BY comp HAVING count(*) > 1),
       md AS (SELECT comps.comp, max(edges.dist) AS max_dist
              FROM edges JOIN comps ON edges.a = comps.id GROUP BY comps.comp)
       SELECT g.comp::BIGINT AS comp, coalesce(md.max_dist, 0)::BIGINT AS max_dist,
         row_number() OVER (ORDER BY coalesce(md.max_dist, 0) ASC, g.n DESC, g.comp ASC)::BIGINT AS rank
       FROM groups g LEFT JOIN md ON g.comp = md.comp ORDER BY comp"""

  // =========================================================================
  // E1/E2/E3 — set algebra: intersection / union / difference of user sets
  // =========================================================================
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val e = rd(spark, dir, "events")
    def users(cond: Column) = e.where(cond).select(col("user_id").cast("long").as("u")).distinct()
    val hi = users(col("value") > 50.0)
    val lo = users(col("value") <= 50.0)
    val both = hi.intersect(lo).withColumn("tag", lit("both"))
    val onlyHi = hi.except(lo).withColumn("tag", lit("only_hi"))
    val onlyLo = lo.except(hi).withColumn("tag", lit("only_lo"))
    both.unionByName(onlyHi).unionByName(onlyLo).orderBy("tag", "u")
  }
  def sqlSetOps(dir: String): String =
    s"""WITH hi AS (SELECT DISTINCT user_id::BIGINT AS u FROM events WHERE value > 50.0),
       lo AS (SELECT DISTINCT user_id::BIGINT AS u FROM events WHERE value <= 50.0)
       SELECT u, 'both' AS tag FROM (SELECT u FROM hi INTERSECT SELECT u FROM lo) t
       UNION ALL
       SELECT u, 'only_hi' AS tag FROM (SELECT u FROM hi EXCEPT SELECT u FROM lo) t
       UNION ALL
       SELECT u, 'only_lo' AS tag FROM (SELECT u FROM lo EXCEPT SELECT u FROM hi) t
       ORDER BY tag, u"""

  // =========================================================================
  // F5 — search predicates: equals / contains / regex / range
  // =========================================================================
  def qSearchPredicates(spark: SparkSession, dir: String): DataFrame =
    rd(spark, dir, "part")
      .where(col("p_size").between(10, 30) &&
        lower(col("p_name")).contains("r") &&
        col("p_type").rlike("^(ECONOMY|SMALL)") &&
        col("p_brand") =!= "Brand#1")
      .select(col("p_partkey").cast("long").as("p_partkey"), col("p_name"),
        col("p_size").cast("long").as("p_size"))
      .orderBy("p_partkey")
  def sqlSearchPredicates(dir: String): String =
    s"""SELECT p_partkey::BIGINT AS p_partkey, p_name, p_size::BIGINT AS p_size
       FROM part
       WHERE p_size BETWEEN 10 AND 30 AND contains(lower(p_name), 'r')
         AND regexp_matches(p_type, '^(ECONOMY|SMALL)') AND p_brand <> 'Brand#1'
       ORDER BY p_partkey"""

  // =========================================================================
  // §2.9 — the search query language end-to-end
  // =========================================================================
  final val SearchQueryText = "size:10-30 name:contains:red type:=:ECONOMY"
  def qSearchQueryLang(spark: SparkSession, dir: String): DataFrame = {
    val p = rd(spark, dir, "part")
    val aliases = Map("size" -> col("p_size"), "name" -> col("p_name"),
      "type" -> col("p_type"), "brand" -> col("p_brand"))
    p.where(SearchQuery.predicate(SearchQueryText, aliases))
      .select(col("p_partkey").cast("long").as("p_partkey"), col("p_name"))
      .orderBy("p_partkey")
  }
  def sqlSearchQueryLang(dir: String): String =
    s"""SELECT p_partkey::BIGINT AS p_partkey, p_name FROM part
       WHERE p_size BETWEEN 10 AND 30 AND contains(lower(p_name), 'red')
         AND p_type = 'ECONOMY'
       ORDER BY p_partkey"""

  // =========================================================================
  // P19 — number-from-string: "f/2.8"-style parsing with regexp_extract
  // =========================================================================
  def qNumberFromString(spark: SparkSession, dir: String): DataFrame =
    rd(spark, dir, "part")
      .select(col("p_partkey").cast("long").as("p_partkey"),
        concat(lit("f/"), col("p_size")).as("fstr"),
        concat(lit("ISO "), col("p_size") * 100).as("isostr"),
        concat(col("p_size"), lit("mm")).as("mmstr"))
      .select(col("p_partkey"),
        regexp_extract(col("fstr"), "f/([0-9]+)", 1).cast("long").as("fnum"),
        regexp_extract(col("isostr"), "ISO ([0-9]+)", 1).cast("long").as("iso"),
        regexp_extract(col("mmstr"), "([0-9]+)mm", 1).cast("long").as("mm"))
      .orderBy("p_partkey")
  def sqlNumberFromString(dir: String): String =
    s"""SELECT p_partkey::BIGINT AS p_partkey,
       regexp_extract('f/' || p_size::VARCHAR, 'f/([0-9]+)', 1)::BIGINT AS fnum,
       regexp_extract('ISO ' || (p_size*100)::VARCHAR, 'ISO ([0-9]+)', 1)::BIGINT AS iso,
       regexp_extract(p_size::VARCHAR || 'mm', '([0-9]+)mm', 1)::BIGINT AS mm
       FROM part ORDER BY p_partkey"""

  // =========================================================================
  // W3 — natural sort (digit runs numeric). The oracle rebuilds the same
  // zero-pad key without lookarounds: DuckDB regexp_extract_all splits into
  // digit/non-digit runs, list_transform pads the digit runs.
  // =========================================================================
  def qNaturalSort(spark: SparkSession, dir: String): DataFrame =
    graft.functions.Ranks.globalRowNumber(
        rd(spark, dir, "part")
          .select(col("p_partkey").cast("long").as("p_partkey"), col("p_name")),
        Seq(graft.functions.NaturalSort.key(col("p_name")).asc,
          col("p_partkey").asc), "nat_rank")
      .select("p_partkey", "p_name", "nat_rank")
      .orderBy("p_partkey")
  def sqlNaturalSort(dir: String): String =
    s"""WITH keyed AS (
         SELECT p_partkey::BIGINT AS p_partkey, p_name,
           array_to_string(list_transform(
             regexp_extract_all(lower(p_name), '[0-9]+|[^0-9]+'),
             x -> CASE WHEN regexp_matches(x, '^[0-9]+$$')
                       THEN lpad(x, 12, '0') ELSE x END), '') AS natkey
         FROM part)
       SELECT p_partkey, p_name,
         row_number() OVER (ORDER BY natkey, p_partkey)::BIGINT AS nat_rank
       FROM keyed ORDER BY p_partkey"""

  // =========================================================================
  // P11/J2-u64 — the pHash(u64) grouping mode: the REAL BandJoin64 operator
  // (8×8-bit chunks, threshold 15 = MAX_SIMILARITY_64, hamminghash.rs:5,
  // 23-41) over planted 64-bit hashes, then connected components. The
  // oracle is an INDEPENDENT brute-force all-pairs Hamming join + recursive
  // CC — equality also proves the banded probe's exhaustive recall.
  // =========================================================================
  private val PhashGroupIds = 2000
  def qPhashGroups(spark: SparkSession, dir: String): DataFrame = {
    val sig = rd(spark, dir, "events").where(col("event_id") < PhashGroupIds)
      .select(col("event_id").cast("long").as("ord"),
        plantedCol(col("event_id")).as("phash64"))
      .withColumn("phash_variants", array(col("phash64")))
      .withColumn("low_conf", lit(false))
      .withColumn("has_pdq", lit(true))
    val edges = graft.lsh.BandJoin64.edges(sig, graft.lsh.BandJoin64.DefaultThreshold)
    ConnectedComponents.run(spark, edges)
      .select(col("id").cast("long").as("id"), col("comp").cast("long").as("comp"))
      .orderBy("id")
  }
  def sqlPhashGroups(dir: String): String =
    s"""WITH RECURSIVE hashes AS (
         SELECT event_id::BIGINT AS id, $plantedSql AS h
         FROM events WHERE event_id < $PhashGroupIds),
       edges AS (SELECT x.id AS a, y.id AS b FROM hashes x JOIN hashes y
         ON x.id < y.id AND bit_count(xor(x.h, y.h)) <= 15),
       sym AS (SELECT a AS s, b AS d FROM edges UNION ALL SELECT b, a FROM edges),
       walk(n, c) AS (
         SELECT s, s FROM (SELECT DISTINCT s FROM sym) t
         UNION
         SELECT sym.d, walk.c FROM walk JOIN sym ON sym.s = walk.n)
       SELECT n::BIGINT AS id, min(c)::BIGINT AS comp FROM walk GROUP BY n ORDER BY id"""

  // =========================================================================
  // A6 — group max_dist: max over members of min-over-pivot-variants
  // Hamming distance to the pivot (scanner.rs:2219-2241), relationally over
  // the planted hashes so the driver's hash gate covers it. The pivot is
  // the min-id member; its "dihedral variants" are simulated as fixed
  // XOR-isometries of the pivot hash.
  // =========================================================================
  private val PivotMasks = Seq(0L, 3L, 5L << 8, 9L << 16)
  def qGroupMaxDist(spark: SparkSession, dir: String): DataFrame = {
    val h = plantedHashes(spark, dir)
    val m = qConnectedComponents(spark, dir).join(h, "id")
    val pivots = m.groupBy("comp").agg(min("id").as("pid"))
      .join(h.select(col("id").as("pid"), col("h").as("ph")), "pid")
    m.join(pivots.select("comp", "ph"), "comp")
      .withColumn("dist", least(PivotMasks.map(mask =>
        bit_count(col("h").bitwiseXOR(col("ph").bitwiseXOR(lit(mask))))): _*))
      .groupBy("comp")
      .agg(count(lit(1)).cast("long").as("n"),
        max("dist").cast("long").as("max_dist"))
      .select(col("comp").cast("long").as("comp"), col("n"), col("max_dist"))
      .orderBy("comp")
  }
  def sqlGroupMaxDist(dir: String): String = {
    val distExprs = PivotMasks.map(mask =>
      s"bit_count(xor(m.h, xor(p.ph, $mask)))").mkString("least(", ", ", ")")
    s"""WITH RECURSIVE ${sqlEdgesCte(dir)},
       sym AS (SELECT a AS s, b AS d FROM edges UNION ALL SELECT b, a FROM edges),
       walk(n, c) AS (
         SELECT s, s FROM (SELECT DISTINCT s FROM sym) t
         UNION
         SELECT sym.d, walk.c FROM walk JOIN sym ON sym.s = walk.n),
       comps AS (SELECT n AS id, min(c) AS comp FROM walk GROUP BY n),
       members AS (SELECT comps.id, comps.comp, hashes.h
         FROM comps JOIN hashes ON hashes.id = comps.id),
       pivots AS (SELECT comp, min(id) AS pid FROM members GROUP BY comp),
       pivoth AS (SELECT pivots.comp, members.h AS ph
         FROM pivots JOIN members ON members.id = pivots.pid)
       SELECT m.comp::BIGINT AS comp, count(*)::BIGINT AS n,
         max($distExprs)::BIGINT AS max_dist
       FROM members m JOIN pivoth p ON p.comp = m.comp
       GROUP BY m.comp ORDER BY comp"""
  }

  // =========================================================================
  // J2 high-threshold tier — R=3 multi-probe (threshold 12 over 4×16-bit
  // chunks ⇒ tol 3, the scanner.rs:1755-1767 tier). Hashes are planted so
  // some pairs differ by exactly 3 bits in EVERY chunk — findable only by
  // the radius-3 masks. The oracle is brute force; equality proves the
  // R=3 tier's exhaustive recall (hamminghash.rs:283-332 at Spark level).
  // =========================================================================
  private val R3Ids = 1998
  private val R3Threshold = 12
  /** member m of cluster id/6: m=0 base; m=1..4 flip bits {1,5,9} of chunk
    * m-1 (pair dists 3/6); m=5 flips them in all 4 chunks (dist-12 pair vs
    * base with per-chunk profile 3,3,3,3 — the R=3-only case). */
  private def r3Col(id: Column): Column = {
    val base = h64Col(floor(id / 6).cast("long"))
    val m = id % 6
    val spread = when(m === 0, lit(0L))
      .when(m === 5, lit(0x0222022202220222L))
      .otherwise(expr(
        "shiftleft(CAST(546 AS BIGINT), CAST((event_id % 6 - 1) * 16 AS INT))"))
    base.bitwiseXOR(spread)
  }
  private def r3Sql: String =
    s"""xor(${h64Sql("(event_id // 6)")},
       CASE WHEN event_id % 6 = 0 THEN 0
            WHEN event_id % 6 = 5 THEN 153687682371944994
            ELSE (546::BIGINT << (((event_id % 6) - 1) * 16)::INT) END)"""
  def qBandJoinR3(spark: SparkSession, dir: String): DataFrame = {
    val h = rd(spark, dir, "events").where(col("event_id") < R3Ids)
      .select(col("event_id").cast("long").as("id"), r3Col(col("event_id")).as("h"))
    // radius split (1,2): covers per-chunk distance ≤ 3 by triangle
    // inequality, exactly like BandJoin.bandMatches
    def keys(df: DataFrame, radius: Int): DataFrame =
      df.select(col("*"),
          posexplode(array((0 until 4).map(k => chunkCol(col("h"), k)): _*))
            .as(Seq("band_idx", "chunk")))
        .withColumn("mask", explode(lit(graft.lsh.BandJoin.masksB(radius, 16))))
        .withColumn("band_val", col("chunk").bitwiseXOR(col("mask")))
    val a = keys(h, 1).select(col("id").as("a"), col("h").as("ha"),
      col("band_idx"), col("band_val"))
    val b = keys(h, 2).select(col("id").as("b"), col("h").as("hb"),
      col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("dist"))
      .where(col("dist") <= R3Threshold)
      .distinct()
      .orderBy("a", "b")
  }
  def sqlBandJoinR3(dir: String): String =
    s"""WITH hashes AS (SELECT event_id::BIGINT AS id, $r3Sql AS h
         FROM events WHERE event_id < $R3Ids)
       SELECT x.id AS a, y.id AS b, bit_count(xor(x.h, y.h))::BIGINT AS dist
       FROM hashes x JOIN hashes y ON x.id < y.id
       WHERE bit_count(xor(x.h, y.h)) <= $R3Threshold
       ORDER BY a, b"""

  // =========================================================================
  // W3 exif-date order — the scanner.rs:2078-2095 comparator: EXIF-stamped
  // rows first (by EXIF ts), un-stamped after (by mtime); built from the
  // REAL NaturalSort.exifDateOrder columns plus an id tie-break
  // =========================================================================
  def qExifDateOrder(spark: SparkSession, dir: String): DataFrame = {
    val e = rd(spark, dir, "events").where(col("event_id") < 3000)
      .select(col("event_id").cast("long").as("id"),
        ((col("event_id") * 37) % 100000).cast("long").as("mtime"),
        when(col("event_id") % 3 === 0, lit(null).cast("long"))
          .otherwise((col("event_id") * 91) % 100000).as("exif_ts"))
    val sortCols = graft.functions.NaturalSort.exifDateOrder(
      col("exif_ts"), col("mtime"), desc = false) :+ col("id").asc
    graft.functions.Ranks.globalRowNumber(e, sortCols, "rnk")
      .orderBy("id")
  }
  def sqlExifDateOrder(dir: String): String =
    s"""SELECT id, mtime, exif_ts,
       row_number() OVER (ORDER BY (exif_ts IS NULL), exif_ts ASC NULLS LAST,
                          mtime, id)::BIGINT AS rnk
       FROM (SELECT event_id::BIGINT AS id,
               ((event_id * 37) % 100000)::BIGINT AS mtime,
               (CASE WHEN event_id % 3 = 0 THEN NULL
                     ELSE (event_id * 91) % 100000 END)::BIGINT AS exif_ts
             FROM events WHERE event_id < 3000)
       ORDER BY id"""

  // =========================================================================
  // P16 — EXIF-style timestamp round-trip parse
  // =========================================================================
  def qExifTimestamp(spark: SparkSession, dir: String): DataFrame =
    rd(spark, dir, "events").where(col("event_id") < 3000)
      .select(col("event_id").cast("long").as("id"),
        date_format(col("ts"), "yyyy:MM:dd HH:mm:ss").as("exif_str"))
      .withColumn("parsed", to_timestamp(col("exif_str"), "yyyy:MM:dd HH:mm:ss"))
      .orderBy("id")
  def sqlExifTimestamp(dir: String): String =
    s"""SELECT event_id::BIGINT AS id,
       strftime(ts, '%Y:%m:%d %H:%M:%S') AS exif_str,
       strptime(strftime(ts, '%Y:%m:%d %H:%M:%S'), '%Y:%m:%d %H:%M:%S') AS parsed
       FROM events WHERE event_id < 3000 ORDER BY id"""

  // =========================================================================
  // P15 — GPS DMS → signed decimal degrees
  // =========================================================================
  def qDmsToDecimal(spark: SparkSession, dir: String): DataFrame =
    rd(spark, dir, "lineitem").where(col("l_orderkey") < 500)
      .select(col("l_orderkey").cast("long").as("okey"),
        col("l_linenumber").cast("long").as("line"),
        (col("l_linenumber") * 10 % 90).cast("long").as("deg"),
        (col("l_partkey") % 60).cast("long").as("mins"),
        (col("l_suppkey") % 60).cast("long").as("secs"),
        when(col("l_orderkey") % 2 === 0, 1L).otherwise(-1L).as("hemi"))
      .withColumn("decimal_deg",
        round(col("hemi") * (col("deg") + col("mins") / 60.0 + col("secs") / 3600.0), 6))
      .orderBy("okey", "line")
  def sqlDmsToDecimal(dir: String): String =
    s"""SELECT l_orderkey::BIGINT AS okey, l_linenumber::BIGINT AS line,
       (l_linenumber * 10 % 90)::BIGINT AS deg, (l_partkey % 60)::BIGINT AS mins,
       (l_suppkey % 60)::BIGINT AS secs,
       (CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE -1 END)::BIGINT AS hemi,
       round((CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE -1 END) *
         ((l_linenumber * 10 % 90) + (l_partkey % 60) / 60.0 + (l_suppkey % 60) / 3600.0), 6)
         AS decimal_deg
       FROM lineitem WHERE l_orderkey < 500 ORDER BY okey, line"""
}
